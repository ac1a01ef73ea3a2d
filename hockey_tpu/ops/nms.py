"""On-device batched NMS with fixed shapes.

The reference gets NMS from ultralytics' torchvision call on GPU/CPU with
dynamic output shapes. XLA needs static shapes, so this version:

1. takes the top ``pre_topk`` candidates by score (lax.top_k),
2. computes one (K, K) IoU matrix (class-offset trick for class-aware NMS,
   as in torchvision.ops.batched_nms),
3. runs greedy suppression as a fori_loop of K vectorized steps (exact,
   same kept set as sequential NMS), or a single matrix step ("fast" mode,
   YOLACT-style, slightly more aggressive suppression),
4. emits exactly ``max_det`` slots with a validity mask.

Batch dimension is vmapped; the whole thing lives inside the jitted
detection megastep, so no host round-trip between forward pass and NMS.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .iou import box_iou

_CLASS_OFFSET = 1e4  # larger than any letterboxed coordinate


class Detections(NamedTuple):
    """Fixed-capacity detection set (one frame or a batch; leading dims
    broadcast). Invalid slots have score -1 and zero boxes."""

    boxes: jnp.ndarray    # (..., max_det, 4) xyxy
    scores: jnp.ndarray   # (..., max_det)
    classes: jnp.ndarray  # (..., max_det) int32
    valid: jnp.ndarray    # (..., max_det) bool


def _suppress_exact(iou: jnp.ndarray, keep0: jnp.ndarray, iou_thr: float) -> jnp.ndarray:
    """Greedy NMS over score-sorted candidates: K tiny vector steps."""
    k = iou.shape[0]
    later = jnp.arange(k)

    def body(i, keep):
        mask = (iou[i] > iou_thr) & (later > i)
        return jnp.where(keep[i], keep & ~mask, keep)

    return jax.lax.fori_loop(0, k, body, keep0)


def _suppress_fast(iou: jnp.ndarray, keep0: jnp.ndarray, iou_thr: float) -> jnp.ndarray:
    """One-shot matrix suppression (YOLACT fast-NMS): drop any box that
    overlaps a *higher-scoring valid* box, whether or not that box survives."""
    k = iou.shape[0]
    higher = jnp.tril(jnp.ones((k, k), bool), -1)  # [i, j] = j ranked above i
    suppressed = jnp.any((iou > iou_thr) & higher & keep0[None, :], axis=1)
    return keep0 & ~suppressed


@functools.partial(
    jax.jit,
    static_argnames=("pre_topk", "max_det", "class_aware", "exact", "pallas",
                     "containment_threshold"),
)
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    classes: jnp.ndarray,
    *,
    score_threshold: float = 0.25,
    iou_threshold: float = 0.45,
    containment_threshold: float = 0.0,
    pre_topk: int = 256,
    max_det: int = 64,
    class_aware: bool = True,
    exact: bool = True,
    pallas: bool = False,
) -> Detections:
    """Single-image NMS. boxes (A, 4) f32, scores (A,), classes (A,) int.
    `pallas=True` runs the sequential suppression as a VMEM-resident
    Pallas kernel (TPU backends; same kept set as exact).

    `containment_threshold` > 0 additionally suppresses a candidate whose
    intersection-over-min-area with a higher-ranked kept same-class box
    exceeds it (0 = pure-IoU suppression, the torchvision/ultralytics
    contract). Partial-duplicate boxes — a torso box inside a full-body
    box of the same player — sit just under the IoU gate (measured
    generator-B dup pairs: IoU 0.38-0.44 vs the 0.45 gate) but high in
    containment (IoMin ~0.68); see COMPAT.md."""
    a = scores.shape[0]
    k = min(pre_topk, a)
    scores = scores.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)

    top_scores, idx = jax.lax.top_k(scores, k)
    top_boxes = boxes[idx]
    top_classes = classes[idx].astype(jnp.int32)

    nms_boxes = top_boxes
    if class_aware:
        nms_boxes = top_boxes + (top_classes.astype(jnp.float32) * _CLASS_OFFSET)[:, None]

    iou = box_iou(nms_boxes, nms_boxes)
    if containment_threshold > 0.0:
        # fold both criteria into one matrix thresholded at 0 so the
        # three suppression backends stay unchanged:
        # suppress iff iou > iou_thr OR iomin > containment_thr.
        # class-offset boxes never intersect cross-class, so the
        # containment term inherits class awareness.
        tl = jnp.maximum(nms_boxes[:, None, :2], nms_boxes[None, :, :2])
        br = jnp.minimum(nms_boxes[:, None, 2:], nms_boxes[None, :, 2:])
        inter = jnp.prod(jnp.clip(br - tl, 0.0, None), -1)
        area = jnp.prod(jnp.clip(nms_boxes[:, 2:] - nms_boxes[:, :2],
                                 0.0, None), -1)
        iomin = inter / jnp.maximum(
            jnp.minimum(area[:, None], area[None, :]), 1e-9)
        metric = jnp.maximum(iou - iou_threshold,
                             iomin - containment_threshold)
        sup_mat, sup_thr = metric, 0.0
    else:
        sup_mat, sup_thr = iou, iou_threshold
    keep0 = top_scores > score_threshold
    if pallas:
        from .pallas.nms_kernel import suppress_pallas

        keep = suppress_pallas(sup_mat, keep0, sup_thr)
    else:
        keep = (_suppress_exact if exact else _suppress_fast)(sup_mat, keep0, sup_thr)

    final_scores = jnp.where(keep, top_scores, -1.0)
    if k < max_det:  # fewer candidates than output slots: pad with invalid
        pad = max_det - k
        final_scores = jnp.pad(final_scores, (0, pad), constant_values=-1.0)
        top_boxes = jnp.pad(top_boxes, ((0, pad), (0, 0)))
        top_classes = jnp.pad(top_classes, (0, pad), constant_values=-1)
    out_scores, out_idx = jax.lax.top_k(final_scores, max_det)
    out_valid = out_scores > score_threshold
    out_boxes = jnp.where(out_valid[:, None], top_boxes[out_idx], 0.0)
    out_classes = jnp.where(out_valid, top_classes[out_idx], -1)
    out_scores = jnp.where(out_valid, out_scores, -1.0)
    return Detections(out_boxes, out_scores, out_classes, out_valid)


def nms_batch(boxes, scores, classes, **kwargs) -> Detections:
    """vmapped NMS over a leading batch dim."""
    fn = functools.partial(nms, **kwargs)
    return jax.vmap(fn)(boxes, scores, classes)
