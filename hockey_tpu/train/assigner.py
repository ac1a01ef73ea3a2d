"""Task-aligned label assignment (TAL) for anchor-free YOLOv8 training.

The reference trains via the ultralytics CLI (notebooks/
train_player_detection.ipynb cell 15); this is our own vectorized
implementation of the same assignment scheme so the detector can be
(re)trained on TPU: align = score^alpha * iou^beta over in-box candidate
anchors, top-k per gt, conflicts resolved by IoU, target scores normalized
by the per-gt max metric.

Everything is fixed-shape (padded gt table + masks) and vmapped over the
batch — no data-dependent shapes under jit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.iou import box_iou


class AssignResult(NamedTuple):
    target_boxes: jnp.ndarray    # (A, 4) xyxy assigned gt box per anchor
    target_scores: jnp.ndarray   # (A, nc) soft cls targets
    fg_mask: jnp.ndarray         # (A,) bool — anchor has an assignment
    target_gt_idx: jnp.ndarray   # (A,) int32 assigned gt row (valid on fg)


def _assign_single(
    pred_scores: jnp.ndarray,   # (A, nc) sigmoid probs
    pred_boxes: jnp.ndarray,    # (A, 4) xyxy (any consistent unit)
    anchor_points: jnp.ndarray, # (A, 2) in the same unit
    gt_boxes: jnp.ndarray,      # (M, 4) xyxy padded
    gt_classes: jnp.ndarray,    # (M,) int32
    gt_mask: jnp.ndarray,       # (M,) bool
    num_classes: int,
    topk: int,
    alpha: float,
    beta: float,
) -> AssignResult:
    a = pred_boxes.shape[0]
    m = gt_boxes.shape[0]

    # candidates: anchor center strictly inside the gt box
    px, py = anchor_points[:, 0], anchor_points[:, 1]
    inside = (
        (px[None, :] > gt_boxes[:, 0:1]) & (px[None, :] < gt_boxes[:, 2:3])
        & (py[None, :] > gt_boxes[:, 1:2]) & (py[None, :] < gt_boxes[:, 3:4])
    )  # (M, A)
    inside &= gt_mask[:, None]

    ious = jnp.maximum(box_iou(gt_boxes, pred_boxes), 0.0)          # (M, A)
    cls_score = jnp.take_along_axis(
        pred_scores.T, jnp.clip(gt_classes, 0, num_classes - 1)[:, None], axis=0
    )  # hmm: want (M, A) of pred prob for gt class
    # pred_scores.T is (nc, A); take rows by gt class -> (M, A)
    align = (cls_score ** alpha) * (ious ** beta)
    align = jnp.where(inside, align, 0.0)

    # top-k per gt
    k = min(topk, a)
    topk_vals, _ = jax.lax.top_k(align, k)                          # (M, k)
    kth = topk_vals[:, k - 1 : k]                                   # (M, 1)
    # no epsilon floor: align = score^a * iou^b is legitimately tiny early
    # in training (iou^6 of a bad box ~ 1e-11) and must still be assignable
    cand = inside & (align >= kth) & (align > 0)

    # resolve anchors claimed by multiple gts: keep highest-iou gt
    iou_masked = jnp.where(cand, ious, -1.0)
    best_gt = jnp.argmax(iou_masked, axis=0)                        # (A,)
    fg = jnp.max(iou_masked, axis=0) > 0

    tgt_boxes = gt_boxes[best_gt]
    tgt_cls = gt_classes[best_gt]
    tgt_iou = jnp.where(fg, ious[best_gt, jnp.arange(a)], 0.0)
    tgt_align = jnp.where(fg, align[best_gt, jnp.arange(a)], 0.0)

    # per-gt normalization: t = align / max_align(gt) * max_iou(gt)
    onehot_assign = (best_gt[None, :] == jnp.arange(m)[:, None]) & fg[None, :]
    per_gt_max_align = jnp.max(jnp.where(onehot_assign, tgt_align[None, :], 0.0), axis=1)
    per_gt_max_iou = jnp.max(jnp.where(onehot_assign, tgt_iou[None, :], 0.0), axis=1)
    norm = per_gt_max_iou / jnp.maximum(per_gt_max_align, 1e-9)
    t = tgt_align * norm[best_gt]                                    # (A,)

    scores = jax.nn.one_hot(tgt_cls, num_classes) * t[:, None]
    scores = jnp.where(fg[:, None], scores, 0.0)
    return AssignResult(tgt_boxes, scores, fg, best_gt.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("num_classes", "topk", "alpha", "beta"))
def assign_batch(
    pred_scores: jnp.ndarray,    # (B, A, nc)
    pred_boxes: jnp.ndarray,     # (B, A, 4)
    anchor_points: jnp.ndarray,  # (A, 2)
    gt_boxes: jnp.ndarray,       # (B, M, 4)
    gt_classes: jnp.ndarray,     # (B, M)
    gt_mask: jnp.ndarray,        # (B, M)
    num_classes: int = 2,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
) -> AssignResult:
    fn = functools.partial(
        _assign_single, num_classes=num_classes, topk=topk, alpha=alpha, beta=beta
    )
    return jax.vmap(fn, in_axes=(0, 0, None, 0, 0, 0))(
        pred_scores, pred_boxes, anchor_points, gt_boxes, gt_classes, gt_mask
    )
