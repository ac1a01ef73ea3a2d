"""Box IoU family, vectorized for TPU (no data-dependent shapes).

Used by NMS (ops/nms.py), ByteTrack association (tracking/bytetrack.py),
and the CIoU training loss (train/losses.py). The reference delegates all
of this to supervision/ultralytics internals; here they are first-class
XLA ops.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of (..., 4) xyxy boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU. a: (N, 4), b: (M, 4) xyxy -> (N, M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / jnp.maximum(union, EPS)


def ciou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Complete-IoU between aligned (..., 4) xyxy boxes.

    Matches the standard YOLOv8 box-loss formulation: IoU minus
    center-distance and aspect-ratio penalties.
    """
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a) + box_area(b) - inter
    iou = inter / jnp.maximum(union, EPS)

    # smallest enclosing box
    c_lt = jnp.minimum(a[..., :2], b[..., :2])
    c_rb = jnp.maximum(a[..., 2:], b[..., 2:])
    c_wh = jnp.maximum(c_rb - c_lt, 0.0)
    c2 = c_wh[..., 0] ** 2 + c_wh[..., 1] ** 2 + EPS

    # center distance
    a_c = (a[..., :2] + a[..., 2:]) * 0.5
    b_c = (b[..., :2] + b[..., 2:]) * 0.5
    rho2 = jnp.sum((a_c - b_c) ** 2, axis=-1)

    # aspect-ratio consistency
    aw = jnp.maximum(a[..., 2] - a[..., 0], EPS)
    ah = jnp.maximum(a[..., 3] - a[..., 1], EPS)
    bw = jnp.maximum(b[..., 2] - b[..., 0], EPS)
    bh = jnp.maximum(b[..., 3] - b[..., 1], EPS)
    v = (4.0 / (jnp.pi ** 2)) * (jnp.arctan(bw / bh) - jnp.arctan(aw / ah)) ** 2
    alpha = v / jnp.maximum(1.0 - iou + v, EPS)

    return iou - rho2 / c2 - alpha * v


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)
