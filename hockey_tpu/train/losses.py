"""YOLOv8 detection loss: BCE cls + CIoU box + distribution focal loss.

Standard v8 formulation (the reference delegates to ultralytics' trainer;
weights 7.5 box / 0.5 cls / 1.5 dfl are the published defaults the
reference trained with — notebook cell 15 overrides none of them).
All in grid units (stride-normalized), fixed shapes, f32 accumulation.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..models.yolov8 import YoloConfig, anchor_points
from ..ops.iou import ciou
from .assigner import assign_batch

BOX_W, CLS_W, DFL_W = 7.5, 0.5, 1.5
KPT_W, KOBJ_W = 12.0, 1.0  # published v8-pose defaults


def _dfl_loss(pred_dist: jnp.ndarray, target: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution focal loss per side. pred_dist (..., reg_max) logits,
    target (...) continuous in [0, reg_max-1]. Cross-entropy against the
    two straddling bins, linearly weighted."""
    tl = jnp.clip(jnp.floor(target), 0, reg_max - 1)
    tr = jnp.clip(tl + 1, 0, reg_max - 1)
    wl = tr - target
    wr = 1.0 - wl
    logp = jax.nn.log_softmax(pred_dist, axis=-1)
    ll = jnp.take_along_axis(logp, tl[..., None].astype(jnp.int32), axis=-1)[..., 0]
    lr = jnp.take_along_axis(logp, tr[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return -(ll * wl + lr * wr)


def detection_loss(
    raw: Dict,
    batch: Dict[str, jnp.ndarray],
    cfg: YoloConfig,
    imgsz: int,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """raw: forward_raw output. batch: {'boxes' (B,M,4) xyxy px,
    'classes' (B,M) int32, 'mask' (B,M) bool}. Returns (loss, metrics)."""
    b = raw["box"][0].shape[0]
    reg_max = cfg.reg_max
    nc = cfg.num_classes

    box_flat = jnp.concatenate(
        [m.reshape(b, -1, 4 * reg_max) for m in raw["box"]], axis=1
    ).astype(jnp.float32)                                   # (B, A, 4*rm)
    cls_flat = jnp.concatenate(
        [m.reshape(b, -1, nc) for m in raw["cls"]], axis=1
    ).astype(jnp.float32)                                   # (B, A, nc)

    pts, strides = anchor_points(imgsz)
    pts = jnp.asarray(pts)                                  # (A, 2) grid units
    strides = jnp.asarray(strides)                          # (A,)

    # decode predicted boxes in *grid units* (per-anchor stride normalized)
    dist = box_flat.reshape(b, -1, 4, reg_max)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    dist_e = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # (B,A,4)
    pred_xyxy_grid = jnp.concatenate(
        [pts[None] - dist_e[..., :2], pts[None] + dist_e[..., 2:]], axis=-1
    )

    # gt boxes in grid units per anchor's stride: assignment happens in a
    # shared pixel space instead — scale anchors up to px
    pts_px = pts * strides[:, None]
    pred_xyxy_px = pred_xyxy_grid * strides[None, :, None]

    scores = jax.nn.sigmoid(cls_flat)
    # assignment must be gradient-free (ultralytics detaches scores/boxes
    # before TAL — tal.py TaskAlignedAssigner.forward). Without the stop,
    # the soft targets t = align/max_align * max_iou are differentiable in
    # the predictions and the optimizer finds the degenerate minimum
    # directly: worse predictions -> smaller targets -> smaller loss
    # (measured: stable training collapses to box_loss ~ 0 within ~100
    # steps of reaching peak LR).
    assign = assign_batch(
        jax.lax.stop_gradient(scores),
        jax.lax.stop_gradient(pred_xyxy_px), pts_px,
        batch["boxes"], batch["classes"], batch["mask"],
        num_classes=nc,
    )
    fg = assign.fg_mask                                     # (B, A)
    tgt_scores = assign.target_scores                       # (B, A, nc)
    tgt_sum = jnp.maximum(jnp.sum(tgt_scores), 1.0)

    # --- cls: BCE over all anchors
    bce = optax_sigmoid_bce(cls_flat, tgt_scores)
    cls_loss = jnp.sum(bce) / tgt_sum

    # --- box: CIoU on fg, weighted by target score
    w = jnp.sum(tgt_scores, axis=-1)                        # (B, A)
    iou_term = 1.0 - ciou(pred_xyxy_px, assign.target_boxes)
    box_loss = jnp.sum(iou_term * w * fg) / tgt_sum

    # --- dfl: per-side cross-entropy on fg
    tgt_grid = assign.target_boxes / strides[None, :, None]  # (B, A, 4) xyxy grid
    lt = pts[None] - tgt_grid[..., :2]
    rb = tgt_grid[..., 2:] - pts[None]
    tgt_ltrb = jnp.clip(jnp.concatenate([lt, rb], -1), 0, reg_max - 1.01)
    dfl = _dfl_loss(dist, tgt_ltrb, reg_max)                # (B, A, 4)
    dfl_loss = jnp.sum(jnp.mean(dfl, axis=-1) * w * fg) / tgt_sum

    total = BOX_W * box_loss + CLS_W * cls_loss + DFL_W * dfl_loss
    metrics = {
        "loss": total,
        "box_loss": box_loss,
        "cls_loss": cls_loss,
        "dfl_loss": dfl_loss,
        "num_fg": jnp.sum(fg.astype(jnp.float32)),
    }

    # --- keypoints (pose models): OKS-style location loss + visibility BCE
    if "kpt" in raw and "keypoints" in batch:
        kpt_loc, kpt_vis = _keypoint_loss(
            raw, batch, cfg, assign, fg, w, tgt_sum, pts, strides)
        total = total + KPT_W * kpt_loc + KOBJ_W * kpt_vis
        metrics["loss"] = total
        metrics["kpt_loss"] = kpt_loc
        metrics["kobj_loss"] = kpt_vis
    return total, metrics


def _keypoint_loss(raw, batch, cfg, assign, fg, w, tgt_sum, pts, strides):
    """v8-pose keypoint loss for fg anchors: OKS-style location term
    (1 - exp(-d^2 / (2 * area * sigma^2))) over visible keypoints + BCE on
    the per-keypoint visibility logit. batch['keypoints']: (B, M, K, 3)
    with (x_px, y_px, visible)."""
    b = raw["kpt"][0].shape[0]
    k = cfg.num_keypoints
    kpt_raw = jnp.concatenate(
        [m.reshape(b, -1, k, 3) for m in raw["kpt"]], axis=1
    ).astype(jnp.float32)                                    # (B, A, K, 3)
    # decode predicted keypoints to px (same as models.yolov8.decode_keypoints)
    p = pts[None, :, None, :]
    s = strides[None, :, None, None]
    pred_xy = (kpt_raw[..., :2] * 2.0 + (p - 0.5)) * s
    vis_logit = kpt_raw[..., 2]

    # gather assigned gt keypoints per anchor
    gt_kpts = batch["keypoints"]                             # (B, M, K, 3)
    idx = assign.target_gt_idx[..., None, None]              # (B, A, 1, 1)
    tgt = jnp.take_along_axis(
        gt_kpts, jnp.broadcast_to(idx, (b, idx.shape[1], k, 3)), axis=1)
    tgt_xy, tgt_vis = tgt[..., :2], tgt[..., 2]

    area = box_area_xyxy(assign.target_boxes)                # (B, A)
    d2 = jnp.sum((pred_xy - tgt_xy) ** 2, axis=-1)           # (B, A, K)
    e = d2 / (2.0 * jnp.maximum(area[..., None], 1.0))
    oks_term = 1.0 - jnp.exp(-e)
    vis_mask = (tgt_vis > 0.5).astype(jnp.float32)
    anchor_w = (w * fg)[..., None]
    loc = jnp.sum(oks_term * vis_mask * anchor_w) / jnp.maximum(
        jnp.sum(vis_mask * anchor_w), 1.0)

    vis_bce = optax_sigmoid_bce(vis_logit, vis_mask)
    vis = jnp.sum(vis_bce * (fg[..., None])) / jnp.maximum(
        jnp.sum(fg) * k, 1.0)
    return loc, vis


def box_area_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0)


def optax_sigmoid_bce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable elementwise sigmoid BCE."""
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
