"""Batched crop-and-resize (ROI pooling) on device.

The reference extracts per-player crops on host (`sv.crop_image` per box,
hockey/main.py:324-326) and then runs per-crop OpenCV work. Here all crops
are sampled from the device-resident frame in one bilinear gather with a
fixed output size — variable box sizes, static output shapes, vmapped over
a padded box table.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_hw",))
def crop_and_resize(
    frame: jnp.ndarray,
    boxes: jnp.ndarray,
    out_hw: Tuple[int, int] = (128, 64),
) -> jnp.ndarray:
    """Sample axis-aligned crops with bilinear interpolation.

    frame: (H, W, C) any float/uint dtype; boxes: (N, 4) xyxy in pixel
    coords (may be fractional / padded with zeros). Returns (N, oh, ow, C)
    float32. Zero-area boxes yield all-(0,0)-pixel samples — callers mask
    by validity.
    """
    h, w = frame.shape[0], frame.shape[1]
    oh, ow = out_hw
    # flat (H*W, C) source + fused 2D-index gathers: gathering rows first
    # (img[y0] -> (oh, W, C)) materializes the full frame width per crop —
    # 7.5 GB at batch 32 x 64 dets — while flat gathers touch only the
    # oh x ow sampled pixels
    flat = frame.reshape(h * w, -1).astype(jnp.float32)

    def one(box):
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        # sample centers of oh x ow grid cells spanning the box
        ys = y1 + (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (y2 - y1) / oh - 0.5
        xs = x1 + (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (x2 - x1) / ow - 0.5
        y0 = jnp.clip(jnp.floor(ys), 0, h - 1)
        x0 = jnp.clip(jnp.floor(xs), 0, w - 1)
        y1i = jnp.clip(y0 + 1, 0, h - 1).astype(jnp.int32)
        x1i = jnp.clip(x0 + 1, 0, w - 1).astype(jnp.int32)
        wy = jnp.clip(ys - y0, 0.0, 1.0)
        wx = jnp.clip(xs - x0, 0.0, 1.0)
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)

        # gather 4 corners via flat indices: (oh, ow, C) each
        tl = flat[y0[:, None] * w + x0[None, :]]
        tr = flat[y0[:, None] * w + x1i[None, :]]
        bl = flat[y1i[:, None] * w + x0[None, :]]
        br = flat[y1i[:, None] * w + x1i[None, :]]
        top = tl + (tr - tl) * wx[None, :, None]
        bot = bl + (br - bl) * wx[None, :, None]
        return top + (bot - top) * wy[:, None, None]

    return jax.vmap(one)(boxes.astype(jnp.float32))


def crop_and_resize_mm(
    frame: jnp.ndarray,     # (h, w, C) — typically a downscaled frame
    boxes: jnp.ndarray,     # (N, 4) xyxy in `frame`'s pixel coords
    out_hw: Tuple[int, int] = (128, 64),
) -> jnp.ndarray:
    """Batched crop-and-resize as two per-box interpolation matmuls.

    Same sampling semantics as crop_and_resize (bilinear at cell centers,
    edge-clamped), but expressed as dense contractions so it rides the MXU
    instead of TPU gathers — inside the megastep's team-feature branch the
    gather formulation costs ~9 ms/frame at 64 boxes; this costs ~0.1 ms.
    Callers crop from a 4-8x downscaled frame (color statistics don't need
    full resolution) to keep the weight matrices small. Returns
    (N, oh, ow, C) float32.
    """
    h, w = frame.shape[0], frame.shape[1]
    oh, ow = out_hw
    bx = boxes.astype(jnp.float32)

    def weights(lo, hi, size, n_src):
        # sample positions for each box along one axis: (N, size)
        pos = lo[:, None] + (jnp.arange(size, dtype=jnp.float32)[None, :]
                             + 0.5) * (hi - lo)[:, None] / size - 0.5
        pos = jnp.clip(pos, 0.0, n_src - 1.0)
        grid = jnp.arange(n_src, dtype=jnp.float32)
        # hat function == bilinear weights on the integer grid
        return jnp.clip(1.0 - jnp.abs(grid[None, None, :] - pos[:, :, None]),
                        0.0, 1.0)                     # (N, size, n_src)

    wy = weights(bx[:, 1], bx[:, 3], oh, h)
    wx = weights(bx[:, 0], bx[:, 2], ow, w)
    img = frame.astype(jnp.float32)
    tmp = jnp.einsum("ywc,nxw->nyxc", img, wx)        # (N, h, ow, C)
    return jnp.einsum("nhy,nyxc->nhxc", wy, tmp)      # (N, oh, ow, C)


def crop_jersey_boxes(boxes: jnp.ndarray,
                      v: Tuple[float, float] = (0.25, 0.75),
                      u: Tuple[float, float] = (0.30, 0.70)) -> jnp.ndarray:
    """Shrink player boxes to the torso/jersey region.

    Defaults mirror the reference's simple classifier geometry
    (team.py:76-99: rows 25-75%, cols 30-70%); the hybrid classifier uses
    (0.10, 0.60) x (0.20, 0.80) (team_hybrid.py:49-64).
    """
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    w = x2 - x1
    h = y2 - y1
    return jnp.stack(
        [x1 + u[0] * w, y1 + v[0] * h, x1 + u[1] * w, y1 + v[1] * h], axis=-1
    )
