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
    img = frame.astype(jnp.float32)

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

        # gather 4 corners: (oh, ow, C)
        tl = img[y0][:, x0]
        tr = img[y0][:, x1i]
        bl = img[y1i][:, x0]
        br = img[y1i][:, x1i]
        top = tl + (tr - tl) * wx[None, :, None]
        bot = bl + (br - bl) * wx[None, :, None]
        return top + (bot - top) * wy[:, None, None]

    return jax.vmap(one)(boxes.astype(jnp.float32))


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
