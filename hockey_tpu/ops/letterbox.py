"""Fused batched letterbox + normalize.

Replaces the host-side preprocessing the reference delegates to ultralytics
(hockey/main.py:179-184 calls `model(frame, imgsz=1280, ...)`, which runs
LetterBox on CPU per frame). Here the whole batch is resized, padded, and
normalized in one XLA program on device: uint8 NHWC in HBM -> bf16 NHWC in
[0, 1], aspect preserved, gray (114) padding, matching ultralytics'
LetterBox(center=True, scaleup=True) geometry so box coordinates map back
identically.

All shapes are static: for a fixed (H, W) -> imgsz this compiles once.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def letterbox_params(h: int, w: int, imgsz: int) -> Tuple[float, int, int, int, int]:
    """Static geometry: scale ratio and padding of the letterboxed image.

    Returns (ratio, new_h, new_w, pad_top, pad_left). Matches ultralytics
    LetterBox: r = min(s/h, s/w); round(dim * r); symmetric padding with
    the extra pixel going to bottom/right (round(x - 0.1) on each side).
    """
    r = min(imgsz / h, imgsz / w)
    new_h, new_w = round(h * r), round(w * r)
    dh, dw = (imgsz - new_h) / 2, (imgsz - new_w) / 2
    pad_top, pad_left = int(round(dh - 0.1)), int(round(dw - 0.1))
    return r, new_h, new_w, pad_top, pad_left


def rect_shape(h: int, w: int, imgsz: int, stride: int = 32) -> Tuple[int, int]:
    """Minimal-rectangle network input for an (h, w) frame at `imgsz`:
    scale the long side to imgsz, round each side up to the stride.

    This is what ultralytics *predict* actually does (LetterBox(auto=True))
    — the reference runtime never pays for square padding. For 1080p at
    1280 this is (736, 1280) instead of (1280, 1280): 42% fewer conv FLOPs.
    """
    r = min(imgsz / h, imgsz / w)
    new_h, new_w = round(h * r), round(w * r)
    return (-(-new_h // stride) * stride, -(-new_w // stride) * stride)


def rect_letterbox_params(h: int, w: int, imgsz: int, stride: int = 32
                          ) -> Tuple[float, int, int, int, int, int, int]:
    """(ratio, new_h, new_w, pad_top, pad_left, in_h, in_w) for the
    minimal-rectangle letterbox."""
    in_h, in_w = rect_shape(h, w, imgsz, stride)
    r = min(imgsz / h, imgsz / w)
    new_h, new_w = round(h * r), round(w * r)
    dh, dw = (in_h - new_h) / 2, (in_w - new_w) / 2
    pad_top, pad_left = int(round(dh - 0.1)), int(round(dw - 0.1))
    return r, new_h, new_w, pad_top, pad_left, in_h, in_w


def _resize_matrix(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear interpolation matrix (half-pixel centers,
    jax.image.resize / cv2.INTER_LINEAR convention). Dense on purpose:
    resize becomes two MXU matmuls instead of gather ops, which on TPU is
    ~10x faster than the gather lowering of jax.image.resize."""
    m = np.zeros((dst, src), np.float32)
    scale = src / dst
    pos = (np.arange(dst) + 0.5) * scale - 0.5
    lo = np.floor(pos).astype(np.int64)
    frac = pos - lo
    lo_c = np.clip(lo, 0, src - 1)
    hi_c = np.clip(lo + 1, 0, src - 1)
    m[np.arange(dst), lo_c] += 1.0 - frac
    m[np.arange(dst), hi_c] += frac
    return m


@functools.partial(jax.jit, static_argnames=("imgsz", "dtype"))
def letterbox_batch(
    frames: jnp.ndarray, imgsz: int, dtype: jnp.dtype = jnp.bfloat16
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, imgsz, imgsz, 3) `dtype` in [0, 1].

    Separable bilinear resize as two dense matmuls (rides the MXU; see
    _resize_matrix) fused with the /255 normalize and gray pad. Runs
    entirely on device as part of the detection megastep.
    """
    b, h, w, c = frames.shape
    r, new_h, new_w, pad_top, pad_left = letterbox_params(h, w, imgsz)

    ah = jnp.asarray(_resize_matrix(h, new_h), dtype)     # (nh, h)
    aw = jnp.asarray(_resize_matrix(w, new_w).T, dtype)   # (w, nw)
    x = frames.astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    # rows: (nh, h) @ (B, h, w*c) -> (B, nh, w, c)
    x = jnp.einsum("rh,bhwc->brwc", ah, x,
                   preferred_element_type=dtype, precision=prec)
    # cols: (B, nh, w, c) @ (w, nw) -> (B, nh, nw, c)
    x = jnp.einsum("brwc,wk->brkc", x, aw,
                   preferred_element_type=dtype, precision=prec)
    x = x * (1.0 / 255.0)
    pad_bottom = imgsz - new_h - pad_top
    pad_right = imgsz - new_w - pad_left
    x = jnp.pad(
        x,
        ((0, 0), (pad_top, pad_bottom), (pad_left, pad_right), (0, 0)),
        constant_values=114.0 / 255.0,
    )
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=("imgsz", "stride", "dtype"))
def letterbox_rect_batch(
    frames: jnp.ndarray, imgsz: int, stride: int = 32,
    dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, in_h, in_w, 3) minimal-rectangle letterbox
    (rect_shape geometry), same matmul resize + normalize as
    letterbox_batch."""
    b, h, w, c = frames.shape
    r, new_h, new_w, pad_top, pad_left, in_h, in_w = rect_letterbox_params(
        h, w, imgsz, stride)

    ah = jnp.asarray(_resize_matrix(h, new_h), dtype)
    aw = jnp.asarray(_resize_matrix(w, new_w).T, dtype)
    x = frames.astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    x = jnp.einsum("rh,bhwc->brwc", ah, x,
                   preferred_element_type=dtype, precision=prec)
    x = jnp.einsum("brwc,wk->brkc", x, aw,
                   preferred_element_type=dtype, precision=prec)
    x = x * (1.0 / 255.0)
    x = jnp.pad(
        x,
        ((0, 0), (pad_top, in_h - new_h - pad_top),
         (pad_left, in_w - new_w - pad_left), (0, 0)),
        constant_values=114.0 / 255.0,
    )
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=("out_hw", "dtype"))
def resize_batch(frames: jnp.ndarray, out_hw: Tuple[int, int],
                 dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Plain separable bilinear resize (no pad/normalize): (B, H, W, C) ->
    (B, oh, ow, C) `dtype`, values preserved. Same two-matmul formulation
    as letterbox_batch (MXU instead of gathers)."""
    b, h, w, c = frames.shape
    oh, ow = out_hw
    ah = jnp.asarray(_resize_matrix(h, oh), dtype)
    aw = jnp.asarray(_resize_matrix(w, ow).T, dtype)
    x = frames.astype(dtype)
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    x = jnp.einsum("rh,bhwc->brwc", ah, x,
                   preferred_element_type=dtype, precision=prec)
    return jnp.einsum("brwc,wk->brkc", x, aw,
                      preferred_element_type=dtype, precision=prec)


def unletterbox_boxes(
    boxes: jnp.ndarray, h: int, w: int, imgsz: int
) -> jnp.ndarray:
    """Map xyxy boxes from letterboxed coords back to original-frame coords.

    Inverse of `letterbox_batch` geometry; mirrors ultralytics scale_boxes
    (subtract pad, divide ratio, clip to frame).
    """
    r, _, _, pad_top, pad_left = letterbox_params(h, w, imgsz)
    pad = jnp.asarray([pad_left, pad_top, pad_left, pad_top], boxes.dtype)
    out = (boxes - pad) / r
    lo = jnp.zeros((4,), out.dtype)
    hi = jnp.asarray([w, h, w, h], out.dtype)
    return jnp.clip(out, lo, hi)
