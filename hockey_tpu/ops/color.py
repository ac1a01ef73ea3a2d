"""Colorspace conversions on device, numerically matching OpenCV's 8-bit
conventions (the team classifiers' features were all tuned against
cv2.cvtColor outputs — team_segmentation.py:113-114, team_hybrid.py:97-98):

- HSV: H in [0, 180), S, V in [0, 255]
- LAB: L scaled to [0, 255], a/b offset by 128 (D65, no sRGB gamma —
  OpenCV's 8-bit BGR2Lab linearizes with the true sRGB curve)

Inputs are BGR uint8/float (OpenCV channel order, matching the video
decoder) with values in [0, 255]. All functions are elementwise over
arbitrary leading dims and jit-friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def bgr_to_hsv(bgr: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) BGR [0,255] -> (..., 3) HSV with OpenCV 8-bit ranges."""
    x = bgr.astype(jnp.float32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    c = v - mn
    s = jnp.where(v > 0, c / jnp.maximum(v, 1e-9) * 255.0, 0.0)
    # hue in degrees / 2 (OpenCV packs 0-360 into 0-180)
    safe_c = jnp.maximum(c, 1e-9)
    hr = (g - b) / safe_c
    hg = 2.0 + (b - r) / safe_c
    hb = 4.0 + (r - g) / safe_c
    hsel = jnp.where(v == r, hr, jnp.where(v == g, hg, hb))
    hdeg = hsel * 60.0
    hdeg = jnp.where(hdeg < 0, hdeg + 360.0, hdeg)
    h = jnp.where(c > 0, hdeg / 2.0, 0.0)
    # quantize to cv2's uint8 grid (all reference thresholds/histograms
    # assume rounded 8-bit HSV); 180 wraps to 0 like cv2
    h = jnp.round(h)
    h = jnp.where(h >= 180.0, h - 180.0, h)
    return jnp.stack([h, jnp.round(s), v], axis=-1)


def _srgb_to_linear(u: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(u <= 0.04045, u / 12.92, ((u + 0.055) / 1.055) ** 2.4)


def bgr_to_lab(bgr: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) BGR [0,255] -> (..., 3) LAB with OpenCV 8-bit scaling."""
    x = bgr.astype(jnp.float32) / 255.0
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    rl, gl, bl = _srgb_to_linear(r), _srgb_to_linear(g), _srgb_to_linear(b)
    # sRGB D65 -> XYZ
    xx = 0.412453 * rl + 0.357580 * gl + 0.180423 * bl
    yy = 0.212671 * rl + 0.715160 * gl + 0.072169 * bl
    zz = 0.019334 * rl + 0.119193 * gl + 0.950227 * bl
    # normalize by D65 white point
    xn = xx / 0.950456
    yn = yy
    zn = zz / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xn), f(yn), f(zn)
    l = jnp.where(yn > 0.008856, 116.0 * jnp.cbrt(yn) - 16.0, 903.3 * yn)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0
    l8 = l * 255.0 / 100.0
    # quantize to cv2's uint8 grid (reference thresholds assume it)
    return jnp.round(jnp.stack([l8, a, bb], axis=-1))
