"""Device-batched jersey feature extraction.

The reference computes every feature per-crop on host with OpenCV
(team_hybrid.py:89-142's 49-dim vector, team_segmentation.py:97-144's
4-dim vector, team.py:101-132's simple stats). Here each variant is one
vmapped XLA program over the whole padded crop batch — the per-frame
classifier cost becomes a single device call instead of N OpenCV rounds.

Feature layouts and thresholds are kept bit-compatible with the reference
definitions (documented per function) so fitted clusterers transfer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.color import bgr_to_hsv, bgr_to_lab


def _hist(values: jnp.ndarray, weights: jnp.ndarray, nbins: int, vmax: float) -> jnp.ndarray:
    """Weighted histogram via one-hot reduction. values (P,), weights (P,).
    Returns (nbins,) normalized to sum 1 (cv2.calcHist + /sum semantics)."""
    idx = jnp.clip((values * (nbins / vmax)).astype(jnp.int32), 0, nbins - 1)
    onehot = (idx[:, None] == jnp.arange(nbins)[None, :]).astype(jnp.float32)
    h = jnp.sum(onehot * weights[:, None], axis=0)
    return h / (jnp.sum(h) + 1e-7)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1e-7)


def _masked_std(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    mu = _masked_mean(x, mask)
    var = _masked_mean((x - mu) ** 2, mask)
    return jnp.sqrt(jnp.maximum(var, 0.0))


def hybrid_color_features_single(crop: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """49-dim color feature of one (h, w, 3) BGR crop, layout identical to
    team_hybrid.py:127-138: [H hist 18, S hist 8, V hist 8, hsv mean/255 x3,
    hsv std/255 x3, lab mean/255 x3, lab std/255 x3, low_sat_ratio,
    high_sat_ratio, white_ratio]. `mask` (h, w) weights pixels (all-ones ==
    reference; padded crops pass zeros outside content)."""
    hsv = bgr_to_hsv(crop).reshape(-1, 3)
    lab = bgr_to_lab(crop).reshape(-1, 3)
    m = mask.reshape(-1).astype(jnp.float32)

    h_hist = _hist(hsv[:, 0], m, 18, 180.0)
    s_hist = _hist(hsv[:, 1], m, 8, 256.0)
    v_hist = _hist(hsv[:, 2], m, 8, 256.0)

    hsv_mean = jnp.stack([_masked_mean(hsv[:, i], m) for i in range(3)])
    hsv_std = jnp.stack([_masked_std(hsv[:, i], m) for i in range(3)])
    lab_mean = jnp.stack([_masked_mean(lab[:, i], m) for i in range(3)])
    lab_std = jnp.stack([_masked_std(lab[:, i], m) for i in range(3)])

    low_sat = _masked_mean((hsv[:, 1] < 30).astype(jnp.float32), m)
    high_sat = _masked_mean((hsv[:, 1] > 100).astype(jnp.float32), m)
    white = _masked_mean(((hsv[:, 2] > 200) & (hsv[:, 1] < 30)).astype(jnp.float32), m)

    return jnp.concatenate([
        h_hist, s_hist, v_hist,
        hsv_mean / 255.0, hsv_std / 255.0, lab_mean / 255.0, lab_std / 255.0,
        low_sat[None], high_sat[None], white[None],
    ])


@jax.jit
def hybrid_color_features(crops: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 3) BGR + (N, h, w) weights -> (N, 49)."""
    return jax.vmap(hybrid_color_features_single)(crops, masks)


def segmentation_features_single(crop: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """4-dim vector of team_segmentation.py:97-144 over masked pixels:
    [white_ratio (LAB: L>200, |a-128|<10, |b-128|<10),
     dominant_hue (18-bin argmax x10 over non-white px, 0 if <=50 colored px),
     saturation (mean S of colored px, else of all px),
     brightness (mean V of all masked px)].
    Insufficient mask (<100 px) -> the reference's defaults (0.5, 0, 0, 128)."""
    hsv = bgr_to_hsv(crop).reshape(-1, 3)
    lab = bgr_to_lab(crop).reshape(-1, 3)
    m = mask.reshape(-1).astype(jnp.float32)
    n = jnp.sum(m)

    white = (
        (lab[:, 0] > 200) & (jnp.abs(lab[:, 1] - 128) < 10) & (jnp.abs(lab[:, 2] - 128) < 10)
    ).astype(jnp.float32) * m
    white_ratio = jnp.sum(white) / jnp.maximum(n, 1e-7)

    colored = m * (1.0 - white)
    n_colored = jnp.sum(colored)
    hue_hist = _hist(hsv[:, 0], colored, 18, 180.0)
    dominant_hue = jnp.argmax(hue_hist).astype(jnp.float32) * 10.0
    sat_colored = _masked_mean(hsv[:, 1], colored)
    sat_all = _masked_mean(hsv[:, 1], m)
    enough_colored = n_colored > 50
    dominant_hue = jnp.where(enough_colored, dominant_hue, 0.0)
    saturation = jnp.where(enough_colored, sat_colored, sat_all)
    brightness = _masked_mean(hsv[:, 2], m)

    feats = jnp.stack([white_ratio, dominant_hue, saturation, brightness])
    defaults = jnp.asarray([0.5, 0.0, 0.0, 128.0], jnp.float32)
    return jnp.where(n < 100, defaults, feats)


@jax.jit
def segmentation_features(crops: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 3) + (N, h, w) -> (N, 4)."""
    return jax.vmap(segmentation_features_single)(crops, masks)


def simple_jersey_stats_single(crop: jnp.ndarray) -> jnp.ndarray:
    """[white_ratio, avg_brightness, avg_saturation] with the simple
    classifier's thresholds (team.py:113-118: white = V>200 & S<30)."""
    hsv = bgr_to_hsv(crop).reshape(-1, 3)
    white = ((hsv[:, 2] > 200) & (hsv[:, 1] < 30)).astype(jnp.float32)
    return jnp.stack([jnp.mean(white), jnp.mean(hsv[:, 2]), jnp.mean(hsv[:, 1])])


@jax.jit
def simple_jersey_stats(crops: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 3) -> (N, 3)."""
    return jax.vmap(simple_jersey_stats_single)(crops)


@jax.jit
def color_prior_masks(crops: jnp.ndarray) -> jnp.ndarray:
    """TPU-native replacement for per-crop GrabCut segmentation
    (team_segmentation.py:30-95).

    GrabCut (5 iterations of graph-cut per crop, on host, per frame) has no
    sane TPU equivalent; the parity target is team-assignment accuracy, not
    mask-identical output (SURVEY.md §7 hard parts). This computes a jersey
    mask in one vectorized pass:

    1. spatial prior = the reference's jersey window (rows 15-60%,
       cols 25-75% — the region GrabCut output is cropped to anyway);
    2. background model = median LAB color of the crop border band (ice);
    3. keep pixels whose chroma distance from the background exceeds a
       threshold, i.e. likely jersey rather than ice;
    4. if too few pixels survive, fall back to the reference's own
       GrabCut-failure rectangle (rows 20-60%, cols 30-70%,
       team_segmentation.py:87-95).
    Returns (N, h, w) float32 masks.
    """

    def one(crop):
        h, w = crop.shape[0], crop.shape[1]
        lab = bgr_to_lab(crop)
        rows = jnp.arange(h)[:, None]
        cols = jnp.arange(w)[None, :]
        window = (
            (rows >= int(h * 0.15)) & (rows < int(h * 0.60))
            & (cols >= int(w * 0.25)) & (cols < int(w * 0.75))
        )
        border = (
            (rows < int(h * 0.05)) | (rows >= int(h * 0.95))
            | (cols < int(w * 0.08)) | (cols >= int(w * 0.92))
        )
        flat = lab.reshape(-1, 3)
        bmask = border.reshape(-1).astype(jnp.float32)
        # median ~ weighted sort; use masked mean of the border band (ice is
        # uniform enough that mean == median in practice)
        bg = jnp.stack([_masked_mean(flat[:, i], bmask) for i in range(3)])
        dist = jnp.sqrt(jnp.sum((lab - bg) ** 2, axis=-1))
        fg = window & (dist > 30.0)
        enough = jnp.sum(fg) >= 500
        fallback = (
            (rows >= int(h * 0.2)) & (rows < int(h * 0.6))
            & (cols >= int(w * 0.3)) & (cols < int(w * 0.7))
        )
        return jnp.where(enough, fg, fallback).astype(jnp.float32)

    return jax.vmap(one)(crops)


def grabcut_mask_host(crop_bgr) -> "np.ndarray":
    """Exact-parity host path: the reference's GrabCut jersey segmentation
    (team_segmentation.py:30-95). Optional (slow); used when a caller asks
    for method='grabcut'."""
    import cv2
    import numpy as np

    h, w = crop_bgr.shape[:2]
    mask = np.zeros((h, w), np.uint8)
    mx, my = int(w * 0.15), int(h * 0.1)
    rect = (mx, my, w - 2 * mx, h - 2 * my)
    bgd = np.zeros((1, 65), np.float64)
    fgd = np.zeros((1, 65), np.float64)
    try:
        cv2.grabCut(crop_bgr, mask, rect, bgd, fgd, 5, cv2.GC_INIT_WITH_RECT)
        m = np.where((mask == 2) | (mask == 0), 0, 1).astype(np.uint8)
        m[int(h * 0.6):, :] = 0
        m[: int(h * 0.15), :] = 0
        m[:, : int(w * 0.25)] = 0
        m[:, int(w * 0.75):] = 0
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
        m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, kernel)
        m = cv2.morphologyEx(m, cv2.MORPH_OPEN, kernel)
        n, labels, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
        if n > 1:
            largest = 1 + np.argmax(stats[1:, cv2.CC_STAT_AREA])
            m = (labels == largest).astype(np.uint8)
        return m.astype(np.float32)
    except Exception:
        fb = np.zeros((h, w), np.float32)
        fb[int(h * 0.2): int(h * 0.6), int(w * 0.3): int(w * 0.7)] = 1.0
        return fb
