"""Device-resident training data pipeline.

The reference feeds augmented batches from a host dataloader
(ultralytics' CPU pipeline). On TPU — especially behind a remote-tunnel
host where host->device bandwidth is the training bottleneck (~20 MB per
640px batch) — the TPU-native design is to stage the (pre-rendered) image
pool in HBM ONCE and run the per-step augmentations as XLA ops inside the
train program: mosaic-4 assembly (one fused gather), horizontal flip, HSV
gain jitter, and mixup, with box bookkeeping vectorized over padded gt
tables. Per step the host supplies only a PRNG key.

Augmentation semantics mirror train/data.py's host versions (mosaic4 /
mixup / hsv_augment — ultralytics recipe, notebook cell 15), with one
divergence: the mosaic center jitter and crop offsets use continuous
uniforms instead of integer randints (XLA PRNG; sub-pixel identical in
distribution).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_GT = 64


def stage_pool(dataset, indices=None) -> Dict[str, jnp.ndarray]:
    """Transfer a pre-rendered dataset pool to device memory (uint8).
    One-time cost; a 2000-scene 640px pool is ~2.4 GB of HBM."""
    idx = list(indices) if indices is not None else range(len(dataset))
    imgs, boxes, classes, masks = [], [], [], []
    for i in idx:
        it = dataset.load(int(i))
        imgs.append((it["images"] * 255.0).astype(np.uint8))
        boxes.append(it["boxes"])
        classes.append(it["classes"])
        masks.append(it["mask"])
    return {
        "images": jnp.asarray(np.stack(imgs)),
        "boxes": jnp.asarray(np.stack(boxes)),
        "classes": jnp.asarray(np.stack(classes)),
        "mask": jnp.asarray(np.stack(masks)),
    }


# ---------------------------------------------------------------------------
# HSV jitter (ultralytics hsv_h/s/v gains), pure jnp
# ---------------------------------------------------------------------------

def _rgb_to_hsv(x):
    """x (..., 3) in [0,1] -> h [0,1), s, v."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe = jnp.where(d > 0, d, 1.0)
    h = jnp.where(
        mx == r, (g - b) / safe % 6.0,
        jnp.where(mx == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(d > 0, h / 6.0, 0.0)
    s = jnp.where(mx > 0, d / jnp.where(mx > 0, mx, 1.0), 0.0)
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    h6 = h * 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def hsv_jitter(img, key, h_gain=0.015, s_gain=0.7, v_gain=0.4):
    """img (..., 3) f32 [0,1]; random multiplicative HSV gains."""
    g = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    g = g * jnp.asarray([h_gain, s_gain, v_gain]) + 1.0
    h, s, v = _rgb_to_hsv(img)
    return _hsv_to_rgb((h * g[0]) % 1.0, jnp.clip(s * g[1], 0, 1),
                       jnp.clip(v * g[2], 0, 1))


# ---------------------------------------------------------------------------
# Mosaic-4 as one fused gather
# ---------------------------------------------------------------------------

def _mosaic_one(pool, key, s: int, max_gt: int):
    """Assemble one mosaic sample from 4 random pool entries."""
    k_idx, k_c, k_off = jax.random.split(key, 3)
    n = pool["images"].shape[0]
    idx = jax.random.randint(k_idx, (4,), 0, n)
    imgs4 = pool["images"][idx]          # (4, s, s, 3) u8
    boxes4 = pool["boxes"][idx]          # (4, M, 4)
    classes4 = pool["classes"][idx]
    mask4 = pool["mask"][idx]

    c = jax.random.uniform(k_c, (2,), minval=0.35, maxval=0.65) * s
    cx, cy = c[0], c[1]
    # quadrant origins/sizes (traced)
    ox = jnp.stack([jnp.zeros(()), cx, jnp.zeros(()), cx])
    oy = jnp.stack([jnp.zeros(()), jnp.zeros(()), cy, cy])
    qw = jnp.stack([cx, s - cx, cx, s - cx])
    qh = jnp.stack([cy, cy, s - cy, s - cy])
    u = jax.random.uniform(k_off, (4, 2))
    sx = u[:, 0] * (s - qw)              # source window offset per quad
    sy = u[:, 1] * (s - qh)

    yy, xx = jnp.mgrid[0:s, 0:s]
    qid = (2 * (yy >= cy) + (xx >= cx)).astype(jnp.int32)
    ry = jnp.clip(yy - oy[qid] + sy[qid], 0, s - 1).astype(jnp.int32)
    rx = jnp.clip(xx - ox[qid] + sx[qid], 0, s - 1).astype(jnp.int32)
    flat = imgs4.reshape(4 * s * s, 3)
    canvas = flat[(qid * s * s + ry * s + rx).reshape(-1)].reshape(s, s, 3)

    # transform boxes: shift by source offset, clip to quadrant, re-origin
    b = boxes4  # (4, M, 4)
    off = jnp.stack([sx, sy, sx, sy], axis=-1)[:, None, :]
    org = jnp.stack([ox, oy, ox, oy], axis=-1)[:, None, :]
    lim = jnp.stack([qw, qh, qw, qh], axis=-1)[:, None, :]
    b = jnp.clip(b - off, 0.0, lim) + org
    keep = (mask4 & ((b[..., 2] - b[..., 0]) > 2)
            & ((b[..., 3] - b[..., 1]) > 2))
    m = boxes4.shape[1]
    b = b.reshape(4 * m, 4)
    cls = classes4.reshape(4 * m)
    keep = keep.reshape(4 * m)
    # compact valid rows to the front, truncate to max_gt
    order = jnp.argsort(~keep, stable=True)
    b, cls, keep = b[order][:max_gt], cls[order][:max_gt], keep[order][:max_gt]
    return canvas, b, cls, keep


def _plain_one(pool, key, s: int, max_gt: int):
    idx = jax.random.randint(key, (), 0, pool["images"].shape[0])
    return (pool["images"][idx], pool["boxes"][idx][:max_gt],
            pool["classes"][idx][:max_gt], pool["mask"][idx][:max_gt])


def make_device_batch_fn(s: int, batch: int, max_gt: int = MAX_GT,
                         mosaic_prob: float = 1.0, mixup_prob: float = 0.15,
                         flip_prob: float = 0.5, hsv: bool = True):
    """Returns batch_fn(pool, key) -> {'images' (B,s,s,3) f32 [0,1],
    'boxes', 'classes', 'mask'} — all augmentation on device."""

    def sample_one(pool, key):
        k_sel, k_mos, k_plain, k_flip, k_hsv, k_mix = jax.random.split(key, 6)
        mos = _mosaic_one(pool, k_mos, s, max_gt)
        pla = _plain_one(pool, k_plain, s, max_gt)
        use_mos = jax.random.uniform(k_sel) < mosaic_prob
        img, b, cls, m = jax.tree.map(
            lambda a, o: jnp.where(
                use_mos.reshape((1,) * a.ndim), a, o), mos, pla)
        img = img.astype(jnp.float32) / 255.0
        # horizontal flip
        do_flip = jax.random.uniform(k_flip) < flip_prob
        img = jnp.where(do_flip, img[:, ::-1], img)
        bf = jnp.stack([s - b[:, 2], b[:, 1], s - b[:, 0], b[:, 3]], axis=-1)
        b = jnp.where(do_flip, bf, b)
        if hsv:
            img = hsv_jitter(img, k_hsv)
        return img, b, cls, m, k_mix

    def batch_fn(pool, key):
        keys = jax.random.split(key, batch + batch)
        imgs, boxes, classes, masks, mix_keys = jax.lax.map(
            lambda k: sample_one(pool, k), keys[:batch])
        if mixup_prob > 0:
            # mixup partner: another independently-sampled item
            imgs2, boxes2, classes2, masks2, _ = jax.lax.map(
                lambda k: sample_one(pool, k), keys[batch:])
            lam = jax.random.beta(mix_keys[0], 32.0, 32.0, (batch, 1, 1, 1))
            do = (jax.random.uniform(mix_keys[1], (batch, 1, 1, 1))
                  < mixup_prob)
            imgs_m = lam * imgs + (1 - lam) * imgs2
            imgs = jnp.where(do, imgs_m, imgs)
            # union targets: partner boxes fill this item's padding slots
            do_b = do[:, :, 0, 0]
            free = ~masks  # (B, max_gt)
            take2 = masks2 & do_b & (jnp.cumsum(free, axis=1) > 0)
            # scatter partner rows into free slots: order-compacted concat
            cat_b = jnp.concatenate([boxes, boxes2], axis=1)
            cat_c = jnp.concatenate([classes, classes2], axis=1)
            cat_m = jnp.concatenate(
                [masks, masks2 & do_b], axis=1)
            order = jnp.argsort(~cat_m, axis=1, stable=True)
            boxes = jnp.take_along_axis(cat_b, order[..., None], 1)[:, :max_gt]
            classes = jnp.take_along_axis(cat_c, order, 1)[:, :max_gt]
            masks = jnp.take_along_axis(cat_m, order, 1)[:, :max_gt]
            del take2
        return {"images": imgs, "boxes": boxes, "classes": classes,
                "mask": masks}

    return batch_fn


# ---------------------------------------------------------------------------
# Pose (rink keypoint) pools: same HBM-staging idea, keypoints carried along
# ---------------------------------------------------------------------------

def stage_pose_pool(dataset, n: int) -> Dict[str, jnp.ndarray]:
    """Pre-render n pose items (images + padded gt + keypoints) and stage
    them in device memory. The rink scenes are cheap to render but at
    512px+ the per-step host->device transfer dominates behind the tunnel;
    staging once removes it entirely."""
    imgs, boxes, classes, masks, kpts = [], [], [], [], []
    for i in range(n):
        it = dataset.load(i)
        imgs.append((it["images"] * 255.0).astype(np.uint8))
        boxes.append(it["boxes"])
        classes.append(it["classes"])
        masks.append(it["mask"])
        kpts.append(it["keypoints"])
    return {
        "images": jnp.asarray(np.stack(imgs)),
        "boxes": jnp.asarray(np.stack(boxes)),
        "classes": jnp.asarray(np.stack(classes)),
        "mask": jnp.asarray(np.stack(masks)),
        "keypoints": jnp.asarray(np.stack(kpts)),
    }


def make_pose_batch_fn(batch: int, hsv: bool = True):
    """Device batch sampler for pose pools: random gather + HSV jitter.
    No flip/mosaic — horizontal flip would require a left-right landmark
    remap table and the pool already covers the camera distribution."""

    def batch_fn(pool, key):
        k_idx, k_hsv = jax.random.split(key)
        n = pool["images"].shape[0]
        idx = jax.random.randint(k_idx, (batch,), 0, n)
        imgs = pool["images"][idx].astype(jnp.float32) / 255.0
        if hsv:
            imgs = jax.vmap(hsv_jitter)(
                imgs, jax.random.split(k_hsv, batch))
        return {
            "images": imgs,
            "boxes": pool["boxes"][idx],
            "classes": pool["classes"][idx],
            "mask": pool["mask"][idx],
            "keypoints": pool["keypoints"][idx],
        }

    return batch_fn
