"""Contrastive training for the team-embedding MobileNetV3.

The reference's robust/hybrid classifiers lean on pretrained visual
embeddings (SigLIP, team_robust.py:69-71; ImageNet MobileNetV3,
team_hybrid.py:24-28) that cannot be downloaded here. This trains our
JAX MobileNetV3-Small from scratch with an NT-Xent objective on synthetic
jersey DESIGNS: two photometrically-jittered views of the same design
(hue + pattern: solid / hoops / vertical stripes / sash / yoke, with
random numbers) are positives; other designs in the batch are negatives.

The resulting embedding separates jerseys by *pattern structure*, not
just hue — exactly the signal the 43-dim color features can't provide —
so color-ambiguous teams (same hue, different patterns) remain separable
(tests/test_teams.py::test_color_ambiguous_teams_separate).

BN runs on batch statistics during training and is calibrated afterwards
(models/mobilenetv3.py:calibrate_bn). Ships ~6 MB of weights to
hockey_tpu/data/weights/team_embed.msgpack.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

H, W = 64, 32  # jersey crop shape fed to the embedder during training

WEIGHTS_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "weights", "team_embed.msgpack")

PATTERNS = ("solid", "hoops", "stripes", "sash", "yoke")


def sample_design(rng: np.random.Generator) -> Dict:
    base = rng.uniform(0, 255, 3)
    second = rng.uniform(0, 255, 3)
    while np.abs(base - second).sum() < 120:
        second = rng.uniform(0, 255, 3)
    return {
        "base": base,
        "second": second,
        "pattern": PATTERNS[int(rng.integers(0, len(PATTERNS)))],
    }


def render_design(rng: np.random.Generator, design: Dict) -> np.ndarray:
    """One augmented view of a jersey design: (H, W, 3) BGR uint8."""
    import cv2

    s = int(rng.integers(48, 120))
    sw = s // 2
    img = np.full((s, sw, 3), design["base"], np.float32)
    c2 = design["second"]
    p = design["pattern"]
    if p == "hoops":
        period = max(s // int(rng.integers(4, 7)), 3)
        for y in range(0, s, period * 2):
            img[y: y + period] = c2
    elif p == "stripes":
        period = max(sw // int(rng.integers(3, 6)), 2)
        for x in range(0, sw, period * 2):
            img[:, x: x + period] = c2
    elif p == "sash":
        yy, xx = np.mgrid[0:s, 0:sw]
        band = np.abs(yy - xx * (s / sw)) < s * 0.18
        img[band] = c2
    elif p == "yoke":
        img[: int(s * 0.3)] = c2
    img = img.astype(np.uint8)
    # number (varies between views — identity is the design, not the digits)
    if rng.uniform() < 0.8:
        col = (250, 250, 250) if design["base"].sum() < 380 else (15, 15, 15)
        cv2.putText(img, str(int(rng.integers(1, 99))),
                    (int(sw * 0.15), int(s * 0.62)),
                    cv2.FONT_HERSHEY_SIMPLEX, s / 80.0, col,
                    max(1, s // 40))
    # photometric / geometric jitter
    ang = rng.uniform(-15, 15)
    m = cv2.getRotationMatrix2D((sw / 2, s / 2), ang, rng.uniform(0.85, 1.2))
    img = cv2.warpAffine(img, m, (sw, s), borderMode=cv2.BORDER_REFLECT)
    if rng.uniform() < 0.5:
        img = cv2.blur(img, (int(rng.integers(1, 4)),) * 2)
    gain = rng.uniform(0.6, 1.3)
    img = np.clip(img.astype(np.float32) * gain + rng.uniform(-25, 25)
                  + rng.normal(0, rng.uniform(1, 8), img.shape),
                  0, 255).astype(np.uint8)
    return cv2.resize(img, (W, H))


def make_pair_batch(rng: np.random.Generator, n_designs: int
                    ) -> Tuple[np.ndarray, np.ndarray]:
    a, b = [], []
    for _ in range(n_designs):
        d = sample_design(rng)
        a.append(render_design(rng, d))
        b.append(render_design(rng, d))
    return np.stack(a), np.stack(b)


def train(steps: int = 1200, batch: int = 48, lr: float = 1e-3,
          seed: int = 0, out: str = WEIGHTS_PATH,
          log_every: int = 50) -> Dict:
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.mobilenetv3 import calibrate_bn, embed, init_params, preprocess_bgr

    params = init_params(seed)
    opt = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, lr, 50, steps, lr * 0.05), weight_decay=1e-5)
    opt_state = opt.init(params)
    temp = 0.2

    def loss_fn(p, xa, xb):
        za = embed(p, xa, stats=[])
        zb = embed(p, xb, stats=[])
        za = za / (jnp.linalg.norm(za, axis=1, keepdims=True) + 1e-6)
        zb = zb / (jnp.linalg.norm(zb, axis=1, keepdims=True) + 1e-6)
        logits = za @ zb.T / temp                    # (B, B)
        labels = jnp.arange(za.shape[0])
        l1 = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        l2 = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        acc = jnp.mean(logits.argmax(axis=1) == labels)
        return (l1 + l2).mean() / 2.0, acc

    @jax.jit
    def step(p, s, xa, xb):
        (loss, acc), g = jax.value_and_grad(loss_fn, has_aux=True)(p, xa, xb)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, loss, acc

    rng = np.random.default_rng(seed)
    for i in range(steps):
        a, b = make_pair_batch(rng, batch)
        params, opt_state, loss, acc = step(
            params, opt_state, preprocess_bgr(jnp.asarray(a)),
            preprocess_bgr(jnp.asarray(b)))
        if i % log_every == 0 or i == steps - 1:
            print(f"embed step {i:5d} loss {float(loss):.4f} "
                  f"pair-acc {float(acc):.3f}", flush=True)

    # calibrate BN running stats on fresh views, then ship
    import jax.numpy as jnp2

    cal = []
    for _ in range(16):
        a, _ = make_pair_batch(rng, batch)
        cal.append(np.asarray(preprocess_bgr(jnp2.asarray(a))))
    params = calibrate_bn(params, cal)
    if out:
        from ..models.checkpoint import save_params

        os.makedirs(os.path.dirname(out), exist_ok=True)
        save_params(out, params)
        print(f"saved {out}")
    return params


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--out", type=str, default=WEIGHTS_PATH)
    args = ap.parse_args()
    train(steps=args.steps, out=args.out)
