"""Functional NHWC conv building blocks for YOLOv8-family models.

Pure-functional design: parameters are nested dicts of f32 arrays; `apply`
functions cast to the compute dtype (bf16 by default) so the MXU runs at
full rate while params stay in f32 for training stability.

Layout choices are TPU-first: NHWC activations, HWIO kernels (XLA's native
TPU layouts — no transposes anywhere), SiLU fused into the conv epilogue by
XLA, BatchNorm foldable into the conv weights for inference
(`fuse_conv_bn`) which removes one HBM round-trip per layer.

The reference gets all of this from ultralytics/torch (see SURVEY.md C4);
this is a ground-up re-implementation, not a translation.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


class KeyGen:
    """Deterministic stream of PRNG keys for parameter init."""

    def __init__(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def __call__(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub


class StatsCollector:
    """Collects per-layer BN batch statistics during a training forward.

    Forward code calls ``collect(path, mean, var)``; the train step turns
    the collected list into EMA updates of the running stats. In eval mode
    (collector is None) running stats are used directly.
    """

    def __init__(self):
        self.stats: List = []  # (path, batch_mean, batch_var)
        self._prefix: List[str] = []

    def scope(self, name: str):
        return _Scope(self, name)

    def collect(self, name: str, mean, var):
        path = "/".join(self._prefix + [name])
        self.stats.append((path, mean, var))


class _Scope:
    def __init__(self, col: StatsCollector, name: str):
        self.col, self.name = col, name

    def __enter__(self):
        self.col._prefix.append(self.name)

    def __exit__(self, *a):
        self.col._prefix.pop()


def make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(np.ceil(x / divisor) * divisor)) if x > 0 else 0


# ---------------------------------------------------------------------------
# Conv + BN + SiLU
# ---------------------------------------------------------------------------

def conv_init(kg: KeyGen, cin: int, cout: int, k: int = 1, bn: bool = True,
              bias: bool = False) -> Dict:
    """He-normal conv kernel (HWIO) + optional BN params or plain bias."""
    fan_in = cin * k * k
    w = jax.random.normal(kg(), (k, k, cin, cout), jnp.float32)
    w = w * np.sqrt(2.0 / fan_in)
    p: Dict = {"w": w}
    if bn:
        p["bn"] = {
            "scale": jnp.ones((cout,), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
            "mean": jnp.zeros((cout,), jnp.float32),
            "var": jnp.ones((cout,), jnp.float32),
        }
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int) -> jnp.ndarray:
    k = w.shape[0]
    pad = k // 2
    # Default XLA precision computes f32 convs at bf16 grade; request true
    # f32 when the caller is running in f32 (tests, parity checks). bf16
    # inputs keep the fast native MXU path.
    precision = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision,
    )


BN_EPS = 1e-3  # torch BatchNorm2d default in ultralytics (eps=0.001)


def conv_apply(
    p: Dict,
    x: jnp.ndarray,
    stride: int = 1,
    act: bool = True,
    name: str = "conv",
    stats: Optional[StatsCollector] = None,
) -> jnp.ndarray:
    """Conv -> BN (running or batch stats) -> SiLU."""
    y = _conv2d(x, p["w"], stride)
    if "bn" in p:
        bn = p["bn"]
        if stats is not None:  # training: batch statistics
            mean = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
            var = jnp.var(y.astype(jnp.float32), axis=(0, 1, 2))
            stats.collect(name, mean, var)
        else:
            mean, var = bn["mean"], bn["var"]
        scale = bn["scale"] * jax.lax.rsqrt(var + BN_EPS)
        bias = bn["bias"] - mean * scale
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    elif "b" in p:
        y = y + p["b"].astype(y.dtype)
    if act:
        y = jax.nn.silu(y)
    return y


def fuse_conv_bn(p: Dict) -> Dict:
    """Fold BN into the conv kernel for inference: y = conv(x, w') + b'."""
    if "bn" not in p:
        return p
    bn = p["bn"]
    scale = bn["scale"] * jax.lax.rsqrt(bn["var"] + BN_EPS)
    w = p["w"] * scale[None, None, None, :]
    b = bn["bias"] - bn["mean"] * scale
    return {"w": w, "b": b}


def fuse_model(params) -> Dict:
    """Recursively fold every conv+BN in a param tree."""
    if isinstance(params, dict):
        if "w" in params and "bn" in params:
            return fuse_conv_bn(params)
        return {k: fuse_model(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(fuse_model(v) for v in params)
    return params


def fuse_for_inference(params) -> Dict:
    """Fold BN and pre-cast weights to bf16: the per-call f32->bf16 cast
    inside a jitted program re-reads every param from HBM at double width
    (272 MB for YOLOv8x) — a pure bandwidth tax, since the MXU consumes
    bf16 either way. Inference-only; training keeps f32 masters."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and a.dtype == jnp.float32 else a,
        fuse_model(params))


# ---------------------------------------------------------------------------
# YOLOv8 blocks: Bottleneck, C2f, SPPF
# ---------------------------------------------------------------------------

def bottleneck_init(kg: KeyGen, cin: int, cout: int,
                    e: float = 0.5, k1: int = 3, k2: int = 3) -> Dict:
    ch = int(cout * e)
    return {
        "cv1": conv_init(kg, cin, ch, k1),
        "cv2": conv_init(kg, ch, cout, k2),
    }


def bottleneck_apply(p: Dict, x, add: bool, stats=None, name="bn") -> jnp.ndarray:
    """`add` is a static structural flag (shortcut and cin == cout), passed
    by the caller — never stored in params, so jit doesn't trace it."""
    if stats is not None:
        with stats.scope(name):
            y = conv_apply(p["cv1"], x, name="cv1", stats=stats)
            y = conv_apply(p["cv2"], y, name="cv2", stats=stats)
    else:
        y = conv_apply(p["cv2"], conv_apply(p["cv1"], x))
    return x + y if add else y


def c2f_init(kg: KeyGen, cin: int, cout: int, n: int) -> Dict:
    """C2f: split-transform-concat block (YOLOv8's CSP variant)."""
    ch = cout // 2
    return {
        "cv1": conv_init(kg, cin, 2 * ch, 1),
        "cv2": conv_init(kg, (2 + n) * ch, cout, 1),
        "m": [bottleneck_init(kg, ch, ch, e=1.0) for _ in range(n)],
    }


def c2f_apply(p: Dict, x, shortcut: bool, stats=None, name="c2f") -> jnp.ndarray:
    def run(stats):
        y = conv_apply(p["cv1"], x, name="cv1", stats=stats)
        a, b = jnp.split(y, 2, axis=-1)
        ys = [a, b]
        for i, m in enumerate(p["m"]):
            ys.append(bottleneck_apply(m, ys[-1], shortcut, stats=stats, name=f"m{i}"))
        return conv_apply(p["cv2"], jnp.concatenate(ys, axis=-1),
                          name="cv2", stats=stats)

    if stats is not None:
        with stats.scope(name):
            return run(stats)
    return run(None)


def sppf_init(kg: KeyGen, cin: int, cout: int) -> Dict:
    ch = cin // 2
    return {
        "cv1": conv_init(kg, cin, ch, 1),
        "cv2": conv_init(kg, ch * 4, cout, 1),
    }


def _maxpool5(x: jnp.ndarray) -> jnp.ndarray:
    # -inf init (bf16 has infinities too): a finite init like finfo.min
    # breaks reverse-mode autodiff of reduce_window-max
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )


def sppf_apply(p: Dict, x, stats=None, name="sppf") -> jnp.ndarray:
    def run(stats):
        y = conv_apply(p["cv1"], x, name="cv1", stats=stats)
        y1 = _maxpool5(y)
        y2 = _maxpool5(y1)
        y3 = _maxpool5(y2)
        cat = jnp.concatenate([y, y1, y2, y3], axis=-1)
        return conv_apply(p["cv2"], cat, name="cv2", stats=stats)

    if stats is not None:
        with stats.scope(name):
            return run(stats)
    return run(None)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample (torch nn.Upsample(scale=2) semantics)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
