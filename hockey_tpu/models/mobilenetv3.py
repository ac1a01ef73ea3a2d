"""MobileNetV3-Small feature extractor in JAX (NHWC, functional params).

Capability parity: the reference's hybrid team classifier embeds jersey
crops with torchvision mobilenet_v3_small minus its classifier head
(team_hybrid.py:24-28 — 576-d output after global pool). This is a
ground-up implementation of the published MobileNetV3-Small topology
(inverted residuals, squeeze-excite, hard-swish).

Weights: torchvision's pretrained checkpoint is not available in this
environment (no network); `init_params` gives a deterministic random init
— random-projection embeddings still provide a usable metric for the
2-cluster jersey problem, and the dominant signal in the hybrid classifier
is the 49-dim color feature anyway. `convert_torchvision` maps a user's
torchvision state dict when they have one.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .layers import KeyGen, conv_init, make_divisible

# (kernel, expanded, out, use_se, use_hswish, stride) — torchvision
# mobilenet_v3_small inverted-residual settings.
_BLOCKS = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]
FEATURE_DIM = 576


def _hswish(x):
    return x * jax.nn.relu6(x + 3.0) / 6.0


def _hsigmoid(x):
    return jax.nn.relu6(x + 3.0) / 6.0


def init_params(seed: int = 0) -> Dict:
    kg = KeyGen(seed)
    p: Dict = {"stem": conv_init(kg, 3, 16, 3)}
    cin = 16
    blocks: List[Dict] = []
    for k, exp, out, se, _, _ in _BLOCKS:
        b: Dict = {}
        if exp != cin:
            b["expand"] = conv_init(kg, cin, exp, 1)
        # depthwise: one filter per channel, HWIO with I=1
        w = jax.random.normal(kg(), (k, k, 1, exp), jnp.float32) * np.sqrt(2.0 / (k * k))
        b["dw"] = {
            "w": w,
            "bn": {
                "scale": jnp.ones((exp,), jnp.float32),
                "bias": jnp.zeros((exp,), jnp.float32),
                "mean": jnp.zeros((exp,), jnp.float32),
                "var": jnp.ones((exp,), jnp.float32),
            },
        }
        if se:
            sq = make_divisible(exp // 4, 8)
            b["se"] = {
                "fc1": conv_init(kg, exp, sq, 1, bn=False, bias=True),
                "fc2": conv_init(kg, sq, exp, 1, bn=False, bias=True),
            }
        b["project"] = conv_init(kg, exp, out, 1)
        blocks.append(b)
        cin = out
    p["blocks"] = blocks
    p["head"] = conv_init(kg, cin, FEATURE_DIM, 1)
    return p


def _conv_bn(p, x, stride=1, act=None, groups=1, stats=None):
    """`stats` (a list) switches BN to batch statistics and records
    (batch_mean, batch_var) in call order — used by contrastive training
    and by `calibrate_bn` (the call order is the write-back order)."""
    w = p["w"].astype(x.dtype)
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None,
    )
    if "bn" in p:
        bn = p["bn"]
        if stats is not None:
            mean = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
            var = jnp.var(y.astype(jnp.float32), axis=(0, 1, 2))
            stats.append((mean, var))
        else:
            mean, var = bn["mean"], bn["var"]
        scale = bn["scale"] * jax.lax.rsqrt(var + 1e-3)
        bias = bn["bias"] - mean * scale
        y = y * scale.astype(y.dtype) + bias.astype(y.dtype)
    elif "b" in p:
        y = y + p["b"].astype(y.dtype)
    return act(y) if act else y


def embed(params: Dict, x: jnp.ndarray, stats=None) -> jnp.ndarray:
    """(B, H, W, 3) normalized images -> (B, 576) embeddings."""
    y = _conv_bn(params["stem"], x, stride=2, act=_hswish, stats=stats)
    cin = 16
    for (k, exp, out, se, hs, stride), b in zip(_BLOCKS, params["blocks"]):
        act = _hswish if hs else jax.nn.relu
        inp = y
        if "expand" in b:
            y = _conv_bn(b["expand"], y, act=act, stats=stats)
        y = _conv_bn(b["dw"], y, stride=stride, act=act, groups=exp,
                     stats=stats)
        if se:
            s = jnp.mean(y, axis=(1, 2), keepdims=True)
            s = _conv_bn(b["se"]["fc1"], s, act=jax.nn.relu)
            s = _hsigmoid(_conv_bn(b["se"]["fc2"], s))
            y = y * s
        y = _conv_bn(b["project"], y, stats=stats)
        if stride == 1 and cin == out:
            y = y + inp
        cin = out
    y = _conv_bn(params["head"], y, act=_hswish, stats=stats)
    return jnp.mean(y, axis=(1, 2))  # global average pool -> (B, 576)


def _bn_nodes(params: Dict) -> List[Dict]:
    """BN param nodes in the same order _conv_bn visits them."""
    nodes = [params["stem"]]
    for b in params["blocks"]:
        if "expand" in b:
            nodes.append(b["expand"])
        nodes.append(b["dw"])
        nodes.append(b["project"])
    nodes.append(params["head"])
    return nodes


def calibrate_bn(params: Dict, batches) -> Dict:
    """Set BN running stats from forward passes over `batches` (iterable
    of preprocessed (B, H, W, 3) arrays). Needed after batch-stat
    training, which never tracks running statistics."""
    sums = None
    n = 0
    for x in batches:
        stats: List = []
        embed(params, jnp.asarray(x), stats=stats)
        vals = [(np.asarray(m), np.asarray(v)) for m, v in stats]
        if sums is None:
            sums = [[m.astype(np.float64), v.astype(np.float64)]
                    for m, v in vals]
        else:
            for s, (m, v) in zip(sums, vals):
                s[0] += m
                s[1] += v
        n += 1
    out = jax.tree_util.tree_map(lambda a: a, params)  # shallow-ish copy
    for node, (m, v) in zip(_bn_nodes(out), sums):
        node["bn"] = dict(node["bn"])
        node["bn"]["mean"] = jnp.asarray(m / n, jnp.float32)
        node["bn"]["var"] = jnp.asarray(v / n, jnp.float32)
    return out


def load_default_params():
    """Shipped contrastive-trained weights (teams/embed_train.py), or
    None -> callers fall back to deterministic random init."""
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "weights", "team_embed.msgpack")
    if not os.path.exists(path):
        return None
    from .checkpoint import load_params

    return load_params(path)


IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def preprocess_bgr(crops: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 3) BGR [0,255] -> ImageNet-normalized RGB float32
    (matches the torchvision transform in team_hybrid.py:31-36)."""
    rgb = crops[..., ::-1].astype(jnp.float32) / 255.0
    return (rgb - IMAGENET_MEAN) / IMAGENET_STD


def convert_torchvision(sd) -> Dict:
    """Map a torchvision mobilenet_v3_small state dict onto our tree."""
    params = init_params()

    def cw(t):
        return np.ascontiguousarray(np.transpose(np.asarray(t), (2, 3, 1, 0)).astype(np.float32))

    def bn(prefix):
        return {
            "scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32),
            "mean": np.asarray(sd[f"{prefix}.running_mean"], np.float32),
            "var": np.asarray(sd[f"{prefix}.running_var"], np.float32),
        }

    # torchvision layout: features.0 = stem, features.1..11 = blocks,
    # features.12 = head conv.
    params["stem"]["w"] = cw(sd["features.0.0.weight"])
    params["stem"]["bn"] = bn("features.0.1")
    for i, ((k, exp, out, se, hs, stride), b) in enumerate(
        zip(_BLOCKS, params["blocks"]), start=1
    ):
        j = 0
        base = f"features.{i}.block"
        if "expand" in b:
            b["expand"]["w"] = cw(sd[f"{base}.{j}.0.weight"])
            b["expand"]["bn"] = bn(f"{base}.{j}.1")
            j += 1
        # depthwise: torch shape (exp, 1, k, k) -> HWIO (k, k, 1, exp)
        dw = np.asarray(sd[f"{base}.{j}.0.weight"], np.float32)
        b["dw"]["w"] = np.ascontiguousarray(np.transpose(dw, (2, 3, 1, 0)))
        b["dw"]["bn"] = bn(f"{base}.{j}.1")
        j += 1
        if se:
            b["se"]["fc1"]["w"] = cw(sd[f"{base}.{j}.fc1.weight"])
            b["se"]["fc1"]["b"] = np.asarray(sd[f"{base}.{j}.fc1.bias"], np.float32)
            b["se"]["fc2"]["w"] = cw(sd[f"{base}.{j}.fc2.weight"])
            b["se"]["fc2"]["b"] = np.asarray(sd[f"{base}.{j}.fc2.bias"], np.float32)
            j += 1
        b["project"]["w"] = cw(sd[f"{base}.{j}.0.weight"])
        b["project"]["bn"] = bn(f"{base}.{j}.1")
    params["head"]["w"] = cw(sd["features.12.0.weight"])
    params["head"]["bn"] = bn("features.12.1")
    return jax.tree_util.tree_map(jnp.asarray, params)
