"""TPU training step for the YOLOv8 detectors.

The reference trains offline via the ultralytics CLI on CUDA
(notebooks/train_player_detection.ipynb cell 15: YOLOv8, imgsz 640,
batch 16-32, cosine LR, early stopping). This is the TPU-native
equivalent: one jitted train step — forward with batch-stat BN, TAL
assignment, v8 loss, grads, optax update, BN running-stat EMA — sharded
over a (dp, fsdp) `jax.sharding.Mesh` (see parallel/sharding.py).

Under GSPMD, BatchNorm batch statistics are computed over the *global*
(dp-sharded) batch automatically — the mean over a sharded axis lowers to
a psum across the mesh, giving sync-BN for free.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Dict

import jax
import optax

from ..models.layers import StatsCollector
from ..models.yolov8 import YoloConfig, forward_raw
from .losses import detection_loss

BN_MOMENTUM = 0.03  # ultralytics BatchNorm2d momentum


# ---------------------------------------------------------------------------
# BN running-stat plumbing: collected (path, mean, var) -> tree updates
# ---------------------------------------------------------------------------

_LIST_TOKEN = re.compile(r"^([a-z]+)(\d+)$")


def _resolve(tree, tokens):
    """Walk 'backbone/c2f1/m0/cv1' style paths. A token that is a dict key
    is taken literally; otherwise 'm0' means list field 'm' index 0."""
    node = tree
    for t in tokens:
        if isinstance(node, dict) and t in node:
            node = node[t]
            continue
        m = _LIST_TOKEN.match(t)
        if m and isinstance(node, dict) and m.group(1) in node:
            node = node[m.group(1)][int(m.group(2))]
            continue
        raise KeyError(f"cannot resolve BN path token {t!r}")
    return node


def update_bn_stats(params: Dict, stats,
                    momentum: float = BN_MOMENTUM) -> Dict:
    """Returns params with BN running mean/var EMA-updated toward this
    step's batch statistics (functional: original tree untouched).
    `stats` is an iterable of (path, batch_mean, batch_var)."""

    # deep-copy only the dict spine so we can mutate
    def copy_spine(t):
        if isinstance(t, dict):
            return {k: copy_spine(v) for k, v in t.items()}
        if isinstance(t, list):
            return [copy_spine(v) for v in t]
        return t

    params = copy_spine(params)
    for path, mean, var in stats:
        node = _resolve(params, path.split("/"))
        bn = node["bn"]
        bn["mean"] = (1 - momentum) * bn["mean"] + momentum * mean
        bn["var"] = (1 - momentum) * bn["var"] + momentum * var
    return params


# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainConfig:
    imgsz: int = 640               # notebook training resolution
    learning_rate: float = 0.01
    final_lr_frac: float = 0.01    # cosine to lr * frac (ultralytics lrf)
    warmup_steps: int = 100
    total_steps: int = 10_000
    weight_decay: float = 5e-4
    momentum: float = 0.937        # ultralytics SGD momentum
    grad_clip: float = 10.0
    compute_dtype: str = "bfloat16"  # forward/backward compute; params,
    # grads, optimizer state and the loss stay f32 (mixed precision — the
    # MXU runs bf16 at ~8x the f32 conv rate)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    # warmup must fit inside the run (optax requires decay_steps > warmup)
    warmup = max(1, min(tc.warmup_steps, tc.total_steps // 2))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=tc.learning_rate,
        warmup_steps=warmup,
        decay_steps=tc.total_steps,
        end_value=tc.learning_rate * tc.final_lr_frac,
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.add_decayed_weights(
            tc.weight_decay,
            # decay conv kernels only, not BN params / biases
            mask=lambda p: jax.tree_util.tree_map_with_path(
                lambda path, _: any(getattr(k, "key", None) == "w" for k in path), p
            ),
        ),
        optax.sgd(learning_rate=schedule, momentum=tc.momentum, nesterov=True),
    )


def make_train_step(cfg: YoloConfig, tc: TrainConfig,
                    optimizer: optax.GradientTransformation,
                    ema_decay: float = 0.0):
    """Returns train_step(params, opt_state, batch) -> (params, opt_state,
    metrics). `batch` = {'images' (B,S,S,3) f32 [0,1], 'boxes' (B,M,4),
    'classes' (B,M), 'mask' (B,M)}. Pure function — jit/pjit at the call
    site with the desired shardings.

    With ema_decay > 0 the signature becomes train_step(params, ema,
    opt_state, batch) -> (params, ema, opt_state, metrics), where `ema` =
    {'params': tree, 'count': scalar}: an exponential moving average of
    the weights with the ultralytics-style warmup ramp
    d_t = ema_decay * (1 - exp(-t/2000)) — checkpoints are saved from the
    EMA (the reference's deployed .pt weights are EMA weights too)."""

    import jax.numpy as _jnp

    cdt = _jnp.dtype(tc.compute_dtype)

    def loss_fn(params, batch):
        stats = StatsCollector()
        raw = forward_raw(params, batch["images"].astype(cdt), cfg,
                          stats=stats)
        loss, metrics = detection_loss(raw, batch, cfg, tc.imgsz)
        # aux must be a pytree — unpack the collector into parallel lists
        # (paths are static strings; means/vars are traced arrays)
        paths = tuple(p for p, _, _ in stats.stats)
        means = [m for _, m, _ in stats.stats]
        vars_ = [v for _, _, v in stats.stats]
        return loss, (metrics, paths, means, vars_)

    def _update(params, opt_state, batch):
        (loss, (metrics, paths, means, vars_)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        gn = optax.global_norm(grads)
        # mixed-precision guard: a rare bf16 overflow step must not poison
        # the weights — discard the whole update (params, opt state, BN
        # stats) and carry on, like a GradScaler-skipped step
        ok = _jnp.isfinite(loss) & _jnp.isfinite(gn)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = update_bn_stats(new_params, zip(paths, means, vars_))
        params = jax.tree.map(lambda n, o: _jnp.where(ok, n, o),
                              new_params, params)
        opt_state = jax.tree.map(lambda n, o: _jnp.where(ok, n, o),
                                 new_opt_state, opt_state)
        metrics = dict(metrics)
        metrics["grad_norm"] = gn
        metrics["skipped"] = 1.0 - ok.astype(_jnp.float32)
        return params, opt_state, metrics

    if not ema_decay:
        return _update

    import jax.numpy as jnp

    def train_step(params, ema, opt_state, batch):
        params, opt_state, metrics = _update(params, opt_state, batch)
        t = ema["count"] + 1.0
        d = ema_decay * (1.0 - jnp.exp(-t / 2000.0))
        new = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                           ema["params"], params)
        return params, {"params": new, "count": t}, opt_state, metrics

    return train_step


def init_ema(params) -> Dict:
    import jax.numpy as jnp

    # real copies: the caller may donate params and ema to the same jitted
    # step — aliased buffers would be donated twice
    return {"params": jax.tree.map(lambda a: jnp.array(a, copy=True), params),
            "count": jnp.asarray(0.0, jnp.float32)}


def make_bn_stats_fn(cfg: YoloConfig, compute_dtype: str = "bfloat16"):
    """Jitted forward that returns {bn_path: (batch_mean, batch_var)}."""
    import jax.numpy as _jnp

    cdt = _jnp.dtype(compute_dtype)

    def stats_fn(params, imgs):
        col = StatsCollector()
        forward_raw(params, imgs.astype(cdt), cfg, stats=col)
        return {p: (m, v) for p, m, v in col.stats}

    return jax.jit(stats_fn)


def precise_bn(params: Dict, stats_fn, batches) -> Dict:
    """Precise-BN recalibration: replace every BN layer's running stats
    with batch statistics averaged over `batches` of clean (unaugmented)
    images. BN running stats EMA'd during training lag the weights and —
    under heavy augmentation — track a different input distribution than
    eval sees; a trained-to-0.87-trainmode checkpoint can score mAP 0.0 in
    eval mode from stale stats alone (measured round 2). Standard fix from
    the large-batch training literature; torch analogue is
    `update_bn_stats` in fvcore. Returns new params (input untouched)."""
    import numpy as _np
    import jax.numpy as _jnp

    acc_m: Dict = {}
    acc_s: Dict = {}
    n = 0
    for imgs in batches:
        out = jax.device_get(stats_fn(params, imgs))
        for p, (m, v) in out.items():
            m = m.astype(_np.float64)
            v = v.astype(_np.float64)
            acc_m[p] = acc_m.get(p, 0.0) + m
            acc_s[p] = acc_s.get(p, 0.0) + v + m**2
        n += 1
    if not n:
        return params
    stats = []
    for p in acc_m:
        mu = acc_m[p] / n
        var = _np.maximum(acc_s[p] / n - mu**2, 0.0)
        stats.append((p, _jnp.asarray(mu, _jnp.float32),
                      _jnp.asarray(var, _jnp.float32)))
    return update_bn_stats(params, stats, momentum=1.0)


def make_eval_step(cfg: YoloConfig, tc: TrainConfig):
    """Loss-only step with running BN stats (no update)."""

    def eval_step(params, batch):
        raw = forward_raw(params, batch["images"], cfg, stats=None)
        _, metrics = detection_loss(raw, batch, cfg, tc.imgsz)
        return metrics

    return eval_step
