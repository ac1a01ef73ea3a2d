"""Pallas TPU kernel for greedy NMS suppression.

The suppression stage of NMS is inherently sequential (each candidate's
fate depends on all higher-ranked survivors), which XLA lowers as a
fori_loop of K tiny HLO steps with HBM round-trips between them. This
kernel keeps the whole (K, K) IoU matrix and the keep-vector resident in
VMEM and runs the K-step recurrence entirely on-core.

Semantics identical to ops/nms.py:_suppress_exact: given score-sorted
candidates, keep[i] stays set only if no higher-ranked kept candidate
overlaps it above the threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _suppress_kernel(iou_ref, keep0_ref, thr_ref, keep_ref):
    k = iou_ref.shape[0]
    thr = thr_ref[0, 0]
    # keep state lives in the output ref (VMEM), shape (1, K) f32 {0, 1}
    keep_ref[:] = keep0_ref[:]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, _):
        row = iou_ref[i, :].reshape(1, k)
        keep_vec = keep_ref[:]
        # dynamic lane-indexed scalar loads aren't vectorizable on TPU —
        # read keep[i] as a masked reduction instead
        keep_i = jnp.sum(jnp.where(col == i, keep_vec, 0.0))
        # suppress later, overlapping candidates when i survives
        sup = (row > thr) & (col > i) & (keep_i > 0.5)
        keep_ref[:] = jnp.where(sup, 0.0, keep_vec)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def suppress_pallas(iou: jnp.ndarray, keep0: jnp.ndarray,
                    iou_threshold: float, interpret: bool = False) -> jnp.ndarray:
    """(K, K) IoU + (K,) bool initial keep -> (K,) bool surviving keep."""
    k = iou.shape[0]
    thr = jnp.asarray([[iou_threshold]], jnp.float32)
    out = pl.pallas_call(
        _suppress_kernel,
        out_shape=jax.ShapeDtypeStruct((1, k), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(iou.astype(jnp.float32), keep0.astype(jnp.float32).reshape(1, k), thr)
    return out[0] > 0.5
