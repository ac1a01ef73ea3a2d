"""Multi-chip sharding for training and batched inference.

The reference is strictly single-process (SURVEY.md §2: zero distributed
code), so this layer is green-field TPU design:

- mesh axes: ``dp`` (batch) x ``fsdp`` (parameter shards);
- batch tensors shard their leading axis over dp;
- parameters FSDP-shard along the conv output-channel (last) axis whenever
  it divides by the fsdp size — XLA/GSPMD inserts the all-gathers on use
  and reduce-scatters on gradients;
- BatchNorm batch stats are global automatically (mean over a dp-sharded
  axis lowers to a cross-device psum), i.e. sync-BN for free.

Inference scaling uses the same mesh with dp-only sharding of the frame
batch (each chip letterboxes + detects its shard; results gather on host).
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.mesh import DP_AXIS, FSDP_AXIS


def param_pspec(path, leaf, fsdp: int) -> P:
    """PartitionSpec for one parameter leaf: shard the last (output
    channel) axis over fsdp when divisible, else replicate."""
    if fsdp > 1 and hasattr(leaf, "shape") and leaf.ndim >= 1 \
            and leaf.shape[-1] % fsdp == 0 and leaf.shape[-1] >= 2 * fsdp:
        return P(*([None] * (leaf.ndim - 1) + [FSDP_AXIS]))
    return P()


def param_shardings(mesh: Mesh, params: Dict) -> Dict:
    fsdp = mesh.shape[FSDP_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_pspec(path, leaf, fsdp)),
        params,
    )


def batch_shardings(mesh: Mesh, batch: Dict) -> Dict:
    s = NamedSharding(mesh, P(DP_AXIS))
    return jax.tree_util.tree_map(lambda _: s, batch)


def replicated_shardings(mesh: Mesh, tree) -> Dict:
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: s, tree)


def shard_params(mesh: Mesh, params: Dict) -> Dict:
    sh = param_shardings(mesh, params)
    return jax.tree_util.tree_map(jax.device_put, params, sh)


def shard_batch(mesh: Mesh, batch: Dict) -> Dict:
    sh = batch_shardings(mesh, batch)
    return jax.tree_util.tree_map(jax.device_put, batch, sh)


def jit_train_step(train_step, mesh: Mesh, params: Dict, opt_state, batch: Dict):
    """pjit the train step with explicit in/out shardings. Metrics are
    replicated scalars."""
    fsdp = mesh.shape[FSDP_AXIS]
    p_sh = param_shardings(mesh, params)
    # optimizer buffers mirror parameter shapes -> same sharding rule, so
    # momentum shards sit next to their parameters
    o_sh = jax.tree_util.tree_map(
        lambda l: NamedSharding(mesh, param_pspec(None, l, fsdp)), opt_state)
    b_sh = batch_shardings(mesh, batch)
    rep = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(p_sh, o_sh, b_sh),
        out_shardings=(p_sh, o_sh, rep),
    )


def jit_detect_dp(detect_fn, mesh: Mesh, params: Dict):
    """Data-parallel inference: frames shard over dp; detections come back
    dp-sharded (host gathers when materializing numpy)."""
    p_sh = replicated_shardings(mesh, params)
    frames_sh = NamedSharding(mesh, P(DP_AXIS))

    return jax.jit(detect_fn, in_shardings=(p_sh, frames_sh))
