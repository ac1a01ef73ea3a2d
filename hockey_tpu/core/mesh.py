"""Device-mesh construction and sharding helpers.

The reference is single-process with zero distributed code (SURVEY.md §2
"Parallelism: none"); scaling here is green-field TPU design: data-parallel
frame batching over ICI with optional FSDP-style parameter sharding for
training. Axes:

- ``dp``   — data parallel (frame batch / training batch dimension)
- ``fsdp`` — parameter sharding (output-channel dim of conv kernels)

Inference on a single chip uses a trivial 1x1 mesh and compiles to exactly
the same program as unsharded jit.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
FSDP_AXIS = "fsdp"


def make_mesh(
    n_devices: Optional[int] = None,
    dp: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, fsdp) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    if dp is None:
        dp = n_devices // fsdp
    if dp * fsdp != n_devices:
        raise ValueError(f"dp({dp}) * fsdp({fsdp}) != n_devices({n_devices})")
    arr = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(arr, (DP_AXIS, FSDP_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp, replicate the rest."""
    return NamedSharding(mesh, P(DP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a pytree with its leading axis sharded over dp."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
