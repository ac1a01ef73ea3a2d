"""Parameter checkpointing (save/load) as msgpack.

Runtime analogue of the reference's .pt files (which are gitignored
upstream and unavailable — SURVEY.md §0); also used to persist team
classifier fit state so runs are resumable (SURVEY.md §5 checkpoint/resume
gap)."""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_params(path: str, params: Dict, dtype=None) -> None:
    """dtype='float16' halves shipped checkpoints (inference re-casts to
    bf16 anyway; f16 keeps ~3 decimal digits on O(1) weights)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tree = _to_numpy(params)
    if dtype is not None:
        tree = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if a.dtype == np.float32 else a, tree)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(tree))


def load_params(path: str) -> Dict:
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    # f16-shipped checkpoints come back as f32 masters
    return jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32)
        if np.asarray(x).dtype == np.float16 else jnp.asarray(x), raw)


def shipped_weights_path(model_name: str):
    """Checkpoint shipped inside the package (data/weights/<name>.msgpack),
    or None. Trained-by-default models resolve here when the caller gives
    no explicit checkpoint."""
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "weights",
        f"{model_name}.msgpack")
    return path if os.path.exists(path) else None
