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


def save_params(path: str, params: Dict) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(_to_numpy(params)))


def load_params(path: str) -> Dict:
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return jax.tree_util.tree_map(lambda x: jnp.asarray(x), raw)
