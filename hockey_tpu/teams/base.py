"""Shared infrastructure for team classifiers: crop standardization and
temporal majority voting."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import cv2
import jax.numpy as jnp
import numpy as np

# Every classifier consumes crops at a fixed device shape (h, w) — the
# hybrid classifier's MobileNet size (team_hybrid.py:33 Resize((128, 64))).
CROP_H, CROP_W = 128, 64


def standardize_crops(crops: Sequence[np.ndarray]) -> np.ndarray:
    """List of variable-size BGR crops -> (N, 128, 64, 3) float32 batch.

    Host-side resize is only used on the list-of-crops compatibility API;
    the pipeline fast path samples crops on device via ops.crop_resize."""
    out = np.zeros((len(crops), CROP_H, CROP_W, 3), np.float32)
    for i, c in enumerate(crops):
        if c is None or c.size == 0:
            continue
        out[i] = cv2.resize(c, (CROP_W, CROP_H), interpolation=cv2.INTER_LINEAR)
    return out


class MajorityVote:
    """Per-tracker temporal majority vote (the consistency mechanism every
    reference classifier shares — e.g. team.py:281-298, window/min vary)."""

    def __init__(self, window: int = 10, min_votes: int = 3):
        self.window = window
        self.min_votes = min_votes
        self.history: Dict[int, List[int]] = defaultdict(list)

    def update(self, tracker_ids: Optional[np.ndarray], teams: np.ndarray) -> np.ndarray:
        teams = np.asarray(teams).copy()
        if tracker_ids is None:
            return teams
        for i, tid in enumerate(tracker_ids):
            if tid is None or i >= len(teams):
                continue
            tid = int(tid)
            h = self.history[tid]
            h.append(int(teams[i]))
            if len(h) > self.window:
                del h[: len(h) - self.window]
            if len(h) >= self.min_votes:
                teams[i] = np.argmax(np.bincount(h))
        return teams

    def reset(self) -> None:
        self.history.clear()


def to_device_batch(crops) -> jnp.ndarray:
    """Accepts a list of crops or an (N, h, w, 3) array; returns jnp batch."""
    if isinstance(crops, (list, tuple)):
        crops = standardize_crops(crops)
    return jnp.asarray(np.asarray(crops, np.float32))
