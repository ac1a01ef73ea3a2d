"""Simple white-vs-colored jersey classifier (the cascade's last resort).

Behavioral parity with reference team.py:76-132 + 274-302:
- torso crop rows 25-75%, cols 30-70%
- white if white_pixel_ratio > 0.3 OR (avg V > 180 AND avg S < 50)
- confidence: white -> min(2*white_ratio, 1); colored -> min(S/150, 1)
- temporal majority vote window 10, min 3

Feature math runs on device in one batch (teams/features.py)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .base import MajorityVote, to_device_batch
from .features import simple_jersey_stats


def _torso(crop: np.ndarray) -> np.ndarray:
    h, w = crop.shape[:2]
    if h < 30 or w < 20:
        return crop
    region = crop[int(h * 0.25): int(h * 0.75), int(w * 0.3): int(w * 0.7)]
    return region if region.size else crop


class SimpleTeamClassifier:
    def __init__(self):
        self.vote = MajorityVote(window=10, min_votes=3)

    def classify_batch(self, crops) -> Tuple[np.ndarray, np.ndarray]:
        """-> (team ids (N,), confidences (N,))."""
        torsos = [_torso(np.asarray(c)) for c in crops] if isinstance(crops, (list, tuple)) else crops
        stats = np.asarray(simple_jersey_stats(to_device_batch(torsos)))
        white_ratio, brightness, saturation = stats[:, 0], stats[:, 1], stats[:, 2]
        is_white = (white_ratio > 0.3) | ((brightness > 180) & (saturation < 50))
        teams = np.where(is_white, 0, 1).astype(np.int64)
        conf = np.where(
            is_white,
            np.minimum(white_ratio * 2.0, 1.0),
            np.minimum(saturation / 150.0, 1.0),
        )
        return teams, conf.astype(np.float32)

    def fit(self, crops: List[np.ndarray], positions=None, **_) -> None:
        """The reference's _simple_fit only prints a distribution
        (team.py:202-217); there is nothing to fit."""
        if len(crops):
            teams, _ = self.classify_batch(crops[:100])

    def predict(self, crops, tracker_ids: Optional[np.ndarray] = None,
                positions=None) -> np.ndarray:
        if not len(crops):
            return np.array([])
        teams, _ = self.classify_batch(crops)
        return self.vote.update(tracker_ids, teams)
