"""Segmentation-based team classifier (the cascade's active default).

Behavioral parity with reference team_segmentation.py:9-298:
- segment each crop to a jersey mask; extract the 4-dim color feature
  [white_ratio, dominant_hue, saturation, brightness];
- fit: KMeans(k=2, seed 42) over <= 50 crops with >= 500 mask pixels,
  relabel so the higher-white-ratio cluster is team 0 (away/white);
- predict: re-segment every crop, nearest-center assignment, temporal
  majority vote (window 10, min 3);
- masks retained for visualization (get_segmentation_masks).

TPU-native difference: segmentation defaults to the vectorized color-prior
mask (features.color_prior_masks — one device call for all crops) instead
of per-crop host GrabCut; pass method='grabcut' for the exact reference
mask path. Parity target is team assignment, not mask pixels (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
from sklearn.cluster import KMeans

import functools

import jax
import jax.numpy as jnp

from ..ops.crop_resize import crop_and_resize
from .base import CROP_H, CROP_W, MajorityVote, to_device_batch
from .features import color_prior_masks, grabcut_mask_host, segmentation_features


@functools.partial(jax.jit, static_argnames=())
def _frame_features(frame: jnp.ndarray, boxes: jnp.ndarray):
    """One device call: sample all player crops from the frame, build
    color-prior masks, extract the 4-dim features. boxes are padded to a
    fixed capacity (invalid rows are zero boxes -> features fall back to
    the <100px defaults and are dropped on host)."""
    crops = crop_and_resize(frame, boxes, (CROP_H, CROP_W))
    masks = color_prior_masks(crops)
    feats = segmentation_features(crops, masks)
    return feats, masks


class SegmentationTeamClassifier:
    def __init__(self, device: str = "tpu", visualize_segmentation: bool = False,
                 method: str = "color_prior"):
        self.visualize_segmentation = visualize_segmentation
        self.method = method
        self.vote = MajorityVote(window=10, min_votes=3)
        self.kmeans: Optional[KMeans] = None
        self.team_colors = None
        self.last_masks: Dict[int, np.ndarray] = {}

    # ------------------------------------------------------------------
    def _masks(self, batch) -> np.ndarray:
        if self.method == "grabcut":
            return np.stack([
                grabcut_mask_host(np.asarray(c, np.uint8)) for c in np.asarray(batch)
            ])
        return np.asarray(color_prior_masks(batch))

    def _features(self, crops) -> tuple[np.ndarray, np.ndarray]:
        batch = to_device_batch(crops)
        masks = self._masks(batch)
        feats = np.asarray(segmentation_features(batch, np.asarray(masks, np.float32)))
        return feats, masks

    # ------------------------------------------------------------------
    def fit(self, crops: List[np.ndarray], positions=None, **_) -> None:
        crops = list(crops)[:50]  # reference limit (team_segmentation.py:181)
        if len(crops) < 2:
            return
        feats, masks = self._features(crops)
        valid = masks.reshape(len(crops), -1).sum(axis=1) > 500
        feats = feats[valid]
        if len(feats) < 2:
            # reference falls back to threshold classification when
            # segmentation yields too few valid crops (:195-197)
            return
        self.kmeans = KMeans(n_clusters=2, random_state=42, n_init=10)
        labels = self.kmeans.fit_predict(feats)
        white = [feats[labels == c, 0].mean() if (labels == c).any() else 0.0 for c in (0, 1)]
        if white[1] > white[0]:
            self.kmeans.cluster_centers_ = self.kmeans.cluster_centers_[[1, 0]]
            white = white[::-1]
        self.team_colors = {
            0: {"is_white": white[0], "name": "Away (White)"},
            1: {"is_white": white[1], "name": "Home (Colored)"},
        }

    # ------------------------------------------------------------------
    def predict(self, crops, tracker_ids: Optional[np.ndarray] = None,
                positions=None) -> np.ndarray:
        if not len(crops):
            return np.array([])
        feats, masks = self._features(crops)

        if not self.visualize_segmentation:
            self.last_masks.clear()
        elif tracker_ids is not None:
            for i, tid in enumerate(tracker_ids[: len(masks)]):
                if tid is not None:
                    self.last_masks[int(tid)] = masks[i] > 0.5

        if self.kmeans is not None:
            teams = self.kmeans.predict(feats)
        else:
            # unfitted fallback: white_ratio > 0.4 -> team 0
            teams = np.where(feats[:, 0] > 0.4, 0, 1)
        return self.vote.update(tracker_ids, teams.astype(np.int64))

    def get_segmentation_masks(self, tracker_ids: List[int]) -> Dict[int, np.ndarray]:
        return {t: self.last_masks[t] for t in tracker_ids if t in self.last_masks}

    # ------------------------------------------------------------------
    def predict_features(self, feats: np.ndarray,
                         tracker_ids: Optional[np.ndarray] = None) -> np.ndarray:
        """Classify precomputed 4-dim segmentation features (the detection
        megastep emits them fused — models/detector.py with_team_features):
        nearest-kmeans-center + temporal vote, zero extra device calls."""
        feats = np.asarray(feats, np.float32).reshape(-1, 4)
        if len(feats) == 0:
            return np.array([])
        if self.kmeans is not None:
            teams = self.kmeans.predict(feats)
        else:
            teams = np.where(feats[:, 0] > 0.4, 0, 1)
        return self.vote.update(tracker_ids, teams.astype(np.int64))

    # ------------------------------------------------------------------
    def predict_from_frame(self, frame: np.ndarray, boxes: np.ndarray,
                           tracker_ids: Optional[np.ndarray] = None,
                           capacity: int = 32) -> np.ndarray:
        """TPU fast path: crops are sampled on device straight from the
        frame (ops/crop_resize) — no per-crop host slicing/resizing. Boxes
        are padded to a power-of-two capacity so only a handful of XLA
        programs ever compile."""
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        n = len(boxes)
        if n == 0:
            return np.array([])
        cap = capacity
        while n > cap:
            cap *= 2
        padded = np.zeros((cap, 4), np.float32)
        padded[:n] = boxes
        feats, masks = _frame_features(jnp.asarray(frame), jnp.asarray(padded))
        feats = np.asarray(feats[:n])
        if self.visualize_segmentation and tracker_ids is not None:
            masks_np = np.asarray(masks[:n])
            for i, tid in enumerate(tracker_ids[:n]):
                if tid is not None:
                    self.last_masks[int(tid)] = masks_np[i] > 0.5
        if self.kmeans is not None:
            teams = self.kmeans.predict(feats)
        else:
            teams = np.where(feats[:, 0] > 0.4, 0, 1)
        return self.vote.update(tracker_ids, teams.astype(np.int64))
