"""Hybrid team classifier: deep embeddings + color features.

Behavioral parity with reference team_hybrid.py:13-328:
- jersey region rows 10-60%, cols 20-80%;
- MobileNetV3-small 576-d embedding (models/mobilenetv3.py — JAX, one
  batched forward instead of the reference's per-crop torch loop,
  team_hybrid.py:66-87) + the 49-dim color vector (device-batched);
- fit: StandardScaler -> optional positions x0.1 -> SpectralClustering
  (rbf, gamma=1, n_init=10, seed 42); cluster with lowest mean saturation
  relabeled to team 0 (white/away);
- temporal majority vote window 15, min 5.

Deliberate divergence (COMPAT.md): the reference's predict ignores its
fitted clusterer and uses a raw white-ratio heuristic — its own comment
calls kNN-on-training-features the intended design (team_hybrid.py:266-267).
We implement that intent: predictions are kNN over the stored fitted
features with their cluster labels; the heuristic remains as the unfitted
fallback.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import SpectralClustering
from sklearn.preprocessing import StandardScaler

from ..models import mobilenetv3 as mnv3
from .base import MajorityVote, standardize_crops, to_device_batch
from .features import hybrid_color_features


def _jersey_region(crop: np.ndarray) -> np.ndarray:
    h, w = crop.shape[:2]
    if h < 40 or w < 20:
        return crop
    return crop[int(h * 0.1): int(h * 0.6), int(w * 0.2): int(w * 0.8)]


class HybridTeamClassifier:
    KNN_K = 5

    def __init__(self, device: str = "tpu", n_clusters: int = 2, seed: int = 0):
        self.n_clusters = n_clusters
        self.vote = MajorityVote(window=15, min_votes=5)
        self.scaler = StandardScaler()
        self.params = mnv3.load_default_params() or mnv3.init_params(seed)
        self._embed = jax.jit(mnv3.embed)
        self.fitted_features: Optional[np.ndarray] = None
        self.fitted_labels: Optional[np.ndarray] = None

    # ------------------------------------------------------------------
    def extract_all_features(self, crops) -> np.ndarray:
        """(N, 576 + 49) combined deep + color features, two device calls."""
        if isinstance(crops, (list, tuple)):
            crops = standardize_crops([_jersey_region(np.asarray(c)) for c in crops])
        batch = to_device_batch(crops)
        deep = np.asarray(self._embed(self.params, mnv3.preprocess_bgr(batch)))
        masks = jnp.ones(batch.shape[:3], jnp.float32)
        color = np.asarray(hybrid_color_features(batch, masks))
        return np.hstack([deep, color]).astype(np.float32)

    # ------------------------------------------------------------------
    def fit(self, crops: List[np.ndarray], positions=None) -> None:
        if len(crops) < self.n_clusters * 2:
            raise ValueError(f"Need at least {self.n_clusters * 2} crops for clustering")
        feats = self.extract_all_features(crops)
        normed = self.scaler.fit_transform(feats)
        if positions is not None and len(positions) == len(crops):
            pos = np.asarray(positions, np.float64)
            lo, hi = pos.min(axis=0), pos.max(axis=0)
            pos = (pos - lo) / (hi - lo + 1e-7)
            normed_sc = np.hstack([normed, pos * 0.1])
        else:
            normed_sc = normed
        # Deliberate divergence (COMPAT.md): the reference passes gamma=1.0
        # (team_hybrid.py:188), which on ~625-dim standardized features
        # makes every rbf affinity exp(-||dx||^2) underflow to 0 — the
        # affinity graph is empty and cluster labels are effectively
        # arbitrary (likely why its predict never uses the clusterer). We
        # use the median heuristic so the intended design functions.
        d2 = ((normed_sc[:, None, :] - normed_sc[None, :, :]) ** 2).sum(-1)
        med = float(np.median(d2[d2 > 0])) if (d2 > 0).any() else 1.0
        clusterer = SpectralClustering(
            n_clusters=self.n_clusters, affinity="rbf", gamma=1.0 / max(med, 1e-9),
            n_init=10, random_state=42,
        )
        labels = clusterer.fit_predict(normed_sc)
        labels = self._orient_labels(feats, labels)
        self.fitted_features = normed
        self.fitted_labels = labels

    def _orient_labels(self, feats: np.ndarray, labels: np.ndarray) -> np.ndarray:
        """Relabel so team 0 = white/away (lowest saturation cluster).
        Mean saturation proxy: hsv_mean S component = feature index 35
        (18+8+8 hists, then hsv_mean[H,S,V]/255)."""
        sat_idx = 18 + 8 + 8 + 1
        sats = [feats[labels == c, sat_idx].mean() if (labels == c).any() else 1e9
                for c in range(self.n_clusters)]
        if self.n_clusters == 2 and sats[1] < sats[0]:
            labels = 1 - labels
        return labels

    # ------------------------------------------------------------------
    def predict(self, crops, tracker_ids: Optional[np.ndarray] = None) -> np.ndarray:
        if not len(crops):
            return np.array([])
        feats = self.extract_all_features(crops)
        if self.fitted_features is None:
            teams = self._heuristic(feats)
        else:
            normed = self.scaler.transform(feats)
            teams = self._knn(normed)
        return self.vote.update(tracker_ids, teams)

    def _knn(self, feats: np.ndarray) -> np.ndarray:
        d2 = ((feats[:, None, :] - self.fitted_features[None, :, :]) ** 2).sum(-1)
        k = min(self.KNN_K, len(self.fitted_features))
        nearest = np.argpartition(d2, k - 1, axis=1)[:, :k]
        votes = self.fitted_labels[nearest]
        return (votes.mean(axis=1) > 0.5).astype(np.int64)

    def _heuristic(self, feats: np.ndarray) -> np.ndarray:
        """Unfitted fallback: the reference's white-ratio rule
        (team_hybrid.py:270-278): white if white_ratio > 0.3 or the lowest
        saturation-histogram bin dominates."""
        white_ratio = feats[:, -1]
        s_hist = feats[:, 18:26]
        low_bin = np.argmax(s_hist, axis=1) == 0
        return np.where((white_ratio > 0.3) | low_bin, 0, 1).astype(np.int64)
