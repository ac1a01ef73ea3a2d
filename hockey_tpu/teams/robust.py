"""Robust team classifier: embeddings + masked color features + HDBSCAN.

Behavioral parity with reference team_robust.py:15-622, with two deliberate
divergences (COMPAT.md):

1. The reference's fit crashes with a NameError (team_robust.py:389
   references undefined `features_reduced`) whenever >= 2 clusters are
   found, so in the reference this classifier's fitted path is dead code
   and every run falls through to the hybrid classifier. We implement the
   *intended* behavior (the bug fixed).
2. Embeddings come from our JAX MobileNetV3 by default instead of SigLIP —
   google/siglip-base weights cannot be downloaded in this environment.
   A SigLIP path is attempted first when transformers can load it locally
   (constructor arg `model_name`, same as the reference's).

Faithful pieces: jersey-number masking (bright center ellipse excluded,
preprocess_crop :98-136), 43-dim masked color features x20 weight
(:162-212, 226), positions x0.1 (:232-236), quality-filtered crop sampling
(:240-261), StandardScaler -> PCA(50) -> HDBSCAN(min_cluster_size=5, eom)
(:263-315), cluster->team mapping by size x cohesion with white = lowest
median saturation (:317-412), outlier handling via PlayerProfile /
exemplar cache (:437-546), consistency-bonus temporal smoothing (:567-614).
"""

from __future__ import annotations

import dataclasses
from collections import Counter
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from sklearn.cluster import HDBSCAN
from sklearn.decomposition import PCA
from sklearn.preprocessing import StandardScaler

from ..models import mobilenetv3 as mnv3
from ..ops.color import bgr_to_hsv, bgr_to_lab
from .base import standardize_crops, to_device_batch
from .features import _hist, _masked_mean


@dataclasses.dataclass
class TeamAssignment:
    team_id: int
    confidence: float
    is_outlier: bool = False


@dataclasses.dataclass
class PlayerProfile:
    tracker_id: int
    team_history: List[int]
    confidence_history: List[float]
    last_seen_frame: int

    def get_stable_team(self, min_confidence: float = 0.7) -> Optional[int]:
        if not self.team_history:
            return None
        confident = [
            t for t, c in zip(self.team_history, self.confidence_history)
            if c >= min_confidence
        ]
        pool = confident or self.team_history
        return Counter(pool).most_common(1)[0][0]


# ---------------------------------------------------------------------------
# Device-batched jersey-number mask + 43-dim color features
# ---------------------------------------------------------------------------

def _number_mask_single(crop: jnp.ndarray) -> jnp.ndarray:
    """Jersey mask excluding bright number regions (reference
    preprocess_crop: threshold gray>200, center ellipse (0.3w, 0.2h) at
    (cx, 0.8cy), 5x5 dilate, invert). Returns (h, w) float32, 1 = jersey."""
    h, w = crop.shape[0], crop.shape[1]
    b, g, r = crop[..., 0], crop[..., 1], crop[..., 2]
    gray = 0.114 * b + 0.587 * g + 0.299 * r
    bright = gray > 200.0
    ys = (jnp.arange(h, dtype=jnp.float32) - 0.8 * (h // 2))[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) - (w // 2))[None, :]
    ellipse = (xs / max(w * 0.3, 1.0)) ** 2 + (ys / max(h * 0.2, 1.0)) ** 2 <= 1.0
    number = (bright & ellipse).astype(jnp.float32)
    # 5x5 dilation == maxpool
    number = jax.lax.reduce_window(
        number, 0.0, jax.lax.max, (5, 5), (1, 1), [(2, 2), (2, 2)]
    )
    return 1.0 - number


def _robust_color_single(crop: jnp.ndarray) -> jnp.ndarray:
    """43-dim masked color feature (reference extract_color_features
    layout: h_hist 18, s_hist 16, hsv_mean/255 x3, lab_mean/255 x3,
    [low, med, high] saturation ratios)."""
    mask = _number_mask_single(crop)
    hsv = bgr_to_hsv(crop).reshape(-1, 3)
    lab = bgr_to_lab(crop).reshape(-1, 3)
    m = mask.reshape(-1)
    h_hist = _hist(hsv[:, 0], m, 18, 180.0)
    s_hist = _hist(hsv[:, 1], m, 16, 256.0)
    hsv_mean = jnp.stack([_masked_mean(hsv[:, i], m) for i in range(3)]) / 255.0
    lab_mean = jnp.stack([_masked_mean(lab[:, i], m) for i in range(3)]) / 255.0
    s = hsv[:, 1]
    low = _masked_mean((s < 30).astype(jnp.float32), m)
    med = _masked_mean(((s >= 30) & (s < 100)).astype(jnp.float32), m)
    high = _masked_mean((s >= 100).astype(jnp.float32), m)
    return jnp.concatenate([h_hist, s_hist, hsv_mean, lab_mean,
                            jnp.stack([low, med, high])])


@jax.jit
def robust_color_features(crops: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(_robust_color_single)(crops)


@jax.jit
def masked_saturation_stats(crops: jnp.ndarray) -> jnp.ndarray:
    """(N, 2): [median-proxy saturation (masked mean), white_ratio] used for
    cluster -> team orientation and the simple fallback."""

    def one(crop):
        mask = _number_mask_single(crop).reshape(-1)
        hsv = bgr_to_hsv(crop).reshape(-1, 3)
        sat = _masked_mean(hsv[:, 1], mask)
        white = _masked_mean(
            ((hsv[:, 2] > 200) & (hsv[:, 1] < 30)).astype(jnp.float32), mask
        )
        return jnp.stack([sat, white])

    return jax.vmap(one)(crops)


# ---------------------------------------------------------------------------

class RobustTeamClassifier:
    def __init__(
        self,
        device: str = "tpu",
        model_name: str = "google/siglip-base-patch16-256",
        min_cluster_size: int = 5,
        min_samples: int = 3,
        seed: int = 0,
    ):
        self.min_cluster_size = min_cluster_size
        self.min_samples = min_samples
        self.scaler = StandardScaler()
        self.pca: Optional[PCA] = None
        self.color_feature_weight = 20.0
        self.team_mapping: Dict[int, int] = {}
        self.team_profiles: Dict[int, Dict] = {}
        self.team_exemplars: Dict[int, List[np.ndarray]] = {0: [], 1: []}
        self.player_profiles: Dict[int, PlayerProfile] = {}
        self.current_frame = 0
        self._train_reduced: Optional[np.ndarray] = None
        self._train_labels: Optional[np.ndarray] = None
        self._outlier_dist: float = np.inf

        self._siglip = None
        try:  # optional exact-parity embedder when weights exist locally
            from transformers import AutoModel, AutoProcessor

            self._siglip = (
                AutoModel.from_pretrained(model_name, local_files_only=True),
                AutoProcessor.from_pretrained(model_name, local_files_only=True),
            )
        except Exception:
            self._siglip = None
        self._mnv3_params = mnv3.load_default_params() or mnv3.init_params(seed)
        self._embed = jax.jit(mnv3.embed)

    # ------------------------------------------------------------------
    def _visual_features(self, batch: jnp.ndarray) -> np.ndarray:
        if self._siglip is not None:
            import torch

            model, processor = self._siglip
            imgs = [np.asarray(c, np.uint8)[..., ::-1] for c in np.asarray(batch)]
            feats = []
            for i in range(0, len(imgs), 32):
                inputs = processor(images=imgs[i : i + 32], return_tensors="pt")
                with torch.no_grad():
                    feats.append(model.get_image_features(**inputs).numpy())
            return np.vstack(feats)
        return np.asarray(self._embed(self._mnv3_params, mnv3.preprocess_bgr(batch)))

    def extract_multimodal_features(self, crops, positions=None) -> np.ndarray:
        if isinstance(crops, (list, tuple)):
            crops = standardize_crops(crops)
        batch = to_device_batch(crops)
        visual = self._visual_features(batch)
        color = np.asarray(robust_color_features(batch)) * self.color_feature_weight
        combined = np.hstack([visual, color])
        if positions is not None and len(positions) == len(combined):
            pos = np.asarray(positions, np.float64)
            pos = (pos - pos.mean(axis=0)) / (pos.std(axis=0) + 1e-7)
            combined = np.hstack([combined, pos * 0.1])
        return combined.astype(np.float32)

    @staticmethod
    def filter_crops_for_clustering(crops, positions=None, min_size: int = 50):
        kept, kept_pos, scores = [], [], []
        for i, crop in enumerate(crops):
            h, w = crop.shape[:2]
            if h >= min_size and w >= min_size * 0.5:
                kept.append(crop)
                if positions is not None:
                    kept_pos.append(positions[i])
                ar = w / h
                scores.append(h * w * (1.0 if 0.4 <= ar <= 0.8 else 0.5))
        return kept, (kept_pos if positions is not None else None), scores

    # ------------------------------------------------------------------
    def fit(self, crops: List[np.ndarray], positions=None) -> None:
        if len(crops) < self.min_cluster_size * 2:
            raise ValueError(f"Need at least {self.min_cluster_size * 2} crops")
        crops, positions, scores = self.filter_crops_for_clustering(crops, positions)
        if len(crops) < self.min_cluster_size * 2:
            raise ValueError(f"After filtering, only {len(crops)} crops remain")
        if len(crops) > 500:
            scores = np.asarray(scores, np.float64)
            probs = scores / scores.sum()
            rng = np.random.default_rng(42)
            idx = rng.choice(len(crops), size=500, replace=False, p=probs)
            crops = [crops[i] for i in idx]
            if positions is not None:
                positions = [positions[i] for i in idx]

        features = self.extract_multimodal_features(crops, positions)
        scaled = self.scaler.fit_transform(features)
        n_comp = min(50, scaled.shape[0], scaled.shape[1])
        self.pca = PCA(n_components=n_comp, random_state=42)
        reduced = self.pca.fit_transform(scaled)

        clusterer = HDBSCAN(
            min_cluster_size=self.min_cluster_size,
            min_samples=self.min_samples,
            metric="euclidean",
            cluster_selection_method="eom",
        )
        labels = clusterer.fit_predict(reduced)
        probabilities = getattr(clusterer, "probabilities_", np.ones(len(labels)))
        self._map_clusters(crops, labels, reduced, probabilities)

    def _map_clusters(self, crops, labels, reduced, probabilities) -> None:
        uniq = sorted(set(labels.tolist()) - {-1})
        if len(uniq) < 2:
            self._fallback_clustering(crops, labels, reduced)
            return
        stats = {}
        batch = to_device_batch(crops)
        sat_white = np.asarray(masked_saturation_stats(batch))
        for lab in uniq:
            m = labels == lab
            stats[lab] = {
                "size": int(m.sum()),
                "median_saturation": float(np.median(sat_white[m, 0])),
                "white_ratio": float(np.median(sat_white[m, 1])),
                "cohesion": float(probabilities[m].mean()),
            }
        ranked = sorted(stats.items(), key=lambda kv: kv[1]["size"] * kv[1]["cohesion"],
                        reverse=True)[:2]
        if ranked[0][1]["median_saturation"] < ranked[1][1]["median_saturation"]:
            self.team_mapping = {ranked[0][0]: 0, ranked[1][0]: 1}
        else:
            self.team_mapping = {ranked[0][0]: 1, ranked[1][0]: 0}
        for cluster_id, team_id in self.team_mapping.items():
            cm = labels == cluster_id
            cf = reduced[cm]
            center = cf.mean(axis=0)
            self.team_profiles[team_id] = {
                "cluster_id": cluster_id,
                "stats": stats[cluster_id],
                "exemplar_features": center,
            }
            best = np.argsort(np.linalg.norm(cf - center, axis=1))[:10]
            self.team_exemplars[team_id] = [cf[i] for i in best]
        # keep training set for nearest-cluster prediction (replaces
        # hdbscan.approximate_predict, unavailable in sklearn's HDBSCAN)
        keep = np.isin(labels, list(self.team_mapping))
        self._train_reduced = reduced[keep]
        self._train_labels = np.asarray(
            [self.team_mapping[l] for l in labels[keep]], np.int64
        )
        # outlier gate: 95th percentile of in-cluster nearest-neighbor dists
        d = self._knn_dists(self._train_reduced)
        self._outlier_dist = float(np.percentile(d, 95)) * 2.0

    def _fallback_clustering(self, crops, labels, reduced) -> None:
        batch = to_device_batch(crops)
        sat = np.asarray(masked_saturation_stats(batch))[:, 0]
        teams = np.where(sat < 40, 0, 1)
        self.team_mapping = {0: 0, 1: 1}
        self._train_reduced = reduced
        self._train_labels = teams.astype(np.int64)
        self._outlier_dist = np.inf
        for t in (0, 1):
            m = teams == t
            if m.any():
                self.team_profiles[t] = {
                    "cluster_id": t,
                    "stats": {"size": int(m.sum())},
                    "exemplar_features": reduced[m].mean(axis=0),
                }

    def _knn_dists(self, feats: np.ndarray) -> np.ndarray:
        d2 = ((feats[:, None, :] - self._train_reduced[None, :, :]) ** 2).sum(-1)
        d2.partition(1, axis=1)
        return np.sqrt(np.maximum(d2[:, 1], 0))

    # ------------------------------------------------------------------
    def predict(self, crops, tracker_ids=None, positions=None) -> List[TeamAssignment]:
        if not len(crops):
            return []
        self.current_frame += 1
        features = self.extract_multimodal_features(crops, positions)
        fitted = self._train_reduced is not None
        if fitted:
            scaled = self.scaler.transform(features)
            reduced = self.pca.transform(scaled)
        else:
            reduced = features

        assignments: List[TeamAssignment] = []
        batch = to_device_batch(crops)
        sat_white = np.asarray(masked_saturation_stats(batch))
        for i in range(len(crops)):
            tid = None
            if tracker_ids is not None and i < len(tracker_ids) and tracker_ids[i] is not None:
                tid = int(tracker_ids[i])
            if fitted:
                d2 = ((self._train_reduced - reduced[i]) ** 2).sum(-1)
                j = int(np.argmin(d2))
                dist = float(np.sqrt(d2[j]))
                if dist > self._outlier_dist:
                    a = self._handle_outlier(sat_white[i], reduced[i], tid)
                else:
                    strength = max(0.0, 1.0 - dist / max(self._outlier_dist, 1e-6))
                    a = TeamAssignment(int(self._train_labels[j]), 0.5 + 0.5 * strength, False)
            else:
                a = self._simple_predict(sat_white[i])
            if tid is not None:
                a = self._apply_temporal_consistency(a, tid)
            if a.confidence > 0.85 and not a.is_outlier and a.team_id in self.team_exemplars:
                ex = self.team_exemplars[a.team_id]
                ex.append(reduced[i])
                del ex[:-50]
            assignments.append(a)
        return assignments

    def _handle_outlier(self, sat_white, feat, tid) -> TeamAssignment:
        if tid is not None and tid in self.player_profiles:
            stable = self.player_profiles[tid].get_stable_team()
            if stable is not None:
                return TeamAssignment(stable, 0.6, True)
        if self.team_profiles:
            best, min_dist = 0, np.inf
            for team_id, prof in self.team_profiles.items():
                d = float(np.linalg.norm(feat - prof["exemplar_features"]))
                if d < min_dist:
                    min_dist, best = d, team_id
            for team_id, exemplars in self.team_exemplars.items():
                if exemplars:
                    d = float(np.min(np.linalg.norm(np.asarray(exemplars) - feat, axis=1)))
                    if d < min_dist:
                        min_dist, best = d, team_id
            conf = max(0.3, 1.0 - min_dist / 500.0)
            return TeamAssignment(best, conf, True)
        return self._simple_predict(sat_white)

    @staticmethod
    def _simple_predict(sat_white) -> TeamAssignment:
        sat = float(sat_white[0])
        if sat < 40:
            return TeamAssignment(0, 1.0 - sat / 40.0, False)
        return TeamAssignment(1, min(sat / 100.0, 1.0), False)

    def _apply_temporal_consistency(self, a: TeamAssignment, tid: int) -> TeamAssignment:
        prof = self.player_profiles.setdefault(
            tid, PlayerProfile(tid, [], [], self.current_frame)
        )
        prof.team_history.append(a.team_id)
        prof.confidence_history.append(a.confidence)
        prof.last_seen_frame = self.current_frame
        del prof.team_history[:-20]
        del prof.confidence_history[:-20]
        stable = prof.get_stable_team(min_confidence=0.6)
        if stable is not None and len(prof.team_history) >= 5:
            recent = prof.team_history[-5:]
            consistency = recent.count(stable) / len(recent)
            if stable == a.team_id:
                return TeamAssignment(a.team_id, min(a.confidence + consistency * 0.2, 1.0), a.is_outlier)
            if consistency > 0.8:
                return TeamAssignment(stable, consistency, a.is_outlier)
            return TeamAssignment(a.team_id, a.confidence * (1 - consistency * 0.3), a.is_outlier)
        return a

    @staticmethod
    def get_team_labels(assignments: List[TeamAssignment]) -> np.ndarray:
        return np.asarray([a.team_id for a in assignments])

    @staticmethod
    def get_confidences(assignments: List[TeamAssignment]) -> np.ndarray:
        return np.asarray([a.confidence for a in assignments])
