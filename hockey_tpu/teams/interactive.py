"""Interactive example-based team classifier.

Behavioral parity with reference team_interactive.py:37-410:
- the user marks 2-5 example players per team; crops become feature
  exemplars;
- features per crop: HSV histograms (30/32/32 bins), HSV mean/std,
  quadrant HSV means, edge density;
- similarity = mean of [per-histogram Pearson correlation, 1/(1+L2) on
  statistical features, 1 - |edge density diff|];
- predict = max similarity over each team's examples; when confidence
  < 0.7 and >= 5 votes of history exist, the majority vote overrides
  (window 10);
- warns when inter-team similarity > 0.75.

TPU-native differences: features are extracted for the whole crop batch in
one device call, similarities are one matrix op against the stacked
exemplars; edge density uses a Sobel-magnitude threshold instead of Canny
(no hysteresis pass on device; both measure "fraction of edge pixels" and
feed a single scalar similarity term). Headless initialization
(`initialize_from_examples`) is first-class so the pipeline can run
without OpenCV windows; the click-UI lives in ui/team_selector.py.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.color import bgr_to_hsv
from .base import to_device_batch
from .features import _hist

# feature block layout in the packed vector
_H, _S, _V = 30, 32, 32
_STATS = 6          # hsv mean (3) + std (3), /255
_QUAD = 12          # 4 quadrants x hsv mean /255
_EDGE = 1
DIM = _H + _S + _V + _STATS + _QUAD + _EDGE  # 113


def _features_single(crop: jnp.ndarray) -> jnp.ndarray:
    hsv = bgr_to_hsv(crop)
    flat = hsv.reshape(-1, 3)
    ones = jnp.ones(flat.shape[0], jnp.float32)
    h_hist = _hist(flat[:, 0], ones, _H, 180.0)
    s_hist = _hist(flat[:, 1], ones, _S, 256.0)
    v_hist = _hist(flat[:, 2], ones, _V, 256.0)
    mean = jnp.mean(flat, axis=0) / 255.0
    std = jnp.std(flat, axis=0) / 255.0

    h, w = crop.shape[0], crop.shape[1]
    quads = [
        hsv[: h // 2, : w // 2],
        hsv[: h // 2, w // 2:],
        hsv[h // 2:, : w // 2],
        hsv[h // 2:, w // 2:],
    ]
    quad_means = jnp.concatenate([jnp.mean(q, axis=(0, 1)) / 255.0 for q in quads])

    b, g, r = crop[..., 0], crop[..., 1], crop[..., 2]
    gray = 0.114 * b + 0.587 * g + 0.299 * r
    gx = gray[:, 2:] - gray[:, :-2]
    gy = gray[2:, :] - gray[:-2, :]
    mag = jnp.sqrt(gx[1:-1, :] ** 2 + gy[:, 1:-1] ** 2)
    edge_density = jnp.mean((mag > 100.0).astype(jnp.float32))

    return jnp.concatenate([h_hist, s_hist, v_hist, mean, std, quad_means,
                            edge_density[None]])


@jax.jit
def interactive_features(crops: jnp.ndarray) -> jnp.ndarray:
    """(N, h, w, 3) BGR -> (N, 113) packed feature vectors."""
    return jax.vmap(_features_single)(crops)


def _block_corr(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pearson correlation between rows of a (N, D) and rows of b (M, D)
    -> (N, M) (cv2.HISTCMP_CORREL semantics)."""
    ac = a - a.mean(axis=1, keepdims=True)
    bc = b - b.mean(axis=1, keepdims=True)
    num = ac @ bc.T
    den = np.sqrt((ac ** 2).sum(1))[:, None] * np.sqrt((bc ** 2).sum(1))[None, :]
    return num / np.maximum(den, 1e-12)


def similarity_matrix(fa: np.ndarray, fb: np.ndarray) -> np.ndarray:
    """(N, 113) x (M, 113) -> (N, M) similarity per the reference's
    compute_similarity: mean of 3 hist correlations, 3 stat 1/(1+L2)
    terms, and the edge term."""
    o = 0
    terms = []
    for n in (_H, _S, _V):
        terms.append(_block_corr(fa[:, o : o + n], fb[:, o : o + n]))
        o += n
    # statistical blocks: hsv_mean(3), hsv_std(3), spatial(12)
    for n in (3, 3, _QUAD):
        d = np.linalg.norm(fa[:, o : o + n, None].transpose(0, 2, 1)
                           - fb[None, :, o : o + n], axis=2)
        terms.append(1.0 / (1.0 + d))
        o += n
    edge = 1.0 - np.abs(fa[:, o, None] - fb[None, :, o])
    terms.append(edge)
    return np.mean(terms, axis=0)


class InteractiveTeamClassifier:
    def __init__(self, device: str = "tpu", confidence_threshold: float = 0.7):
        self.confidence_threshold = confidence_threshold
        self.examples: Dict[int, np.ndarray] = {}  # team -> (M, 113)
        self.example_crops: Dict[int, List[np.ndarray]] = {}  # for montage
        self.player_history: Dict[int, List[int]] = defaultdict(list)
        self.history_window = 10
        self.min_examples_per_team = 2
        self.max_examples_per_team = 5

    # ------------------------------------------------------------------
    def initialize_from_examples(
        self, team0_crops: List[np.ndarray], team1_crops: List[np.ndarray]
    ) -> bool:
        """Headless initialization with pre-picked example crops."""
        if (len(team0_crops) < self.min_examples_per_team
                or len(team1_crops) < self.min_examples_per_team):
            return False
        f0 = np.asarray(interactive_features(to_device_batch(team0_crops)))
        f1 = np.asarray(interactive_features(to_device_batch(team1_crops)))
        self.examples = {0: f0[: self.max_examples_per_team],
                         1: f1[: self.max_examples_per_team]}
        self.example_crops = {
            0: [np.asarray(c) for c in team0_crops[: self.max_examples_per_team]],
            1: [np.asarray(c) for c in team1_crops[: self.max_examples_per_team]],
        }
        inter = float(similarity_matrix(self.examples[0], self.examples[1]).mean())
        if inter > 0.75:
            print(f"WARNING: Teams look similar (avg similarity: {inter:.2f})")
        return True

    def visualize_examples(self) -> Optional[np.ndarray]:
        """Montage of the selected example crops: one 100-px row per team
        with 10-px gaps and count labels (reference
        team_interactive.py:357-410 layout)."""
        import cv2

        if len(self.example_crops) < 2:
            return None
        target_height, gap = 100, 10
        team_images = []
        for team_id in (0, 1):
            crops = []
            for crop in self.example_crops[team_id]:
                scale = target_height / max(crop.shape[0], 1)
                crops.append(cv2.resize(
                    crop, (max(int(crop.shape[1] * scale), 1), target_height)))
            row = []
            for c in crops[:-1]:
                row.extend([c, np.full((target_height, gap, 3), 255, np.uint8)])
            row.append(crops[-1])
            team_images.append(np.hstack(row))
        max_width = max(img.shape[1] for img in team_images)
        for i, img in enumerate(team_images):
            if img.shape[1] < max_width:
                pad = np.full((target_height, max_width - img.shape[1], 3),
                              255, np.uint8)
                team_images[i] = np.hstack([img, pad])
        y0 = 30
        canvas = np.full((target_height * 2 + gap * 3 + 60, max_width, 3),
                         255, np.uint8)
        canvas[y0: y0 + target_height] = team_images[0]
        canvas[y0 + target_height + gap: y0 + target_height * 2 + gap] = \
            team_images[1]
        n0, n1 = len(self.example_crops[0]), len(self.example_crops[1])
        cv2.putText(canvas, f"Team 0 (White/Away) - {n0} examples", (10, 20),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 0, 0), 2)
        cv2.putText(canvas, f"Team 1 (Colored/Home) - {n1} examples",
                    (10, y0 + target_height + gap - 10),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, (0, 0, 0), 2)
        return canvas

    def initialize_from_user_selection(self, frame, detections) -> bool:
        """OpenCV click-UI path (reference :54-132). detections is
        (boxes, tracker_ids) or an object with .xyxy. Requires a display;
        returns False when unavailable or cancelled."""
        from ..ui.team_selector import pick_team_examples

        boxes = detections[0] if isinstance(detections, tuple) else detections.xyxy
        picked = pick_team_examples(frame, np.asarray(boxes))
        if picked is None:
            return False
        t0, t1 = picked
        crops0 = [frame[int(b[1]):int(b[3]), int(b[0]):int(b[2])] for b in t0]
        crops1 = [frame[int(b[1]):int(b[3]), int(b[0]):int(b[2])] for b in t1]
        return self.initialize_from_examples(crops0, crops1)

    # ------------------------------------------------------------------
    def predict(self, crops, tracker_ids: Optional[np.ndarray] = None) -> np.ndarray:
        if len(self.examples) < 2:
            raise ValueError("Must initialize with user selection first!")
        if not len(crops):
            return np.array([])
        feats = np.asarray(interactive_features(to_device_batch(crops)))
        sims = {t: similarity_matrix(feats, ex).max(axis=1)
                for t, ex in self.examples.items()}
        sim_mat = np.stack([sims[0], sims[1]], axis=1)
        teams = np.argmax(sim_mat, axis=1)
        confs = sim_mat[np.arange(len(teams)), teams]

        if tracker_ids is not None:
            for i, tid in enumerate(tracker_ids[: len(teams)]):
                if tid is None:
                    continue
                tid = int(tid)
                h = self.player_history[tid]
                h.append(int(teams[i]))
                del h[: -self.history_window]
                if len(h) >= 5 and confs[i] < self.confidence_threshold:
                    counts = np.bincount(h)
                    teams[i] = int(np.argmax(counts))
        return teams.astype(np.int64)
