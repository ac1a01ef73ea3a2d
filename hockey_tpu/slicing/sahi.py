"""SAHI-style sliced puck detection as ONE batched device call.

No reference code exists (`common/puck.py` is documented in README.md:44 /
CLAUDE.md:42,55 but absent from the snapshot — SURVEY.md §0); spec, from
the docs: the puck model runs on overlapping slices of the frame for
small-object accuracy, detections are merged, and a PuckTracker keeps a
detection history with trajectory smoothing and a fading trail.

TPU-native design: the slice grid is static for a fixed frame size, so all
slices become one (T, S, S, 3) batch through one jitted forward + NMS —
"N crops = one batched device call" (BASELINE.json north star) instead of
N sequential model calls.
"""

from __future__ import annotations

from collections import deque
from typing import List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..models.detector import Detector
from ..ops.nms import nms


def slice_grid(h: int, w: int, size: int, overlap: float) -> List[Tuple[int, int]]:
    """Static top-left offsets of overlapping size x size tiles covering
    (h, w). Stride = size * (1 - overlap); last tile is clamped flush."""
    stride = max(int(size * (1.0 - overlap)), 1)

    def starts(total):
        if total <= size:
            return [0]
        s = list(range(0, total - size, stride))
        s.append(total - size)
        return s

    return [(y, x) for y in starts(h) for x in starts(w)]


class SlicedDetector:
    """Batched tiled inference for one small-object model."""

    def __init__(self, config: Config, frame_hw: Tuple[int, int],
                 checkpoint: Optional[str] = None, seed: int = 0):
        self.config = config
        self.h, self.w = frame_hw
        self.size = config.puck_slice_size
        self.grid = slice_grid(self.h, self.w, self.size, config.puck_slice_overlap)
        self.detector = Detector(
            config.puck_model_name, config,
            frame_hw=(self.size, self.size), imgsz=self.size,
            conf=config.puck_confidence, checkpoint=checkpoint,
            max_det=8, seed=seed,
        )
        offs = np.asarray([(x, y, x, y) for (y, x) in self.grid], np.float32)
        self._offsets = jnp.asarray(offs)  # (T, 4) xyxy offsets
        self._slice_fn = self._build_slice_fn()

    def _build_slice_fn(self):
        grid = jnp.asarray([(y, x) for (y, x) in self.grid], jnp.int32)
        size = self.size

        @jax.jit
        def slice_frame(frame):
            def one(off):
                return jax.lax.dynamic_slice(frame, (off[0], off[1], 0),
                                             (size, size, 3))
            return jax.vmap(one)(grid)

        return slice_frame

    def detect(self, frame: np.ndarray):
        """(H, W, 3) -> (boxes (n,4), scores (n,)) in frame coords after
        cross-tile NMS. One device call for all tiles."""
        tiles = self._slice_fn(jnp.asarray(frame))        # (T, S, S, 3)
        det = self.detector.detect_batch(np.asarray(tiles))
        boxes = det.boxes + self._offsets[:, None, :]      # to frame coords
        flat_boxes = boxes.reshape(-1, 4)
        flat_scores = jnp.where(det.valid, det.scores, -1.0).reshape(-1)
        flat_classes = det.classes.reshape(-1)
        merged = nms(
            flat_boxes, flat_scores, flat_classes,
            score_threshold=self.config.puck_confidence,
            iou_threshold=0.5,
            pre_topk=min(64, flat_scores.shape[0]), max_det=4,
        )
        valid = np.asarray(merged.valid)
        return np.asarray(merged.boxes)[valid], np.asarray(merged.scores)[valid]


class PuckTracker:
    """Detection history + trajectory smoothing + fading trail
    (documented spec: README.md:44 'PuckTracker class maintains detection
    history for trajectory smoothing')."""

    def __init__(self, trail_length: int = 30, smooth_window: int = 5,
                 max_gap: int = 15):
        self.trail: deque = deque(maxlen=trail_length)
        self.history: deque = deque(maxlen=smooth_window)
        self.max_gap = max_gap
        self.misses = 0

    def update(self, center: Optional[Tuple[float, float]]) -> Optional[Tuple[float, float]]:
        """Feed this frame's puck center (or None). Returns the smoothed
        position, carrying through short gaps by holding the trajectory."""
        if center is None:
            self.misses += 1
            if self.misses > self.max_gap:
                self.history.clear()
                return None
            return self.smoothed()
        self.misses = 0
        self.history.append(np.asarray(center, np.float32))
        sm = self.smoothed()
        if sm is not None:
            self.trail.append(sm)
        return sm

    def smoothed(self) -> Optional[Tuple[float, float]]:
        if not self.history:
            return None
        w = np.arange(1, len(self.history) + 1, dtype=np.float32)
        pts = np.stack(list(self.history))
        p = (pts * w[:, None]).sum(0) / w.sum()
        return (float(p[0]), float(p[1]))

    def draw_trail(self, frame: np.ndarray,
                   color: Tuple[int, int, int] = (0, 215, 255)) -> np.ndarray:
        pts = list(self.trail)
        for i in range(1, len(pts)):
            alpha = i / len(pts)
            c = tuple(int(v * alpha) for v in color)
            cv2.line(frame, (int(pts[i - 1][0]), int(pts[i - 1][1])),
                     (int(pts[i][0]), int(pts[i][1])), c, 2)
        if pts:
            cv2.circle(frame, (int(pts[-1][0]), int(pts[-1][1])), 6, color, -1)
        return frame


class PuckPipeline:
    """PUCK_DETECTION mode: sliced detect + PuckTracker + trail overlay."""

    def __init__(self, config: Config, frame_hw: Tuple[int, int] = (1080, 1920),
                 checkpoint: Optional[str] = None):
        self.config = config
        self.sliced = SlicedDetector(config, frame_hw, checkpoint=checkpoint)
        self.tracker = PuckTracker(trail_length=config.puck_trail_length)

    def process_frame(self, frame: np.ndarray) -> np.ndarray:
        boxes, scores = self.sliced.detect(frame)
        center = None
        if len(boxes):
            b = boxes[int(np.argmax(scores))]
            center = ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)
        self.tracker.update(center)
        out = frame.copy()
        if len(boxes):
            b = boxes[int(np.argmax(scores))].astype(int)
            cv2.rectangle(out, (b[0], b[1]), (b[2], b[3]), (0, 215, 255), 2)
        return self.tracker.draw_trail(out)
