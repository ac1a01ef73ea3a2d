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
        # frames smaller than the configured tile: shrink the tile to fit
        # (dynamic_slice would otherwise read out of bounds)
        self.size = min(config.puck_slice_size, self.h, self.w)
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
        self._merge_fn = self._build_merge_fn()

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

    def _build_merge_fn(self):
        """Jitted cross-tile merge for a batch of frames: tile->frame
        coordinate shift + per-frame class-agnostic NMS, all on device."""
        T = len(self.grid)
        offs = self._offsets
        conf = self.config.puck_confidence

        @jax.jit
        def merge(boxes, scores, classes, valid):
            k = boxes.shape[0] // T
            d = boxes.shape[1]
            b = (boxes.reshape(k, T, d, 4)
                 + offs[None, :, None, :]).reshape(k, T * d, 4)
            sc = jnp.where(valid, scores, -1.0).reshape(k, T * d)
            cl = classes.reshape(k, T * d)
            from ..ops.nms import nms_batch

            return nms_batch(b, sc, cl, score_threshold=conf,
                             iou_threshold=0.5,
                             pre_topk=min(64, T * d), max_det=4)

        return merge

    def detect_frames(self, frames: np.ndarray):
        """(K, H, W, 3) -> per-frame (boxes (K, 4, 4), scores (K, 4),
        valid (K, 4)) after cross-tile NMS. TWO device programs for the
        WHOLE frame batch (K x T tiles through one forward + one fused
        merge), the temporal analogue of the player path's frame batching
        (pipeline.py batched megastep)."""
        k = frames.shape[0]
        tiles = jax.vmap(self._slice_fn)(jnp.asarray(frames))
        det = self.detector.detect_batch(
            tiles.reshape(k * len(self.grid), self.size, self.size, 3))
        merged = self._merge_fn(det.boxes, det.scores, det.classes,
                                det.valid)
        return (np.asarray(merged.boxes), np.asarray(merged.scores),
                np.asarray(merged.valid))

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
        self._vel = np.zeros(2, np.float32)   # px/frame, EMA-smoothed
        self._last: Optional[np.ndarray] = None

    def update(self, center: Optional[Tuple[float, float]]) -> Optional[Tuple[float, float]]:
        """Feed this frame's puck center (or None). Returns the smoothed
        position. Short gaps extrapolate at the (damped) estimated
        velocity — a pass travels many px/frame, so holding the last
        position through occlusion would park the trajectory far behind
        the puck's reappearance point."""
        if center is None:
            self.misses += 1
            if self.misses > self.max_gap:
                self.history.clear()
                self._last = None
                self._vel = np.zeros(2, np.float32)
                return None
            if self._last is not None:
                self._last = self._last + self._vel
                self._vel = self._vel * 0.92
                self.trail.append((float(self._last[0]),
                                   float(self._last[1])))
                return (float(self._last[0]), float(self._last[1]))
            return None
        self.misses = 0
        self.history.append(np.asarray(center, np.float32))
        sm = self.smoothed()
        if sm is not None:
            smv = np.asarray(sm, np.float32)
            if self._last is not None:
                self._vel = 0.35 * self._vel + 0.65 * (smv - self._last)
            self._last = smv
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
        self.last_center = None      # smoothed tracker position
        self.last_detection = None   # this frame's raw best detection

    def process_frame(self, frame: np.ndarray) -> np.ndarray:
        boxes, scores = self.sliced.detect(frame)
        return self._annotate(frame, boxes, scores)

    def process_batch(self, frames: np.ndarray, n: Optional[int] = None
                      ) -> List[np.ndarray]:
        """(K, H, W, 3) frames through the cross-frame tiled megastep
        (slicing + forward + merge batched over K x T tiles), then the
        sequential host stages (tracker update, trail drawing) per frame.
        `n` limits output to the first n frames (tail batch padding)."""
        boxes, scores, valid = self.sliced.detect_frames(frames)
        out = []
        for i in range(len(frames) if n is None else n):
            v = valid[i]
            out.append(self._annotate(frames[i], boxes[i][v], scores[i][v]))
        return out

    def _annotate(self, frame: np.ndarray, boxes: np.ndarray,
                  scores: np.ndarray) -> np.ndarray:
        center = None
        if len(boxes):
            b = boxes[int(np.argmax(scores))]
            center = ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)
        self.last_center = self.tracker.update(center)
        self.last_detection = center
        out = frame.copy()
        if len(boxes):
            b = boxes[int(np.argmax(scores))].astype(int)
            cv2.rectangle(out, (b[0], b[1]), (b[2], b[3]), (0, 215, 255), 2)
        return self.tracker.draw_trail(out)
