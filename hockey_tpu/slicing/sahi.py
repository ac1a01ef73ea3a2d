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

    # gating constants (px / px-per-frame units at frame resolution).
    # GATE_BASE and PEND_SNAP come from the round-5 operating-point sweep
    # with the shipped TPU-trained puck model (scripts/sweep_puck_gate.py,
    # logs/puck_gate_sweep[_b].json, gt-scaled hit radii): across the
    # {PEND_SNAP, GATE_BASE, COAST_FRAMES} grid replayed on one cached
    # detection pass, PEND_SNAP=2/GATE 28 dominates the old 3/42 in-dist
    # (recall 0.781 -> 0.813 at precision 1.0, MAE 1.96 -> 1.44 px) and
    # trades OOD precision 1.0 -> 0.83 for recall 0.567 -> 0.80
    # (generator B). PEND_SNAP=1 collapses OOD (precision 0.25) and is
    # rejected. Decision logged in COMPAT.md #31.
    GATE_BASE = 28.0    # lock gate radius around the predicted position
    GATE_VEL = 3.0      # gate growth per px/frame of estimated speed
    GATE_MISS = 6.0     # gate growth per coasted (missed) frame
    PEND_RADIUS = 48.0  # spatial consistency radius for pending evidence
    PEND_SNAP = 2       # consecutive consistent far fires to re-acquire
    PEND_MARGIN = 0.10  # score margin a far fire needs over the gated pick
    COAST_FRAMES = 5    # misses to keep EMITTING the extrapolated position
                        # (state persists to max_gap for re-acquisition, but
                        # a long-extrapolated guess is usually hundreds of px
                        # off on a bouncing puck — stop drawing it)

    def __init__(self, trail_length: int = 30, smooth_window: int = 5,
                 max_gap: int = 15):
        self.trail: deque = deque(maxlen=trail_length)
        self.history: deque = deque(maxlen=smooth_window)
        self._ts: deque = deque(maxlen=smooth_window)  # frame stamps
        self._t = 0
        self.max_gap = max_gap
        self.misses = 0
        self._vel = np.zeros(2, np.float32)   # px/frame, EMA-smoothed
        self._last: Optional[np.ndarray] = None
        self._pend: Optional[np.ndarray] = None  # candidate re-acquisition
        self._pend_n = 0

    def _note_pending(self, c: np.ndarray) -> bool:
        """Accumulate spatially-consistent off-track evidence. Returns True
        once PEND_SNAP consecutive consistent fires have been seen."""
        if (self._pend is not None
                and float(np.linalg.norm(c - self._pend)) <= self.PEND_RADIUS):
            self._pend = 0.5 * (self._pend + c)
            self._pend_n += 1
        else:
            self._pend = c.copy()
            self._pend_n = 1
        return self._pend_n >= self.PEND_SNAP

    def _clear_pending(self) -> None:
        self._pend = None
        self._pend_n = 0

    def _reacquire(self, c: np.ndarray) -> Optional[Tuple[float, float]]:
        """Drop the stale track state and restart the fit at c."""
        self.history.clear()
        self._ts.clear()
        self._vel = np.zeros(2, np.float32)
        self._last = None
        self.misses = 0
        self._clear_pending()
        return self.update((float(c[0]), float(c[1])))

    def ingest(self, boxes: np.ndarray, scores: np.ndarray
               ) -> Tuple[Optional[Tuple[float, float]], Optional[int]]:
        """Gated selection over this frame's detections, then update.

        The raw argmax detection is NOT trustworthy frame-to-frame: compact
        dark blobs attached to players (gloves, stick blades, skates) draw
        confident false fires, and a single one dragged the linear-fit
        trajectory by hundreds of px (e2e MAE 106 px at precision 0.86,
        logs/e2e_puck.json before this gate). A real puck's evidence is
        temporally coherent, a glove's is not, so:

        - while locked, only detections inside a velocity-scaled gate
          around the predicted position are eligible (best score-minus-
          distance utility wins);
        - off-gate fires (or fires while unlocked) only take over after
          PEND_SNAP consecutive spatially-consistent frames — one glove
          flash is ignored, a genuinely re-appearing puck re-acquires in
          PEND_SNAP frames.

        Returns (smoothed position, index of the selected detection or
        None if this frame contributed no accepted evidence).
        """
        boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
        scores = np.asarray(scores, np.float32).reshape(-1)
        if boxes.shape[0] == 0:
            return self.update(None), None
        cents = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                          (boxes[:, 1] + boxes[:, 3]) / 2], 1)

        if self._last is None:
            # cold acquisition: require PEND_SNAP-frame spatial consistency
            # before trusting anything (an unlucky first lock onto a glove
            # would then be defended by the gate itself)
            i = int(np.argmax(scores))
            if self._note_pending(cents[i]):
                return self._reacquire(cents[i]), i
            self.update(None)
            return None, None

        gate = (self.GATE_BASE
                + self.GATE_VEL * float(np.linalg.norm(self._vel))
                + self.GATE_MISS * self.misses)
        d = np.linalg.norm(cents - self._last, axis=1)
        in_gate = d <= gate
        if in_gate.any():
            util = np.where(in_gate, scores - 0.004 * d, -np.inf)
            i = int(np.argmax(util))
            # a much more confident fire far away: remember it — if it
            # persists it is the puck and the lock is on a distractor
            far = (~in_gate) & (scores > scores[i] + self.PEND_MARGIN)
            if far.any():
                j = int(np.argmax(np.where(far, scores, -np.inf)))
                if self._note_pending(cents[j]):
                    return self._reacquire(cents[j]), j
            else:
                self._clear_pending()
            return self.update((float(cents[i, 0]), float(cents[i, 1]))), i
        # nothing in the gate: coast, but track the best raw fire as
        # pending re-acquisition evidence
        j = int(np.argmax(scores))
        if self._note_pending(cents[j]):
            return self._reacquire(cents[j]), j
        return self.update(None), None

    def update(self, center: Optional[Tuple[float, float]]) -> Optional[Tuple[float, float]]:
        """Feed this frame's puck center (or None). Returns the smoothed
        position. Short gaps extrapolate at the (damped) estimated
        velocity — a pass travels many px/frame, so holding the last
        position through occlusion would park the trajectory far behind
        the puck's reappearance point."""
        self._t += 1                 # frame clock (misses advance it too)
        if center is None:
            self.misses += 1
            if self.misses > self.max_gap:
                self.history.clear()
                self._ts.clear()
                self._last = None
                self._vel = np.zeros(2, np.float32)
                return None
            if self._last is not None:
                self._last = self._last + self._vel
                self._vel = self._vel * 0.92
                if self.misses > self.COAST_FRAMES:
                    return None  # state kept for gating, output suppressed
                self.trail.append((float(self._last[0]),
                                   float(self._last[1])))
                return (float(self._last[0]), float(self._last[1]))
            return None
        c = np.asarray(center, np.float32)
        if (self.misses > 2 and self._last is not None
                and float(np.linalg.norm(c - self._last)) > 32.0):
            # re-acquisition after an occlusion gap far from where the
            # extrapolation drifted: stale history would drag the smoothed
            # position for frames — snap to the new evidence instead
            self.history.clear()
            self._ts.clear()
            self._vel = np.zeros(2, np.float32)
        self.misses = 0
        self.history.append(c)
        self._ts.append(self._t)
        sm = self.smoothed()
        if sm is not None:
            smv = np.asarray(sm, np.float32)
            if self._last is not None:
                self._vel = 0.35 * self._vel + 0.65 * (smv - self._last)
            self._last = smv
            self.trail.append(sm)
        return sm

    def smoothed(self) -> Optional[Tuple[float, float]]:
        """Recency-weighted LINEAR FIT over the history window, evaluated
        at the newest sample's timestamp. A weighted running mean lags a
        moving puck by ~1.3 frames — 25-40 px on a pass, more than the
        whole match radius; the fit tracks constant-velocity motion with
        zero lag while still averaging detection noise."""
        n = len(self.history)
        if n == 0:
            return None
        pts = np.stack(list(self.history))
        if n < 3:
            p = pts[-1] if n == 1 else pts.mean(0) * 0.5 + pts[-1] * 0.5
            return (float(p[0]), float(p[1]))
        t = np.asarray(list(self._ts), np.float32)
        t = t - t[-1]                       # newest sample at t=0
        w = 1.0 / (1.0 + 0.35 * (-t))       # recency weighting
        sw = w.sum()
        tm = (w * t).sum() / sw
        den = (w * (t - tm) ** 2).sum()
        p = np.empty(2, np.float32)
        for d in range(2):
            ym = (w * pts[:, d]).sum() / sw
            b = ((w * (t - tm) * (pts[:, d] - ym)).sum() / den
                 if den > 1e-6 else 0.0)
            p[d] = ym + b * (0.0 - tm)       # evaluate at the newest frame
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


def demote_in_player_boxes(puck_boxes: np.ndarray, puck_scores: np.ndarray,
                           player_boxes: np.ndarray,
                           player_valid: np.ndarray,
                           factor: float, foot_band: float = 0.2
                           ) -> np.ndarray:
    """Multiply the score of puck candidates whose center lies inside a
    player box ABOVE its bottom `foot_band` fraction by `factor`.

    The measured OOD failure mode is confident glove-mitt false fires at
    mid-body height (~5.7/image, logs/diag_puck_b.json); a true puck near
    a player sits at skate level, so the bottom band is exempt. Host-side
    numpy on the already-transferred (K, D, 4) arrays — microseconds.
    """
    out = np.asarray(puck_scores).copy()
    for i in range(len(out)):
        pb = np.asarray(player_boxes[i])[np.asarray(player_valid[i])]
        if not len(pb):
            continue
        b = np.asarray(puck_boxes[i])
        c = (b[:, :2] + b[:, 2:]) / 2.0
        y_cut = pb[:, 3] - foot_band * (pb[:, 3] - pb[:, 1])
        inside = ((c[:, 0:1] >= pb[None, :, 0])
                  & (c[:, 0:1] <= pb[None, :, 2])
                  & (c[:, 1:2] >= pb[None, :, 1])
                  & (c[:, 1:2] <= y_cut[None, :]))
        out[i] = np.where(inside.any(axis=1), out[i] * factor, out[i])
    return out


class PuckPipeline:
    """PUCK_DETECTION mode: sliced detect + PuckTracker + trail overlay."""

    def __init__(self, config: Config, frame_hw: Tuple[int, int] = (1080, 1920),
                 checkpoint: Optional[str] = None):
        self.config = config
        self.sliced = SlicedDetector(config, frame_hw, checkpoint=checkpoint)
        self.tracker = PuckTracker(trail_length=config.puck_trail_length)
        self.last_center = None      # smoothed tracker position
        self.last_detection = None   # this frame's raw best detection
        # player-context demotion (config.puck_player_demote): one player
        # megastep per puck batch feeding demote_in_player_boxes
        self.player_detector = None
        if 0.0 < config.puck_player_demote < 1.0:
            from ..models.detector import Detector

            self.player_detector = Detector(
                config.player_model_name, config, frame_hw=frame_hw)

    def process_frame(self, frame: np.ndarray) -> np.ndarray:
        boxes, scores = self.sliced.detect(frame)
        if self.player_detector is not None:
            det = self.player_detector.detect(frame)
            scores = demote_in_player_boxes(
                boxes[None], scores[None], det.boxes[None],
                np.ones((1, len(det.boxes)), bool),
                self.config.puck_player_demote,
                self.config.puck_demote_foot_band)[0]
        return self._annotate(frame, boxes, scores)

    def process_batch(self, frames: np.ndarray, n: Optional[int] = None
                      ) -> List[np.ndarray]:
        """(K, H, W, 3) frames through the cross-frame tiled megastep
        (slicing + forward + merge batched over K x T tiles), then the
        sequential host stages (tracker update, trail drawing) per frame.
        `n` limits output to the first n frames (tail batch padding)."""
        boxes, scores, valid = self.detect_batch(frames)
        out = []
        for i in range(len(frames) if n is None else n):
            out.append(self.annotate_frame(frames[i], boxes, scores, valid, i))
        return out

    def detect_batch(self, frames: np.ndarray):
        """Device-only half of process_batch (the tiled megastep) so the
        pipeline can time detect separately from the host tracker/drawing
        stages, consistent with every other mode. With player-context
        demotion enabled this also runs the player megastep and demotes
        mid-body puck candidates (demote_in_player_boxes)."""
        boxes, scores, valid = self.sliced.detect_frames(frames)
        if self.player_detector is not None:
            det = self.player_detector.detect_batch(np.asarray(frames))
            scores = demote_in_player_boxes(
                boxes, scores, det.boxes, det.valid,
                self.config.puck_player_demote,
                self.config.puck_demote_foot_band)
        return boxes, scores, valid

    def annotate_frame(self, frame: np.ndarray, boxes, scores, valid,
                       i: int) -> np.ndarray:
        """Host half for frame `i`: tracker ingest + rectangle + trail."""
        v = valid[i]
        return self._annotate(frame, boxes[i][v], scores[i][v])

    def _annotate(self, frame: np.ndarray, boxes: np.ndarray,
                  scores: np.ndarray) -> np.ndarray:
        self.last_center, idx = self.tracker.ingest(boxes, scores)
        self.last_detection = None
        out = frame.copy()
        if idx is not None:
            b = boxes[idx]
            self.last_detection = ((b[0] + b[2]) / 2.0, (b[1] + b[3]) / 2.0)
            bi = b.astype(int)
            cv2.rectangle(out, (bi[0], bi[1]), (bi[2], bi[3]),
                          (0, 215, 255), 2)
        return self.tracker.draw_trail(out)
