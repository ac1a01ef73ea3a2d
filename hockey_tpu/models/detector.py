"""The detection megastep: one jitted XLA program per frame batch.

Reference equivalent: `VideoProcessor.detect_players` (hockey/main.py:
177-195), which does host letterbox -> torch forward -> torch NMS -> host
filtering per single frame. Here the whole chain — letterbox, YOLOv8
forward, DFL decode, NMS, coordinate un-mapping — is a single compiled
device program over a frame *batch*, so HBM round-trips happen exactly
twice (frames in, fixed-size detections out).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..ops.letterbox import (
    letterbox_batch,
    letterbox_params,
    letterbox_rect_batch,
    rect_letterbox_params,
    rect_shape,
)
from ..ops.nms import Detections, nms
from .layers import fuse_for_inference
from .yolov8 import (
    MODEL_ZOO,
    YoloConfig,
    decode_boxes,
    decode_keypoints,
    forward_raw,
    init_params,
)

# ByteTrack low-score floor (tracking/device_tracker.py stage-2 band is
# [BYTE_FLOOR, activation)); the fused tracking path floors its NMS here
BYTE_FLOOR = 0.1


class HostDetections(NamedTuple):
    """Numpy view of one frame's detections in original-frame coordinates."""

    boxes: np.ndarray    # (n, 4) xyxy float32
    scores: np.ndarray   # (n,)
    classes: np.ndarray  # (n,) int32

    def __len__(self) -> int:
        return len(self.boxes)

    @staticmethod
    def from_padded(det: Detections, i: int) -> "HostDetections":
        valid = np.asarray(det.valid[i])
        return HostDetections(
            boxes=np.asarray(det.boxes[i])[valid],
            scores=np.asarray(det.scores[i])[valid],
            classes=np.asarray(det.classes[i])[valid],
        )


def _unmap_boxes(boxes: jnp.ndarray, h: int, w: int, imgsz: int,
                 rect: bool) -> jnp.ndarray:
    if rect:
        r, _, _, pad_top, pad_left, _, _ = rect_letterbox_params(h, w, imgsz)
    else:
        r, _, _, pad_top, pad_left = letterbox_params(h, w, imgsz)
    pad = jnp.asarray([pad_left, pad_top, pad_left, pad_top], boxes.dtype)
    out = (boxes - pad) / r
    hi = jnp.asarray([w, h, w, h], out.dtype)
    return jnp.clip(out, 0.0, hi)


def _build_detect_core(
    cfg: YoloConfig,
    *,
    imgsz: int,
    frame_hw: Tuple[int, int],
    conf: float,
    iou: float = 0.45,
    containment: float = 0.0,
    pre_topk: int = 256,
    max_det: int = 64,
    dtype=jnp.bfloat16,
    with_keypoints: bool = False,
    with_team_features: bool = False,
    rect: bool = True,
):
    """Returns the traceable (params, frames_u8) -> Detections [+ keypoints]
    program body (un-jitted, so callers can compose it — see
    build_detect_track_fn).

    frames_u8: (B, H, W, 3) uint8 RGB/BGR (colorspace-agnostic; training and
    inference just need to agree). All outputs are in original (H, W) frame
    coordinates with fixed max_det capacity.

    `rect=True` (default) letterboxes to the minimal stride-32 rectangle —
    what ultralytics predict does — instead of an imgsz square; for 16:9
    video this cuts ~42% of the conv FLOPs with identical geometry.
    """
    h, w = frame_hw
    in_hw = rect_shape(h, w, imgsz) if rect else (imgsz, imgsz)
    # sequential NMS suppression runs as a Pallas VMEM kernel on TPU
    use_pallas = jax.default_backend() not in ("cpu",)

    def detect_core(params: Dict, frames: jnp.ndarray):
        if rect:
            x = letterbox_rect_batch(frames, imgsz, 32, dtype)
        else:
            x = letterbox_batch(frames, imgsz, dtype)
        raw = forward_raw(params, x, cfg)
        boxes, scores = decode_boxes(raw, cfg, in_hw)  # letterboxed coords
        max_scores = jnp.max(scores, axis=-1)
        classes = jnp.argmax(scores, axis=-1).astype(jnp.int32)

        def one(bx, sc, cl):
            return nms(
                bx, sc, cl,
                score_threshold=conf, iou_threshold=iou,
                containment_threshold=containment,
                pre_topk=pre_topk, max_det=max_det, pallas=use_pallas,
            )

        det = jax.vmap(one)(boxes, max_scores, classes)
        det = det._replace(boxes=_unmap_boxes(det.boxes, h, w, imgsz, rect))

        if with_team_features:
            # fold the team classifier's per-detection features into the
            # same program: crop every padded detection slot, color-prior
            # mask, 4-dim segmentation feature (teams/features.py).
            # TEAM_CLASSIFICATION becomes ONE device call per frame batch.
            # Crops come from a 4x-downscaled frame via interpolation
            # matmuls (MXU) — full-res gather crops cost ~9 ms/frame and
            # color statistics don't need full resolution.
            from ..teams.base import CROP_H, CROP_W
            from ..teams.features import color_prior_masks, segmentation_features
            from ..ops.crop_resize import crop_and_resize_mm
            from ..ops.letterbox import resize_batch

            ds = 4
            small = resize_batch(frames, (h // ds, w // ds), jnp.float32)

            def feats_one(frame_small, bx):
                crops = crop_and_resize_mm(frame_small, bx / ds,
                                           (CROP_H, CROP_W))
                masks = color_prior_masks(crops)
                return segmentation_features(crops, masks)

            # lax.map over frames keeps the (D, CROP_H, CROP_W, C) crop
            # buffers at 1/B peak memory; each step is ~0.1 ms of matmuls
            team_feats = jax.lax.map(
                lambda fb: feats_one(fb[0], fb[1]), (small, det.boxes))
            return det, team_feats

        if with_keypoints:
            kpts = decode_keypoints(raw, cfg, in_hw)  # (B, A, K, 3)
            # NMS indices are lost inside nms(); recover per-kept-box
            # keypoints by nearest-anchor match on box centers instead:
            # for the rink model there is one instance per frame, so take
            # the argmax-score anchor's keypoints.
            best = jnp.argmax(max_scores, axis=1)  # (B,)
            k = jnp.take_along_axis(
                kpts, best[:, None, None, None], axis=1
            )[:, 0]  # (B, K, 3)
            if rect:
                r, _, _, pt, pl, _, _ = rect_letterbox_params(h, w, imgsz)
            else:
                r, _, _, pt, pl = letterbox_params(h, w, imgsz)
            xy = (k[..., :2] - jnp.asarray([pl, pt], jnp.float32)) / r
            k = jnp.concatenate([xy, k[..., 2:]], axis=-1)
            return det, k
        return det

    return detect_core


def build_detect_fn(*args, **kwargs):
    """jit(params, frames_u8) -> Detections [+ keypoints / team feats].
    See _build_detect_core for the program contract."""
    return jax.jit(_build_detect_core(*args, **kwargs))


def build_detect_track_fn(
    cfg: YoloConfig,
    *,
    tracker_kwargs: Dict,
    allowed_classes: Tuple[int, ...] = (0, 1),
    **core_kwargs,
):
    """The fully fused megastep: detection + K frames of ByteTrack in ONE
    program — jit(params, frames_u8, TrackState) -> (Detections,
    team_feats | None, det_track_ids (B, D), new TrackState).

    The reference runs tracking on host per frame (hockey/main.py:262-268,
    sv.ByteTrack); round 1 of this repo still synced tracker arrays to
    host every frame. Here `lax.scan` threads the track table through the
    frame batch on device, so detections AND track ids leave the chip
    exactly once per K frames. Class/confidence gating (reference
    main.py:177-195: {player, goalkeeper}) is applied to `valid` before
    association, matching the host pipeline's pre-tracker filter.

    `packed` concatenates [boxes | score | class | track_id | feats...]
    into one (B, D, 7 or 11) f32 tensor so the host needs exactly ONE
    device->host materialization per batch (each separate np.asarray
    pays a full round-trip on remote-tunnel deployments)."""
    from ..tracking.device_tracker import tracker_scan

    with_team_features = core_kwargs.get("with_team_features", False)
    core = _build_detect_core(cfg, **core_kwargs)

    @jax.jit
    def detect_track(params: Dict, frames: jnp.ndarray, state):
        out = core(params, frames)
        det, feats = out if with_team_features else (out, None)
        cls_ok = jnp.zeros(det.classes.shape, bool)
        for c in allowed_classes:
            cls_ok = cls_ok | (det.classes == c)
        valid = det.valid & cls_ok
        state2, tids = tracker_scan(state, det.boxes, det.scores,
                                    det.classes, valid, **tracker_kwargs)
        cols = [det.boxes, det.scores[..., None],
                det.classes.astype(jnp.float32)[..., None],
                tids.astype(jnp.float32)[..., None]]
        if feats is not None:
            cols.append(feats.astype(jnp.float32))
        packed = jnp.concatenate(cols, axis=-1)
        return det, feats, tids, packed, state2

    return detect_track


class Detector:
    """Host-facing detector: owns params + the compiled megastep.

    Weights come from a converted/trained checkpoint when available;
    otherwise deterministic random init (this environment ships no
    reference .pt files — they are gitignored upstream, SURVEY.md §0).
    """

    def __init__(
        self,
        model_name: str,
        config: Optional[Config] = None,
        *,
        frame_hw: Tuple[int, int] = (1080, 1920),
        params: Optional[Dict] = None,
        checkpoint: Optional[str] = None,
        imgsz: Optional[int] = None,
        conf: Optional[float] = None,
        max_det: Optional[int] = None,
        fuse: bool = True,
        with_team_features: bool = False,
        seed: int = 0,
    ):
        self.config = config or Config()
        self.cfg = MODEL_ZOO[model_name]
        self.imgsz = imgsz or self.config.detection_imgsz
        self.conf = conf if conf is not None else self.config.detection_confidence
        self.frame_hw = frame_hw
        if params is None:
            if checkpoint:
                from .checkpoint import load_params
                params = load_params(checkpoint)
            else:
                from .checkpoint import load_params, shipped_weights_path

                shipped = shipped_weights_path(model_name)
                if shipped:  # trained default (synthetic-hard recipe)
                    params = load_params(shipped)
                else:
                    params = init_params(self.cfg, seed)
        if fuse:
            params = fuse_for_inference(params)
        self.params = params
        self.max_det = max_det or self.config.max_detections
        self._fn = build_detect_fn(
            self.cfg,
            imgsz=self.imgsz,
            frame_hw=frame_hw,
            conf=self.conf,
            iou=self.config.nms_iou_threshold,
            containment=self.config.nms_containment_threshold,
            pre_topk=self.config.nms_pre_topk,
            max_det=self.max_det,
            with_keypoints=self.cfg.num_keypoints > 0,
            with_team_features=with_team_features,
        )
        self.with_team_features = with_team_features
        self._fn_track = None  # built lazily (detect_track_batch)

    def detect_batch(self, frames: np.ndarray):
        """(B, H, W, 3) uint8 -> padded device Detections (+ keypoints)."""
        return self._fn(self.params, jnp.asarray(frames))

    def detect_track_batch(self, frames: np.ndarray, state):
        """Fused detection + tracking over a frame batch (ONE program):
        (B, H, W, 3) uint8 + TrackState -> (Detections, team_feats | None,
        det_track_ids (B, D), new TrackState). See build_detect_track_fn."""
        if self._fn_track is None:
            c = self.config
            # ByteTrack's second stage associates LOW-score detections
            # (0.1..track-start threshold) to existing tracks — that is
            # the algorithm's whole idea. The reference starves it by
            # filtering at detection_confidence BEFORE the tracker
            # (hockey/main.py:179-192: conf=0.4 at the model call and
            # again on detections), so a tracked player whose score dips
            # under 0.4 for a few frames fragments into a new id. Here
            # the fused path floors NMS at BYTE_FLOOR and keeps track
            # INITIATION at the reference's effective threshold
            # (max(activation, conf)): identical track starts, real
            # low-score continuation. OOD id stability is measured in
            # logs/e2e_quality_b.json (regenerated by scripts/
            # e2e_quality.py --generator b alongside the duplicate-
            # suppression knobs, COMPAT #26-28).
            self._fn_track = build_detect_track_fn(
                self.cfg,
                tracker_kwargs=dict(
                    activation_thresh=max(c.track_activation_threshold,
                                          self.conf),
                    match_thresh=c.minimum_matching_threshold,
                    max_time_lost=int(c.frame_rate / 30.0
                                      * c.lost_track_buffer),
                    min_consecutive=c.minimum_consecutive_frames,
                    duplicate_kill_iomin=c.duplicate_kill_iomin,
                    lost_dup_kill_iomin=c.lost_dup_kill_iomin,
                ),
                imgsz=self.imgsz,
                frame_hw=self.frame_hw,
                conf=min(self.conf, BYTE_FLOOR),
                iou=c.nms_iou_threshold,
                containment=c.nms_containment_threshold,
                pre_topk=c.nms_pre_topk,
                max_det=self.max_det,
                with_team_features=self.with_team_features,
            )
        return self._fn_track(self.params, jnp.asarray(frames), state)

    def detect(self, frame: np.ndarray) -> HostDetections:
        """Single frame -> host-side unpadded detections."""
        out = self.detect_batch(frame[None])
        # pose models return (Detections, keypoints); Detections is itself a
        # NamedTuple, so check the concrete type, not tuple-ness
        det = out[0] if not isinstance(out, Detections) else out
        return HostDetections.from_padded(det, 0)
