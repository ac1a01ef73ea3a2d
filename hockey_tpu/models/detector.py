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
from .layers import fuse_model
from .yolov8 import (
    MODEL_ZOO,
    YoloConfig,
    decode_boxes,
    decode_keypoints,
    forward_raw,
    init_params,
)


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


def build_detect_fn(
    cfg: YoloConfig,
    *,
    imgsz: int,
    frame_hw: Tuple[int, int],
    conf: float,
    iou: float = 0.45,
    pre_topk: int = 256,
    max_det: int = 64,
    dtype=jnp.bfloat16,
    with_keypoints: bool = False,
    with_team_features: bool = False,
    rect: bool = True,
):
    """Returns jit(params, frames_u8) -> Detections [+ keypoints].

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

    @jax.jit
    def detect(params: Dict, frames: jnp.ndarray):
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
                pre_topk=pre_topk, max_det=max_det, pallas=use_pallas,
            )

        det = jax.vmap(one)(boxes, max_scores, classes)
        det = det._replace(boxes=_unmap_boxes(det.boxes, h, w, imgsz, rect))

        if with_team_features:
            # fold the team classifier's per-detection features into the
            # same program: crop every padded detection slot from the
            # original frame, color-prior mask, 4-dim segmentation feature
            # (teams/features.py). TEAM_CLASSIFICATION becomes ONE device
            # call per frame batch.
            from ..teams.base import CROP_H, CROP_W
            from ..teams.features import color_prior_masks, segmentation_features
            from ..ops.crop_resize import crop_and_resize

            def feats_one(frame, bx):
                crops = crop_and_resize(frame.astype(jnp.float32), bx,
                                        (CROP_H, CROP_W))
                masks = color_prior_masks(crops)
                return segmentation_features(crops, masks)

            team_feats = jax.vmap(feats_one)(frames, det.boxes)
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

    return detect


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
                params = init_params(self.cfg, seed)
        if fuse:
            params = fuse_model(params)
        self.params = params
        self._fn = build_detect_fn(
            self.cfg,
            imgsz=self.imgsz,
            frame_hw=frame_hw,
            conf=self.conf,
            iou=self.config.nms_iou_threshold,
            pre_topk=self.config.nms_pre_topk,
            max_det=max_det or self.config.max_detections,
            with_keypoints=self.cfg.num_keypoints > 0,
            with_team_features=with_team_features,
        )
        self.with_team_features = with_team_features

    def detect_batch(self, frames: np.ndarray):
        """(B, H, W, 3) uint8 -> padded device Detections (+ keypoints)."""
        return self._fn(self.params, jnp.asarray(frames))

    def detect(self, frame: np.ndarray) -> HostDetections:
        """Single frame -> host-side unpadded detections."""
        out = self.detect_batch(frame[None])
        # pose models return (Detections, keypoints); Detections is itself a
        # NamedTuple, so check the concrete type, not tuple-ness
        det = out[0] if not isinstance(out, Detections) else out
        return HostDetections.from_padded(det, 0)
