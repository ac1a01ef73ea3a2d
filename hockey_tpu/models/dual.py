"""Dual-model megastep: player detection + rink keypoints in ONE program.

When `--rink-keypoints` / `--show-2d-map` is on, the reference runs two
sequential model calls per frame (hockey/main.py:262 + :296). Here both
forwards share one jitted program over the same letterboxed batch — one
host<->device round trip per frame batch for the entire device side of the
full pipeline (player boxes + team features + 56 rink keypoints).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..ops.letterbox import (
    letterbox_batch,
    letterbox_params,
    letterbox_rect_batch,
    rect_shape,
)
from ..ops.nms import nms
from .detector import _unmap_boxes
from .layers import fuse_for_inference
from .yolov8 import (
    MODEL_ZOO,
    decode_boxes,
    decode_keypoints,
    forward_raw,
    init_params,
)


def build_dual_fn(
    player_cfg,
    rink_cfg,
    *,
    imgsz: int,
    frame_hw: Tuple[int, int],
    conf: float,
    iou: float = 0.45,
    containment: float = 0.0,
    pre_topk: int = 256,
    max_det: int = 64,
    with_team_features: bool = True,
    rink_imgsz: int = 512,
    dtype=jnp.bfloat16,
):
    """jit(player_params, rink_params, frames_u8) ->
    (Detections, team_feats (B, max_det, 4), rink_kpts (B, 56, 3)).

    The rink branch letterboxes to its own `rink_imgsz` (the shipped pose
    checkpoint's training resolution; keypoint accuracy does not survive
    running it at the player model's 1280 — measured PCK 0.99 vs 0.08)."""
    h, w = frame_hw
    in_hw = rect_shape(h, w, imgsz)
    use_pallas = jax.default_backend() not in ("cpu",)

    @jax.jit
    def dual(player_params: Dict, rink_params: Dict, frames: jnp.ndarray):
        x = letterbox_rect_batch(frames, imgsz, 32, dtype)

        # --- player branch
        raw = forward_raw(player_params, x, player_cfg)
        boxes, scores = decode_boxes(raw, player_cfg, in_hw)
        max_scores = jnp.max(scores, axis=-1)
        classes = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        det = jax.vmap(lambda b, s, c: nms(
            b, s, c, score_threshold=conf, iou_threshold=iou,
            containment_threshold=containment,
            pre_topk=pre_topk, max_det=max_det, pallas=use_pallas,
        ))(boxes, max_scores, classes)
        det = det._replace(boxes=_unmap_boxes(det.boxes, h, w, imgsz, True))

        team_feats = None
        if with_team_features:
            # same implementation as the fused detect path
            # (detector.py): crops from a 4x-downscaled frame via
            # interpolation matmuls (MXU). The previous full-resolution
            # f32 gather was the dual program's hot spot — color
            # statistics don't need 1080p crops (round-5 dual_fps fix).
            from ..ops.crop_resize import crop_and_resize_mm
            from ..ops.letterbox import resize_batch
            from ..teams.base import CROP_H, CROP_W
            from ..teams.features import color_prior_masks, segmentation_features

            ds = 4
            small = resize_batch(frames, (h // ds, w // ds), jnp.float32)

            def feats_one(frame_small, bx):
                crops = crop_and_resize_mm(frame_small, bx / ds,
                                           (CROP_H, CROP_W))
                return segmentation_features(crops, color_prior_masks(crops))

            # lax.map over frames keeps crop buffers at 1/B peak memory
            team_feats = jax.lax.map(
                lambda fb: feats_one(fb[0], fb[1]), (small, det.boxes))

        # --- rink branch (best pose instance's keypoints), at its own
        # training resolution
        xr = letterbox_batch(frames, rink_imgsz, dtype=dtype)
        rink_hw = (rink_imgsz, rink_imgsz)
        rraw = forward_raw(rink_params, xr, rink_cfg)
        _, rscores = decode_boxes(rraw, rink_cfg, rink_hw)
        kpts = decode_keypoints(rraw, rink_cfg, rink_hw)
        best = jnp.argmax(jnp.max(rscores, axis=-1), axis=1)
        k = jnp.take_along_axis(kpts, best[:, None, None, None], axis=1)[:, 0]
        r, _, _, pt, pl = letterbox_params(h, w, rink_imgsz)
        xy = (k[..., :2] - jnp.asarray([pl, pt], jnp.float32)) / r
        k = jnp.concatenate([xy, k[..., 2:]], axis=-1)
        return det, team_feats, k

    return dual


class DualDetector:
    """Shared megastep for player + rink models (drop-in for the player
    Detector's detect_batch contract, plus keypoints)."""

    def __init__(self, config: Optional[Config] = None,
                 frame_hw: Tuple[int, int] = (1080, 1920),
                 checkpoint: Optional[str] = None,
                 rink_checkpoint: Optional[str] = None,
                 with_team_features: bool = True,
                 seed: int = 0):
        from .checkpoint import load_params

        self.config = config or Config()
        self.player_cfg = MODEL_ZOO[self.config.player_model_name]
        self.rink_cfg = MODEL_ZOO[self.config.hockey_model_name]
        self.with_team_features = with_team_features
        from .checkpoint import shipped_weights_path

        def resolve(ckpt, name, cfg, seed_):
            ckpt = ckpt or shipped_weights_path(name)
            return load_params(ckpt) if ckpt else init_params(cfg, seed_)

        self.player_params = fuse_for_inference(resolve(
            checkpoint, self.config.player_model_name, self.player_cfg, seed))
        self.rink_params = fuse_for_inference(resolve(
            rink_checkpoint, self.config.hockey_model_name, self.rink_cfg,
            seed + 1))
        self._fn = build_dual_fn(
            self.player_cfg, self.rink_cfg,
            imgsz=self.config.detection_imgsz, frame_hw=frame_hw,
            rink_imgsz=self.config.rink_imgsz,
            conf=self.config.detection_confidence,
            iou=self.config.nms_iou_threshold,
            containment=self.config.nms_containment_threshold,
            pre_topk=self.config.nms_pre_topk,
            max_det=self.config.max_detections,
            with_team_features=with_team_features,
        )
        self.last_keypoints: Optional[np.ndarray] = None

    def detect_batch(self, frames: np.ndarray):
        det, feats, kpts = self._fn(self.player_params, self.rink_params,
                                    jnp.asarray(frames))
        self.last_keypoints = np.asarray(kpts)
        if self.with_team_features:
            return det, feats
        return det

    def detect(self, frame: np.ndarray):
        from ..ops.nms import Detections
        from .detector import HostDetections

        out = self.detect_batch(frame[None])
        # Detections is itself a NamedTuple (hence a tuple): check the
        # concrete type, not tuple-ness (same pitfall as Detector.detect)
        det = out[0] if not isinstance(out, Detections) else out
        return HostDetections.from_padded(det, 0)
