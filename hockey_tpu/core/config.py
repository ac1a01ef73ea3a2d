"""Typed configuration for the pipeline.

Defaults mirror the reference `Config` dataclass (hockey/main.py:20-59) so a
reference user gets identical behavior out of the box; TPU-specific knobs
(batch size, dtype, padded capacities) are new and have no reference
counterpart.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class ProcessingMode(str, enum.Enum):
    """CLI processing modes (reference README.md:134-139; absent from the
    reference snapshot's main.py, rebuilt from the documented spec)."""

    PLAYER_DETECTION = "PLAYER_DETECTION"
    PUCK_DETECTION = "PUCK_DETECTION"
    PLAYER_TRACKING = "PLAYER_TRACKING"
    TEAM_CLASSIFICATION = "TEAM_CLASSIFICATION"


# Class ids (reference hockey/main.py:357-359).
PLAYER_CLASS_ID = 0
GOALKEEPER_CLASS_ID = 1
# Team id assigned to goalies (reference hockey/main.py:284).
GOALIE_TEAM_ID = 2


@dataclasses.dataclass
class Config:
    """Pipeline configuration.

    Reference-compatible fields keep the exact defaults of
    hockey/main.py:20-59.
    """

    # --- Model identifiers (reference main.py:24-25 uses .pt paths; we use
    # checkpoint directories / msgpack files produced by models.convert).
    player_model_name: str = "hockey-player-detection"
    hockey_model_name: str = "hockey-detection"
    puck_model_name: str = "hockey-puck-detection"

    # --- Detection (reference main.py:28-29).
    detection_imgsz: int = 1280
    # rink pose model inference resolution — its own knob because CNN
    # keypoint accuracy does not survive a large scale shift from the
    # checkpoint's training resolution (measured: PCK 0.99 at train-res
    # vs 0.08 when run at the player model's 1280). The shipped
    # checkpoint is the round-4 window-camera TPU retrain at 512
    # (rink_s_w_tpu: PCK 0.885, logs/val_rink_shipped.json).
    rink_imgsz: int = 512
    detection_confidence: float = 0.4

    # --- Tracking (reference main.py:32-36).
    track_activation_threshold: float = 0.25
    lost_track_buffer: int = 30
    # reference value is 0.8 (main.py:34); 0.95 (stage-1 IoU gate 0.05)
    # measured strictly better on both renderers under detection extent
    # jitter — in-dist id switches 52 -> 42, OOD generator-B 247 -> 80
    # (scripts/diag_track_b.py, COMPAT #28). The auction assignment is
    # jointly optimal, so the gate only rejects weak pairs; set 0.8 for
    # reference parity.
    minimum_matching_threshold: float = 0.95
    frame_rate: int = 30
    minimum_consecutive_frames: int = 2

    # --- Team classification sampling (reference main.py:39-41).
    initialization_stride: int = 10
    max_initialization_frames: int = 20
    min_players_for_selection: int = 6

    # --- Annotation smoothing (reference main.py:44-45).
    smoothing_factor: float = 0.3
    use_adaptive_smoothing: bool = True

    # --- Visualization (reference main.py:48-51,59).
    team_colors: Optional[List[str]] = None
    annotation_thickness: int = 2
    label_text_scale: float = 0.6
    label_text_thickness: int = 2
    # 'box' (reference default) | 'ellipse' (sv.EllipseAnnotator-style
    # ground ellipses) | 'styled' (rounded label chips)
    annotator_style: str = "box"

    # --- Rink keypoints (reference main.py:54-55).
    keypoint_confidence_threshold: float = 0.3
    keypoint_radius: int = 10

    # --- Puck detection via SAHI-style slicing (reference README.md:44,
    # CLAUDE.md:55 — documented spec only, no reference code).
    puck_slice_size: int = 640
    puck_slice_overlap: float = 0.2
    puck_confidence: float = 0.25
    puck_trail_length: int = 30
    # player-context demotion (round 4, default off): multiply the score
    # of puck candidates whose center lies inside a detected player box
    # ABOVE its bottom band by this factor (1.0/0 = off). Motivation: the
    # measured OOD failure is ~5.7 confident glove-mitt false fires per
    # image at mid-body height (logs/diag_puck_b.json) while a true puck
    # near a player sits at skate level — the bottom band is exempt so
    # stickhandling/possession detections survive. Costs one player
    # megastep per puck batch when enabled (slicing/sahi.py
    # demote_in_player_boxes).
    puck_player_demote: float = 0.0
    puck_demote_foot_band: float = 0.2  # bottom fraction of the player
    #   box exempt from demotion (skates/possession zone)

    # --- TPU-native knobs (new; no reference counterpart).
    frame_batch: int = 0               # frames per device step; 0 = auto
    #   (32 on an accelerator backend, 1 on CPU — the batched megastep is
    #   the default path on TPU, reference-sequential on host backends)
    max_detections: int = 64           # padded post-NMS capacity
    nms_pre_topk: int = 256            # candidates entering NMS
    nms_iou_threshold: float = 0.45    # ultralytics default
    # suppress partial-duplicate boxes (torso-inside-full-body) by
    # intersection-over-min-area; 0 = pure-IoU ultralytics contract.
    # Measured (COMPAT #26): OOD generator-B tracking precision
    # 0.776 -> 0.84+ with in-dist unchanged; dup pairs sit at IoU
    # 0.38-0.44 (under the gate) but IoMin ~0.68.
    nms_containment_threshold: float = 0.5
    # kill the younger of two same-class tracks overlapping at IoMin
    # above this (device tracker stage; 0 = stock ByteTrack, which only
    # dedups at IoU > 0.85). See tracking/device_tracker.py docstring.
    duplicate_kill_iomin: float = 0.55
    # kill a LOST younger track coasting inside a TRACKED older same-class
    # track at IoMin above this (0 = off). duplicate_kill_iomin only fires
    # when both tracks are TRACKED in the same frame; the measured OOD
    # failure mode is ALTERNATION (the detector flickers between torso and
    # full-body extents, each sustaining its own track — one tracked, one
    # lost each frame, the emitted id oscillating). Offline A/B on saved
    # detection dumps replaying the full shipped wiring (NMS containment
    # 0.5 + match gate 0.95 + duplicate_kill 0.55; scripts/
    # diag_track_b.py): generator-B switches 80 -> 23 with id_stability
    # 0.667 -> 0.778; in-dist switches 42 -> 2 with id_stability
    # 0.9 -> 1.0 (occlusion relinks were NOT harmed — unit-tested).
    lost_dup_kill_iomin: float = 0.55
    max_tracks: int = 128              # padded track-table capacity
    compute_dtype: str = "bfloat16"
    # on-device tracker (tracking/device_tracker.py): association runs as
    # XLA ops (auction solver, Hungarian semantics) fused into the
    # detection megastep via lax.scan. None = auto: on for accelerator
    # backends when the batched megastep is active, off on CPU (host
    # Hungarian ByteTrack remains the reference-sequential path)
    use_device_tracker: Optional[bool] = None

    def __post_init__(self) -> None:
        if self.team_colors is None:
            # Team1, Team2, Goalies (reference main.py:59).
            self.team_colors = ["#FF1493", "#00BFFF", "#FF6347"]

    def resolved_frame_batch(self) -> int:
        """frame_batch with 0 = auto: batch 128 on an accelerator (the
        measured v5e sweet spot — detect drops 6.6 -> 4.4 ms/frame vs
        batch 32, pushing pipeline compute past 100 fps at ~4s of video
        latency; set frame_batch explicitly for latency-sensitive runs),
        sequential on CPU."""
        if self.frame_batch > 0:
            return self.frame_batch
        import jax

        return 128 if jax.default_backend() not in ("cpu",) else 1


def hex_to_bgr(hex_color: str) -> Tuple[int, int, int]:
    """'#RRGGBB' -> (B, G, R) for OpenCV drawing."""
    h = hex_color.lstrip("#")
    r, g, b = int(h[0:2], 16), int(h[2:4], 16), int(h[4:6], 16)
    return (b, g, r)
