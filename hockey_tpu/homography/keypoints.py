"""Rink keypoint detection (56-point YOLO pose head).

Behavioral parity with reference rink_keypoint_detector.py:9-212:
- RinkKeypoint dataclass {id, name, position, confidence};
- zone grouping left 0-19 / center 20-35 / right 36-55, names
  "{zone}_kpt_{i}";
- detect_keypoints: best pose instance's (56, 3) keypoints, confidence
  filtered;
- visualize_keypoints: gradient circles, zone colors, "id:conf" labels.

Divergence (COMPAT.md): get_rink_homography in the reference is a
placeholder that always returns None (:189-212); ours computes a real
RANSAC homography via homography/ransac.py using the documented stable
keypoint subset (README.md:76-81).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import cv2
import numpy as np

from ..core.config import Config


@dataclasses.dataclass
class RinkKeypoint:
    id: int
    name: str
    position: Tuple[float, float]
    confidence: float


KEYPOINT_GROUPS = {
    "left_zone": list(range(0, 20)),
    "center_zone": list(range(20, 36)),
    "right_zone": list(range(36, 56)),
}

_ZONE_COLORS = {
    "left": (0, 255, 0),
    "center": (255, 191, 0),
    "right": (71, 99, 255),
    "unknown": (255, 255, 255),
}


def zone_of(idx: int) -> str:
    for name, ids in KEYPOINT_GROUPS.items():
        if idx in ids:
            return name
    return "unknown"


def keypoints_from_array(kpts: np.ndarray,
                         conf_threshold: float = 0.5) -> List[RinkKeypoint]:
    """(56, 3) raw keypoints (e.g. a dual-megastep row) -> filtered
    RinkKeypoint list (same semantics as detect_keypoints)."""
    out = []
    for i, (x, y, c) in enumerate(np.asarray(kpts)):
        if c < conf_threshold:
            continue
        z = zone_of(i)
        out.append(RinkKeypoint(i, f"{z}_kpt_{i}", (float(x), float(y)), float(c)))
    return out


class RinkKeypointDetector:
    """Wraps the pose-model megastep; one device call per frame batch."""

    def __init__(self, model_name: str = "hockey-detection",
                 config: Optional[Config] = None,
                 frame_hw: Tuple[int, int] = (1080, 1920),
                 checkpoint: Optional[str] = None):
        from ..models.detector import Detector

        self.config = config or Config()
        self.detector = Detector(
            model_name, self.config, frame_hw=frame_hw, checkpoint=checkpoint,
            imgsz=self.config.rink_imgsz,
        )

    def detect_keypoints(self, frame: np.ndarray,
                         conf_threshold: float = 0.5) -> List[RinkKeypoint]:
        """Single frame -> confidence-filtered keypoints of the best rink
        instance (reference takes results[0].keypoints.data[0])."""
        _, kpts = self.detector.detect_batch(frame[None])
        kpts = np.asarray(kpts[0])  # (56, 3): x, y, conf
        out = []
        for i, (x, y, c) in enumerate(kpts):
            if c < conf_threshold:
                continue
            z = zone_of(i)
            out.append(RinkKeypoint(i, f"{z}_kpt_{i}", (float(x), float(y)), float(c)))
        return out

    def detect_keypoints_batch(self, frames: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) -> (B, 56, 3) raw keypoints (device batch path)."""
        _, kpts = self.detector.detect_batch(frames)
        return np.asarray(kpts)

    # ------------------------------------------------------------------
    @staticmethod
    def visualize_keypoints(frame: np.ndarray, keypoints: List[RinkKeypoint],
                            radius: int = 8, show_labels: bool = True) -> np.ndarray:
        annotated = frame.copy()
        for kp in keypoints:
            x, y = int(kp.position[0]), int(kp.position[1])
            color = _ZONE_COLORS.get(kp.name.split("_")[0], _ZONE_COLORS["unknown"])
            for r in range(radius + 4, 0, -1):
                alpha = 1.0 - r / (radius + 4)
                cv2.circle(annotated, (x, y), r, tuple(int(c * alpha) for c in color), -1)
            cv2.circle(annotated, (x, y), radius, color, -1)
            cv2.circle(annotated, (x, y), radius, (255, 255, 255), 2)
            if show_labels:
                label = f"{kp.id}:{kp.confidence:.2f}"
                (tw, th), _ = cv2.getTextSize(label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1)
                cv2.rectangle(annotated, (x - tw // 2 - 2, y - radius - th - 4),
                              (x + tw // 2 + 2, y - radius - 2), (0, 0, 0), -1)
                cv2.putText(annotated, label, (x - tw // 2, y - radius - 4),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (255, 255, 255), 1)
        return annotated

    def get_rink_homography(self, keypoints: List[RinkKeypoint]) -> Optional[np.ndarray]:
        """Frame -> overhead rink homography (real implementation; the
        reference's is a stub returning None)."""
        from .ransac import homography_from_keypoints

        return homography_from_keypoints(keypoints)
