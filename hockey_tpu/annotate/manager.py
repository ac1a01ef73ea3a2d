"""AnnotationManager: one object owning all annotators.

API parity with reference hockey/main.py:90-141: builds the palette-backed
box annotator wrapped in SmoothAnnotator plus the label annotator from a
Config, and exposes `annotate_frame(frame, detections..., labels,
color_lookup)`. (The reference's rink-keypoint branch there is a no-op
`pass`; keypoint drawing lives with the detector in both codebases.)
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..core.config import Config
from .draw import make_annotators
from .smooth import SmoothAnnotator


class AnnotationManager:
    def __init__(self, config: Optional[Config] = None):
        self.config = config or Config()
        box_annotator, self.label_annotator = make_annotators(self.config)
        self.box_annotator = SmoothAnnotator(
            box_annotator,
            smoothing_factor=self.config.smoothing_factor,
            use_adaptive=self.config.use_adaptive_smoothing,
        )

    def annotate_frame(
        self,
        frame: np.ndarray,
        boxes: np.ndarray,
        labels: Sequence[str],
        color_lookup: np.ndarray,
        tracker_ids: Optional[np.ndarray] = None,
        confidences: Optional[np.ndarray] = None,
        rink_keypoints: Optional[List] = None,
    ) -> np.ndarray:
        annotated = frame.copy()
        annotated = self.box_annotator.annotate(
            annotated, boxes, tracker_ids, confidences, color_lookup)
        annotated = self.label_annotator.annotate(
            annotated, boxes, labels, color_lookup)
        # rink keypoints draw via RinkKeypointDetector.visualize_keypoints
        # (the reference's branch here is `pass`, main.py:137-139)
        return annotated
