"""Multi-clip batch processing.

No reference counterpart (the reference is one-clip sequential); this is
the TPU-native throughput mode called out in the north-star spec
("multi-clip batch"): K clips are processed concurrently with their
per-frame detections computed by ONE device megastep over a (K, H, W, 3)
batch — the batch dimension is the clip dimension, so a single chip's MXU
utilization stays high even at frame_batch=1 per clip. Tracking, team
classification, and annotation stay per-clip (ordered host state).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .core.config import (
    GOALKEEPER_CLASS_ID,
    PLAYER_CLASS_ID,
    Config,
    ProcessingMode,
)
from .models.detector import Detector, HostDetections
from .pipeline import VideoProcessor
from .video.io import VideoInfo, VideoSink, frame_generator


class MultiClipProcessor:
    def __init__(
        self,
        sources: Sequence[str],
        config: Optional[Config] = None,
        mode: ProcessingMode = ProcessingMode.PLAYER_TRACKING,
        team_names: Optional[Tuple[str, str]] = None,
        checkpoint: Optional[str] = None,
        player_detector=None,
        seed: int = 0,
    ):
        if not sources:
            raise ValueError("need at least one source clip")
        self.sources = list(sources)
        self.config = config or Config()
        self.mode = ProcessingMode(mode)
        infos = [VideoInfo.from_video_path(s) for s in self.sources]
        hw = {(i.height, i.width) for i in infos}
        if len(hw) != 1:
            raise ValueError(f"all clips must share a resolution, got {hw}")
        self.frame_hw = next(iter(hw))
        self.infos = infos

        # ONE shared detector (one compiled megastep, one param set)
        self.detector = player_detector or Detector(
            self.config.player_model_name, self.config,
            frame_hw=self.frame_hw, checkpoint=checkpoint, seed=seed,
        )
        # per-clip host pipelines sharing the detector
        self.processors: List[VideoProcessor] = [
            VideoProcessor(
                config=self.config, mode=self.mode, frame_hw=self.frame_hw,
                team_names=team_names, player_detector=self.detector,
            )
            for _ in self.sources
        ]

    def run(self, targets: Optional[Sequence[Optional[str]]] = None,
            limit_frames: Optional[int] = None) -> List[int]:
        """Process all clips in lockstep; returns frames written per clip."""
        targets = targets or [None] * len(self.sources)
        if self.mode == ProcessingMode.TEAM_CLASSIFICATION:
            # per-clip one-time classifier fit, like single-clip mode
            # (without this, every clip would silently predict unfitted)
            for src, p in zip(self.sources, self.processors):
                p.initialize_team_classifier(src)
        gens = [frame_generator(s) for s in self.sources]
        sinks = [
            VideoSink(t, info).__enter__() if t else None
            for t, info in zip(targets, self.infos)
        ]
        counts = [0] * len(self.sources)
        live = [True] * len(self.sources)
        # seed with zeros so a clip that dies before yielding a single
        # frame can't leave a None hole in the stacked device batch
        h, w = self.frame_hw
        frames: List[np.ndarray] = [
            np.zeros((h, w, 3), np.uint8) for _ in self.sources]
        try:
            while any(live):
                if limit_frames is not None and all(
                        c >= limit_frames or not l
                        for c, l in zip(counts, live)):
                    break
                for i, g in enumerate(gens):
                    if not live[i]:
                        continue
                    nxt = next(g, None)
                    if nxt is None:
                        live[i] = False
                    else:
                        frames[i] = nxt
                if not any(live):
                    break
                # one device call for the whole clip batch; dead clips
                # repeat their last frame to keep shapes static
                batch = np.stack([f for f in frames])
                det = self.detector.detect_batch(batch)
                for i, p in enumerate(self.processors):
                    if not live[i]:
                        continue
                    if limit_frames is not None and counts[i] >= limit_frames:
                        continue
                    d = HostDetections.from_padded(det, i)
                    keep = ((d.classes == PLAYER_CLASS_ID)
                            | (d.classes == GOALKEEPER_CLASS_ID))
                    keep &= d.scores > self.config.detection_confidence
                    out = p.process_frame(
                        frames[i],
                        HostDetections(d.boxes[keep], d.scores[keep],
                                       d.classes[keep]),
                    )
                    if sinks[i] is not None:
                        sinks[i].write_frame(out)
                    counts[i] += 1
        finally:
            for s in sinks:
                if s is not None:
                    s.__exit__()
        return counts
