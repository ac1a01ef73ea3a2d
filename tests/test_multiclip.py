"""Multi-clip batch mode tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hockey_tpu.core.config import ProcessingMode
from hockey_tpu.multiclip import MultiClipProcessor
from hockey_tpu.ops.nms import Detections
from tests.test_pipeline import H, W, gt_detections, make_frame, small_config


class MultiStubDetector:
    """Stub whose batch rows are per-clip frames."""

    def __init__(self):
        self.calls = 0

    def detect_batch(self, frames):
        n = len(frames)
        max_det = 16
        boxes = np.zeros((n, max_det, 4), np.float32)
        scores = np.full((n, max_det), -1.0, np.float32)
        classes = np.full((n, max_det), -1, np.int32)
        valid = np.zeros((n, max_det), bool)
        for i in range(n):
            b, s, c = gt_detections(self.calls)
            boxes[i, : len(b)] = b
            scores[i, : len(b)] = s
            classes[i, : len(b)] = c
            valid[i, : len(b)] = True
        self.calls += 1
        return Detections(boxes, scores, classes, valid)


@pytest.fixture
def clips(tmp_path):
    paths = []
    for k, n_frames in enumerate((12, 8)):  # different lengths
        p = str(tmp_path / f"clip{k}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
        for i in range(n_frames):
            w.write(make_frame(i))
        w.release()
        paths.append(p)
    return paths


@pytest.fixture(autouse=True)
def headless_env(monkeypatch):
    monkeypatch.setenv("HOCKEY_TPU_HEADLESS", "1")


class TestMultiClip:
    def test_lockstep_processing_and_lengths(self, clips, tmp_path):
        mp = MultiClipProcessor(
            clips, config=small_config(), mode=ProcessingMode.PLAYER_TRACKING,
            team_names=("A", "B"), player_detector=MultiStubDetector(),
        )
        targets = [str(tmp_path / "out0.mp4"), str(tmp_path / "out1.mp4")]
        counts = mp.run(targets)
        assert counts == [12, 8]
        for t, want in zip(targets, (12, 8)):
            cap = cv2.VideoCapture(t)
            assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == want
            cap.release()

    def test_one_device_call_per_frame_row(self, clips):
        stub = MultiStubDetector()
        mp = MultiClipProcessor(
            clips, config=small_config(), mode=ProcessingMode.PLAYER_TRACKING,
            team_names=("A", "B"), player_detector=stub,
        )
        mp.run(limit_frames=5)
        assert stub.calls == 5, "expected exactly one batched call per frame row"

    def test_per_clip_tracker_isolation(self, clips):
        mp = MultiClipProcessor(
            clips, config=small_config(), mode=ProcessingMode.PLAYER_TRACKING,
            team_names=("A", "B"), player_detector=MultiStubDetector(),
        )
        mp.run(limit_frames=4)
        ids0 = {t.track_id for t in mp.processors[0].tracker.tracks}
        ids1 = {t.track_id for t in mp.processors[1].tracker.tracks}
        assert ids0 and ids1
        # trackers are independent instances (separate id spaces that both
        # start at 1 — identical sets prove isolation, shared state would
        # have disjoint continuing sequences)
        assert mp.processors[0].tracker is not mp.processors[1].tracker

    def test_mismatched_resolution_rejected(self, clips, tmp_path):
        p = str(tmp_path / "odd.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (320, 240))
        for i in range(4):
            w.write(np.zeros((240, 320, 3), np.uint8))
        w.release()
        with pytest.raises(ValueError):
            MultiClipProcessor(clips + [p], config=small_config(),
                               player_detector=MultiStubDetector())
