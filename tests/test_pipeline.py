"""Golden-frame integration tests: synthetic video + stub detector through
the full pipeline (SURVEY.md §4 'Golden-frame integration' — the stub
substitutes for the absent .pt weights)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from hockey_tpu.core.config import Config, ProcessingMode
from hockey_tpu.models.detector import HostDetections
from hockey_tpu.ops.nms import Detections
from hockey_tpu.pipeline import VideoProcessor

H, W = 360, 640
N_PLAYERS = 8


def player_pos(frame_idx, j):
    x = 60 + 70 * j + 2 * frame_idx
    y = 120 + 30 * (j % 3)
    return x, y


def make_frame(i):
    f = np.full((H, W, 3), 235, np.uint8)  # ice
    for j in range(N_PLAYERS):
        x, y = player_pos(i, j)
        color = (30, 30, 200) if j % 2 else (250, 250, 250)  # red / white
        cv2.rectangle(f, (x, y), (x + 24, y + 60), color, -1)
    return f


def gt_detections(i):
    boxes, classes = [], []
    for j in range(N_PLAYERS):
        x, y = player_pos(i, j)
        boxes.append([x - 2, y - 4, x + 26, y + 64])  # a little margin
        classes.append(1 if j == 0 else 0)  # player 0 is the "goalie"
    return (np.asarray(boxes, np.float32),
            np.full(N_PLAYERS, 0.9, np.float32),
            np.asarray(classes, np.int32))


class StubDetector:
    """Canned-output stand-in for the YOLO megastep."""

    def __init__(self):
        self.frame_idx = 0

    def detect(self, frame):
        b, s, c = gt_detections(self.frame_idx)
        self.frame_idx += 1
        return HostDetections(b, s, c)

    def detect_batch(self, frames):
        n = len(frames)
        max_det = 16
        boxes = np.zeros((n, max_det, 4), np.float32)
        scores = np.full((n, max_det), -1.0, np.float32)
        classes = np.full((n, max_det), -1, np.int32)
        valid = np.zeros((n, max_det), bool)
        for i in range(n):
            b, s, c = gt_detections(self.frame_idx)
            self.frame_idx += 1
            boxes[i, : len(b)] = b
            scores[i, : len(b)] = s
            classes[i, : len(b)] = c
            valid[i, : len(b)] = True
        return Detections(boxes, scores, classes, valid)


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vid") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
    for i in range(40):
        w.write(make_frame(i))
    w.release()
    return path


@pytest.fixture(autouse=True)
def headless_env(monkeypatch):
    monkeypatch.setenv("HOCKEY_TPU_HEADLESS", "1")


def small_config(**kw):
    cfg = Config(**kw)
    cfg.max_initialization_frames = 3
    cfg.initialization_stride = 5
    return cfg


class TestVideoIO:
    def test_info_and_generator(self, clip):
        from hockey_tpu.video.io import VideoInfo, frame_generator

        info = VideoInfo.from_video_path(clip)
        assert (info.width, info.height) == (W, H)
        assert info.total_frames == 40
        frames = list(frame_generator(clip, stride=10))
        assert len(frames) == 4

    def test_batched_generator_pads_final(self, clip):
        from hockey_tpu.video.io import batched_frame_generator

        batches = list(batched_frame_generator(clip, batch=16))
        assert [n for _, n in batches] == [16, 16, 8]
        assert all(b.shape == (16, H, W, 3) for b, _ in batches)

    def test_prefetched_propagates_exceptions(self):
        from hockey_tpu.video.io import prefetched

        def broken():
            yield 1
            yield 2
            raise RuntimeError("decode failed mid-stream")

        got = []
        with pytest.raises(RuntimeError, match="decode failed"):
            for item in prefetched(broken()):
                got.append(item)
        assert got == [1, 2], "items before the failure must still arrive"


class TestPipelineModes:
    def make(self, mode, **kw):
        return VideoProcessor(
            config=small_config(), mode=mode, frame_hw=(H, W),
            player_detector=StubDetector(), team_names=("TOR", "DET"), **kw,
        )

    def test_player_detection_mode(self):
        p = self.make(ProcessingMode.PLAYER_DETECTION)
        out = p.process_frame(make_frame(0))
        assert out.shape == (H, W, 3)
        assert not np.array_equal(out, make_frame(0)), "no annotation drawn"

    def test_tracking_mode_labels_ids(self):
        p = self.make(ProcessingMode.PLAYER_TRACKING)
        for i in range(3):
            out = p.process_frame(make_frame(i))
        assert out.shape == (H, W, 3)
        assert len(p.tracker.tracks) >= N_PLAYERS

    def test_team_classification_end_to_end(self, clip):
        p = self.make(ProcessingMode.TEAM_CLASSIFICATION)
        frames = list(p.process_video(clip))
        assert len(frames) == 40
        assert p.team_classifier.get_team_name(0) == "TOR"
        # team classifier must have been fitted (segmentation kmeans)
        assert p.team_classifier.active_strategy in (
            "segmentation", "interactive", "robust", "hybrid", "simple")
        s = p.timers.summary()
        assert s["counters"]["detections"] > 0

    def test_batched_detection_path(self, clip):
        cfg = small_config()
        cfg.frame_batch = 8
        p = VideoProcessor(config=cfg, mode=ProcessingMode.PLAYER_TRACKING,
                           frame_hw=(H, W), player_detector=StubDetector(),
                           team_names=("A", "B"))
        frames = list(p.process_video(clip))
        assert len(frames) == 40

    def test_goalies_get_goalie_label_color(self):
        p = self.make(ProcessingMode.TEAM_CLASSIFICATION)
        crops = [make_frame(0)[120:180, 60 + 70 * j: 84 + 70 * j]
                 for j in range(N_PLAYERS)]
        p.team_classifier.fit(crops)
        for i in range(4):
            out = p.process_frame(make_frame(i))
        # goalie color = palette idx 2 = #FF6347 tomato -> BGR (71, 99, 255)
        # just assert some tomato-ish pixels got drawn
        reds = (np.abs(out.astype(int) - np.array([71, 99, 255])).sum(axis=2) < 30)
        assert reds.any(), "goalie color not found in annotated frame"


class TestCLI:
    def test_cli_headless_run(self, clip, tmp_path, monkeypatch):
        import hockey_tpu.cli.main as cli
        import hockey_tpu.pipeline as pl

        # swap the heavy Detector for the stub
        monkeypatch.setattr(pl, "Detector",
                            lambda *a, **k: StubDetector())
        out = str(tmp_path / "out.mp4")
        metrics = str(tmp_path / "metrics.json")
        rc = cli.main([
            "--source_path", clip, "--target_path", out,
            "--mode", "PLAYER_TRACKING", "--headless",
            "--limit-frames", "10", "--json-metrics", metrics,
        ])
        assert rc == 0
        assert os.path.exists(out)
        cap = cv2.VideoCapture(out)
        assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 10
        cap.release()
        assert os.path.exists(metrics)

    def test_cli_missing_source_raises(self):
        import hockey_tpu.cli.main as cli

        with pytest.raises(FileNotFoundError):
            cli.main(["--source_path", "/nonexistent.mp4", "--headless"])


class TestBatchedSequentialParity:
    def test_batched_equals_sequential_output(self, clip):
        """frame_batch=8 must produce byte-identical frames to the
        sequential path (same detections drive the same host stages)."""
        def run(batch):
            cfg = small_config()
            cfg.frame_batch = batch
            p = VideoProcessor(config=cfg, mode=ProcessingMode.PLAYER_TRACKING,
                               frame_hw=(H, W), player_detector=StubDetector(),
                               team_names=("A", "B"))
            return [f.copy() for f in p.process_video(clip)]

        seq = run(1)
        bat = run(8)
        assert len(seq) == len(bat) == 40
        for i, (a, b) in enumerate(zip(seq, bat)):
            np.testing.assert_array_equal(a, b, err_msg=f"frame {i} differs")


class TestProfileFlag:
    def test_profile_writes_trace(self, clip, tmp_path, monkeypatch):
        import os

        import hockey_tpu.cli.main as cli
        import hockey_tpu.pipeline as pl

        monkeypatch.setattr(pl, "Detector", lambda *a, **k: StubDetector())
        trace_dir = str(tmp_path / "trace")
        rc = cli.main(["--source_path", clip, "--mode", "PLAYER_TRACKING",
                       "--headless", "--limit-frames", "3",
                       "--profile", trace_dir])
        assert rc == 0
        assert os.path.isdir(trace_dir) and os.listdir(trace_dir)


class TestFusedTeamFeatures:
    def test_fused_megastep_drives_team_classification(self, clip, rng):
        """When the detector emits fused team features, the pipeline must
        classify from them (no per-frame crop device call) and produce the
        same team ids as the crop path."""
        from hockey_tpu.teams.segmentation import SegmentationTeamClassifier

        class FusedStub(StubDetector):
            with_team_features = True

            def detect_batch(self, frames):
                det = super().detect_batch(frames)
                n, m = det.boxes.shape[:2]
                feats = np.zeros((n, m, 4), np.float32)
                # white_ratio feature: players at odd j are red (j%2==1)
                for i in range(n):
                    for k in range(N_PLAYERS):
                        is_red = k % 2 == 1
                        feats[i, k] = [0.05 if is_red else 0.9,
                                       0.0, 180.0 if is_red else 5.0, 150.0]
                return det, feats

        cfg = small_config()
        cfg.frame_batch = 8
        p = VideoProcessor(config=cfg, mode=ProcessingMode.TEAM_CLASSIFICATION,
                           frame_hw=(H, W), player_detector=FusedStub(),
                           team_names=("A", "B"))
        # unfitted kmeans -> white_ratio>0.4 rule applies to fused features
        frames = list(p.process_video(clip))
        assert len(frames) == 40
        # vote histories were driven through predict_features
        impl = p.team_classifier._impl
        assert isinstance(impl, SegmentationTeamClassifier)
        assert len(impl.vote.history) > 0


class TestDualMegastep:
    def test_dual_keypoints_consumed(self, rng):
        """A pipeline given precomputed rink keypoints must draw them and
        feed the 2D-map calibrator without a second detector."""
        p = VideoProcessor(
            config=small_config(), mode=ProcessingMode.PLAYER_TRACKING,
            frame_hw=(H, W), player_detector=StubDetector(),
            team_names=("A", "B"))
        kpts = np.zeros((56, 3), np.float32)
        kpts[:, 0] = np.linspace(50, W - 50, 56)
        kpts[:, 1] = H / 2
        kpts[:, 2] = 0.9
        out = p.process_frame(make_frame(0), rink_kpts=kpts)
        assert out.shape == (H, W, 3)
        s = p.timers.summary()
        assert s["counters"].get("keypoints", 0) == 56

    def test_dual_detector_small_models_cpu(self):
        """DualDetector end-to-end on tiny zoo configs (CPU backend)."""
        import hockey_tpu.models.dual as dual
        from hockey_tpu.models.yolov8 import MODEL_ZOO, YoloConfig

        cfg = small_config()
        cfg.detection_imgsz = 64
        cfg.nms_pre_topk = 32
        cfg.max_detections = 8
        cfg.player_model_name = "hockey-puck-detection"  # s-scale, smaller
        tiny_pose = YoloConfig("n", num_classes=1, num_keypoints=56)
        orig = dict(MODEL_ZOO)
        MODEL_ZOO["hockey-puck-detection"] = YoloConfig("n", num_classes=2)
        MODEL_ZOO["hockey-detection"] = tiny_pose
        try:
            d = dual.DualDetector(cfg, frame_hw=(48, 96))
            frames = np.random.default_rng(0).integers(
                0, 255, (2, 48, 96, 3)).astype(np.uint8)
            det, feats = d.detect_batch(frames)
            assert det.boxes.shape == (2, 8, 4)
            assert feats.shape == (2, 8, 4)
            assert d.last_keypoints.shape == (2, 56, 3)
            host = d.detect(frames[0])
            assert host.boxes.shape[1] == 4
        finally:
            MODEL_ZOO.clear()
            MODEL_ZOO.update(orig)


class TestSceneSequence:
    """Contract of train/scenes.py:render_scene_sequence — the source for
    the end-to-end quality harness (scripts/e2e_quality.py)."""

    def test_coherent_motion_and_stable_ids(self):
        from hockey_tpu.train.scenes import render_scene_sequence

        frames, labels = render_scene_sequence(
            np.random.default_rng(3), 320, n_frames=12)
        assert len(frames) == 12 and len(labels) == 12
        assert frames[0].shape == (320, 320, 3)
        assert frames[0].dtype == np.uint8
        # per-actor boxes move smoothly: skating displacement is ~8 px at
        # 320, but sprite jitter (lean/arm resampling) can add more — the
        # enforced bound is 20 px per consecutive frame
        for a, b in zip(labels, labels[1:]):
            common = set(a["track_ids"]) & set(b["track_ids"])
            for tid in common:
                ba = a["boxes"][list(a["track_ids"]).index(tid)]
                bb = b["boxes"][list(b["track_ids"]).index(tid)]
                d = np.abs(ba - bb).max()
                assert d < 20, f"track {tid} jumped {d:.1f}px in one frame"
        # ids stay within the actor set, teams are 0/1/2
        for lab in labels:
            assert (lab["team_ids"] >= 0).all() and (lab["team_ids"] <= 2).all()
            assert len(lab["boxes"]) == len(lab["track_ids"])

    def test_deterministic(self):
        from hockey_tpu.train.scenes import render_scene_sequence

        f1, l1 = render_scene_sequence(np.random.default_rng(9), 320, 4)
        f2, l2 = render_scene_sequence(np.random.default_rng(9), 320, 4)
        assert np.array_equal(f1[3], f2[3])
        assert np.array_equal(l1[3]["boxes"], l2[3]["boxes"])
