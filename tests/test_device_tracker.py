"""On-device ByteTrack tests: same scenarios as the host tracker."""

import numpy as np

from hockey_tpu.tracking.device_tracker import DeviceByteTrack
from tests.test_tracking import make_box


class TestDeviceByteTrack:
    def test_ids_stable_for_steady_targets(self):
        tr = DeviceByteTrack(minimum_consecutive_frames=2)
        seen = []
        for f in range(10):
            boxes = np.stack([make_box(100 + f, 100), make_box(400, 300)])
            b, s, c, ids = tr.update(boxes, np.asarray([0.9, 0.85], np.float32))
            if f == 0:
                assert len(ids) == 0  # min_consecutive=2
            else:
                assert len(ids) == 2, f"frame {f}: {ids}"
                seen.append(tuple(sorted(ids.tolist())))
        assert len(set(seen)) == 1, f"IDs changed: {seen}"

    def test_id_survives_occlusion_gap(self):
        tr = DeviceByteTrack(lost_track_buffer=30)
        for f in range(5):
            b, s, c, ids = tr.update(make_box(100 + 5 * f, 100)[None],
                                     np.asarray([0.9]))
        original = ids[0]
        for _ in range(10):
            tr.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
        b, s, c, ids = tr.update(make_box(175, 100)[None], np.asarray([0.9]))
        assert len(ids) == 1 and ids[0] == original

    def test_track_expires_after_buffer(self):
        tr = DeviceByteTrack(lost_track_buffer=5)
        for _ in range(5):
            b, s, c, ids = tr.update(make_box(100, 100)[None], np.asarray([0.9]))
        original = ids[0]
        for _ in range(12):
            tr.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
        b, s, c, ids = tr.update(make_box(100, 100)[None], np.asarray([0.9]))
        assert len(ids) == 0 or ids[0] != original

    def test_low_score_rescues_track(self):
        tr = DeviceByteTrack(minimum_consecutive_frames=2)
        for f in range(4):
            b, s, c, ids = tr.update(make_box(100 + 2 * f, 100)[None],
                                     np.asarray([0.9]))
        original = ids[0]
        b, s, c, ids = tr.update(make_box(108, 100)[None], np.asarray([0.2]))
        assert len(ids) == 1 and ids[0] == original

    def test_matches_host_tracker_on_easy_scenario(self):
        """Greedy vs Hungarian agree when IoUs are unambiguous."""
        from hockey_tpu.tracking.bytetrack import ByteTrack

        host = ByteTrack(minimum_consecutive_frames=1)
        dev = DeviceByteTrack(minimum_consecutive_frames=1)
        rng = np.random.default_rng(5)
        pos = rng.uniform(100, 800, (6, 2))
        for f in range(12):
            pos_f = pos + f * np.asarray([3.0, 1.0])
            boxes = np.stack([make_box(*p) for p in pos_f]).astype(np.float32)
            scores = np.full(6, 0.9, np.float32)
            _, _, _, h_ids = host.update(boxes, scores)
            _, _, _, d_ids = dev.update(boxes, scores)
            assert len(h_ids) == len(d_ids)
            # same grouping: detection order identical, ids consistent maps
            if f > 0:
                assert (np.argsort(h_ids) == np.argsort(d_ids)).all()

    def test_capacity_and_padding_changes_dont_leak(self):
        tr = DeviceByteTrack(minimum_consecutive_frames=1)
        b, s, c, ids1 = tr.update(make_box(50, 50)[None], np.asarray([0.9]))
        # second frame with many detections (forces a bigger padded shape)
        boxes = np.stack([make_box(50 + 3, 50)] +
                         [make_box(200 + 60 * j, 300) for j in range(9)])
        b, s, c, ids = tr.update(boxes, np.full(10, 0.9, np.float32))
        assert len(ids) == 10
        assert ids[0] == ids1[0], "existing track lost identity on re-pad"

    def test_pipeline_with_device_tracker(self, tmp_path):
        import cv2

        from hockey_tpu.core.config import ProcessingMode
        from hockey_tpu.core.session import load_run_state, save_run_state
        from hockey_tpu.pipeline import VideoProcessor
        from tests.test_pipeline import StubDetector, make_frame, small_config, H, W

        cfg = small_config()
        cfg.use_device_tracker = True
        cfg.max_tracks = 32
        p = VideoProcessor(config=cfg, mode=ProcessingMode.PLAYER_TRACKING,
                           frame_hw=(H, W), player_detector=StubDetector(),
                           team_names=("A", "B"))
        for i in range(4):
            out = p.process_frame(make_frame(i))
        assert out.shape == (H, W, 3)
        # resume round-trips the device track table
        state = str(tmp_path / "dev.state")
        save_run_state(state, p, frame_idx=4)
        cfg2 = small_config()
        cfg2.use_device_tracker = True
        cfg2.max_tracks = 32
        p2 = VideoProcessor(config=cfg2, mode=ProcessingMode.PLAYER_TRACKING,
                            frame_hw=(H, W), player_detector=StubDetector(),
                            team_names=("A", "B"))
        assert load_run_state(state, p2) == 4
        import numpy as np
        np.testing.assert_array_equal(
            np.asarray(p2.tracker.state.track_id),
            np.asarray(p.tracker.state.track_id))
