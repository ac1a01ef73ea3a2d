"""On-device ByteTrack tests: same scenarios as the host tracker."""

import numpy as np

from hockey_tpu.tracking.device_tracker import DeviceByteTrack
from tests.test_tracking import make_box


class TestFusedByteTrackWiring:
    def test_nms_floor_and_initiation_threshold(self, monkeypatch):
        """The fused path must floor NMS at BYTE_FLOOR so ByteTrack's
        stage-2 low-score band actually receives detections, while track
        INITIATION stays at the reference's effective threshold
        max(activation, detection_confidence) (COMPAT #22)."""
        import hockey_tpu.models.detector as det_mod
        from hockey_tpu.core.config import Config
        from hockey_tpu.models import checkpoint as ckpt_mod
        from hockey_tpu.models.yolov8 import MODEL_ZOO, YoloConfig
        from hockey_tpu.tracking.device_tracker import init_state

        monkeypatch.setitem(MODEL_ZOO, "hockey-player-detection",
                            YoloConfig("n", num_classes=2))
        monkeypatch.setattr(ckpt_mod, "shipped_weights_path",
                            lambda name: None)
        captured = {}
        real = det_mod.build_detect_track_fn

        def spy(cfg, *, tracker_kwargs, **kw):
            captured["conf"] = kw["conf"]
            captured["activation"] = tracker_kwargs["activation_thresh"]
            return real(cfg, tracker_kwargs=tracker_kwargs, **kw)

        monkeypatch.setattr(det_mod, "build_detect_track_fn", spy)
        config = Config(nms_pre_topk=32, max_detections=8, max_tracks=16)
        det = det_mod.Detector("hockey-player-detection", config,
                               frame_hw=(64, 96), imgsz=64, seed=0)
        frames = np.zeros((2, 64, 96, 3), np.uint8)
        det.detect_track_batch(frames, init_state(16))
        assert captured["conf"] == det_mod.BYTE_FLOOR
        assert captured["activation"] == max(
            config.track_activation_threshold, config.detection_confidence)


class TestAuctionAssignment:
    def test_matches_scipy_on_tracker_matrices(self):
        """Auction == Hungarian (total benefit) on IoU-shaped matrices:
        sparse, peaked, a detection overlaps 1-3 track predictions."""
        import jax.numpy as jnp
        from scipy.optimize import linear_sum_assignment

        from hockey_tpu.ops.assignment import auction_match

        rng = np.random.default_rng(0)
        T, D = 32, 16
        for trial in range(100):
            b = np.zeros((T, D), np.float32)
            # each det overlaps its "own" track strongly + 0-2 rivals
            for j in range(int(rng.integers(1, D))):
                i = int(rng.integers(0, T))
                b[i, j] = rng.uniform(0.5, 0.95)
                for _ in range(int(rng.integers(0, 3))):
                    b[int(rng.integers(0, T)), j] = rng.uniform(0.05, 0.6)
            row_ok = rng.random(T) < 0.7
            col_ok = rng.random(D) < 0.9
            a = np.asarray(auction_match(
                jnp.asarray(b), jnp.asarray(row_ok), jnp.asarray(col_ok)))
            ours = sum(b[i, a[i]] for i in range(T) if a[i] >= 0)
            ri, ci = np.flatnonzero(row_ok), np.flatnonzero(col_ok)
            opt = 0.0
            if len(ri) and len(ci):
                sub = b[np.ix_(ri, ci)]
                r, c = linear_sum_assignment(sub, maximize=True)
                opt = float(sub[r, c].sum())
            # validity: no duplicate columns, masks respected
            cols = a[a >= 0]
            assert len(set(cols.tolist())) == len(cols)
            assert all(row_ok[i] and col_ok[a[i]]
                       for i in range(T) if a[i] >= 0)
            # eps-CS bound: within n_matched * eps of the optimum
            bound = max(len(cols), 1) * 2e-3 + 1e-5
            assert opt - ours <= bound, f"trial {trial}: {opt} vs {ours}"


class TestTrackerScan:
    def test_scan_equals_sequential_steps(self):
        """tracker_scan over K frames == K sequential tracker_step calls."""
        import jax.numpy as jnp

        from hockey_tpu.tracking.device_tracker import (
            init_state,
            tracker_scan,
            tracker_step,
        )

        rng = np.random.default_rng(3)
        K, D = 12, 8
        boxes = np.zeros((K, D, 4), np.float32)
        scores = np.full((K, D), -1.0, np.float32)
        classes = np.zeros((K, D), np.int32)
        valid = np.zeros((K, D), bool)
        pos = rng.uniform(100, 700, (5, 2))
        for f in range(K):
            n = 5 if f % 4 != 3 else 3  # drop two dets every 4th frame
            for j in range(n):
                x, y = pos[j] + f * np.asarray([4.0, 1.5])
                boxes[f, j] = [x, y, x + 30, y + 80]
                scores[f, j] = 0.9 if j != 2 else 0.2  # one low-score det
                valid[f, j] = True

        kw = dict(activation_thresh=0.25, match_thresh=0.8,
                  max_time_lost=30, min_consecutive=2)
        st_seq = init_state(32)
        tids_seq = []
        for f in range(K):
            st_seq, tid = tracker_step(
                st_seq, jnp.asarray(boxes[f]), jnp.asarray(scores[f]),
                jnp.asarray(classes[f]), jnp.asarray(valid[f]), **kw)
            tids_seq.append(np.asarray(tid))
        st_scan, tids = tracker_scan(
            init_state(32), jnp.asarray(boxes), jnp.asarray(scores),
            jnp.asarray(classes), jnp.asarray(valid), **kw)
        np.testing.assert_array_equal(np.asarray(tids), np.stack(tids_seq))
        np.testing.assert_allclose(np.asarray(st_scan.mean),
                                   np.asarray(st_seq.mean), rtol=1e-5,
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(st_scan.track_id),
                                      np.asarray(st_seq.track_id))


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

    def test_lost_reacquire_floor_relinks_lost_track(self):
        """With the stage-3 extension on, a LOST track re-links to a
        sub-activation detection at its predicted position and keeps its
        id; with the knob off (stock ByteTrack) the same detection is
        dropped — a lost track can only be revived by a high detection."""

        def run(floor):
            # activation 0.4 mirrors the fused wiring
            # (max(track_activation_threshold, detection_confidence))
            tr = DeviceByteTrack(minimum_consecutive_frames=1,
                                 lost_track_buffer=30,
                                 track_activation_threshold=0.4,
                                 lost_reacquire_floor=floor)
            for f in range(4):
                _, _, _, ids = tr.update(make_box(100 + 3 * f, 100)[None],
                                         np.asarray([0.9], np.float32))
            original = ids[0]
            for _ in range(3):  # miss -> track becomes LOST
                tr.update(np.zeros((0, 4), np.float32),
                          np.zeros((0,), np.float32))
            # sub-activation (0.25 < s < 0.4 band) det near the prediction
            _, _, _, ids = tr.update(make_box(118, 100)[None],
                                     np.asarray([0.3], np.float32))
            return original, ids

        orig, ids = run(0.15)
        assert len(ids) == 1 and ids[0] == orig
        _, ids_off = run(0.0)
        assert len(ids_off) == 0  # stock: low det cannot revive a lost track

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

    def test_matches_host_tracker_through_occlusion(self):
        """Hungarian-semantics parity: crossing players + detection gaps +
        low-score rescue. Host and device must emit the same detections
        every frame with a consistent id bijection."""
        from hockey_tpu.tracking.bytetrack import ByteTrack

        host = ByteTrack(minimum_consecutive_frames=2, lost_track_buffer=30)
        dev = DeviceByteTrack(minimum_consecutive_frames=2,
                              lost_track_buffer=30)
        rng = np.random.default_rng(11)
        # 8 players: two pairs cross paths; one vanishes for 6 frames
        start = rng.uniform(100, 800, (8, 2))
        vel = rng.uniform(-4, 4, (8, 2))
        vel[1] = -vel[0]  # head-on crossing pair
        vel[3] = -vel[2]
        id_map = {}
        for f in range(30):
            boxes, scores = [], []
            idx = []
            for j in range(8):
                if j == 5 and 10 <= f < 16:
                    continue  # occlusion gap
                x, y = start[j] + f * vel[j]
                boxes.append([x, y, x + 30, y + 80])
                scores.append(0.9 if not (j == 6 and f % 3 == 0) else 0.2)
                idx.append(j)
            boxes = np.asarray(boxes, np.float32)
            scores = np.asarray(scores, np.float32)
            hb, hs, hc, h_ids = host.update(boxes, scores)
            db, ds, dc, d_ids = dev.update(boxes, scores)
            assert len(h_ids) == len(d_ids), f"frame {f}"
            np.testing.assert_allclose(hb, db, atol=1e-3)
            for hid, did in zip(h_ids.tolist(), d_ids.tolist()):
                assert id_map.setdefault(hid, did) == did, \
                    f"frame {f}: host id {hid} flipped device id"

    def test_capacity_and_padding_changes_dont_leak(self):
        tr = DeviceByteTrack(minimum_consecutive_frames=1)
        b, s, c, ids1 = tr.update(make_box(50, 50)[None], np.asarray([0.9]))
        # second frame with many detections (forces a bigger padded shape)
        boxes = np.stack([make_box(50 + 3, 50)] +
                         [make_box(200 + 60 * j, 300) for j in range(9)])
        b, s, c, ids = tr.update(boxes, np.full(10, 0.9, np.float32))
        assert len(ids) == 10
        assert ids[0] == ids1[0], "existing track lost identity on re-pad"

    def test_fused_pipeline_equals_sequential_device_tracker(self, tmp_path):
        """The fused detect+track batched path must produce byte-identical
        frames to the sequential device-tracker path (same detections,
        same scan semantics driving the same host stages)."""
        import cv2
        import jax.numpy as jnp

        from hockey_tpu.core.config import ProcessingMode
        from hockey_tpu.pipeline import VideoProcessor
        from hockey_tpu.tracking.device_tracker import tracker_scan
        from tests.test_pipeline import StubDetector, make_frame, small_config, H, W

        clip = str(tmp_path / "clip.mp4")
        wtr = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30, (W, H))
        for i in range(20):
            wtr.write(make_frame(i))
        wtr.release()

        class FusedStubDetector(StubDetector):
            """Stub detections + the REAL device tracker scan."""

            def __init__(self, cfg):
                super().__init__()
                self.with_team_features = False
                self._kw = dict(
                    activation_thresh=cfg.track_activation_threshold,
                    match_thresh=cfg.minimum_matching_threshold,
                    max_time_lost=int(cfg.frame_rate / 30.0
                                      * cfg.lost_track_buffer),
                    min_consecutive=cfg.minimum_consecutive_frames,
                )

            def detect_track_batch(self, frames, state):
                det = self.detect_batch(frames)
                cls_ok = (det.classes == 0) | (det.classes == 1)
                state, tids = tracker_scan(
                    state, jnp.asarray(det.boxes), jnp.asarray(det.scores),
                    jnp.asarray(det.classes),
                    jnp.asarray(det.valid & cls_ok), **self._kw)
                return det, None, tids, None, state

        def run(fused):
            cfg = small_config()
            cfg.frame_batch = 5
            cfg.use_device_tracker = True
            cfg.max_tracks = 32
            stub = FusedStubDetector(cfg) if fused else StubDetector()
            p = VideoProcessor(config=cfg, mode=ProcessingMode.PLAYER_TRACKING,
                               frame_hw=(H, W), player_detector=stub,
                               team_names=("A", "B"))
            assert p.use_fused_tracker == fused
            return [f.copy() for f in p.process_video(clip)]

        fused_frames = run(True)
        seq_frames = run(False)
        assert len(fused_frames) == len(seq_frames) == 20
        for i, (a, b) in enumerate(zip(fused_frames, seq_frames)):
            assert np.array_equal(a, b), f"frame {i} differs"

    def test_pipeline_with_device_tracker(self, tmp_path):
        import cv2

        from hockey_tpu.core.config import ProcessingMode
        from hockey_tpu.core.session import load_run_state, save_run_state
        from hockey_tpu.pipeline import VideoProcessor
        from tests.test_pipeline import StubDetector, make_frame, small_config, H, W

        cfg = small_config()
        cfg.use_device_tracker = True
        cfg.max_tracks = 32
        # the pipeline must thread the COMPAT #27/#29 kill knobs into the
        # sequential device tracker — without them it ran stock ByteTrack
        # while the fused/host paths applied the kills (measured gen-B
        # id_stability 0.444 vs 0.778, logs/r4_measure2.log)
        ptmp = VideoProcessor(config=cfg, mode=ProcessingMode.PLAYER_TRACKING,
                              frame_hw=(H, W), player_detector=StubDetector(),
                              team_names=("A", "B"))
        assert ptmp.tracker.kwargs["duplicate_kill_iomin"] == \
            cfg.duplicate_kill_iomin
        assert ptmp.tracker.kwargs["lost_dup_kill_iomin"] == \
            cfg.lost_dup_kill_iomin
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


class TestDuplicateAlternationKill:
    """The measured generator-B OOD failure mode (scripts/diag_track_b.py):
    the detector flickers between a torso box and a full-body box on the
    same player; each extent sustains its own track (one TRACKED, one LOST
    per frame) and the emitted id alternates. duplicate_kill_iomin cannot
    fire (it requires both tracks TRACKED in the same frame);
    lost_dup_kill_iomin kills the coasting younger duplicate."""

    BODY = np.asarray([100.0, 100.0, 140.0, 180.0], np.float32)
    TORSO = np.asarray([102.0, 100.0, 138.0, 148.0], np.float32)

    @classmethod
    def _seed_duplicate_pair(cls, tr):
        """Both extent hypotheses detected for a few frames -> two live
        tracks on the same player (older = body, younger = torso), then
        body-only frames send the torso track LOST while it coasts
        contained inside the tracked body track."""
        for _ in range(4):
            _, _, _, ids = tr.update(np.stack([cls.BODY, cls.TORSO]),
                                     np.asarray([0.9, 0.85], np.float32))
        assert len(set(int(i) for i in ids)) == 2
        for _ in range(3):
            tr.update(cls.BODY[None], np.asarray([0.9], np.float32))
        # probe: a torso-extent detection — which identity takes it?
        _, _, _, ids = tr.update(cls.TORSO[None],
                                 np.asarray([0.9], np.float32))
        return [int(i) for i in ids]

    def test_stale_duplicate_reclaims_without_kill(self):
        tr = DeviceByteTrack(minimum_consecutive_frames=1,
                             track_activation_threshold=0.4)
        ids = self._seed_duplicate_pair(tr)
        assert ids == [2]  # stock: the coasting duplicate steals the det
        # -> emitted identity alternates with detection extent

    def test_lost_dup_kill_converges_to_older_id(self):
        tr = DeviceByteTrack(minimum_consecutive_frames=1,
                             track_activation_threshold=0.4,
                             lost_dup_kill_iomin=0.55)
        ids = self._seed_duplicate_pair(tr)
        assert ids == [1]  # duplicate killed while coasting; the torso
        # det still matches the surviving older track (IoU ~0.54 >= gate)

    def test_init_contain_veto_blocks_duplicate_birth(self):
        def run(veto):
            tr = DeviceByteTrack(minimum_consecutive_frames=1,
                                 track_activation_threshold=0.4,
                                 init_contain_veto=veto)
            body = np.asarray([100.0, 100.0, 140.0, 180.0], np.float32)
            torso = np.asarray([102.0, 100.0, 138.0, 148.0], np.float32)
            for _ in range(3):
                _, _, _, ids = tr.update(body[None],
                                         np.asarray([0.9], np.float32))
            # frame with BOTH hypotheses: body matches the track, the
            # contained torso det is an initiation candidate
            _, _, _, ids = tr.update(
                np.stack([body, torso]),
                np.asarray([0.9, 0.85], np.float32))
            return sorted(set(int(i) for i in ids))

        with_veto = run(0.85)
        without = run(0.0)
        assert len(with_veto) == 1      # duplicate birth vetoed
        assert len(without) == 2        # stock: second id born

    def test_occlusion_relink_survives_lost_dup_kill(self):
        """A genuinely distinct player whose track coasts through an
        occlusion must still re-link when the overlap is partial (the
        kill only fires on containment-grade overlap)."""
        tr = DeviceByteTrack(minimum_consecutive_frames=1,
                             track_activation_threshold=0.4,
                             lost_track_buffer=30,
                             lost_dup_kill_iomin=0.55)
        a = make_box(100, 100)
        b = make_box(160, 100)  # side-by-side, small overlap while crossing
        for f in range(4):
            _, _, _, ids = tr.update(np.stack([a, b]),
                                     np.asarray([0.9, 0.9], np.float32))
        pair = sorted(int(i) for i in ids)
        for _ in range(4):  # b occluded; a persists (boxes stay side-by-side)
            tr.update(a[None], np.asarray([0.9], np.float32))
        _, _, _, ids = tr.update(np.stack([a, b]),
                                 np.asarray([0.9, 0.9], np.float32))
        assert sorted(int(i) for i in ids) == pair  # b relinked, same id
