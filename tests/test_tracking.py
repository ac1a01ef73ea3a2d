"""Tracker tests: Kalman filter math + ByteTrack determinism/occlusion
(SURVEY.md §4 'Tracker determinism tests')."""

import numpy as np

from hockey_tpu.tracking.bytetrack import ByteTrack
from hockey_tpu.tracking.kalman import (
    BatchKalmanXYAH,
    xyah_to_xyxy,
    xyxy_to_xyah,
)


def make_box(cx, cy, w=40.0, h=80.0):
    return np.asarray([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)


class TestKalman:
    def test_xyah_roundtrip(self):
        boxes = np.asarray([[10, 20, 50, 100], [0, 0, 30, 60]], np.float32)
        back = xyah_to_xyxy(xyxy_to_xyah(boxes))
        np.testing.assert_allclose(back, boxes, atol=1e-4)

    def test_predict_constant_velocity(self):
        kf = BatchKalmanXYAH()
        meas = xyxy_to_xyah(make_box(100, 100)[None])
        mean, cov = kf.initiate(meas)
        # feed two steps moving +10px/frame in x
        for step in (1, 2):
            mean, cov = kf.predict(mean, cov)
            mean, cov = kf.update(mean, cov, xyxy_to_xyah(make_box(100 + 10 * step, 100)[None]))
        mean, cov = kf.predict(mean, cov)
        # learned velocity should carry the prediction forward
        assert mean[0, 0] > 120.0
        assert abs(mean[0, 1] - 100.0) < 2.0

    def test_update_reduces_uncertainty(self):
        kf = BatchKalmanXYAH()
        meas = xyxy_to_xyah(make_box(50, 50)[None])
        mean, cov = kf.initiate(meas)
        mean, cov = kf.predict(mean, cov)
        tr_before = np.trace(cov[0, :4, :4])
        _, cov2 = kf.update(mean, cov, meas)
        assert np.trace(cov2[0, :4, :4]) < tr_before

    def test_batched_matches_sequential(self):
        kf = BatchKalmanXYAH()
        boxes = np.stack([make_box(100, 100), make_box(300, 200, 60, 120)])
        meas = xyxy_to_xyah(boxes)
        mean_b, cov_b = kf.initiate(meas)
        mean_b, cov_b = kf.predict(mean_b, cov_b)
        mean_b, cov_b = kf.update(mean_b, cov_b, meas)
        for i in range(2):
            m, c = kf.initiate(meas[i : i + 1])
            m, c = kf.predict(m, c)
            m, c = kf.update(m, c, meas[i : i + 1])
            np.testing.assert_allclose(mean_b[i], m[0], atol=1e-4)
            np.testing.assert_allclose(cov_b[i], c[0], atol=1e-4)


class TestByteTrack:
    def track(self, **kw):
        kw.setdefault("minimum_consecutive_frames", 2)
        return ByteTrack(**kw)

    def test_ids_stable_for_steady_targets(self):
        tr = self.track()
        ids_seen = []
        for f in range(10):
            boxes = np.stack([make_box(100 + f, 100), make_box(400, 300)])
            scores = np.asarray([0.9, 0.85], np.float32)
            b, s, c, ids = tr.update(boxes, scores)
            if f == 0:
                assert len(ids) == 0  # minimum_consecutive_frames=2
            else:
                assert len(ids) == 2
                ids_seen.append(tuple(sorted(ids.tolist())))
        assert len(set(ids_seen)) == 1, f"IDs changed: {ids_seen}"

    def test_id_survives_occlusion_gap(self):
        """lost_track_buffer semantics: a track missing for < buffer frames
        must resume with the same ID (reference Config lost_track_buffer=30)."""
        tr = self.track(lost_track_buffer=30)
        for f in range(5):
            b, s, c, ids = tr.update(make_box(100 + 5 * f, 100)[None], np.asarray([0.9]))
        original = ids[0]
        for f in range(10):  # occluded: no detections
            tr.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
        # reappears close to the predicted position
        b, s, c, ids = tr.update(make_box(175, 100)[None], np.asarray([0.9]))
        assert len(ids) == 1 and ids[0] == original

    def test_track_expires_after_buffer(self):
        tr = self.track(lost_track_buffer=5)
        for f in range(5):
            b, s, c, ids = tr.update(make_box(100, 100)[None], np.asarray([0.9]))
        original = ids[0]
        for f in range(10):  # longer than buffer
            tr.update(np.zeros((0, 4), np.float32), np.zeros((0,), np.float32))
        b, s, c, ids = tr.update(make_box(100, 100)[None], np.asarray([0.9]))
        assert len(ids) == 0 or (len(ids) and ids[0] != original)

    def test_low_score_rescues_track(self):
        """ByteTrack stage 2: a dip below the activation threshold should not
        break the track."""
        tr = self.track()
        for f in range(4):
            b, s, c, ids = tr.update(make_box(100 + 2 * f, 100)[None], np.asarray([0.9]))
        original = ids[0]
        # low-score detection (0.1 <= s < 0.25) at the predicted spot
        b, s, c, ids = tr.update(make_box(108, 100)[None], np.asarray([0.2]))
        assert len(ids) == 1 and ids[0] == original
        # and it continues afterwards
        b, s, c, ids = tr.update(make_box(110, 100)[None], np.asarray([0.9]))
        assert ids[0] == original

    def test_new_ids_monotonic_and_deterministic(self):
        def run():
            tr = self.track(minimum_consecutive_frames=1)
            all_ids = []
            rng = np.random.default_rng(7)
            pos = rng.uniform(100, 500, (4, 2))
            for f in range(8):
                pos += rng.normal(0, 2, pos.shape)
                boxes = np.stack([make_box(*p) for p in pos])
                scores = rng.uniform(0.5, 1.0, 4).astype(np.float32)
                _, _, _, ids = tr.update(boxes, scores)
                all_ids.append(ids.tolist())
            return all_ids

        a, b = run(), run()
        assert a == b, "tracker is not deterministic"

    def test_crossing_targets_keep_ids(self):
        tr = self.track(minimum_consecutive_frames=1)
        id_map = {}
        for f in range(21):
            # two targets cross paths around frame 10
            b1 = make_box(100 + 10 * f, 100)
            b2 = make_box(300 - 10 * f, 108)
            b, s, c, ids = tr.update(np.stack([b1, b2]), np.asarray([0.9, 0.9]))
            for box, tid in zip(b, ids):
                key = "L" if box[1] < 64 else "R"  # y distinguishes them
            if f == 0:
                first = sorted(ids.tolist())
        assert len(tr.tracks) >= 2
        last = sorted(ids.tolist())
        assert last == first, f"IDs swapped or changed: {first} -> {last}"

    def test_duplicate_kill_collapses_to_older_id(self):
        """COMPAT #27 host parity: two TRACKED same-class tracks over one
        actor (torso inside full body, IoMin 1.0) — the younger dies and
        the older id is the one emitted."""
        full = np.asarray([100, 100, 140, 240], np.float32)
        torso = np.asarray([100, 100, 140, 170], np.float32)
        tr = self.track(minimum_consecutive_frames=1,
                        duplicate_kill_iomin=0.55)
        ids_seen = set()
        for _ in range(4):
            _, _, _, ids = tr.update(np.stack([full, torso]),
                                     np.asarray([0.9, 0.85]))
            ids_seen.update(ids.tolist())
        live = [t.track_id for t in tr.tracks]
        assert live == [min(ids_seen)], (live, ids_seen)
        # stock semantics (0.0) keep both
        tr2 = self.track(minimum_consecutive_frames=1)
        for _ in range(4):
            tr2.update(np.stack([full, torso]), np.asarray([0.9, 0.85]))
        assert len(tr2.tracks) == 2

    def test_lost_duplicate_kill_stops_alternation(self):
        """COMPAT #29 host parity: after a duplicate pair forms, extent
        flicker leaves one TRACKED and one LOST per frame; the LOST
        younger track coasting inside the TRACKED older one is killed, so
        the emitted id stops alternating."""
        full = np.asarray([100, 100, 140, 240], np.float32)
        torso = np.asarray([100, 102, 140, 172], np.float32)

        def run(**kw):
            tr = self.track(minimum_consecutive_frames=1, **kw)
            for _ in range(2):  # seed the duplicate pair
                tr.update(np.stack([full, torso]), np.asarray([0.9, 0.85]))
            emitted = []
            for f in range(10):  # extent flicker: one box per frame
                b = torso if f % 2 else full
                _, _, _, ids = tr.update(np.stack([b]), np.asarray([0.9]))
                if len(ids):
                    emitted.append(int(ids[0]))
            return emitted

        flicker = run()  # stock: both tracks persist
        fixed = run(lost_dup_kill_iomin=0.55)
        assert len(set(fixed)) == 1, fixed
        assert min(fixed) == min(flicker), (fixed, flicker)

    def test_from_config_threads_duplicate_kills(self):
        from hockey_tpu.core.config import Config

        tr = ByteTrack.from_config(Config())
        assert tr.dup_kill_iomin == Config().duplicate_kill_iomin
        assert tr.lost_dup_kill_iomin == Config().lost_dup_kill_iomin

    def test_goalie_class_preserved(self):
        tr = self.track(minimum_consecutive_frames=1)
        boxes = np.stack([make_box(100, 100), make_box(400, 300)])
        classes = np.asarray([0, 1], np.int32)
        b, s, c, ids = tr.update(boxes, np.asarray([0.9, 0.9]), classes)
        np.testing.assert_array_equal(np.sort(c), [0, 1])
