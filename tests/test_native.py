"""Native host runtime tests (C++ IoU + Hungarian via ctypes)."""

import numpy as np
import pytest

from hockey_tpu.tracking import native


class TestNative:
    def test_iou_matches_numpy(self, rng):
        a = rng.uniform(0, 100, (15, 4)).astype(np.float32)
        a[:, 2:] = a[:, :2] + rng.uniform(5, 40, (15, 2))
        b = rng.uniform(0, 100, (11, 4)).astype(np.float32)
        b[:, 2:] = b[:, :2] + rng.uniform(5, 40, (11, 2))
        got = native.iou_matrix(a, b)
        want = native._iou_numpy(a, b)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_lsap_matches_scipy_fuzz(self, rng):
        import scipy.optimize

        for _ in range(100):
            n, m = int(rng.integers(1, 14)), int(rng.integers(1, 14))
            cost = rng.uniform(0, 10, (n, m))
            r1, c1 = native.linear_sum_assignment(cost)
            r2, c2 = scipy.optimize.linear_sum_assignment(cost)
            assert np.isclose(cost[r1, c1].sum(), cost[r2, c2].sum()), \
                f"suboptimal assignment on {n}x{m}"

    def test_lsap_shapes(self):
        cost = np.asarray([[1.0, 2.0], [2.0, 1.0], [3.0, 3.0]])  # n > m
        r, c = native.linear_sum_assignment(cost)
        assert len(r) == len(c) == 2  # min(n, m) assignments

    def test_empty(self):
        out = native.iou_matrix(np.zeros((0, 4), np.float32),
                                np.zeros((3, 4), np.float32))
        assert out.shape == (0, 3)

    def test_bytetrack_uses_native_and_stays_deterministic(self, rng):
        """Tracker behavior must be identical regardless of backend."""
        from hockey_tpu.tracking.bytetrack import ByteTrack

        def run():
            tr = ByteTrack(minimum_consecutive_frames=1)
            ids_all = []
            pos = rng_local.uniform(100, 500, (5, 2))
            for f in range(10):
                pos_f = pos + f * 3
                boxes = np.stack([
                    np.asarray([x - 20, y - 40, x + 20, y + 40], np.float32)
                    for x, y in pos_f])
                _, _, _, ids = tr.update(boxes, np.full(5, 0.9, np.float32))
                ids_all.append(sorted(ids.tolist()))
            return ids_all

        rng_local = np.random.default_rng(3)
        a = run()
        rng_local = np.random.default_rng(3)
        b = run()
        assert a == b
