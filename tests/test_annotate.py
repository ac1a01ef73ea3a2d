"""Stabilizer + annotator tests (reference semantics from
adaptive_size_stabilizer.py / detection_stabilizer.py / kalman_tracker.py)."""

import numpy as np
import pytest

from hockey_tpu.annotate.draw import BoxAnnotator, LabelAnnotator, Palette
from hockey_tpu.annotate.smooth import SmoothAnnotator
from hockey_tpu.annotate.stabilizers import (
    AdaptiveStabilizer,
    EmaStabilizer,
    KalmanStabilizer,
    hysteresis_round,
    make_stabilizer,
)


def box(cx, cy, w=40.0, h=80.0):
    return np.asarray([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], np.float32)


class TestHysteresisRound:
    def test_zones(self):
        vals = np.asarray([10.9, 10.1, 10.5, 10.85, 10.15])
        got = hysteresis_round(vals)
        # >0.8 -> up, <0.2 -> trunc, middle -> round
        np.testing.assert_array_equal(got, [11, 10, 10, 11, 10])


class TestEma:
    def test_first_frame_passthrough(self):
        st = EmaStabilizer(0.3)
        out = st.update_batch([1], box(100, 100)[None])
        np.testing.assert_allclose(out[0], box(100, 100), atol=0.51)

    def test_ema_formula(self):
        st = EmaStabilizer(0.3)
        st.update_batch([1], box(100, 100)[None])
        out = st.update_batch([1], box(110, 100)[None])
        want = 0.3 * box(110, 100) + 0.7 * box(100, 100)
        np.testing.assert_allclose(out[0], np.round(want), atol=1e-5)

    def test_cleanup(self):
        st = EmaStabilizer()
        st.update_batch([1, 2], np.stack([box(1, 1), box(2, 2)]))
        st.cleanup([2])
        assert 1 not in st.state and 2 in st.state


class TestAdaptive:
    def test_first_frame_passthrough(self):
        st = AdaptiveStabilizer()
        b = box(100, 100)
        out = st.update_batch([5], b[None], np.asarray([0.9]))
        np.testing.assert_allclose(out[0], b, atol=1e-5)

    def test_position_ema_alpha_scaled_by_conf(self):
        st = AdaptiveStabilizer(position_smoothing=0.4)
        st.update_batch([1], box(100, 100)[None], np.asarray([1.0]))
        out = st.update_batch([1], box(110, 100)[None], np.asarray([0.5]))
        # alpha = 0.4 * 0.5 = 0.2 -> cx = 0.2*110 + 0.8*100 = 102
        cx = (out[0, 0] + out[0, 2]) / 2
        assert cx == pytest.approx(102.0, abs=0.01)

    def test_size_more_stable_than_position(self):
        st = AdaptiveStabilizer(position_smoothing=0.4, size_smoothing_base=0.1)
        st.update_batch([1], box(100, 100, 40, 80)[None])
        out = st.update_batch([1], box(100, 100, 60, 80)[None])  # zero motion
        w = out[0, 2] - out[0, 0]
        # alpha_s = 0.1 (no motion, conf 1) -> w = 0.1*60 + 0.9*40 = 42
        assert w == pytest.approx(42.0, abs=0.1)

    def test_iqr_damping_halves_alpha(self):
        st = AdaptiveStabilizer(size_smoothing_base=0.2)
        for _ in range(6):  # fill history with steady size 40x80
            st.update_batch([1], box(100, 100, 40, 80)[None])
        prev_w = st.smooth_size[st._table.slots[1], 0]
        # 40 is inside IQR of history -> alpha halved to 0.1
        out = st.update_batch([1], box(100, 100, 40.0, 80)[None])
        assert np.isclose(st.smooth_size[st._table.slots[1], 0],
                          0.1 * 40 + 0.9 * prev_w, atol=1e-3)

    def test_aspect_ratio_clamp(self):
        st = AdaptiveStabilizer()
        for _ in range(8):
            st.update_batch([1], box(100, 100, 40, 80)[None])  # ar = 0.5
        # sudden extreme aspect: w 80 h 40 (ar=2) — should be pulled toward 0.5
        out = st.update_batch([1], box(100, 100, 80, 40)[None], np.asarray([1.0]))
        w = out[0, 2] - out[0, 0]
        h = out[0, 3] - out[0, 1]
        assert w / h < 1.5, "aspect clamp did not engage"

    def test_slot_reuse_after_cleanup(self):
        st = AdaptiveStabilizer()
        st.update_batch([1], box(1, 1)[None])
        st.cleanup([])
        st.update_batch([2], box(500, 500)[None])
        out = st.update_batch([2], box(510, 500)[None])
        cx = (out[0, 0] + out[0, 2]) / 2
        assert 500 < cx < 510, "stale state leaked into reused slot"


class TestKalmanStabilizer:
    def test_first_frame_rounded_passthrough(self):
        st = KalmanStabilizer()
        b = box(100.3, 100.3)
        out = st.update_batch([1], b[None], np.asarray([0.9]))
        assert np.abs(out[0] - b).max() <= 1.0

    def test_smooths_jitter(self):
        st = KalmanStabilizer()
        rng = np.random.default_rng(0)
        outs = []
        for f in range(30):
            b = box(100 + rng.normal(0, 2), 100 + rng.normal(0, 2))
            outs.append(st.update_batch([1], b[None], np.asarray([0.9]))[0])
        outs = np.stack(outs[5:])
        centers = (outs[:, 0] + outs[:, 2]) / 2
        assert centers.std() < 2.0, "output jitter not reduced"

    def test_tracks_fast_motion(self):
        st = KalmanStabilizer()
        for f in range(20):
            out = st.update_batch([1], box(100 + 20 * f, 100)[None], np.asarray([0.9]))
        cx = (out[0, 0] + out[0, 2]) / 2
        assert abs(cx - (100 + 20 * 19)) < 30, "lagging too far behind fast target"

    def test_cleanup_and_reset(self):
        st = KalmanStabilizer()
        st.update_batch([1, 2], np.stack([box(1, 1), box(9, 9)]))
        st.cleanup([1])
        assert 2 not in st.means
        st.reset()
        assert not st.means


class TestSmoothAnnotator:
    def test_bypass_without_tracker_ids(self):
        ann = SmoothAnnotator(BoxAnnotator(Palette(["#FF0000"])))
        boxes = box(50, 50)[None]
        out = ann.smooth_boxes(boxes, None)
        np.testing.assert_array_equal(out, boxes)

    def test_detections_not_mutated(self):
        ann = SmoothAnnotator(BoxAnnotator(Palette(["#FF0000"])))
        boxes = np.stack([box(50, 50)])
        orig = boxes.copy()
        ann.smooth_boxes(boxes, np.asarray([1]))
        ann.smooth_boxes(boxes, np.asarray([1]))
        np.testing.assert_array_equal(boxes, orig)

    def test_make_stabilizer_selection(self):
        assert isinstance(make_stabilizer(use_adaptive=True), AdaptiveStabilizer)
        assert isinstance(make_stabilizer(use_adaptive=False), KalmanStabilizer)


class TestDraw:
    def test_box_and_label_annotators_draw(self):
        scene = np.zeros((200, 200, 3), np.uint8)
        pal = Palette(["#FF1493", "#00BFFF", "#FF6347"])
        BoxAnnotator(pal).annotate(scene, np.asarray([[20, 20, 100, 150]]), np.asarray([1]))
        assert scene.sum() > 0
        # deep-sky-blue in BGR is (255, 191, 0)
        assert tuple(scene[20, 50]) == (255, 191, 0)
        LabelAnnotator(pal).annotate(scene, np.asarray([[20, 60, 100, 150]]),
                                     ["HOME"], np.asarray([0]))
        assert (scene[40:60, 20:100] != 0).any()


class TestStyledLabelAnnotator:
    def test_draws_styled_labels(self):
        from hockey_tpu.annotate.draw import StyledLabelAnnotator

        scene = np.zeros((200, 300, 3), np.uint8)
        pal = Palette(["#FF1493", "#00BFFF"])
        ann = StyledLabelAnnotator(pal)
        out = ann.annotate(scene, np.asarray([[40, 80, 160, 180]]),
                           ["TOR #12"], np.asarray([1]))
        assert out.sum() > 0
        # chip is alpha-blended, never fully saturated
        assert out.max() <= 255


class TestEllipseAnnotator:
    def test_draws_ground_ellipse(self):
        from hockey_tpu.annotate.draw import EllipseAnnotator

        scene = np.zeros((200, 200, 3), np.uint8)
        EllipseAnnotator(Palette(["#00BFFF"])).annotate(
            scene, np.asarray([[50, 40, 110, 160]]), np.asarray([0]))
        # ellipse sits at the bottom edge of the box
        assert scene[150:175, 40:130].sum() > 0
        assert scene[:120].sum() == 0


class TestAnnotationManager:
    def test_annotate_frame(self):
        from hockey_tpu.annotate.manager import AnnotationManager
        from hockey_tpu.core.config import Config

        mgr = AnnotationManager(Config())
        frame = np.zeros((200, 300, 3), np.uint8)
        boxes = np.asarray([[40, 40, 100, 160], [150, 40, 210, 160]], np.float32)
        out = mgr.annotate_frame(
            frame, boxes, ["TOR", "Goalie"], np.asarray([0, 2]),
            tracker_ids=np.asarray([1, 2]), confidences=np.asarray([0.9, 0.8]))
        assert out.sum() > 0
        assert frame.sum() == 0, "input frame must not be mutated"
