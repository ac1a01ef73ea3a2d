"""Sliced puck detection + PuckTracker + OCR reader tests."""

import numpy as np
import pytest

from hockey_tpu.core.config import Config
from hockey_tpu.ocr.jersey import JerseyNumberReader
from hockey_tpu.slicing.sahi import PuckTracker, SlicedDetector, slice_grid


class TestSliceGrid:
    def test_covers_frame(self):
        g = slice_grid(1080, 1920, 640, 0.2)
        ys = {y for y, x in g}
        xs = {x for y, x in g}
        assert 0 in ys and 1080 - 640 in ys
        assert 0 in xs and 1920 - 640 in xs
        # every pixel covered
        for y, x in [(0, 0), (1079, 1919), (540, 960)]:
            assert any(oy <= y < oy + 640 and ox <= x < ox + 640 for oy, ox in g)

    def test_small_frame_single_tile(self):
        assert slice_grid(400, 500, 640, 0.2) == [(0, 0)]

    def test_overlap_stride(self):
        g = slice_grid(1080, 1920, 640, 0.2)
        xs = sorted({x for _, x in g})
        assert xs[1] - xs[0] == 512  # 640 * 0.8


class TestSlicedDetector:
    def test_one_batched_call_and_merge(self, rng):
        cfg = Config(puck_slice_size=128, puck_slice_overlap=0.25,
                     nms_pre_topk=32, max_detections=8)
        sd = SlicedDetector(cfg, frame_hw=(256, 384), seed=0)
        # stride 96: rows start at 0/96/128(flush), cols at 0/96/192/256(flush)
        assert len(sd.grid) == 12
        frame = rng.integers(0, 255, (256, 384, 3)).astype(np.uint8)
        boxes, scores = sd.detect(frame)
        # random weights: just assert contract (frame coords, shapes)
        assert boxes.ndim == 2 and boxes.shape[1] == 4
        if len(boxes):
            assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 384 + 128).all()


class TestPuckTracker:
    def test_smoothing_and_trail(self):
        t = PuckTracker(trail_length=10, smooth_window=3)
        for i in range(8):
            p = t.update((100.0 + 10 * i, 200.0))
        assert p is not None
        assert 150 < p[0] <= 170  # smoothed lags slightly
        assert len(t.trail) == 8

    def test_gap_handling(self):
        t = PuckTracker(max_gap=3)
        t.update((100.0, 100.0))
        for _ in range(2):  # short gap: holds position
            assert t.update(None) is not None
        for _ in range(5):  # long gap: resets
            t.update(None)
        assert t.update(None) is None

    def test_draw_trail(self):
        import cv2  # noqa: F401

        t = PuckTracker()
        for i in range(5):
            t.update((50.0 + 5 * i, 60.0))
        frame = np.zeros((120, 120, 3), np.uint8)
        out = t.draw_trail(frame)
        assert out.sum() > 0


class TestOCR:
    def test_unavailable_degrades_gracefully(self):
        r = JerseyNumberReader()
        # easyocr is not installed in this environment
        assert r.available is False
        r.observe(np.zeros((100, 100, 3), np.uint8),
                  np.asarray([[10, 10, 50, 90]]), np.asarray([1]))
        assert r.get_number(1) is None

    def test_number_persistence_api(self):
        r = JerseyNumberReader()
        r.numbers[5] = "42"
        assert r.get_number(5) == "42"
        r.drop(5)
        assert r.get_number(5) is None
