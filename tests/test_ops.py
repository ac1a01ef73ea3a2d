"""Unit tests for device ops: IoU, letterbox geometry, NMS."""

import jax.numpy as jnp
import numpy as np
import pytest

from hockey_tpu.ops.iou import box_iou, ciou, xywh_to_xyxy, xyxy_to_xywh
from hockey_tpu.ops.letterbox import (
    letterbox_batch,
    letterbox_params,
    unletterbox_boxes,
)
from hockey_tpu.ops.nms import nms, nms_batch


def ref_iou(a, b):
    """Trusted O(N*M) numpy IoU for comparison."""
    out = np.zeros((len(a), len(b)))
    for i, p in enumerate(a):
        for j, q in enumerate(b):
            x1, y1 = max(p[0], q[0]), max(p[1], q[1])
            x2, y2 = min(p[2], q[2]), min(p[3], q[3])
            inter = max(x2 - x1, 0) * max(y2 - y1, 0)
            ua = (p[2] - p[0]) * (p[3] - p[1]) + (q[2] - q[0]) * (q[3] - q[1]) - inter
            out[i, j] = inter / max(ua, 1e-7)
    return out


def ref_nms(boxes, scores, iou_thr):
    """Trusted sequential greedy NMS (single class)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = ref_iou(boxes[i : i + 1], boxes)[0]
        suppressed |= ious > iou_thr
        suppressed[i] = True
    return keep


class TestIoU:
    def test_matches_reference(self, rng):
        a = rng.uniform(0, 100, (13, 4)).astype(np.float32)
        b = rng.uniform(0, 100, (7, 4)).astype(np.float32)
        a[:, 2:] = a[:, :2] + np.abs(a[:, 2:] - a[:, :2])
        b[:, 2:] = b[:, :2] + np.abs(b[:, 2:] - b[:, :2])
        got = np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, ref_iou(a, b), atol=1e-5)

    def test_identity(self):
        b = jnp.asarray([[0.0, 0, 10, 10], [5, 5, 15, 15]])
        m = box_iou(b, b)
        np.testing.assert_allclose(np.diag(np.asarray(m)), 1.0, atol=1e-6)

    def test_ciou_bounds_and_perfect(self):
        b = jnp.asarray([[0.0, 0, 10, 10]])
        assert float(ciou(b, b)[0]) == pytest.approx(1.0, abs=1e-5)
        far = jnp.asarray([[100.0, 100, 110, 110]])
        assert float(ciou(b, far)[0]) < 0.0

    def test_xywh_roundtrip(self, rng):
        xyxy = rng.uniform(0, 50, (5, 4)).astype(np.float32)
        xyxy[:, 2:] += xyxy[:, :2]
        back = np.asarray(xywh_to_xyxy(xyxy_to_xywh(jnp.asarray(xyxy))))
        np.testing.assert_allclose(back, xyxy, atol=1e-4)


class TestLetterbox:
    def test_params_match_ultralytics_semantics(self):
        # 1080p -> 1280: r = 1280/1920 = 2/3, new = (720, 1280), pad top 280.
        r, nh, nw, pt, pl = letterbox_params(1080, 1920, 1280)
        assert (nh, nw) == (720, 1280)
        assert r == pytest.approx(2 / 3)
        assert (pt, pl) == (280, 0)

    def test_shapes_and_padding_value(self):
        frames = np.zeros((2, 108, 192, 3), np.uint8)
        out = np.asarray(letterbox_batch(jnp.asarray(frames), 128, jnp.float32))
        assert out.shape == (2, 128, 128, 3)
        # top rows are gray padding
        np.testing.assert_allclose(out[:, 0, :, :], 114.0 / 255.0, atol=1e-3)
        # content region is black
        np.testing.assert_allclose(out[:, 64, :, :], 0.0, atol=1e-3)

    def test_box_roundtrip(self):
        h, w, s = 1080, 1920, 1280
        r, _, _, pt, pl = letterbox_params(h, w, s)
        orig = jnp.asarray([[100.0, 200, 500, 800]])
        lb = orig * r + jnp.asarray([pl, pt, pl, pt], jnp.float32)
        back = np.asarray(unletterbox_boxes(lb, h, w, s))
        np.testing.assert_allclose(back, np.asarray(orig), atol=1e-3)


class TestNMS:
    def test_matches_sequential_reference(self, rng):
        n = 80
        boxes = rng.uniform(0, 200, (n, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(10, 60, (n, 2))
        scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
        classes = np.zeros(n, np.int32)
        det = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            score_threshold=0.0, iou_threshold=0.5, pre_topk=n, max_det=n,
        )
        kept = sorted(np.flatnonzero(np.asarray(det.valid)).tolist())
        got_boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
        want = ref_nms(boxes, scores, 0.5)
        want_boxes = boxes[sorted(want, key=lambda i: -scores[i])]
        assert len(kept) == len(want)
        np.testing.assert_allclose(np.sort(got_boxes, 0), np.sort(want_boxes, 0), atol=1e-4)

    def test_class_aware_keeps_overlapping_different_classes(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [0.5, 0, 10, 10]])
        scores = jnp.asarray([0.9, 0.8])
        classes = jnp.asarray([0, 1])
        det = nms(boxes, scores, classes, score_threshold=0.1, pre_topk=2, max_det=2)
        assert int(det.valid.sum()) == 2
        det2 = nms(
            boxes, scores, jnp.asarray([0, 0]),
            score_threshold=0.1, pre_topk=2, max_det=2,
        )
        assert int(det2.valid.sum()) == 1

    def test_containment_suppresses_partial_duplicate(self):
        """A torso box inside a full-body box of the same class survives
        pure-IoU NMS (IoU under the gate) but dies under the containment
        term; different-class and low-containment boxes are untouched."""
        full = [0.0, 0, 40, 100]     # full-body
        torso = [2.0, 5, 38, 48]     # inside full: IoU ~0.42, IoMin ~0.97
        apart = [100.0, 0, 140, 100]
        boxes = jnp.asarray([full, torso, apart])
        scores = jnp.asarray([0.9, 0.7, 0.8])
        det = nms(boxes, scores, jnp.asarray([0, 0, 0]),
                  score_threshold=0.1, iou_threshold=0.45,
                  pre_topk=3, max_det=3)
        assert int(det.valid.sum()) == 3  # pure IoU: duplicate survives
        det2 = nms(boxes, scores, jnp.asarray([0, 0, 0]),
                   score_threshold=0.1, iou_threshold=0.45,
                   containment_threshold=0.5, pre_topk=3, max_det=3)
        kept = np.sort(np.asarray(det2.scores)[np.asarray(det2.valid)])
        np.testing.assert_allclose(kept, [0.8, 0.9], atol=1e-6)
        # class-aware: cross-class containment is NOT suppressed
        det3 = nms(boxes, scores, jnp.asarray([0, 1, 0]),
                   score_threshold=0.1, iou_threshold=0.45,
                   containment_threshold=0.5, pre_topk=3, max_det=3)
        assert int(det3.valid.sum()) == 3

    def test_score_threshold_and_padding(self):
        boxes = jnp.asarray([[0.0, 0, 10, 10], [20, 20, 30, 30]])
        scores = jnp.asarray([0.9, 0.05])
        classes = jnp.asarray([0, 0])
        det = nms(boxes, scores, classes, score_threshold=0.4, pre_topk=2, max_det=4)
        assert det.boxes.shape == (4, 4)
        assert int(det.valid.sum()) == 1
        assert float(det.scores[0]) == pytest.approx(0.9, abs=1e-5)
        assert np.all(np.asarray(det.scores[1:]) == -1.0)

    def test_batch_vmap(self, rng):
        boxes = rng.uniform(0, 100, (3, 20, 4)).astype(np.float32)
        boxes[..., 2:] = boxes[..., :2] + 10
        scores = rng.uniform(0, 1, (3, 20)).astype(np.float32)
        classes = np.zeros((3, 20), np.int32)
        det = nms_batch(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            pre_topk=20, max_det=8,
        )
        assert det.boxes.shape == (3, 8, 4)

    def test_fast_mode_is_superset_of_suppression(self, rng):
        n = 50
        boxes = rng.uniform(0, 100, (n, 4)).astype(np.float32)
        boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 40, (n, 2))
        scores = rng.uniform(0.3, 1.0, n).astype(np.float32)
        classes = np.zeros(n, np.int32)
        exact = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
                    pre_topk=n, max_det=n, exact=True, score_threshold=0.0)
        fast = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
                   pre_topk=n, max_det=n, exact=False, score_threshold=0.0)
        # fast NMS can only suppress more, never less
        assert int(fast.valid.sum()) <= int(exact.valid.sum())


class TestRectLetterbox:
    def test_rect_shape_1080p(self):
        from hockey_tpu.ops.letterbox import rect_letterbox_params, rect_shape

        assert rect_shape(1080, 1920, 1280) == (736, 1280)
        r, nh, nw, pt, pl, ih, iw = rect_letterbox_params(1080, 1920, 1280)
        assert (nh, nw) == (720, 1280)
        assert (ih, iw) == (736, 1280)
        assert pt == 8 and pl == 0

    def test_rect_batch_matches_square_content(self):
        from hockey_tpu.ops.letterbox import (
            letterbox_batch,
            letterbox_rect_batch,
            letterbox_params,
            rect_letterbox_params,
        )

        frames = np.random.default_rng(0).integers(
            0, 255, (1, 108, 192, 3), dtype=np.uint8)
        sq = np.asarray(letterbox_batch(jnp.asarray(frames), 128, jnp.float32))
        rc = np.asarray(letterbox_rect_batch(jnp.asarray(frames), 128, 32, jnp.float32))
        assert rc.shape == (1, 96, 128, 3)
        _, nh, nw, spt, spl = letterbox_params(108, 192, 128)
        _, _, _, rpt, rpl, _, _ = rect_letterbox_params(108, 192, 128)
        np.testing.assert_allclose(
            sq[0, spt: spt + nh, spl: spl + nw],
            rc[0, rpt: rpt + nh, rpl: rpl + nw], atol=1e-4)

    def test_rect_detector_boxes_in_frame_coords(self):
        from hockey_tpu.core.config import Config
        from hockey_tpu.models.detector import Detector

        cfg = Config(nms_pre_topk=64, max_detections=8)
        det = Detector("hockey-puck-detection", cfg, frame_hw=(108, 192),
                       imgsz=128, conf=0.0001, seed=0)
        frames = np.random.default_rng(0).integers(
            0, 255, (1, 108, 192, 3), dtype=np.uint8)
        out = det.detect_batch(frames)
        b = np.asarray(out.boxes)
        assert (b[..., [0, 2]] <= 192 + 1e-3).all()
        assert (b[..., [1, 3]] <= 108 + 1e-3).all()
