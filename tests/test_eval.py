"""mAP evaluation harness tests (against hand-computable cases)."""

import numpy as np

from hockey_tpu.train.eval import EvalAccumulator, _ap_101


class TestAP:
    def test_perfect_detections(self):
        acc = EvalAccumulator(2)
        gt = np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)
        cls = np.asarray([0, 1])
        acc.add_image(gt, np.asarray([0.9, 0.8]), cls, gt, cls)
        m = acc.compute()
        assert m["mAP50"] == 1.0
        assert m["mAP50_95"] == 1.0
        assert m["precision"] == 1.0 and m["recall"] == 1.0

    def test_no_detections(self):
        acc = EvalAccumulator(1)
        acc.add_image(np.zeros((0, 4)), np.zeros(0), np.zeros(0, np.int64),
                      np.asarray([[0, 0, 10, 10.0]]), np.asarray([0]))
        m = acc.compute()
        assert m["mAP50"] == 0.0

    def test_half_matched(self):
        acc = EvalAccumulator(1)
        gt = np.asarray([[0, 0, 10, 10], [100, 100, 120, 120]], np.float32)
        # one correct, one total miss (still predicted)
        preds = np.asarray([[0, 0, 10, 10], [500, 500, 520, 520]], np.float32)
        acc.add_image(preds, np.asarray([0.9, 0.8]), np.zeros(2, np.int64),
                      gt, np.zeros(2, np.int64))
        m = acc.compute()
        # recall 0.5; AP50 ≈ precision 1.0 up to recall 0.5 -> ~0.5
        assert 0.45 <= m["mAP50"] <= 0.55

    def test_localization_quality_affects_map5095_not_map50(self):
        acc = EvalAccumulator(1)
        gt = np.asarray([[0, 0, 100, 100.0]])
        loose = np.asarray([[0, 0, 100, 70.0]])  # IoU = 0.7
        acc.add_image(loose, np.asarray([0.9]), np.zeros(1, np.int64),
                      gt, np.zeros(1, np.int64))
        m = acc.compute()
        assert m["mAP50"] == 1.0
        assert m["mAP50_95"] < 0.6  # fails at IoU >= 0.75 thresholds

    def test_wrong_class_not_matched(self):
        acc = EvalAccumulator(2)
        gt = np.asarray([[0, 0, 10, 10.0]])
        acc.add_image(gt, np.asarray([0.9]), np.asarray([1]),
                      gt, np.asarray([0]))
        m = acc.compute()
        assert m["AP50_class0"] == 0.0

    def test_duplicate_detections_penalized(self):
        acc = EvalAccumulator(1)
        gt = np.asarray([[0, 0, 10, 10.0]])
        preds = np.repeat(gt, 3, axis=0)
        acc.add_image(preds, np.asarray([0.9, 0.8, 0.7]), np.zeros(3, np.int64),
                      gt, np.zeros(1, np.int64))
        m = acc.compute()
        assert m["mAP50"] == 1.0  # AP unaffected (dup below the match)
        # but precision at best-F1 point reflects only 1 of up-to-3 used
        assert m["precision"] == 1.0  # best F1 cuts off after the first

    def test_ap101_monotone_envelope(self):
        r = np.asarray([0.1, 0.5, 0.9])
        p = np.asarray([1.0, 0.2, 0.6])
        ap = _ap_101(r, p)
        assert 0 < ap < 1


class TestEvaluateDetector:
    def test_synthetic_dataset_stub_detector(self):
        from hockey_tpu.train.data import SyntheticHockeyDataset
        from hockey_tpu.train.eval import evaluate_detector

        ds = SyntheticHockeyDataset(imgsz=64, seed=0)

        class Oracle:
            class cfg:
                num_classes = 2

            def detect(self, img):
                # peek at the matching dataset item (oracle predictions)
                from hockey_tpu.models.detector import HostDetections
                item = ds.load(self._i)
                m = item["mask"]
                return HostDetections(
                    item["boxes"][m], np.full(m.sum(), 0.9, np.float32),
                    item["classes"][m].astype(np.int32))

        det = Oracle()
        acc_metrics = []
        for i in range(3):
            det._i = i
            m = evaluate_detector(det, ds, [i])
            acc_metrics.append(m["mAP50"])
        assert all(v == 1.0 for v in acc_metrics)


class TestPoseEval:
    def test_perfect_keypoints(self):
        from hockey_tpu.train.eval import PoseEvalAccumulator

        acc = PoseEvalAccumulator()
        k = np.zeros((5, 3), np.float32)
        k[:, 0] = np.arange(5) * 10
        k[:, 1] = 50
        k[:, 2] = 1
        acc.add_image(k, k, (100, 100))
        m = acc.compute()
        assert m["mean_kpt_error_px"] == 0.0
        assert m["pck"] == 1.0

    def test_pck_threshold(self):
        from hockey_tpu.train.eval import PoseEvalAccumulator

        acc = PoseEvalAccumulator(pck_threshold=0.05)
        gt = np.asarray([[50, 50, 1], [80, 80, 1]], np.float32)
        # diag of 100x100 image ~ 141; threshold ~ 7.07 px
        pred = gt.copy()
        pred[0, 0] += 5.0   # within
        pred[1, 0] += 20.0  # outside
        acc.add_image(pred, gt, (100, 100))
        m = acc.compute()
        assert m["pck"] == 0.5
        assert 10 < m["mean_kpt_error_px"] < 15

    def test_invisible_keypoints_ignored(self):
        from hockey_tpu.train.eval import PoseEvalAccumulator

        acc = PoseEvalAccumulator()
        gt = np.asarray([[50, 50, 0]], np.float32)  # invisible
        acc.add_image(np.asarray([[999, 999, 1]], np.float32), gt, (100, 100))
        m = acc.compute()
        assert np.isnan(m["mean_kpt_error_px"])
