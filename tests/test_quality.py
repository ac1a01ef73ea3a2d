"""Detection-quality gates on the shipped trained checkpoints.

The reference's deployed capability is a trained detector (mAP50 0.690 /
player 0.784, notebooks/train_player_detection.ipynb cell 15). These
tests hold the shipped checkpoints (hockey_tpu/data/weights/) to a
working-quality bar on held-out hard synthetic scenes — the same
distribution train/loop.py validates on. They skip when no trained
checkpoint ships (random-init weights would be meaningless to gate).
"""

from __future__ import annotations

import numpy as np
import pytest


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def _pr_on_scenes(det, n_scenes: int, seed: int, pucks: bool,
                  conf: float, iou_thr: float = 0.5):
    """Greedy-matched precision/recall of `det` over held-out scenes."""
    from hockey_tpu.train.scenes import render_scene

    tp = fp = fn = 0
    for i in range(n_scenes):
        rng = np.random.default_rng((9999 + seed) * 1_000_003
                                    + i * 7919 + pucks)
        img, gt_boxes, _ = render_scene(rng, 640, pucks=pucks)
        out = det.detect(img)
        keep = out.scores >= conf
        boxes = out.boxes[keep]
        if len(gt_boxes) == 0:
            fp += len(boxes)
            continue
        if len(boxes) == 0:
            fn += len(gt_boxes)
            continue
        m = _iou(np.asarray(boxes, np.float64), np.asarray(gt_boxes, np.float64))
        matched_gt = set()
        for j in np.argsort(-out.scores[keep]):
            k = int(m[j].argmax())
            if m[j, k] >= iou_thr and k not in matched_gt:
                matched_gt.add(k)
                tp += 1
            else:
                fp += 1
        fn += len(gt_boxes) - len(matched_gt)
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec


class TestShippedPlayerDetector:
    def test_detects_players_on_held_out_scenes(self):
        from hockey_tpu.core.config import Config
        from hockey_tpu.models.checkpoint import shipped_weights_path
        from hockey_tpu.models.detector import Detector

        if shipped_weights_path("hockey-player-detection") is None:
            pytest.skip("no shipped player checkpoint")
        config = Config()
        config.detection_imgsz = 640
        det = Detector("hockey-player-detection", config,
                       frame_hw=(640, 640), imgsz=640, conf=0.25)
        prec, rec = _pr_on_scenes(det, n_scenes=6, seed=0, pucks=False,
                                  conf=0.4)
        assert rec >= 0.55, f"recall {rec:.3f} on held-out hard scenes"
        assert prec >= 0.6, f"precision {prec:.3f} on held-out hard scenes"


class TestShippedRinkPoseModel:
    def test_keypoints_on_held_out_views(self):
        from hockey_tpu.core.config import Config
        from hockey_tpu.homography.keypoints import RinkKeypointDetector
        from hockey_tpu.models.checkpoint import shipped_weights_path
        from hockey_tpu.train.data import SyntheticRinkDataset
        from hockey_tpu.train.eval import PoseEvalAccumulator

        if shipped_weights_path("hockey-detection") is None:
            pytest.skip("no shipped rink checkpoint")
        config = Config()
        # evaluate at the shipped model's OPERATING resolution (the
        # pipeline always runs the rink branch at config.rink_imgsz;
        # pose accuracy does not survive off-resolution inference)
        s = config.rink_imgsz
        rkd = RinkKeypointDetector("hockey-detection", config,
                                   frame_hw=(s, s))
        ds = SyntheticRinkDataset(imgsz=s, seed=4242)
        acc = PoseEvalAccumulator()
        # 24 scenes, not 6: per-view PCK ranges 0.17-1.0 on hard views
        # (measured on the shipped rink_s_w_tpu: 6-scene probe 0.645 vs
        # 0.838 over 24 at this seed, 0.886 over the 200-image val pool,
        # logs/val_rink_shipped.json) — a 6-scene sample gates on view
        # luck, not model quality. Deterministic rendering + CPU
        # inference makes the 24-scene number exactly reproducible.
        for i in range(0, 24, 6):
            items = [ds.load(j) for j in range(i, i + 6)]
            frames = np.stack([(it["images"] * 255).astype(np.uint8)
                               for it in items])
            kpts = rkd.detect_keypoints_batch(frames)
            for j, it in enumerate(items):
                acc.add_image(kpts[j], it["keypoints"][0], (s, s))
        m = acc.compute()
        assert m["pck"] >= 0.8, f"PCK@0.05 {m['pck']:.3f} on held-out views"


class TestShippedPuckDetector:
    def test_finds_pucks_on_held_out_scenes(self):
        from hockey_tpu.core.config import Config
        from hockey_tpu.models.checkpoint import shipped_weights_path
        from hockey_tpu.models.detector import Detector

        if shipped_weights_path("hockey-puck-detection") is None:
            pytest.skip("no shipped puck checkpoint")
        config = Config()
        config.detection_imgsz = 640
        det = Detector("hockey-puck-detection", config,
                       frame_hw=(640, 640), imgsz=640, conf=0.2)
        prec, rec = _pr_on_scenes(det, n_scenes=8, seed=0, pucks=True,
                                  conf=0.25)
        # the puck is tiny and often occluded; the bar is "actually finds
        # pucks", not player-level AP
        assert rec >= 0.4, f"puck recall {rec:.3f}"
        assert prec >= 0.4, f"puck precision {prec:.3f}"
