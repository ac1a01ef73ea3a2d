"""Detection evaluation: mAP50 / mAP50-95 / precision / recall.

Mirrors the reference's validation metrics (ultralytics `yolo mode=val`,
notebooks/train_player_detection.ipynb cell 15 output — the numbers in
BASELINE.md) so parity can be checked when real data/checkpoints exist:
greedy per-image matching at IoU thresholds 0.50:0.95:0.05, 101-point
interpolated AP per class, P/R reported at IoU 0.50.

Host-side numpy: evaluation is offline and tiny-N; the detector forward
that produces the predictions runs on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = np.arange(0.50, 0.96, 0.05)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return (inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-9)).astype(np.float32)


@dataclasses.dataclass
class EvalAccumulator:
    """Streaming accumulator: feed per-image predictions + ground truth."""

    num_classes: int

    def __post_init__(self):
        # per prediction: (score, class, tp-flags per IoU threshold)
        self._scores: List[np.ndarray] = []
        self._classes: List[np.ndarray] = []
        self._tps: List[np.ndarray] = []
        self._gt_per_class = np.zeros(self.num_classes, np.int64)

    def add_image(
        self,
        pred_boxes: np.ndarray, pred_scores: np.ndarray, pred_classes: np.ndarray,
        gt_boxes: np.ndarray, gt_classes: np.ndarray,
    ) -> None:
        pred_boxes = np.asarray(pred_boxes, np.float32).reshape(-1, 4)
        gt_boxes = np.asarray(gt_boxes, np.float32).reshape(-1, 4)
        pred_scores = np.asarray(pred_scores, np.float32).reshape(-1)
        pred_classes = np.asarray(pred_classes, np.int64).reshape(-1)
        gt_classes = np.asarray(gt_classes, np.int64).reshape(-1)
        for c in gt_classes:
            if 0 <= c < self.num_classes:
                self._gt_per_class[c] += 1

        n, t = len(pred_boxes), len(IOU_THRESHOLDS)
        tp = np.zeros((n, t), bool)
        if n and len(gt_boxes):
            order = np.argsort(-pred_scores)
            iou = _iou_matrix(pred_boxes, gt_boxes)
            same = pred_classes[:, None] == gt_classes[None, :]
            iou = np.where(same, iou, 0.0)
            for ti, thr in enumerate(IOU_THRESHOLDS):
                taken = np.zeros(len(gt_boxes), bool)
                for i in order:
                    j = int(np.argmax(np.where(taken, -1.0, iou[i])))
                    if iou[i, j] >= thr and not taken[j]:
                        taken[j] = True
                        tp[i, ti] = True
        self._scores.append(pred_scores)
        self._classes.append(pred_classes)
        self._tps.append(tp)

    # ------------------------------------------------------------------
    def compute(self) -> Dict[str, float]:
        if not self._scores:
            return {"mAP50": 0.0, "mAP50_95": 0.0, "precision": 0.0, "recall": 0.0}
        scores = np.concatenate(self._scores)
        classes = np.concatenate(self._classes)
        tps = np.concatenate(self._tps, axis=0)
        order = np.argsort(-scores)
        classes, tps = classes[order], tps[order]

        ap = np.zeros((self.num_classes, len(IOU_THRESHOLDS)))
        p50 = np.zeros(self.num_classes)
        r50 = np.zeros(self.num_classes)
        for c in range(self.num_classes):
            m = classes == c
            n_gt = self._gt_per_class[c]
            if n_gt == 0:
                ap[c] = np.nan
                p50[c] = r50[c] = np.nan
                continue
            if not m.any():
                continue
            tp_c = tps[m]
            cum_tp = np.cumsum(tp_c, axis=0)
            cum_fp = np.cumsum(~tp_c, axis=0)
            recall = cum_tp / n_gt
            precision = cum_tp / np.maximum(cum_tp + cum_fp, 1e-9)
            for ti in range(len(IOU_THRESHOLDS)):
                ap[c, ti] = _ap_101(recall[:, ti], precision[:, ti])
            # P/R at the score that maximizes F1 (ultralytics convention)
            f1 = 2 * precision[:, 0] * recall[:, 0] / np.maximum(
                precision[:, 0] + recall[:, 0], 1e-9)
            best = int(np.argmax(f1))
            p50[c] = precision[best, 0]
            r50[c] = recall[best, 0]

        out = {
            "mAP50": float(np.nanmean(ap[:, 0])),
            "mAP50_95": float(np.nanmean(ap)),
            "precision": float(np.nanmean(p50)),
            "recall": float(np.nanmean(r50)),
        }
        for c in range(self.num_classes):
            out[f"AP50_class{c}"] = float(ap[c, 0])
            out[f"AP50_95_class{c}"] = float(np.mean(ap[c]))
        return out


def _ap_101(recall: np.ndarray, precision: np.ndarray) -> float:
    """COCO 101-point interpolated average precision: precision at recall
    point r = monotone-envelope precision of the first sample with
    recall >= r (pycocotools semantics; searchsorted avoids the
    duplicate-x ambiguity of interp at recall exactly 1.0)."""
    mpre = np.maximum.accumulate(precision[::-1])[::-1]
    x = np.linspace(0, 1, 101)
    idx = np.searchsorted(recall, x, side="left")
    valid = idx < len(recall)
    vals = np.where(valid, mpre[np.minimum(idx, len(recall) - 1)], 0.0)
    return float(np.mean(vals))


@dataclasses.dataclass
class PoseEvalAccumulator:
    """Keypoint metrics for the rink pose model: mean pixel error over
    visible keypoints and PCK@t (fraction within t * image diagonal).
    Complements the box mAP metrics for `hockey-detection` training."""

    pck_threshold: float = 0.05

    def __post_init__(self):
        self._errs: List[np.ndarray] = []
        self._diags: List[float] = []

    def add_image(self, pred_kpts: np.ndarray, gt_kpts: np.ndarray,
                  image_hw: Tuple[int, int]) -> None:
        """pred/gt: (K, 3) with (x, y, conf/visible)."""
        pred_kpts = np.asarray(pred_kpts, np.float32)
        gt_kpts = np.asarray(gt_kpts, np.float32)
        vis = gt_kpts[:, 2] > 0.5
        if not vis.any():
            return
        err = np.linalg.norm(pred_kpts[vis, :2] - gt_kpts[vis, :2], axis=1)
        self._errs.append(err)
        self._diags.append(float(np.hypot(*image_hw)))

    def compute(self) -> Dict[str, float]:
        if not self._errs:
            return {"mean_kpt_error_px": float("nan"), "pck": 0.0}
        errs = np.concatenate(self._errs)
        norm = np.concatenate([
            np.full(len(e), d) for e, d in zip(self._errs, self._diags)])
        return {
            "mean_kpt_error_px": float(errs.mean()),
            "pck": float((errs <= self.pck_threshold * norm).mean()),
        }


def evaluate_detector(
    detector,
    dataset,
    indices: Sequence[int],
    conf: float = 0.001,
    batch: int = 8,
) -> Dict[str, float]:
    """Run a hockey_tpu Detector over dataset items and compute metrics.
    `dataset` yields dicts with 'images' (S, S, 3) f32 [0,1] + padded gt.

    Batched (`batch` images per device call): single-frame calls pay a
    full host<->device round trip each, which dominates wall clock on
    remote-tunnel deployments (measured ~1-2 s/image vs ~0.1 s batched)."""
    from ..ops.nms import Detections

    acc = EvalAccumulator(detector.cfg.num_classes)
    idx = list(indices)
    if not hasattr(detector, "detect_batch"):  # stub detectors (tests)
        for i in idx:
            item = (dataset.load(int(i)) if hasattr(dataset, "load")
                    else dataset[i])
            img = (item["images"] * 255).astype(np.uint8)
            det = detector.detect(img)
            keep = det.scores >= conf
            gt_m = item["mask"]
            acc.add_image(det.boxes[keep], det.scores[keep],
                          det.classes[keep],
                          item["boxes"][gt_m], item["classes"][gt_m])
        return acc.compute()
    for k in range(0, len(idx), batch):
        chunk = idx[k: k + batch]
        items = [dataset.load(int(i)) if hasattr(dataset, "load")
                 else dataset[i] for i in chunk]
        imgs = np.stack([(it["images"] * 255).astype(np.uint8)
                         for it in items])
        if len(chunk) < batch:  # static shapes: pad the tail
            imgs = np.concatenate(
                [imgs, np.repeat(imgs[-1:], batch - len(chunk), 0)])
        out = detector.detect_batch(imgs)
        det = out[0] if not isinstance(out, Detections) else out
        valid = np.asarray(det.valid)
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        classes = np.asarray(det.classes)
        for j, it in enumerate(items):
            keep = valid[j] & (scores[j] >= conf)
            gt_m = it["mask"]
            acc.add_image(boxes[j][keep], scores[j][keep],
                          classes[j][keep],
                          it["boxes"][gt_m], it["classes"][gt_m])
    return acc.compute()


class InTrainingEvaluator:
    """Periodic mAP evaluation during training with ONE compiled detect
    program reused across evals (a fresh Detector per eval would recompile
    the megastep every time). Batched: 8 images per device call."""

    BATCH = 8

    def __init__(self, cfg, imgsz: int, conf: float = 0.001):
        from ..models.detector import build_detect_fn

        self.cfg = cfg
        self.imgsz = imgsz
        self.conf = conf
        self._fn = build_detect_fn(
            cfg, imgsz=imgsz, frame_hw=(imgsz, imgsz), conf=conf,
            rect=False, max_det=96, pre_topk=384)

    def evaluate(self, params, dataset, indices: Sequence[int]) -> Dict[str, float]:
        from ..models.layers import fuse_for_inference

        fused = fuse_for_inference(params)
        acc = EvalAccumulator(self.cfg.num_classes)
        idx = list(indices)
        for k in range(0, len(idx), self.BATCH):
            chunk = idx[k: k + self.BATCH]
            items = [dataset.load(int(i)) for i in chunk]
            imgs = np.stack([(it["images"] * 255).astype(np.uint8)
                             for it in items])
            if len(chunk) < self.BATCH:  # static shapes: pad the tail
                pad = np.repeat(imgs[-1:], self.BATCH - len(chunk), 0)
                imgs = np.concatenate([imgs, pad])
            det = self._fn(fused, imgs)
            valid = np.asarray(det.valid)
            boxes = np.asarray(det.boxes)
            scores = np.asarray(det.scores)
            classes = np.asarray(det.classes)
            for j, it in enumerate(items):
                v = valid[j]
                gt_m = it["mask"]
                acc.add_image(boxes[j][v], scores[j][v], classes[j][v],
                              it["boxes"][gt_m], it["classes"][gt_m])
        return acc.compute()


class InTrainingPoseEvaluator:
    """Periodic keypoint evaluation during pose (rink) training — the PCK
    analogue of InTrainingEvaluator, with ONE compiled pose-detect program
    reused across evals. Without this the pose path had no in-loop val at
    all, so --val-every was inert and no `.best` checkpoint was ever
    banked for rink models (long CPU fine-tunes kept only their final
    step). Banks on PCK@0.05, val.py's headline pose metric."""

    BATCH = 8

    def __init__(self, cfg, imgsz: int, conf: float = 0.001):
        from ..models.detector import build_detect_fn

        self.cfg = cfg
        self.imgsz = imgsz
        self._fn = build_detect_fn(
            cfg, imgsz=imgsz, frame_hw=(imgsz, imgsz), conf=conf,
            rect=False, max_det=8, pre_topk=64, with_keypoints=True)

    def evaluate(self, params, dataset, indices: Sequence[int]) -> Dict[str, float]:
        from ..models.layers import fuse_for_inference

        fused = fuse_for_inference(params)
        acc = PoseEvalAccumulator()
        idx = list(indices)
        for k in range(0, len(idx), self.BATCH):
            chunk = idx[k: k + self.BATCH]
            items = [dataset.load(int(i)) for i in chunk]
            imgs = np.stack([(it["images"] * 255).astype(np.uint8)
                             for it in items])
            if len(chunk) < self.BATCH:  # static shapes: pad the tail
                pad = np.repeat(imgs[-1:], self.BATCH - len(chunk), 0)
                imgs = np.concatenate([imgs, pad])
            _, kpts = self._fn(fused, imgs)
            kpts = np.asarray(kpts)
            for j, it in enumerate(items):
                acc.add_image(kpts[j], it["keypoints"][0],
                              (self.imgsz, self.imgsz))
        return acc.compute()
