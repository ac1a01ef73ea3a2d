"""Diagnose the puck detector's generator-B failures.

Renders generator-B puck scenes, runs the puck detector (shipped or
--checkpoint), and reports per-image: gt puck boxes, top detections with
scores, and whether the miss is a no-fire (nothing near gt) or a misfire
(confident detection elsewhere). Writes a few annotated crops to
logs/diag_puck_b/ for visual inspection, plus aggregate stats.

    python scripts/diag_puck_b.py [--n 40] [--checkpoint ...] [--gen a|b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=40)
    p.add_argument("--seed", type=int, default=7777)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--gen", type=str, default="b", choices=["a", "b"],
                   help="which renderer to diagnose on")
    p.add_argument("--dump", type=int, default=8,
                   help="annotated examples to write")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import cv2

    from hockey_tpu.core.config import Config
    from hockey_tpu.models.detector import Detector

    config = Config()
    config.detection_imgsz = args.imgsz
    det = Detector("hockey-puck-detection", config,
                   frame_hw=(args.imgsz, args.imgsz), imgsz=args.imgsz,
                   conf=0.001, checkpoint=args.checkpoint)

    if args.gen == "b":
        from hockey_tpu.train.scenes_b import HardSyntheticHockeyDatasetB

        ds = HardSyntheticHockeyDatasetB(imgsz=args.imgsz, seed=args.seed,
                                         pool_size=args.n, pucks=True)
    else:
        from hockey_tpu.train.scenes import HardSyntheticHockeyDataset

        ds = HardSyntheticHockeyDataset(imgsz=args.imgsz, seed=args.seed,
                                        pool_size=args.n, pucks=True)
    ds.pregenerate()

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                          "logs", "diag_puck_b")
    os.makedirs(outdir, exist_ok=True)

    stats = {"images": 0, "gt_pucks": 0, "hit": 0, "no_fire": 0,
             "misfire": 0, "gt_wh_px": [], "det_scores_at_gt": [],
             "top_fp_scores": []}
    dumped = 0
    for i in range(args.n):
        item = ds.load(i)
        img = (item["images"] * 255.0).astype(np.uint8)
        gt_boxes = item["boxes"][item["mask"].astype(bool)]
        h = det.detect(img)
        boxes, scores = np.asarray(h.boxes), np.asarray(h.scores)
        stats["images"] += 1
        gt_centers = np.stack([(gt_boxes[:, 0] + gt_boxes[:, 2]) / 2,
                               (gt_boxes[:, 1] + gt_boxes[:, 3]) / 2], 1) \
            if len(gt_boxes) else np.zeros((0, 2))
        for g, gc in zip(gt_boxes, gt_centers):
            stats["gt_pucks"] += 1
            stats["gt_wh_px"].append([round(float(g[2] - g[0]), 1),
                                      round(float(g[3] - g[1]), 1)])
            if len(boxes):
                cent = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                                 (boxes[:, 1] + boxes[:, 3]) / 2], 1)
                d = np.linalg.norm(cent - gc, axis=1)
                near = d < 16
                if near.any():
                    stats["hit"] += 1
                    stats["det_scores_at_gt"].append(
                        round(float(scores[near].max()), 3))
                    continue
            stats["no_fire"] += 1
        # false positives: confident detections far from every gt
        for b, s in zip(boxes, scores):
            if s < 0.25:
                continue
            c = np.array([(b[0] + b[2]) / 2, (b[1] + b[3]) / 2])
            if len(gt_centers) == 0 or \
                    np.linalg.norm(gt_centers - c, axis=1).min() >= 16:
                stats["misfire"] += 1
                stats["top_fp_scores"].append(round(float(s), 3))

        if dumped < args.dump:
            vis = img.copy()
            for g in gt_boxes:
                cv2.rectangle(vis, (int(g[0]), int(g[1])),
                              (int(g[2]), int(g[3])), (0, 255, 0), 1)
            for b, s in zip(boxes, scores):
                if s < 0.10:
                    continue
                cv2.rectangle(vis, (int(b[0]), int(b[1])),
                              (int(b[2]), int(b[3])), (0, 0, 255), 1)
                cv2.putText(vis, f"{s:.2f}", (int(b[0]), int(b[1]) - 2),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 0, 255), 1)
            cv2.imwrite(os.path.join(outdir, f"{args.gen}{i:02d}.png"), vis)
            dumped += 1

    stats["hit_rate"] = round(stats["hit"] / max(stats["gt_pucks"], 1), 3)
    stats["gt_wh_px"] = stats["gt_wh_px"][:20]
    stats["det_scores_at_gt"] = stats["det_scores_at_gt"][:20]
    stats["top_fp_scores"] = sorted(stats["top_fp_scores"],
                                    reverse=True)[:20]
    print(json.dumps(stats, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
