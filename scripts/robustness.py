"""Out-of-distribution evaluation: generator-B + corruption curves.

Runs the SHIPPED player detector (no retraining) on:
1. generator B (train/scenes_b.py — an independent renderer the model
   has never seen a pixel from), and
2. held-out generator-A scenes under each corruption x severity
   (train/corruptions.py), producing mAP50-vs-severity curves.

    python scripts/robustness.py [--limit 60] [--corr-limit 40]
        [--model hockey-player-detection] [--dataset hard-b]

Writes logs/robustness.json and prints a table. This is the evidence
that the in-distribution mAP numbers transfer: the reference's deployed
bar is mAP50 0.690 on real broadcast data it did not generate
(/root/reference/notebooks/train_player_detection.ipynb cell 15).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="hockey-player-detection")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--limit", type=int, default=100,
                   help="generator-B images")
    p.add_argument("--corr-limit", type=int, default=40,
                   help="images per corruption x severity point")
    p.add_argument("--severities", type=str, default="1,3,5")
    p.add_argument("--seed", type=int, default=7777)
    p.add_argument("--pucks", action="store_true",
                   help="evaluate the puck model on puck-labeled scenes")
    p.add_argument("--skip-corruptions", action="store_true")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="evaluate this checkpoint instead of the shipped "
                        "weights (e.g. a retrain candidate before shipping)")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    from hockey_tpu.core.config import Config
    from hockey_tpu.models.detector import Detector
    from hockey_tpu.train.corruptions import CORRUPTIONS, CorruptedDataset
    from hockey_tpu.train.eval import evaluate_detector
    from hockey_tpu.train.scenes import HardSyntheticHockeyDataset
    from hockey_tpu.train.scenes_b import HardSyntheticHockeyDatasetB

    config = Config()
    config.detection_imgsz = args.imgsz
    det = Detector(args.model, config, frame_hw=(args.imgsz, args.imgsz),
                   imgsz=args.imgsz, conf=0.001,
                   checkpoint=args.checkpoint)
    out = {"model": args.model, "imgsz": args.imgsz,
           "checkpoint": args.checkpoint}

    # --- generator B (never-seen renderer)
    ds_b = HardSyntheticHockeyDatasetB(
        imgsz=args.imgsz, seed=args.seed, pool_size=args.limit,
        pucks=args.pucks)
    print(f"rendering {args.limit} generator-B scenes...", flush=True)
    ds_b.pregenerate()
    m = evaluate_detector(det, ds_b, range(args.limit))
    out["generator_b"] = m
    print(f"generator-B: mAP50 {m['mAP50']:.4f} "
          f"mAP50-95 {m['mAP50_95']:.4f} P {m['precision']:.3f} "
          f"R {m['recall']:.3f}", flush=True)

    # --- corruption curves on held-out generator-A scenes
    if not args.skip_corruptions:
        sevs = [int(s) for s in args.severities.split(",")]
        ds_a = HardSyntheticHockeyDataset(
            imgsz=args.imgsz, seed=args.seed, pool_size=args.corr_limit,
            pucks=args.pucks)
        ds_a.pregenerate()
        clean = evaluate_detector(det, ds_a, range(args.corr_limit))
        out["clean_a"] = clean
        print(f"clean A (held-out): mAP50 {clean['mAP50']:.4f}", flush=True)
        curves = {}
        for name in CORRUPTIONS:
            curves[name] = {}
            for sev in sevs:
                cd = CorruptedDataset(ds_a, name, sev)
                mm = evaluate_detector(det, cd, range(args.corr_limit))
                curves[name][str(sev)] = round(mm["mAP50"], 4)
                print(f"  {name} s{sev}: mAP50 {mm['mAP50']:.4f}",
                      flush=True)
        out["corruption_mAP50"] = curves

    path = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "logs",
        "robustness.json" if not args.pucks else "robustness_puck.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
