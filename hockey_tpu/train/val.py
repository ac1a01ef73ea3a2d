"""Validation CLI: `python -m hockey_tpu.train.val`.

TPU-native counterpart of `yolo mode=val` (reference notebook cell 18):
loads a checkpoint + YOLO-format dataset and prints mAP50 / mAP50-95 /
P / R per class and overall (the exact metrics in BASELINE.md).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="Validate a hockey_tpu detector")
    p.add_argument("--images", type=str, default=None,
                   help="images/ dir (labels/ sibling); synthetic if omitted")
    p.add_argument("--model", type=str, default="hockey-player-detection")
    p.add_argument("--variant", type=str, default=None,
                   help="override variant (n/s/m/l/x), e.g. n for smoke tests")
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--limit", type=int, default=200,
                   help="max images to evaluate")
    p.add_argument("--dataset", type=str, default="synthetic",
                   choices=["synthetic", "hard", "hard-puck",
                            "hard-b", "hard-puck-b", "rink-b",
                            "rink-rich"],
                   help="synthetic source when --images is absent; 'hard' "
                        "evaluates on held-out broadcast-like scenes "
                        "(train/scenes.py, the training loop's val split); "
                        "the '-b' variants evaluate OUT-OF-DISTRIBUTION on "
                        "generator B (train/scenes_b.py, an independent "
                        "renderer sharing nothing with the training one)")
    p.add_argument("--seed", type=int, default=7777,
                   help="scene seed for --dataset hard (7777 = the "
                        "training loop's held-out split for --seed 0)")
    p.add_argument("--json", action="store_true", help="print metrics as JSON")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend in-process (plain "
                        "JAX_PLATFORMS=cpu is ignored under the axon "
                        "sitecustomize; required when the TPU tunnel is "
                        "down or jax init hangs retrying it)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ..core.config import Config
    from ..models.detector import Detector
    from ..models.yolov8 import MODEL_ZOO
    from .data import SyntheticHockeyDataset, YoloDataset
    from .eval import evaluate_detector

    config = Config()
    config.detection_imgsz = args.imgsz

    if args.variant:
        # process-local zoo override so Detector resolves the right shape
        from ..models.yolov8 import YoloConfig

        base = MODEL_ZOO[args.model]
        MODEL_ZOO[args.model] = YoloConfig(
            args.variant, base.num_classes, base.num_keypoints)

    if MODEL_ZOO[args.model].num_keypoints:
        # pose model: PCK@0.05 + mean pixel error on held-out rink views
        # (the pose analogue of `yolo mode=val`; SURVEY §4 metrics)
        import numpy as np

        from ..homography.keypoints import RinkKeypointDetector
        from .data import SyntheticRinkDataset
        from .eval import PoseEvalAccumulator

        # shipped-default validation runs the net at its shipped operating
        # resolution (config.rink_imgsz); an explicit --checkpoint is
        # validated at the requested --imgsz so checkpoints trained at
        # other resolutions aren't silently evaluated at the default
        if args.checkpoint:
            config.rink_imgsz = args.imgsz
        rkd = RinkKeypointDetector(
            args.model, config, frame_hw=(args.imgsz, args.imgsz),
            checkpoint=args.checkpoint)
        if args.dataset == "rink-b":
            from .scenes_b import SyntheticRinkDatasetB

            ds = SyntheticRinkDatasetB(imgsz=args.imgsz, seed=args.seed)
        elif args.dataset == "rink-rich":
            # held-out slice of the ACTUAL pose training family (rich
            # broadcast/pinhole/trapezoid camera mixture + clutter) —
            # the default sterile-trapezoid val reads ~0.95 on models
            # that score ~0.3 on their own training family (round 5)
            ds = SyntheticRinkDataset(imgsz=args.imgsz,
                                      seed=args.seed + 7777, rich=True)
        else:
            ds = SyntheticRinkDataset(imgsz=args.imgsz, seed=args.seed)
        acc = PoseEvalAccumulator()
        B = 8
        for k in range(0, args.limit, B):
            items = [ds.load(i) for i in range(k, min(k + B, args.limit))]
            frames = np.stack([(it["images"] * 255).astype(np.uint8)
                               for it in items])
            kpts = rkd.detect_keypoints_batch(frames)
            for j, it in enumerate(items):
                acc.add_image(kpts[j], it["keypoints"][0],
                              (args.imgsz, args.imgsz))
        m = acc.compute()
        if args.json:
            print(json.dumps(m))
        else:
            print(f"images: {args.limit}")
            print(f"PCK@0.05:        {m['pck']:.4f}")
            print(f"mean kpt error:  {m['mean_kpt_error_px']:.2f} px")
        return 0
    det = Detector(
        args.model, config, frame_hw=(args.imgsz, args.imgsz),
        imgsz=args.imgsz, conf=args.conf, checkpoint=args.checkpoint,
    )

    if args.images:
        ds = YoloDataset(args.images, imgsz=args.imgsz)
        n = min(len(ds), args.limit)
    elif args.dataset in ("hard", "hard-puck"):
        from .scenes import HardSyntheticHockeyDataset

        ds = HardSyntheticHockeyDataset(
            imgsz=args.imgsz, seed=args.seed, pool_size=args.limit,
            pucks=args.dataset == "hard-puck")
        ds.pregenerate()
        n = args.limit
    elif args.dataset in ("hard-b", "hard-puck-b"):
        from .scenes_b import HardSyntheticHockeyDatasetB

        ds = HardSyntheticHockeyDatasetB(
            imgsz=args.imgsz, seed=args.seed, pool_size=args.limit,
            pucks=args.dataset == "hard-puck-b")
        ds.pregenerate()
        n = args.limit
    else:
        ds = SyntheticHockeyDataset(imgsz=args.imgsz, seed=0)
        n = min(args.limit, 50)
    metrics = evaluate_detector(det, ds, range(n), conf=args.conf)
    if args.json:
        print(json.dumps(metrics))
    else:
        print(f"images: {n}")
        print(f"mAP50:    {metrics['mAP50']:.4f}")
        print(f"mAP50-95: {metrics['mAP50_95']:.4f}")
        print(f"P / R:    {metrics['precision']:.4f} / {metrics['recall']:.4f}")
        for k, v in metrics.items():
            if k.startswith("AP50_class"):
                print(f"  {k}: {v:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
