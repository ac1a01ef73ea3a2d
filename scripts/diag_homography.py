"""Isolate the e2e homography error (logs/e2e_homography.json ~16 ft)
into its stages on coherent-clip frames with a KNOWN camera:

  A. keypoint px error: detected rink keypoints vs the true projected
     keypoint positions (localization quality at frame coords);
  B. fit-from-gt error: H fitted from the TRUE keypoint positions,
     gt feet projected through it vs gt rink positions — a nonzero
     number here means the scoring/table contract is broken, not the
     model;
  C. fit-from-detected error: the same score through H fitted from the
     model's keypoints (= the calibrator's ceiling).

    python scripts/diag_homography.py [--frames 8] [--seed 3]
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
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--span", type=str, default="0.82,0.95")
    p.add_argument("--rink-checkpoint", type=str, default=None)
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hockey_tpu.core.config import Config
    from hockey_tpu.homography.keypoints import (
        RinkKeypointDetector,
        keypoints_from_array,
    )
    from hockey_tpu.homography.ransac import (
        homography_from_keypoints,
        project,
    )
    from hockey_tpu.rinkmap.dimensions import default_keypoint_positions
    from hockey_tpu.train.scenes import _project
    from hockey_tpu.train.scenes import render_scene_sequence

    span = tuple(float(x) for x in args.span.split(","))
    rng = np.random.default_rng(args.seed)
    frames, labels = render_scene_sequence(rng, args.imgsz, args.frames,
                                           span_range=span)

    config = Config()
    det = RinkKeypointDetector(config=config,
                               frame_hw=(args.imgsz, args.imgsz),
                               checkpoint=args.rink_checkpoint)
    table = default_keypoint_positions()

    kp_err, fit_gt_err, fit_det_err, n_conf = [], [], [], []
    for t, frame in enumerate(frames):
        cam = labels[t]["camera_h"]
        gt_pts = _project(cam, table)          # (56, 2) true image px
        in_frame = ((gt_pts[:, 0] >= 0) & (gt_pts[:, 0] < args.imgsz)
                    & (gt_pts[:, 1] >= 0) & (gt_pts[:, 1] < args.imgsz))

        kraw = det.detect_keypoints_batch(np.asarray(frame)[None])[0]
        kps = keypoints_from_array(kraw, conf_threshold=args.conf)
        n_conf.append(len(kps))
        for kp in kps:
            if in_frame[kp.id]:
                kp_err.append(float(np.linalg.norm(
                    np.asarray(kp.position) - gt_pts[kp.id])))

        gt = labels[t]
        if len(gt["boxes"]) == 0:
            continue
        feet = np.stack([(gt["boxes"][:, 0] + gt["boxes"][:, 2]) / 2,
                         gt["boxes"][:, 3]], 1).astype(np.float64)

        # B: fit from perfect keypoints
        from hockey_tpu.homography.keypoints import RinkKeypoint

        perfect = [RinkKeypoint(i, f"kpt_{i}",
                                (float(gt_pts[i, 0]), float(gt_pts[i, 1])),
                                1.0)
                   for i in range(56) if in_frame[i]]
        h_gt = homography_from_keypoints(perfect)
        if h_gt is not None:
            e = np.linalg.norm(project(h_gt, feet) - gt["rink_xy"], axis=1)
            fit_gt_err.append(float(e.mean()))

        # C: fit from the model's keypoints
        h_det = homography_from_keypoints(kps)
        if h_det is not None:
            e = np.linalg.norm(project(h_det, feet) - gt["rink_xy"], axis=1)
            fit_det_err.append(float(e.mean()))

    out = {
        "frames": len(frames),
        "mean_confident_kpts": round(float(np.mean(n_conf)), 1),
        "keypoint_err_px_mean": round(float(np.mean(kp_err)), 2)
        if kp_err else None,
        "keypoint_err_px_p90": round(float(np.percentile(kp_err, 90)), 2)
        if kp_err else None,
        "fit_from_gt_kpts_err_ft": round(float(np.mean(fit_gt_err)), 2)
        if fit_gt_err else None,
        "fit_from_detected_err_ft": round(float(np.mean(fit_det_err)), 2)
        if fit_det_err else None,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
