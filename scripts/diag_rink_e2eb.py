"""Diagnose the generator-B e2e calibration failure for a rink
checkpoint on the EXACT camera family scripts/e2e_homography.py
--generator b uses (scenes_b render_scene_sequence_b, zoom 0.9-1.3,
low 25-90 ft cameras — NOT the rink-b val family's high fit_rink
cameras).

Per camera/frame it reports:
  - pose quality on this family: PCK@0.05, mean px error (visible gt);
  - detection stats at the calibrator's conf gate (0.5): how many
    keypoints pass, and of those how many are actually CORRECT
    (within the PCK radius) — separates "model is wrong" from
    "gate admits wrong points";
  - the tiered RANSAC fit exactly as the calibrator runs it
    (all detected kpts, conf >= 0.5, coarse fallback 12 ft) and the
    fit's TRUE calibration error (gt keypoint pixels through the
    fitted H vs the table) vs its self-reported reprojection error —
    exposes confidently-wrong fits the quality gate cannot see.

    python scripts/diag_rink_e2eb.py --cpu --n-cams 8 \
        --checkpoint checkpoints/rink_s_ext.msgpack.best
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-cams", type=int, default=8)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--rink-imgsz", type=int, default=512)
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--conf", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hockey_tpu.core.config import Config
    from hockey_tpu.homography.keypoints import RinkKeypointDetector
    from hockey_tpu.homography.ransac import fit_homography_tiered, project
    from hockey_tpu.rinkmap.dimensions import default_keypoint_positions
    from hockey_tpu.train.scenes_b import render_scene_sequence_b

    table = default_keypoint_positions()
    config = Config()
    config.rink_imgsz = args.rink_imgsz
    det = RinkKeypointDetector(config=config,
                               frame_hw=(args.imgsz, args.imgsz),
                               checkpoint=args.checkpoint)

    s = args.imgsz
    pck_r = 0.05 * s
    rows = []
    rng = np.random.default_rng(args.seed)
    for c in range(args.n_cams):
        frames, labels = render_scene_sequence_b(
            rng, s, 2, zoom_range=(0.9, 1.3))
        frame, lab = frames[0], labels[0]
        cam_h = lab["camera_h"]  # rink ft -> image px
        gt_px = project(cam_h, table.astype(np.float64))
        vis = ((gt_px[:, 0] >= 0) & (gt_px[:, 0] < s)
               & (gt_px[:, 1] >= 0) & (gt_px[:, 1] < s))

        kpts = det.detect_keypoints_batch(frame[None])[0]  # (56,3)
        err = np.linalg.norm(kpts[:, :2] - gt_px, axis=1)
        pck = float((err[vis] <= pck_r).mean()) if vis.any() else None
        mean_err = float(err[vis].mean()) if vis.any() else None

        sel = kpts[:, 2] >= args.conf
        n_sel = int(sel.sum())
        sel_correct = int((err[sel] <= pck_r).sum()) if n_sel else 0
        # confidence separation: mean conf of correct vs wrong keypoints
        correct = err <= pck_r
        conf_ok = float(kpts[correct, 2].mean()) if correct.any() else None
        conf_bad = float(kpts[~correct, 2].mean()) if (~correct).any() else None

        row = {
            "cam": c, "n_visible_gt": int(vis.sum()),
            "pck": None if pck is None else round(pck, 3),
            "mean_err_px": None if mean_err is None else round(mean_err, 1),
            "n_conf_sel": n_sel, "n_conf_sel_correct": sel_correct,
            "conf_mean_correct": None if conf_ok is None else round(conf_ok, 3),
            "conf_mean_wrong": None if conf_bad is None else round(conf_bad, 3),
        }

        if n_sel >= 4:
            src = kpts[sel, :2].astype(np.float64)
            dst = table[sel].astype(np.float64)
            h, q, tier = fit_homography_tiered(src, dst,
                                               coarse_threshold=12.0)
            if h is not None:
                true_err = np.linalg.norm(
                    project(h, gt_px[vis]) - table[vis], axis=1)
                row.update({
                    "tier": tier,
                    "fit_selfreport_ft": round(q.mean_reprojection_error, 2),
                    "fit_inlier_ratio": round(q.inlier_ratio, 2),
                    "fit_true_err_ft": round(float(true_err.mean()), 2),
                })
            else:
                row["tier"] = None
        else:
            row["tier"] = "too_few"
        rows.append(row)
        print(json.dumps(row), flush=True)

    good = [r for r in rows if r.get("fit_true_err_ft") is not None]
    summary = {
        "cams": len(rows),
        "pck_mean": round(float(np.mean([r["pck"] for r in rows
                                         if r["pck"] is not None])), 3),
        "fits": len(good),
        "fits_true_le_12ft": sum(1 for r in good if r["fit_true_err_ft"] <= 12),
        "fits_confidently_wrong": sum(
            1 for r in good
            if r["fit_true_err_ft"] > 12 and r["fit_selfreport_ft"] <= 12),
    }
    print(json.dumps({"summary": summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
