"""Isolate the rink pose model's generator-B collapse (PCK 0.06 vs 0.75+
in-dist): geometry or style?

Renders a 2x2 ablation grid and scores the SHIPPED pose checkpoint:
  a_geom + sterile  : training-family trapezoid, sterile line drawing
  b_geom + sterile  : generator-B pinhole camera, SAME sterile drawing
  a_geom + b_style  : training trapezoid, generator-B background/degrade
  b_geom + b_style  : full generator-B (the failing eval, rink-b)

If b_geom+sterile holds PCK, the gap is style (B's markings/ice/crowd
rendering); if it collapses, the homography family itself is out of
distribution. Directs what the queued TPU rink retrain must randomize.

Usage: python scripts/diag_rink_b.py [--n 24] [--imgsz 384]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sterile(pts: np.ndarray, s: int, rng) -> np.ndarray:
    """The SyntheticRinkDataset sterile line drawing (data.py:283-303)
    through an arbitrary projected keypoint table."""
    import cv2

    img = np.full((s, s, 3), 225, np.uint8)
    img[...] += rng.integers(0, 8, (s, s, 3), dtype=np.uint8)

    def line(a, b, color, w=1):
        cv2.line(img, (int(pts[a][0]), int(pts[a][1])),
                 (int(pts[b][0]), int(pts[b][1])), color, w)

    blue = (160, 90, 30)
    red = (50, 50, 190)
    line(20, 21, blue, 2)
    line(23, 24, blue, 2)
    line(26, 27, red, 2)
    line(0, 1, red, 1)
    line(36, 37, red, 1)
    for c_id, r_id in ((28, 29), (5, 7), (6, 11), (41, 43), (42, 47)):
        c = pts[c_id]
        r = max(int(np.linalg.norm(pts[r_id] - c)), 2)
        cv2.circle(img, (int(c[0]), int(c[1])), r, red, 1)
    return img


def _a_homography(rng, s: int, rink):
    from hockey_tpu.homography.ransac import dlt_homography

    d = rink
    f = rng.uniform(0.42, 1.0)
    x0 = rng.uniform(0.0, d.length * (1.0 - f))
    x1 = x0 + f * d.length
    rink_corners = np.asarray(
        [[x0, 0], [x1, 0], [x0, d.width], [x1, d.width]], np.float64)
    top_y = rng.uniform(0.03, 0.25) * s
    bot_y = rng.uniform(0.75, 1.25) * s
    top_inset = rng.uniform(0.04, 0.22) * s
    bot_outset = rng.uniform(-0.02, 0.25) * s
    img_corners = np.asarray([
        [top_inset, top_y], [s - top_inset, top_y],
        [-bot_outset, bot_y], [s + bot_outset, bot_y],
    ], np.float64)
    return dlt_homography(rink_corners, img_corners)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=24)
    p.add_argument("--imgsz", type=int, default=384)
    p.add_argument("--checkpoint", type=str, default=None)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from hockey_tpu.core.config import Config
    from hockey_tpu.homography.keypoints import RinkKeypointDetector
    from hockey_tpu.homography.ransac import project
    from hockey_tpu.rinkmap.dimensions import NHL, default_keypoint_positions
    from hockey_tpu.train.scenes_b import _background, _Camera, _degrade

    s = args.imgsz
    table = default_keypoint_positions().astype(np.float64)
    config = Config()
    config.rink_imgsz = s
    det = RinkKeypointDetector("hockey-detection", config, frame_hw=(s, s),
                               checkpoint=args.checkpoint)

    cases = {k: {"err": [], "pck": []} for k in
             ["a_sterile", "b_sterile", "b_bstyle"]}
    for i in range(args.n):
        rng = np.random.default_rng(4242 + i)
        # one B camera + one A homography per index; styles crossed
        cam = _Camera(rng, s, NHL, fit_rink=True,
                      dist_range=(40.0, 120.0), height_range=(120.0, 300.0))
        ha = _a_homography(rng, s, NHL)
        for key, (pts, style) in {
            "a_sterile": (project(ha, table), "sterile"),
            "b_sterile": (cam.project_plane(table), "sterile"),
            "b_bstyle": (cam.project_plane(table), "b"),
        }.items():
            r2 = np.random.default_rng(9000 + i)
            if style == "sterile":
                img = _sterile(pts, s, r2)
            else:
                # full generator-B rendering (markings drawn through the
                # same camera the labels are projected with)
                img = _degrade(_background(r2, cam, NHL), r2)
            _, kp = det.detector.detect_batch(img.astype(np.uint8)[None])
            pred = np.asarray(kp[0])[:, :2]
            vis = ((pts[:, 0] >= 0) & (pts[:, 0] < s)
                   & (pts[:, 1] >= 0) & (pts[:, 1] < s))
            if vis.sum() == 0:
                continue
            err = np.linalg.norm(pred[vis] - pts[vis], axis=1)
            cases[key]["err"].append(float(err.mean()))
            cases[key]["pck"].append(float((err <= 0.05 * s).mean()))

    out = {k: {"mean_err_px": round(float(np.mean(v["err"])), 2),
               "pck": round(float(np.mean(v["pck"])), 4),
               "n": len(v["err"])} for k, v in cases.items()}
    print(json.dumps(out))
    with open(os.path.join(os.environ.get("HOCKEY_E2E_LOGS")
                           or os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), "..", "logs"), "diag_rink_b.json"), "w") as f:
        f.write(json.dumps(out) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
