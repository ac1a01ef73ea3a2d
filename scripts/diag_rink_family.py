"""Rink pose model vs camera-family ablation (round 5).

Scores a checkpoint on three render families at the model's operating
resolution:

  pinhole_rich : the extended-pinhole training branch, rich A style
                 (held-out draws of train/data.py:_pinhole_camera)
  bseq_rich    : the e2e-B SEQUENCE camera geometry (scenes_b._Camera,
                 isotropic zoom 0.9-1.3) rendered with A's rich style —
                 isolates geometry from renderer style
  bseq_real    : real generator-B sequence renders (the failing e2e-B
                 probe, scripts/e2e_homography.py --generator b)

Round-5 measurement that redirected the rink work (banked
rink_s_ext2.msgpack, 512):

  pinhole_rich PCK 0.295 | bseq_rich 0.465 | bseq_real 0.303

i.e. the model under-fits its OWN training family — the hull-shaped
pinhole family (span-fit focal x log-uniform anamorphic stretch x
f 0.18-1.3 x elev 7-80 deg) spreads density too thin for an s-scale
model, while the e2e-B sequence geometry is the EASIER part of the
hull. The sterile-trapezoid default val (train/val.py --dataset
synthetic) reads 0.95 on the same checkpoint and cannot see any of
this. Fix: deployment-matched camera mixture (data.py:_broadcast_camera,
COMPAT #32) + `--dataset rink-rich` val.

    python scripts/diag_rink_family.py --checkpoint banked/rink_s_ext2.msgpack --cpu
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
    p.add_argument("--checkpoint", type=str, default=None,
                   help="pose checkpoint (default: shipped weights)")
    p.add_argument("--n", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=512)
    p.add_argument("--seed", type=int, default=1000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hockey_tpu.core.config import Config
    from hockey_tpu.homography.keypoints import RinkKeypointDetector
    from hockey_tpu.homography.ransac import project
    from hockey_tpu.rinkmap.dimensions import NHL, default_keypoint_positions
    from hockey_tpu.train.data import SyntheticRinkDataset
    from hockey_tpu.train.scenes_b import _Camera, render_scene_sequence_b

    S = args.imgsz
    table = default_keypoint_positions()
    config = Config()
    config.rink_imgsz = S
    det = RinkKeypointDetector(config=config, frame_hw=(S, S),
                               checkpoint=args.checkpoint)
    ds = SyntheticRinkDataset(imgsz=S, rich=True)
    pck_r = 0.05 * S

    def score(frame, gt_px, vis):
        kpts = det.detect_keypoints_batch(frame[None])[0]
        err = np.linalg.norm(kpts[:, :2] - gt_px, axis=1)
        if not vis.any():
            return None, None
        return float((err[vis] <= pck_r).mean()), float(err[vis].mean())

    results = {}
    for cell in ("pinhole_rich", "bseq_rich", "bseq_real"):
        pcks, errs = [], []
        for i in range(args.n):
            rng = np.random.default_rng(args.seed + i)
            if cell == "pinhole_rich":
                h, front = ds._pinhole_camera(rng, S)
                gt = project(h, table.astype(np.float64))
                vis = ((gt[:, 0] >= 0) & (gt[:, 0] < S)
                       & (gt[:, 1] >= 0) & (gt[:, 1] < S) & front)
                img = ds._rich_scene(rng, S, h, gt)
            elif cell == "bseq_rich":
                cam = _Camera(rng, S, NHL, zoom_range=(0.9, 1.3))
                gt = project(cam.H, table.astype(np.float64))
                t3 = np.concatenate([table, np.zeros((len(table), 1))], 1)
                front = ((t3 - cam.C) @ cam.R.T)[:, 2] > 1e-6
                vis = ((gt[:, 0] >= 0) & (gt[:, 0] < S)
                       & (gt[:, 1] >= 0) & (gt[:, 1] < S) & front)
                img = ds._rich_scene(rng, S, cam.H, gt)
            else:
                frames, labels = render_scene_sequence_b(
                    rng, S, 2, zoom_range=(0.9, 1.3))
                img, lab = frames[0], labels[0]
                gt = project(lab["camera_h"], table.astype(np.float64))
                vis = ((gt[:, 0] >= 0) & (gt[:, 0] < S)
                       & (gt[:, 1] >= 0) & (gt[:, 1] < S))
            pck, e = score(img.astype(np.uint8), gt, vis)
            if pck is not None:
                pcks.append(pck)
                errs.append(e)
        results[cell] = {"pck": round(float(np.mean(pcks)), 3),
                         "err_px": round(float(np.mean(errs)), 1),
                         "n": len(pcks)}
        print(cell, results[cell], flush=True)

    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
