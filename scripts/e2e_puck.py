"""End-to-end PUCK_DETECTION quality harness on a coherent clip.

Renders a temporally-coherent broadcast-like sequence with a MOVING puck
and known ground-truth trajectory (train/scenes.py render_scene_sequence
include_puck=True: fast pass segments between players, board bounces,
natural occlusion by nearer players), runs the REAL puck pipeline
(slicing/sahi.py: shipped hockey-puck-detection checkpoint, cross-frame
tiled megastep, PuckTracker smoothing) and scores it:

- detection recall: the tracker's gate-selected detection within `radius`
  px of the gt puck center, over frames where the puck is visibly drawn;
- detection precision: fraction of accepted detections that are within
  `radius` of gt;
- trajectory MAE: smoothed tracker position vs gt center (all frames
  where the tracker reports and the puck is in frame);
- gap recovery: mean frames from the end of an occlusion gap until the
  tracker is re-locked (within `radius`), over all gaps.

Capability spec: /root/reference/README.md:44 + CLAUDE.md:55 (sliced
small-object inference + PuckTracker trajectory smoothing).

    python scripts/e2e_puck.py [--frames 96] [--seed 11] [--imgsz 960]

Prints one JSON line; also written to logs/e2e_puck.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def gt_radius(lab, generator: str, cap: float = 16.0,
              floor: float = 6.0) -> float:
    """Per-frame hit radius = one drawn gt puck width (round-3/4 review
    ask: a fixed 16 px radius means different things for an 8 px and a
    60 px puck). Both renderers size the puck from the local standing
    height at its rink position; recompute that law from the labeled
    homography instead of using a fixed constant. Shared by
    scripts/e2e_puck.py and scripts/sweep_puck_gate.py so the sweep's
    operating points are scored exactly like the canonical artifact."""
    from hockey_tpu.train.scenes import _local_height

    pr_ft = lab.get("puck_rink")
    h = lab.get("camera_h")
    if pr_ft is None or h is None:
        return cap
    hpx = _local_height(np.asarray(h, np.float64),
                        float(pr_ft[0]), float(pr_ft[1]))
    if generator == "b":  # scenes_b.py _draw_puck_b size law
        w = 2.0 * max(max(hpx * 0.055, 1.8) * 1.5, 2.0)
    else:                 # scenes.py _draw_puck size law
        w = 2.0 * max(max(hpx * 0.06, 2.0) * 1.6, 2.0)
    return float(np.clip(w, floor, cap))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--imgsz", type=int, default=960)
    p.add_argument("--radius", type=float, default=16.0,
                   help="fixed match radius in px (used when "
                        "--radius-mode fixed; also the gt-scaled mode's "
                        "upper clamp)")
    p.add_argument("--radius-mode", type=str, default="gt-scaled",
                   choices=["gt-scaled", "fixed"],
                   help="gt-scaled (default): per-frame hit radius = one "
                        "drawn gt puck width (floor 6 px, cap --radius) "
                        "so 'close' means the same thing for an 8 px and "
                        "a 60 px puck; fixed: legacy constant --radius")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--span", type=str, default="0.25,0.45",
                   help="camera zoom span range (fraction of rink length)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="evaluate this puck checkpoint instead of the "
                        "shipped weights (pre-ship candidate evaluation)")
    p.add_argument("--generator", type=str, default="a", choices=["a", "b"],
                   help="'b' scores the puck pipeline on the never-trained "
                        "generator-B renderer (OOD)")
    p.add_argument("--player-demote", type=float, default=0.0,
                   help="enable player-context demotion (config."
                        "puck_player_demote): puck candidates at mid-body "
                        "height inside a detected player box get their "
                        "score multiplied by this factor")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (env vars alone cannot "
                        "override the axon sitecustomize)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from hockey_tpu.core.config import Config
    from hockey_tpu.slicing.sahi import PuckPipeline

    rng = np.random.default_rng(args.seed)
    if args.generator == "b":
        from hockey_tpu.train.scenes_b import render_scene_sequence_b

        frames, labels = render_scene_sequence_b(
            rng, args.imgsz, args.frames, zoom_range=(2.6, 4.0),
            include_puck=True)
    else:
        from hockey_tpu.train.scenes import render_scene_sequence

        span = tuple(float(x) for x in args.span.split(","))
        frames, labels = render_scene_sequence(
            rng, args.imgsz, args.frames, span_range=span,
            include_puck=True)

    if args.radius_mode == "fixed":
        radii = [args.radius] * len(labels)
    else:
        radii = [gt_radius(lab, args.generator, cap=args.radius)
                 for lab in labels]

    config = Config()
    config.puck_player_demote = args.player_demote
    if args.player_demote:
        # player context at the scale its OOD quality is validated at
        # (generator-B val runs at 640, logs/val_player_dr_b.json); the
        # demotion needs approximate body boxes, not 1280-px precision
        config.detection_imgsz = 640
    pipe = PuckPipeline(config, frame_hw=(args.imgsz, args.imgsz),
                        checkpoint=args.checkpoint)

    det_tp = det_fp = vis_frames = raw_tp = 0
    traj_err = []
    # per-frame records for gap-recovery analysis
    rec = []  # (visible, detected_close, tracker_close)
    b = args.batch
    for k in range(0, len(frames), b):
        chunk = frames[k:k + b]
        if len(chunk) < b:  # pad the tail to the compiled batch shape
            chunk = chunk + [chunk[-1]] * (b - len(chunk))
        batch = np.stack(chunk)
        boxes, scores, valid = pipe.detect_batch(batch)
        for j in range(min(b, len(frames) - k)):
            t = k + j
            v = valid[j]
            out_boxes, out_scores = boxes[j][v], scores[j][v]
            # raw detector recall (pre-gate): best detection near gt —
            # makes the gate's recall-for-precision trade auditable
            gt_t = labels[t].get("puck_xy")
            if (labels[t].get("puck_visible") and len(out_boxes)
                    and gt_t is not None):
                bb = out_boxes[int(np.argmax(out_scores))]
                c = np.asarray([(bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2])
                raw_tp += int(float(np.linalg.norm(c - gt_t))
                              <= radii[t])
            # the REAL tracker ingest: gated selection + smoothing (the
            # same path PuckPipeline._annotate runs)
            sm, idx = pipe.tracker.ingest(out_boxes, out_scores)
            center = None
            if idx is not None:
                bb = out_boxes[idx]
                center = np.asarray([(bb[0] + bb[2]) / 2,
                                     (bb[1] + bb[3]) / 2])
            gt = labels[t].get("puck_xy")
            visible = bool(labels[t].get("puck_visible"))
            det_close = (center is not None and gt is not None
                         and float(np.linalg.norm(center - gt))
                         <= radii[t])
            if visible:
                vis_frames += 1
                det_tp += int(det_close)
            if center is not None and not det_close:
                det_fp += 1
            tracker_close = False
            if sm is not None and gt is not None:
                e = float(np.linalg.norm(np.asarray(sm) - gt))
                traj_err.append(e)
                tracker_close = e <= radii[t]
            rec.append((visible, det_close, tracker_close))

    recall = det_tp / max(vis_frames, 1)
    n_det = sum(1 for _, d, _ in rec if d) + det_fp
    precision = (n_det - det_fp) / max(n_det, 1)

    # gap recovery: for each maximal invisible run followed by visible
    # frames, count frames until the tracker re-locks
    recoveries = []
    t = 0
    n = len(rec)
    while t < n:
        if not rec[t][0]:  # start of an invisible gap
            g0 = t
            while t < n and not rec[t][0]:
                t += 1
            if t >= n or t == g0:
                break
            lock = None
            for dt in range(t, min(t + 30, n)):
                if rec[dt][2]:
                    lock = dt - t
                    break
            if lock is not None:
                recoveries.append(lock)
        else:
            t += 1

    out = {
        "frames": len(frames),
        "visible_frames": vis_frames,
        "detection_recall": round(recall, 4),
        "detection_recall_raw": round(raw_tp / max(vis_frames, 1), 4),
        "detection_precision": round(precision, 4),
        "trajectory_mae_px": round(float(np.mean(traj_err)), 2)
        if traj_err else None,
        "trajectory_p90_px": round(float(np.percentile(traj_err, 90)), 2)
        if traj_err else None,
        "gaps": len(recoveries),
        "gap_recovery_frames_mean": round(float(np.mean(recoveries)), 2)
        if recoveries else 0.0,
        "imgsz": args.imgsz,
        "generator": args.generator,
        "radius_mode": args.radius_mode,
        "radius_px": (args.radius if args.radius_mode == "fixed"
                      else round(float(np.mean(radii)), 2)),
        "radius_px_min": round(float(np.min(radii)), 2),
        "radius_px_max": round(float(np.max(radii)), 2),
    }
    if args.player_demote:
        out["player_demote"] = args.player_demote
    line = json.dumps(out)
    print(line)
    name = "e2e_puck.json" if args.generator == "a" else "e2e_puck_b.json"
    if args.checkpoint:  # candidate runs keep shipped artifacts pristine
        name = name.replace(".json", "_candidate.json")
    if args.player_demote:
        name = name.replace(".json", "_demote.json")
    with open(os.path.join(os.environ.get("HOCKEY_E2E_LOGS")
                           or os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), "..", "logs"), name), "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
