"""Real-weights video CI: decode -> CLI pipeline -> mp4 sink, all 4 modes.

The reference's only entry point is file-in/file-out video
(/root/reference/hockey/main.py:362-384). This harness exercises exactly
that surface with the SHIPPED checkpoints: render a temporally-coherent
broadcast-like clip (train/scenes.py), encode it to mp4 with cv2, then
drive `hockey_tpu.cli.main` — the real argv entry — once per processing
mode (PLAYER_DETECTION / PLAYER_TRACKING / TEAM_CLASSIFICATION /
PUCK_DETECTION) plus TEAM_CLASSIFICATION with --show-2d-map, asserting
for each run:

- exit code 0,
- the --target_path mp4 exists and holds exactly --frames frames,
- the --json-metrics file parses and its 'detect' stage saw every frame.

Prints one JSON line (per-mode wall fps + assertions); also written to
logs/e2e_video.json.

    python scripts/e2e_video.py [--frames 48] [--imgsz 640] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--seed", type=int, default=5)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--span", type=str, default="0.45,0.8")
    p.add_argument("--frame-batch", type=int, default=16)
    p.add_argument("--modes", type=str, default=None,
                   help="comma list override (default: all four + 2d map)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (tunnel-outage fallback)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2

    from hockey_tpu.train.scenes import render_scene_sequence

    rng = np.random.default_rng(args.seed)
    span = tuple(float(x) for x in args.span.split(","))
    frames, _labels = render_scene_sequence(rng, args.imgsz, args.frames,
                                            span_range=span)
    clip = "/tmp/e2e_video_clip.mp4"
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (args.imgsz, args.imgsz))
    for f in frames:
        w.write(f)
    w.release()

    runs = ([(m, False) for m in args.modes.split(",")] if args.modes else
            [("PLAYER_DETECTION", False), ("PLAYER_TRACKING", False),
             ("TEAM_CLASSIFICATION", False), ("PUCK_DETECTION", False),
             ("TEAM_CLASSIFICATION", True)])

    import hockey_tpu.cli.main as cli

    out = {"frames": args.frames, "imgsz": args.imgsz, "clip": clip,
           "modes": {}, "ok": True}
    for mode, map2d in runs:
        tag = mode + ("+2dmap" if map2d else "")
        dst = f"/tmp/e2e_video_{tag.replace('+', '_')}.mp4"
        met = dst.replace(".mp4", "_metrics.json")
        for f_ in (dst, met):
            if os.path.exists(f_):
                os.remove(f_)
        argv = ["--source_path", clip, "--target_path", dst,
                "--mode", mode, "--headless", "--json-metrics", met,
                "--frame-batch", str(args.frame_batch),
                "--imgsz", str(args.imgsz),
                "--team-names", "TEAM_A,TEAM_B"]
        if map2d:
            argv.append("--show-2d-map")
        t0 = time.perf_counter()
        try:
            rc = cli.main(argv)
        except Exception as e:  # keep scoring the other modes
            print(f"[{tag}] CRASHED: {e!r}", file=sys.stderr)
            out["modes"][tag] = {"ok": False, "error": repr(e)}
            out["ok"] = False
            continue
        wall = time.perf_counter() - t0

        cap = cv2.VideoCapture(dst)
        n_sink = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        stages = {}
        detected = None
        try:
            with open(met) as f:
                mj = json.load(f)
            stages = mj.get("stages", mj)
            detected = (mj.get("counters") or {}).get("detections")
        except Exception as e:
            print(f"[{tag}] metrics unreadable: {e!r}", file=sys.stderr)
        ok = (rc == 0 and n_sink == args.frames
              and "detect" in json.dumps(stages))
        out["modes"][tag] = {
            "ok": bool(ok), "rc": rc, "sink_frames": n_sink,
            "wall_fps": round(args.frames / wall, 2),
            "detections": detected,
        }
        out["ok"] = out["ok"] and ok
        print(f"[{tag}] rc={rc} sink={n_sink}/{args.frames} "
              f"wall_fps={out['modes'][tag]['wall_fps']} det={detected}",
              file=sys.stderr)

    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "..", "logs"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "logs", "e2e_video.json")
    line = json.dumps(out)
    with open(path, "w") as f:
        f.write(line + "\n")
    print(line)
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
