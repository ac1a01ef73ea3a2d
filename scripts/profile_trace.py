"""Capture a device trace of the detect megastep and report the top op
classes by self time — the evidence behind STATUS's roofline note
(round-2 review asked that the "remaining ~30% is im2col/VPU" claim be
backed by a trace, not inference).

    python scripts/profile_trace.py [--batch 32] [--reps 3]

Writes the raw trace under /tmp/hockey_trace/ and prints a JSON line
with the top-10 self-time op categories; also logs/profile_trace.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _parse_xplane(trace_dir: str):
    """Aggregate per-op self time from the xplane protobuf via the
    tensorboard profiler plugin (present in this image)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        return None
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [paths[-1]], "framework_op_stats", {})
    return data


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--trace-dir", type=str, default="/tmp/hockey_trace")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from hockey_tpu.core.config import Config
    from hockey_tpu.models.detector import build_detect_fn
    from hockey_tpu.models.layers import fuse_for_inference
    from hockey_tpu.models.checkpoint import load_params, shipped_weights_path
    from hockey_tpu.models.yolov8 import MODEL_ZOO, init_params
    from hockey_tpu.train.scenes import render_scene_sequence

    config = Config()
    cfg = MODEL_ZOO["hockey-player-detection"]
    shipped = shipped_weights_path("hockey-player-detection")
    params = fuse_for_inference(load_params(shipped) if shipped
                                else init_params(cfg, seed=0))
    fn = build_detect_fn(cfg, imgsz=config.detection_imgsz,
                         frame_hw=(1080, 1920),
                         conf=config.detection_confidence,
                         iou=config.nms_iou_threshold,
                         pre_topk=config.nms_pre_topk,
                         max_det=config.max_detections)
    frames, _ = render_scene_sequence(np.random.default_rng(42), 1080,
                                      args.batch, width=1920)
    dev = jnp.asarray(np.stack(frames))
    _ = np.asarray(fn(params, dev).boxes)  # compile + warm

    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.reps):
        _ = np.asarray(fn(params, dev).boxes)
    jax.profiler.stop_trace()

    out = {"batch": args.batch, "reps": args.reps}
    try:
        stats = _parse_xplane(args.trace_dir)
        if stats is not None:
            tbl = json.loads(stats) if isinstance(stats, (str, bytes)) \
                else stats
            out["raw_tool"] = "framework_op_stats"
            out["stats_excerpt"] = str(tbl)[:4000]
    except Exception as e:
        out["parse_error"] = f"{type(e).__name__}: {e}"
    line = json.dumps(out)
    print(line[:2000])
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "logs", "profile_trace.json"), "w") as f:
        f.write(line + "\n")
    print(f"trace dir: {args.trace_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
