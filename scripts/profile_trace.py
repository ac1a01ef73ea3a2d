"""Capture a device trace of a hot program and report top op classes.

Round-2..4 reviews asked that STATUS's roofline/MFU claims be backed by
a parsed op-level trace, not cost-model arithmetic. Round 4's attempt
died on a protobuf gencode mismatch inside tensorboard_plugin_profile
("Descriptors cannot be created directly"); this version forces the
pure-python protobuf runtime BEFORE any proto import and parses the
XSpace protobuf DIRECTLY (tensorflow.tsl.profiler.protobuf.xplane_pb2),
dropping the broken plugin entirely.

    python scripts/profile_trace.py [--program detect|dual] [--batch 32]

Writes the raw trace under /tmp/hockey_trace*/ and prints a JSON line
with total device-plane time and the top-12 op categories by summed
duration; also logs/profile_trace[_<program>].json.
"""

from __future__ import annotations

import os

# must precede every (transitive) google.protobuf import: the C++
# descriptor pool rejects tensorflow's older gencode, the python one
# accepts it (the round-4 trace failure).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import argparse
import glob
import json
import re
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# strip SSA suffixes: "%fusion.123" -> "fusion", "convolution.5.remat"
# -> "convolution"; keep readable names for named computations
_CAT = re.compile(r"^%?([a-zA-Z_][\w-]*?)(?:[._-]\d+)*(?:\.remat\d*)?$")


def _category(name: str) -> str:
    m = _CAT.match(name)
    return m.group(1) if m else name[:40]


def parse_xplane(trace_dir: str):
    """Aggregate op durations per category from the newest xplane.pb.

    Returns (device_planes: {plane_name: {total_ps, line_names}},
    cats: {category: ps}) summed over device-plane op lines."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return None, None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    planes_info = {}
    cats = defaultdict(int)
    for plane in space.planes:
        pname = plane.name
        is_device = ("TPU" in pname or "/device:" in pname
                     or "Device" in pname) and "Host" not in pname
        if not is_device:
            continue
        meta = {mid: m.name for mid, m in plane.event_metadata.items()}
        lines = []
        total = 0
        for line in plane.lines:
            # op-level lines on TPU planes: "XLA Ops" / per-core op
            # streams; step/module lines double-count their children
            lname = line.name or f"line{line.id}"
            if any(k in lname.lower() for k in ("step", "module")):
                continue
            lines.append(lname)
            for ev in line.events:
                dur = int(ev.duration_ps)
                total += dur
                cats[_category(meta.get(ev.metadata_id, "?"))] += dur
        planes_info[pname] = {"total_ps": total, "lines": lines}
    return planes_info, dict(cats)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--program", type=str, default="detect",
                   choices=["detect", "fused", "dual"])
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--trace-dir", type=str, default=None)
    p.add_argument("--parse-only", type=str, default=None,
                   help="skip capture; parse this existing trace dir")
    args = p.parse_args()
    trace_dir = args.trace_dir or f"/tmp/hockey_trace_{args.program}"

    out = {"program": args.program, "batch": args.batch, "reps": args.reps}

    if not args.parse_only:
        import jax
        import jax.numpy as jnp

        from hockey_tpu.core.config import Config
        from hockey_tpu.train.scenes import render_scene_sequence

        config = Config()
        frames, _ = render_scene_sequence(np.random.default_rng(42), 1080,
                                          args.batch, width=1920)
        stack = np.stack(frames)

        if args.program == "detect":
            from hockey_tpu.models.checkpoint import (load_params,
                                                      shipped_weights_path)
            from hockey_tpu.models.detector import build_detect_fn
            from hockey_tpu.models.layers import fuse_for_inference
            from hockey_tpu.models.yolov8 import MODEL_ZOO, init_params

            cfg = MODEL_ZOO["hockey-player-detection"]
            shipped = shipped_weights_path("hockey-player-detection")
            params = fuse_for_inference(load_params(shipped) if shipped
                                        else init_params(cfg, seed=0))
            # stage weights in HBM once: host-numpy params re-upload the
            # full weight set every call and pollute the trace with
            # copy-start ops (measured 13.7% of device time, round 5)
            params = jax.device_put(params)
            fn = build_detect_fn(cfg, imgsz=config.detection_imgsz,
                                 frame_hw=(1080, 1920),
                                 conf=config.detection_confidence,
                                 iou=config.nms_iou_threshold,
                                 pre_topk=config.nms_pre_topk,
                                 max_det=config.max_detections)
            dev = jnp.asarray(stack)
            _ = np.asarray(fn(params, dev).boxes)  # compile + warm

            jax.profiler.start_trace(trace_dir)
            for _ in range(args.reps):
                _ = np.asarray(fn(params, dev).boxes)
            jax.profiler.stop_trace()
        elif args.program == "fused":
            # the e2e pipeline's actual device program: detect + team
            # features + device ByteTrack scan in ONE jitted call
            # (models/detector.py detect_track_batch) — the suspect for
            # the round-2 -> round-4 e2e_compute regression
            from hockey_tpu.models.detector import Detector
            from hockey_tpu.tracking.device_tracker import DeviceByteTrack

            det = Detector("hockey-player-detection", config,
                           frame_hw=(1080, 1920), with_team_features=True)
            tr = DeviceByteTrack(
                capacity=config.max_tracks,
                track_activation_threshold=config.track_activation_threshold,
                lost_track_buffer=config.lost_track_buffer,
                minimum_matching_threshold=config.minimum_matching_threshold,
                frame_rate=config.frame_rate,
                minimum_consecutive_frames=config.minimum_consecutive_frames,
                duplicate_kill_iomin=config.duplicate_kill_iomin,
                lost_dup_kill_iomin=config.lost_dup_kill_iomin,
            )
            dev = jnp.asarray(stack)
            r = det.detect_track_batch(dev, tr.state)
            _ = np.asarray(r[0].boxes)  # compile + warm
            tr.reset()
            jax.profiler.start_trace(trace_dir)
            for _ in range(args.reps):
                r = det.detect_track_batch(dev, tr.state)
                tr.state = r[-1]
                _ = np.asarray(r[0].boxes)
            jax.profiler.stop_trace()
        else:  # dual player+rink megastep (pipeline --show-2d-map path)
            from hockey_tpu.models.dual import DualDetector

            det = DualDetector(config=config, frame_hw=(1080, 1920))
            _ = det.detect_batch(stack)  # compile + warm (syncs per call)
            jax.profiler.start_trace(trace_dir)
            for _ in range(args.reps):
                _ = det.detect_batch(stack)
            jax.profiler.stop_trace()

    planes, cats = parse_xplane(args.parse_only or trace_dir)
    if planes is None:
        out["parse_error"] = "no xplane.pb found in trace dir"
    else:
        total = sum(p["total_ps"] for p in planes.values())
        out["device_planes"] = list(planes)
        out["device_total_ms"] = round(total / 1e9, 3)
        top = sorted((cats or {}).items(), key=lambda kv: -kv[1])[:12]
        out["top_ops"] = [
            {"op": k, "ms": round(v / 1e9, 3),
             "pct": round(100.0 * v / max(total, 1), 1)}
            for k, v in top]
    line = json.dumps(out)
    print(line[:2000])
    name = ("profile_trace.json" if args.program == "detect"
            else f"profile_trace_{args.program}.json")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "logs", name), "w") as f:
        f.write(line + "\n")
    print(f"trace dir: {args.parse_only or trace_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
