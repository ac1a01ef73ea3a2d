"""Offline tracker diagnosis: dump the detection megastep's raw outputs on
a coherent clip ONCE, then sweep tracker-parameter variants on the saved
arrays.

Motivation (round 4): generator-B OOD tracking measured id_stability 0.111
with 88 switches even at extent-insensitive matching (logs/
e2e_quality_b_iou03.json) while in-dist is 1.0. The detector is ~10 s/frame
on the 1-core host but the tracker is milliseconds — decoupling them makes
association experiments tractable: one dump, then every variant replays
the same detections.

Usage:
  python scripts/diag_track_b.py dump  --generator b --frames 96
  python scripts/diag_track_b.py sweep --generator b

The dump uses conf=0.1 (the fused path's BYTE_FLOOR NMS floor,
models/detector.py detect_track_batch) so sweeps see the same low-score
detections ByteTrack's second stage consumes; each variant then applies
its own activation threshold, mirroring the fused wiring
(activation = max(track_activation_threshold, detection_confidence)).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _render(args):
    rng = np.random.default_rng(args.seed)
    if args.generator == "b":
        from hockey_tpu.train.scenes_b import render_scene_sequence_b

        return render_scene_sequence_b(rng, args.imgsz, args.frames)
    from hockey_tpu.train.scenes import render_scene_sequence

    return render_scene_sequence(rng, args.imgsz, args.frames,
                                 span_range=(0.45, 0.8))


def _npz_path(args) -> str:
    return f"/tmp/diag_track_{args.generator}_{args.seed}_{args.imgsz}.npz"


def dump(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from hockey_tpu.core.config import Config
    from hockey_tpu.models.detector import Detector, HostDetections

    frames, labels = _render(args)
    det = Detector("hockey-player-detection", Config(),
                   frame_hw=(args.imgsz, args.imgsz), conf=0.1,
                   imgsz=args.imgsz)
    n = len(frames)
    boxes, scores, classes, valid = [], [], [], []
    bs = 8
    for i in range(0, n, bs):
        chunk = np.stack(frames[i:i + bs])
        pad = bs - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros_like(chunk[:pad])])
        out = det.detect_batch(chunk)
        # Detections is itself a NamedTuple (a tuple); with_team_features /
        # pose variants return (Detections, extra) instead.
        from hockey_tpu.ops.nms import Detections
        d = out if isinstance(out, Detections) else out[0]
        for j in range(min(bs, n - i)):
            h = HostDetections.from_padded(d, j)
            boxes.append(h.boxes)
            scores.append(h.scores)
            classes.append(h.classes)
        print(f"dumped {min(i + bs, n)}/{n}", flush=True)
    dmax = max(len(b) for b in boxes)
    pb = np.zeros((n, dmax, 4), np.float32)
    ps = np.full((n, dmax), -1.0, np.float32)
    pc = np.zeros((n, dmax), np.int32)
    pv = np.zeros((n, dmax), bool)
    for t, (b, s, c) in enumerate(zip(boxes, scores, classes)):
        k = len(b)
        pb[t, :k], ps[t, :k], pc[t, :k], pv[t, :k] = b, s, c, True
    gmax = max(len(lb["boxes"]) for lb in labels)
    gb = np.zeros((n, gmax, 4), np.float32)
    gi = np.full((n, gmax), -1, np.int32)
    gv = np.zeros((n, gmax), bool)
    for t, lb in enumerate(labels):
        k = len(lb["boxes"])
        gb[t, :k] = lb["boxes"]
        gi[t, :k] = lb["track_ids"]
        gv[t, :k] = True
    np.savez_compressed(_npz_path(args), boxes=pb, scores=ps, classes=pc,
                        valid=pv, gt_boxes=gb, gt_ids=gi, gt_valid=gv)
    print(f"saved {_npz_path(args)}")
    return 0


def _iou_mat(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), -1)
    aa = np.prod(a[:, 2:] - a[:, :2], -1)
    ab = np.prod(b[:, 2:] - b[:, :2], -1)
    return inter / np.maximum(aa[:, None] + ab[None] - inter, 1e-9)


def _score_variant(data, det_tids, match_iou: float) -> dict:
    """Score emitted (det_tid >= 0) detections against gt, e2e_quality
    semantics: greedy by detection score, match at IoU >= match_iou;
    stability = share of actors whose dominant id covers >= 90%."""
    n = data["boxes"].shape[0]
    tp = fp = fn = 0
    id_seen: dict = {}
    for t in range(n):
        keep = (det_tids[t] >= 0) & data["valid"][t]
        pb = data["boxes"][t][keep]
        psc = data["scores"][t][keep]
        tids = det_tids[t][keep]
        gt = data["gt_boxes"][t][data["gt_valid"][t]]
        gids = data["gt_ids"][t][data["gt_valid"][t]]
        if len(pb) == 0:
            fn += len(gt)
            continue
        m = _iou_mat(pb.astype(np.float64), gt.astype(np.float64))
        taken: set = set()
        matched = 0
        for i in np.argsort(-psc):
            if m.shape[1] == 0:
                break
            j = int(np.argmax(np.where(
                [k in taken for k in range(m.shape[1])], -1.0, m[i])))
            if m[i, j] >= match_iou and j not in taken:
                taken.add(j)
                matched += 1
                id_seen.setdefault(int(gids[j]), []).append(int(tids[i]))
        tp += matched
        fp += len(pb) - matched
        fn += len(gt) - matched
    switches = stable = 0
    for ids in id_seen.values():
        switches += sum(1 for a, b in zip(ids, ids[1:]) if a != b)
        dominant = max(set(ids), key=ids.count)
        stable += ids.count(dominant) / len(ids) >= 0.9
    return {
        "precision": round(tp / max(tp + fp, 1), 4),
        "recall": round(tp / max(tp + fn, 1), 4),
        "id_stability": round(stable / max(len(id_seen), 1), 4),
        "id_switches": switches,
        "actors": len(id_seen),
    }


def _dedup_iomin(data, thr: float):
    """Greedy same-class containment suppression on the dumped (post-NMS)
    detections: invalidate a box whose intersection-over-min-area with a
    higher-scoring surviving same-class box exceeds `thr`. Offline stand-in
    for adding the containment term to the device NMS."""
    out = {k: data[k].copy() for k in data}
    n = data["scores"].shape[0]
    for t in range(n):
        v = np.where(out["valid"][t])[0]
        if len(v) < 2:
            continue
        order = v[np.argsort(-out["scores"][t][v])]
        b = out["boxes"][t].astype(np.float64)
        area = np.prod(np.clip(b[:, 2:] - b[:, :2], 0, None), -1)
        alive = []
        for i in order:
            dead = False
            for j in alive:
                if out["classes"][t][i] != out["classes"][t][j]:
                    continue
                tl = np.maximum(b[i, :2], b[j, :2])
                br = np.minimum(b[i, 2:], b[j, 2:])
                inter = np.prod(np.clip(br - tl, 0, None))
                if inter / max(min(area[i], area[j]), 1e-9) > thr:
                    dead = True
                    break
            if dead:
                out["valid"][t][i] = False
                out["scores"][t][i] = -1.0
            else:
                alive.append(i)
    return out


def sweep(args) -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from hockey_tpu.tracking.device_tracker import init_state, tracker_step

    data = np.load(_npz_path(args))
    if args.dedup_iomin > 0:
        data = _dedup_iomin(data, args.dedup_iomin)
    base = dict(activation_thresh=0.4, match_thresh=0.8, low_gate=0.5,
                max_time_lost=30, min_consecutive=2)
    variants = {
        "shipped": {},
        "act_025": {"activation_thresh": 0.25},
        "mc1": {"min_consecutive": 1},
        "act_025_mc1": {"activation_thresh": 0.25, "min_consecutive": 1},
        "lost60": {"max_time_lost": 60},
        "gate_09": {"match_thresh": 0.9},
        "combo": {"activation_thresh": 0.25, "min_consecutive": 1,
                  "max_time_lost": 60},
    }
    if args.reacquire:
        variants["reacq"] = {"lost_reacquire_floor": 0.15}
        variants["reacq_combo"] = {"lost_reacquire_floor": 0.15,
                                   "min_consecutive": 1}
    if args.dupkill > 0:
        variants["dupkill"] = {"duplicate_kill_iomin": args.dupkill}
        variants["dupkill_reacq"] = {"duplicate_kill_iomin": args.dupkill,
                                     "lost_reacquire_floor": 0.15}
    if args.lostdup > 0:
        # kills LOST younger tracks coasting inside a TRACKED older one —
        # targets the measured alternation mode (torso/full-body extent
        # flicker sustaining two tracks per actor)
        for thr in (args.lostdup, 0.85):
            variants[f"lostdup_{thr:g}"] = {"lost_dup_kill_iomin": thr}
        variants["lostdup_full"] = {
            "lost_dup_kill_iomin": args.lostdup,
            "duplicate_kill_iomin": max(args.dupkill, 0.7),
            "lost_reacquire_floor": 0.15}
        for thr in (0.7, 0.85):
            variants[f"veto_{thr:g}"] = {
                "lost_dup_kill_iomin": args.lostdup,
                "duplicate_kill_iomin": max(args.dupkill, 0.7),
                "lost_reacquire_floor": 0.15,
                "init_contain_veto": thr}
    n, dmax = data["scores"].shape
    out = {}
    for name, over in variants.items():
        kw = dict(base, **over)
        state = init_state(64)
        tids = np.full((n, dmax), -1, np.int32)
        try:
            for t in range(n):
                state, dt = tracker_step(
                    state, jnp.asarray(data["boxes"][t]),
                    jnp.asarray(data["scores"][t]),
                    jnp.asarray(data["classes"][t]),
                    jnp.asarray(data["valid"][t]), **kw)
                tids[t] = np.asarray(dt)
        except TypeError as e:  # variant needs a not-yet-implemented knob
            out[name] = f"unsupported: {e}"
            continue
        out[name] = _score_variant(data, tids, args.match_iou)
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"generator": args.generator, "seed": args.seed,
                      "match_iou": args.match_iou, "variants": out}))
    return 0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("cmd", choices=["dump", "sweep"])
    p.add_argument("--generator", default="b", choices=["a", "b"])
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--match-iou", type=float, default=0.3)
    p.add_argument("--dupkill", type=float, default=0.0,
                   help="include duplicate-track-kill variants at this "
                        "IoMin threshold")
    p.add_argument("--dedup-iomin", type=float, default=0.0,
                   help="pre-tracker containment suppression threshold "
                        "(offline stand-in for an NMS containment term)")
    p.add_argument("--lostdup", type=float, default=0.0,
                   help="include lost-dup-kill variants at this IoMin "
                        "threshold (kills LOST younger tracks covered by "
                        "a TRACKED older same-class track)")
    p.add_argument("--reacquire", action="store_true",
                   help="include lost-reacquisition variants (requires the "
                        "device tracker knob)")
    args = p.parse_args()
    return dump(args) if args.cmd == "dump" else sweep(args)


if __name__ == "__main__":
    sys.exit(main())
