"""End-to-end quality harness on a temporally-coherent synthetic clip.

Renders a broadcast-like sequence (train/scenes.py:render_scene_sequence —
fixed camera/teams, players skating smoothly), runs the REAL pipeline
(shipped trained checkpoints, fused megastep, tracker, team classifier) in
TEAM_CLASSIFICATION mode, and scores it against ground truth:

- detection precision / recall (IoU 0.5 greedy match),
- ID stability: fraction of gt actors tracked under a single dominant
  predicted id, and total id switches,
- team accuracy: predicted team label vs gt team, after resolving the
  best gt-team -> predicted-team mapping by majority.

    python scripts/e2e_quality.py [--frames 96] [--seed 7] [--imgsz 640]

Prints one JSON line; also written to logs/e2e_quality.json.
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
    p.add_argument("--frames", type=int, default=96)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--imgsz", type=int, default=640,
                   help="clip resolution (square)")
    p.add_argument("--mode", type=str, default="TEAM_CLASSIFICATION",
                   choices=["TEAM_CLASSIFICATION", "PLAYER_TRACKING"],
                   help="PLAYER_TRACKING additionally scores per-track "
                        "majority-voted jersey-number accuracy "
                        "(reference README.md:95-98)")
    p.add_argument("--span", type=str, default="0.45,0.8",
                   help="camera zoom span. Number scoring wants a tight "
                        "zoom (e.g. 0.28,0.42) at --imgsz >= 960: the "
                        "OCR reads crops >= 60 px tall (the reference's "
                        "easyocr gate), which wide shots never produce")
    p.add_argument("--generator", type=str, default="a", choices=["a", "b"],
                   help="'b' scores the pipeline END-TO-END on the "
                        "never-trained generator-B renderer (OOD; "
                        "--span is ignored, B uses its pinhole zoom)")
    p.add_argument("--player-checkpoint", type=str, default=None,
                   help="evaluate this player checkpoint instead of the "
                        "shipped weights (pre-ship candidate evaluation)")
    p.add_argument("--device-tracker", action="store_true",
                   help="force the fused device tracker (the shipped TPU "
                        "wiring incl. COMPAT #26-29 duplicate suppression) "
                        "even on the CPU backend, where the pipeline's "
                        "auto rule would pick the host ByteTrack; writes "
                        "*_devtrack.json")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (e.g. while the TPU is "
                        "training; env vars alone cannot override the "
                        "axon sitecustomize)")
    p.add_argument("--match-iou", type=float, default=0.5,
                   help="pred<->gt match threshold. 0.5 is the MOT "
                        "convention; generator B draws looser body "
                        "extents than the training labels (its mAP50-95 "
                        "is 0.195 for the same reason), so a B run at "
                        "0.3 separates extent-convention mismatch from "
                        "real detection/tracking error")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import cv2

    from hockey_tpu.core.config import Config, ProcessingMode
    from hockey_tpu.pipeline import VideoProcessor

    rng = np.random.default_rng(args.seed)
    if args.generator == "b":
        from hockey_tpu.train.scenes_b import render_scene_sequence_b

        frames, labels = render_scene_sequence_b(rng, args.imgsz,
                                                 args.frames)
    else:
        from hockey_tpu.train.scenes import render_scene_sequence

        span = tuple(float(x) for x in args.span.split(","))
        frames, labels = render_scene_sequence(rng, args.imgsz, args.frames,
                                               span_range=span)
    clip = "/tmp/e2e_quality_clip.mp4"
    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30,
                        (args.imgsz, args.imgsz))
    for f in frames:
        w.write(f)
    w.release()

    os.environ["HOCKEY_TPU_HEADLESS"] = "1"
    config = Config()
    config.detection_imgsz = args.imgsz
    if args.device_tracker:
        config.use_device_tracker = True
    mode = ProcessingMode(args.mode)
    proc = VideoProcessor(config=config, mode=mode,
                          frame_hw=(args.imgsz, args.imgsz),
                          checkpoint=args.player_checkpoint,
                          team_names=("TEAM_A", "TEAM_B"))
    if mode == ProcessingMode.TEAM_CLASSIFICATION:
        proc.initialize_team_classifier(clip)

    tp = fp = fn = 0
    matched_ious = []  # IoU of every matched pair: quantifies gt box-
    # extent convention mismatch (generator B draws looser extents)
    # per gt actor: predicted ids seen (for stability), team votes
    id_seen: dict = {}
    team_votes: dict = {}   # (gt_team -> predicted-team counts)
    per_actor_team: dict = {}
    actor_numbers: dict = {}  # gt actor -> gt jersey number
    t = 0
    for _ in proc.process_video(clip, skip_init=True):
        res = proc.last_frame_result
        gt = labels[t]
        t += 1
        if res is None:
            fn += len(gt["boxes"])
            continue
        pb, tids = res["boxes"], res["tracker_ids"]
        pteam = res["team_ids"]
        m = _iou(np.asarray(pb, np.float64),
                 np.asarray(gt["boxes"], np.float64))
        taken = set()
        matched_pred = set()
        for i in np.argsort(-res["scores"]):
            if m.shape[1] == 0:
                break
            j = int(np.argmax(np.where(
                [k in taken for k in range(m.shape[1])], -1.0, m[i])))
            if m[i, j] >= args.match_iou and j not in taken:
                taken.add(j)
                matched_pred.add(int(i))
                matched_ious.append(float(m[i, j]))
                actor = int(gt["track_ids"][j])
                id_seen.setdefault(actor, []).append(int(tids[i]))
                if "numbers" in gt and gt["numbers"][j] >= 1:
                    actor_numbers[actor] = int(gt["numbers"][j])
                gt_team = int(gt["team_ids"][j])
                if gt_team in (0, 1):
                    team_votes.setdefault(gt_team, {})
                    tv = team_votes[gt_team]
                    tv[int(pteam[i])] = tv.get(int(pteam[i]), 0) + 1
                    per_actor_team.setdefault(actor, []).append(
                        (gt_team, int(pteam[i])))
        tp += len(taken)
        fp += len(pb) - len(matched_pred)
        fn += len(gt["boxes"]) - len(taken)

    precision = tp / max(tp + fp, 1)
    recall = tp / max(tp + fn, 1)

    switches = 0
    stable = 0
    for actor, ids in id_seen.items():
        switches += sum(1 for a, b in zip(ids, ids[1:]) if a != b)
        dominant = max(set(ids), key=ids.count)
        if ids.count(dominant) / len(ids) >= 0.9:
            stable += 1
    id_stability = stable / max(len(id_seen), 1)

    # resolve gt-team -> predicted-team mapping by majority, then score
    mapping = {}
    for gt_team, votes in team_votes.items():
        mapping[gt_team] = max(votes, key=votes.get)
    team_correct = team_total = 0
    if len(set(mapping.values())) == len(mapping):  # injective mapping
        for actor, obs in per_actor_team.items():
            for gt_team, pred in obs:
                team_total += 1
                team_correct += int(mapping[gt_team] == pred)
    team_acc = team_correct / max(team_total, 1)

    out = {
        "mode": args.mode,
        "frames": args.frames,
        "imgsz": args.imgsz,
        "match_iou": args.match_iou,
        "detection_precision": round(precision, 4),
        "detection_recall": round(recall, 4),
        "id_stability": round(id_stability, 4),
        "id_switches": switches,
        "actors": len(id_seen),
        "matched_iou_mean": round(float(np.mean(matched_ious)), 4)
        if matched_ious else None,
    }
    if mode == ProcessingMode.TEAM_CLASSIFICATION:
        out["team_accuracy"] = round(team_acc, 4)
        out["teams_separable"] = len(set(mapping.values())) == len(mapping)
    else:
        # per-track majority-voted jersey-number accuracy: each gt actor's
        # dominant predicted track id must carry the right number at the
        # end of the clip (reference README.md:95-98 — numbers persist
        # per tracker id and should be correct)
        num_ok = num_total = 0
        wrong = []
        for actor, number in actor_numbers.items():
            ids = id_seen.get(actor)
            if not ids:
                continue
            dominant = max(set(ids), key=ids.count)
            got = (proc.ocr.get_number(dominant)
                   if proc.ocr is not None else None)
            num_total += 1
            if got is not None and int(got) == number:
                num_ok += 1
            else:
                wrong.append((number, got))
        out["number_accuracy"] = round(num_ok / max(num_total, 1), 4)
        out["numbered_actors"] = num_total
        out["number_errors"] = [[n, g] for n, g in wrong]
    out["generator"] = args.generator
    line = json.dumps(out)
    name = ("e2e_quality.json" if mode == ProcessingMode.TEAM_CLASSIFICATION
            else "e2e_tracking.json")
    if args.generator == "b":
        name = name.replace(".json", "_b.json")
    if args.device_tracker:
        name = name.replace(".json", "_devtrack.json")
    if args.player_checkpoint:  # keep shipped-weights artifacts pristine
        name = name.replace(".json", "_candidate.json")
    print(line)
    with open(os.path.join(os.environ.get("HOCKEY_E2E_LOGS")
                           or os.path.join(os.path.dirname(
                               os.path.abspath(__file__)), "..", "logs"), name), "w") as f:
        f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
