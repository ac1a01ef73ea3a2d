"""Benchmark: 1080p detection + end-to-end pipeline throughput per chip.

Un-losable by construction (round-3 lesson: one hung stage against a dead
TPU tunnel forfeited every metric, BENCH_r03.json rc=124/parsed=null):

- Every sub-bench runs in its OWN subprocess under its own time budget;
  a hang or crash in one stage cannot take down the others.
- A cumulative JSON line (detect metric first) is printed to stdout after
  EVERY stage, and mirrored to logs/bench_partial.json — whatever line is
  last when a driver-level timeout strikes is valid and carries every
  metric measured so far. Stage stderr goes to logs/bench_stage_*.log,
  never stdout, so the last stdout line is always the JSON.
- A cheap tunnel probe (tiny matmul, hard sync) runs first; if the axon
  tunnel is dead this is detected in <= ~4 min and the TPU stages are
  skipped with "error": "tpu_unavailable" instead of hanging 25 min.
- The rendered benchmark content (hard 1080p clips) is cached under
  .bench_cache/ so host rendering cost is paid once, not per run.
- Stages write their result file incrementally (after each batch size /
  milestone), so even a stage killed at its budget leaves partial numbers.

Measurements (same metrics as rounds 1-3, comparable across rounds):

1. `value` (primary): the flagship megastep (letterbox -> YOLOv8x @1280 ->
   DFL decode -> on-device NMS, the reference's runtime configuration:
   hockey/main.py:28-29) on hard synthetic 1080p frames, frames/sec/chip.
2. `e2e_pipeline_fps` / `e2e_compute_fps`: the REAL pipeline (decode ->
   megastep with fused team features -> ByteTrack -> team vote ->
   annotate) in TEAM_CLASSIFICATION mode on a 1080p clip.
3. `puck_fps`: PUCK_DETECTION cross-frame tiled megastep (K frames x T
   640-tiles in one program, slicing/sahi.py).
4. `dual_fps`: player@1280 + rink-pose + team features (--show-2d-map
   program, models/dual.py).

Baseline derivation (vs_baseline): the reference publishes no end-to-end
number (BASELINE.md). Its only measured datum is the detector at
0.4 + 4.1 + 0.6 = 5.1 ms/frame at imgsz=640 on an RTX 4090
(train_player_detection.ipynb cell 15 "Speed:" line). The runtime uses
imgsz=1280 = 4x the pixels, so the comparable per-frame cost is
~4 * 5.1 ms = 20.4 ms -> 49.0 fps. vs_baseline = our_fps / 49.0.

This is the MOST CONSERVATIVE comparator (the reference's detector alone
on a flagship GPU). The reference's actual end-to-end pipeline also runs
GrabCut on host per player crop per frame (team_segmentation.py:248) —
measured at ~18.5 ms/crop x ~12 players = ~220 ms/frame on this host — so
its real TEAM_CLASSIFICATION throughput ceiling is ~4 fps.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASELINE_FPS = 1000.0 / (4 * (0.4 + 4.1 + 0.6))  # ≈ 49.0 (see docstring)
E2E_FRAMES = 192  # steady-state frames timed in the pipeline benchmark
REPO = os.path.dirname(os.path.abspath(__file__))
# env overrides exist so TESTS can exercise the real orchestrator without
# writing the repo's logs/ — an unpatched test once fabricated
# logs/bench_last_good.json from fixture values
CACHE = os.environ.get("HOCKEY_BENCH_CACHE", os.path.join(REPO, ".bench_cache"))
LOGS = os.environ.get("HOCKEY_BENCH_LOGS", os.path.join(REPO, "logs"))

# Per-stage wall budgets (seconds). The parent also enforces a global
# deadline (HOCKEY_BENCH_BUDGET, default 1500 s) and shrinks/skips the
# later stages to fit it.
STAGE_BUDGET = {
    "probe": 270,
    "prep": 420,
    "detect": 700,
    "e2e": 700,
    "puck": 450,
    "dual": 700,
}


def _write_out(path: str, obj: dict) -> None:
    """Atomic incremental result write so a killed stage leaves data."""
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# Stage bodies (each runs in its own subprocess: `bench.py --stage X --out F`)
# ---------------------------------------------------------------------------


def stage_probe(out: str) -> None:
    """Tunnel liveness: devices + tiny matmul with a HARD sync.

    On the axon tunnel `jax.block_until_ready` returns early; only
    np.asarray truly waits (CLAUDE.md), so the matmul round-trip is the
    real liveness signal.
    """
    import numpy as np

    t0 = time.perf_counter()
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    x = jnp.ones((128, 128), jnp.bfloat16)
    v = float(np.asarray(x @ x)[0, 0])
    assert v == 128.0, v
    _write_out(out, {
        "ok": True,
        "platform": devs[0].platform,
        "n_devices": len(devs),
        "roundtrip_s": round(time.perf_counter() - t0, 1),
    })


def stage_prep(out: str) -> None:
    """Render + cache the benchmark content (host-only, forced CPU jax).

    Content is the coherent broadcast-like scene renderer
    (train/scenes.py — ~10-14 actors, perspective camera, crowd/boards
    clutter, occlusions), NOT flat noise: NMS occupancy, decode tails and
    host-stage cost depend on realistic content.
    """
    import jax

    jax.config.update("jax_platforms", "cpu")  # env vars don't work here
    import numpy as np

    from hockey_tpu.train.scenes import render_scene_sequence

    os.makedirs(CACHE, exist_ok=True)
    done = {}

    hard_npz = os.path.join(CACHE, "hard32.npz")
    if not os.path.exists(hard_npz):
        frames, _ = render_scene_sequence(np.random.default_rng(42), 1080,
                                          32, width=1920)
        np.savez_compressed(hard_npz, frames=np.stack(frames))
    done["hard32"] = True
    _write_out(out, done)

    clip = os.path.join(CACHE, f"clip{E2E_FRAMES}.mp4")
    if not os.path.exists(clip):
        import cv2

        frames, _ = render_scene_sequence(np.random.default_rng(42), 1080,
                                          E2E_FRAMES, width=1920)
        w = cv2.VideoWriter(clip + ".tmp.mp4",
                            cv2.VideoWriter_fourcc(*"mp4v"), 30,
                            (1920, 1080))
        for f in frames:
            w.write(f)
        w.release()
        os.replace(clip + ".tmp.mp4", clip)
    done["clip"] = True
    _write_out(out, done)

    puck_npz = os.path.join(CACHE, "puck16.npz")
    if not os.path.exists(puck_npz):
        frames, _ = render_scene_sequence(np.random.default_rng(7), 1080,
                                          16, width=1920,
                                          span_range=(0.25, 0.45),
                                          include_puck=True)
        np.savez_compressed(puck_npz, frames=np.stack(frames))
    done["puck16"] = True
    _write_out(out, done)


def _load_hard32():
    import numpy as np

    return np.load(os.path.join(CACHE, "hard32.npz"))["frames"]


def stage_detect(out: str) -> None:
    """Detect-only megastep sweep; writes best fps after EVERY batch."""
    import jax.numpy as jnp
    import numpy as np

    from hockey_tpu.core.config import Config
    from hockey_tpu.models.detector import build_detect_fn
    from hockey_tpu.models.layers import fuse_for_inference
    from hockey_tpu.models.yolov8 import MODEL_ZOO, init_params

    config = Config()
    cfg = MODEL_ZOO["hockey-player-detection"]
    # the SHIPPED trained checkpoint (identical FLOPs to random init, but
    # NMS occupancy and the team-feature tail depend on real content +
    # real weights)
    try:
        from hockey_tpu.models.checkpoint import (
            load_params,
            shipped_weights_path,
        )

        params = fuse_for_inference(
            load_params(shipped_weights_path("hockey-player-detection")))
    except Exception:
        params = fuse_for_inference(init_params(cfg, seed=0))

    hard = _load_hard32()
    res = {"fps": 0.0, "per_batch": {}}
    # batch 128 is the measured sweet spot on v5e (227 fps, ~70% MFU of
    # XLA's own flop estimate); 160/192 tile worse and regress
    for batch in (32, 64, 128):
        fn = build_detect_fn(
            cfg,
            imgsz=config.detection_imgsz,
            frame_hw=(1080, 1920),
            conf=config.detection_confidence,
            iou=config.nms_iou_threshold,
            pre_topk=config.nms_pre_topk,
            max_det=config.max_detections,
        )
        frames = jnp.asarray(
            np.tile(hard, (max(batch // 32, 1), 1, 1, 1))[:batch])
        # warmup incl. compile; np.asarray forces real completion (axon
        # block_until_ready returns early; queuing multiple in-flight
        # executions deadlocks the tunnel — sync per call)
        try:
            for _ in range(2):
                _ = np.asarray(fn(params, frames).boxes)
        except Exception as e:
            res["per_batch"][str(batch)] = f"{type(e).__name__}"
            _write_out(out, res)
            break  # batch too large for HBM; keep best so far
        n_iter = max(4, int(128 // batch))
        t0 = time.perf_counter()
        for _ in range(n_iter):
            _ = np.asarray(fn(params, frames).boxes)
        dt = time.perf_counter() - t0
        fps = batch * n_iter / dt
        res["per_batch"][str(batch)] = round(fps, 2)
        res["fps"] = max(res["fps"], fps)
        _write_out(out, res)  # survive a budget kill mid-sweep


def stage_e2e(out: str) -> None:
    """Real TEAM_CLASSIFICATION pipeline on the cached 1080p clip; fps +
    per-stage ms/frame (steady state: classifier init and first compile
    excluded via explicit warmup)."""
    import numpy as np

    import hockey_tpu.pipeline as pl
    from hockey_tpu.core.config import Config, ProcessingMode
    from hockey_tpu.pipeline import VideoProcessor

    clip = os.path.join(CACHE, f"clip{E2E_FRAMES}.mp4")

    config = Config()
    p = VideoProcessor(config=config,
                       mode=ProcessingMode.TEAM_CLASSIFICATION,
                       frame_hw=(1080, 1920), team_names=("HOME", "AWAY"))
    os.environ["HOCKEY_TPU_HEADLESS"] = "1"
    p.initialize_team_classifier(clip)

    # compile/warm the batched megastep outside the timed region — the
    # SAME program the pipeline will run (fused detect+track when active)
    b = config.resolved_frame_batch()
    warm = np.zeros((b, 1080, 1920, 3), np.uint8)
    if p.use_fused_tracker:
        o = p.player_detector.detect_track_batch(warm, p.tracker.state)
        _ = np.asarray(o[0].boxes)
        p.tracker.reset()
    else:
        o = p.player_detector.detect_batch(warm)
        _ = np.asarray((o[0] if isinstance(o, tuple) else o).boxes)

    p.timers.reset()
    t0 = time.perf_counter()
    n = 0
    for _ in p.process_video(clip, skip_init=True):
        n += 1
    dt = time.perf_counter() - t0
    summary = p.timers.summary()
    stage_ms = {k: round(v["total_s"] * 1000.0 / max(n, 1), 2)
                for k, v in summary.items()
                if k != "counters" and isinstance(v, dict) and "total_s" in v}
    res = {"fps": round(n / dt, 2), "frames": n, "stage_ms": stage_ms,
           "frame_batch": b}
    _write_out(out, res)

    # compute-bound e2e: the dev tunnel moves host->device pixels at only
    # ~35 MB/s (measured), which caps full-res 1080p feeds at ~6 fps — a
    # co-located production host (PCIe) does not have this wall. Stage one
    # batch of real frames on device once and rerun the fused program +
    # host stages: the per-chip pipeline rate when ingest is local.
    if p.use_fused_tracker:
        import jax.numpy as jnp

        from hockey_tpu.video.io import batched_frame_generator

        frames, _ = next(batched_frame_generator(clip, b))
        dev = jnp.asarray(frames)
        _ = np.asarray(dev[0, 0, 0, 0])
        p.tracker.reset()
        reps = max(E2E_FRAMES // b, 1)
        t0 = time.perf_counter()
        for _ in range(reps):
            r = p.player_detector.detect_track_batch(dev, p.tracker.state)
            p.tracker.state = r[-1]
            rows = pl.unpack_tracked(r)
            for i in range(b):
                p.process_frame(frames[i], pretracked=rows[i][:4],
                                team_feats=rows[i][4])
        res["compute_fps"] = round(reps * b / (time.perf_counter() - t0), 2)
        _write_out(out, res)


def stage_puck(out: str) -> None:
    """PUCK_DETECTION cross-frame tiled megastep: K 1080p frames x T
    overlapping 640-tiles through one forward + one merge program
    (slicing/sahi.py detect_frames); frames staged in HBM once."""
    import jax.numpy as jnp
    import numpy as np

    from hockey_tpu.core.config import Config
    from hockey_tpu.slicing.sahi import PuckPipeline

    k = 16
    pipe = PuckPipeline(Config(), frame_hw=(1080, 1920))
    frames = np.load(os.path.join(CACHE, "puck16.npz"))["frames"][:k]
    dev = jnp.asarray(frames)
    _ = np.asarray(dev[0, 0, 0, 0])
    for _ in range(2):  # compile + warm
        pipe.sliced.detect_frames(dev)
    reps = 4
    t0 = time.perf_counter()
    for _ in range(reps):
        pipe.sliced.detect_frames(dev)
    _write_out(out, {"fps": round(reps * k / (time.perf_counter() - t0), 2)})


def stage_dual(out: str) -> None:
    """Dual (player@1280 + rink-pose + team features) megastep — the
    --show-2d-map device program (models/dual.py). Reports fps + compile
    seconds per batch size."""
    import jax.numpy as jnp
    import numpy as np

    from hockey_tpu.core.config import Config
    from hockey_tpu.models.dual import DualDetector

    det = DualDetector(Config(), frame_hw=(1080, 1920))
    hard = _load_hard32()
    res = {"fps": 0.0, "compile_s": {}}
    for batch in (32, 64):
        frames = jnp.asarray(
            np.tile(hard, (max(batch // 32, 1), 1, 1, 1))[:batch])
        _ = np.asarray(frames[0, 0, 0, 0])
        try:
            t0 = time.perf_counter()
            _ = det.detect_batch(frames)  # syncs via np.asarray internally
            res["compile_s"][str(batch)] = round(time.perf_counter() - t0, 1)
            _write_out(out, res)
            _ = det.detect_batch(frames)  # warm
            n_iter = max(2, int(64 // batch))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                _ = det.detect_batch(frames)
            res["fps"] = max(res["fps"],
                             round(batch * n_iter
                                   / (time.perf_counter() - t0), 2))
            _write_out(out, res)
        except Exception as e:
            res["compile_s"][str(batch)] = f"{type(e).__name__}"
            _write_out(out, res)
            break


STAGES = {
    "probe": stage_probe,
    "prep": stage_prep,
    "detect": stage_detect,
    "e2e": stage_e2e,
    "puck": stage_puck,
    "dual": stage_dual,
}


# ---------------------------------------------------------------------------
# Parent orchestrator (no jax import here — stdout carries ONLY JSON lines)
# ---------------------------------------------------------------------------


def _emit(results: dict) -> None:
    """Print the cumulative JSON line + mirror it to logs/."""
    detect = results.get("detect") or {}
    e2e = results.get("e2e") or {}
    puck = results.get("puck") or {}
    dual = results.get("dual") or {}
    fps = float(detect.get("fps", 0.0) or 0.0)
    line = {
        "metric": "e2e_1080p_detect_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/sec/chip (YOLOv8x @1280 incl. device NMS)",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
        "e2e_pipeline_fps": e2e.get("fps", 0.0),
        "e2e_compute_fps": e2e.get("compute_fps", 0.0),
        "puck_fps": puck.get("fps", 0.0),
        "dual_fps": dual.get("fps", 0.0),
        "dual_compile_s": dual.get("compile_s", {}),
        "e2e_detail": {k: v for k, v in e2e.items()
                       if k not in ("fps", "compute_fps")},
        "detect_per_batch": detect.get("per_batch", {}),
        "stages": results.get("_status", {}),
    }
    if results.get("_error"):
        line["error"] = results["_error"]
        # A dead tunnel NOW must not lose numbers a successful run banked
        # EARLIER in the round (round-3 lesson, generalized): attach the
        # last good measurement so the driver-recorded line carries it.
        last_good = os.path.join(LOGS, "bench_last_good.json")
        if os.path.exists(last_good):
            try:
                with open(last_good) as f:
                    line["last_good"] = json.load(f)
            except (OSError, json.JSONDecodeError):
                pass
    print(json.dumps(line), flush=True)
    try:
        os.makedirs(LOGS, exist_ok=True)
        _write_out(os.path.join(LOGS, "bench_partial.json"), line)
        # bank last_good ONLY when this run's tunnel probe succeeded: a
        # nonzero value without a probe cannot be a real measurement
        # (this is how fixture pollution forged a "banked" number)
        if line["value"] > 0.0 and results.get("probe", {}).get("ok"):
            line_g = dict(line)
            line_g["measured_at"] = time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            _write_out(os.path.join(LOGS, "bench_last_good.json"), line_g)
    except OSError:
        pass


def _run_stage(name: str, budget: float, results: dict) -> dict | None:
    """Run one stage in a subprocess under `budget` seconds; stderr+stdout
    go to logs/bench_stage_<name>.log so bench stdout stays JSON-only."""
    os.makedirs(LOGS, exist_ok=True)
    outf = os.path.join(CACHE, f"stage_{name}.json")
    os.makedirs(CACHE, exist_ok=True)
    if os.path.exists(outf):
        os.remove(outf)
    logf = os.path.join(LOGS, f"bench_stage_{name}.log")
    t0 = time.perf_counter()
    with open(logf, "w") as lf:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name, "--out", outf],
                stdout=lf, stderr=subprocess.STDOUT, timeout=budget,
                cwd=REPO)
            status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            status = "timeout"
    dt = round(time.perf_counter() - t0, 1)
    results.setdefault("_status", {})[name] = {"s": dt, "status": status}
    if os.path.exists(outf):  # partial results survive kills
        try:
            with open(outf) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None
    return None


def main() -> None:
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        name = sys.argv[i + 1]
        out = sys.argv[sys.argv.index("--out") + 1]
        STAGES[name](out)
        return

    deadline = time.monotonic() + float(
        os.environ.get("HOCKEY_BENCH_BUDGET", "1500"))
    results: dict = {}

    def remaining() -> float:
        return deadline - time.monotonic()

    # 1. content prep (CPU-only; cheap after first run thanks to the cache)
    prep = _run_stage("prep", min(STAGE_BUDGET["prep"],
                                  max(remaining() - 120, 60)), results)
    if not prep:
        results["_error"] = "prep_failed"
        _emit(results)
        return

    # 2. tunnel probe — if the TPU is unreachable, say so fast and stop
    probe = _run_stage("probe", min(STAGE_BUDGET["probe"],
                                    max(remaining() - 60, 60)), results)
    if not probe or not probe.get("ok"):
        results["_error"] = "tpu_unavailable"
        _emit(results)
        return
    results["probe"] = probe
    _emit(results)

    # 3. TPU stages, primary metric first; each emits cumulatively
    for name in ("detect", "e2e", "puck", "dual"):
        if remaining() < 120:
            results.setdefault("_status", {})[name] = {
                "s": 0, "status": "skipped_budget"}
            continue
        budget = min(STAGE_BUDGET[name], remaining() - 30)
        results[name] = _run_stage(name, budget, results)
        _emit(results)


if __name__ == "__main__":
    main()
