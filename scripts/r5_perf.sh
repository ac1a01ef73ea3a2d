#!/bin/bash
# Round-5 perf evidence pass (run AFTER r5_queue.sh; TPU single-tenant):
#   1. op-level traces for the detect / fused / dual programs
#      (scripts/profile_trace.py — the round-2..4 MFU claims finally get
#      a parsed trace);
#   2. dual-program ablation: player-only vs +rink vs +team-features at
#      the same batch, isolating where the 17-fps dual measurement goes;
#   3. full bench.py (BENCH_r05 preview).
cd /root/repo || exit 1
set -o pipefail
echo "=== r5 perf start: $(date)"

echo "=== trace: detect (batch 32)"
timeout -k 20 1200 python scripts/profile_trace.py --program detect --batch 32
echo "=== trace: fused detect+track (batch 32)"
timeout -k 20 1200 python scripts/profile_trace.py --program fused --batch 32
echo "=== trace: dual (batch 32)"
timeout -k 20 1800 python scripts/profile_trace.py --program dual --batch 32

echo "=== dual ablation (batch 32, same frames)"
timeout -k 20 2400 python - <<'PYEOF'
import time, json
import numpy as np
import jax.numpy as jnp
from hockey_tpu.core.config import Config
from hockey_tpu.train.scenes import render_scene_sequence

config = Config()
frames, _ = render_scene_sequence(np.random.default_rng(42), 1080, 32,
                                  width=1920)
stack = np.stack(frames)
dev = jnp.asarray(stack)
_ = np.asarray(dev[0, 0, 0, 0])
out = {}

def timeit(name, fn, reps=4):
    fn()  # warm (compile)
    fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        fn()
    dt = (time.perf_counter() - t0) / reps
    out[name] = {"ms_per_batch": round(dt * 1e3, 1),
                 "fps": round(32 / dt, 1)}
    print(name, out[name], flush=True)

# 1. player-only (the bench detect stage program, batch 32)
from hockey_tpu.models.detector import Detector
det_p = Detector("hockey-player-detection", config, frame_hw=(1080, 1920))
timeit("player_only", lambda: np.asarray(det_p.detect_batch(dev).boxes))

# 2. player + team features (no rink)
det_f = Detector("hockey-player-detection", config, frame_hw=(1080, 1920),
                 with_team_features=True)
timeit("player_feats",
       lambda: np.asarray(det_f.detect_batch(dev)[0].boxes))

# 3. dual without team features (player + rink)
from hockey_tpu.models.dual import DualDetector
det_dnf = DualDetector(config=config, frame_hw=(1080, 1920),
                       with_team_features=False)
timeit("dual_no_feats", lambda: det_dnf.detect_batch(dev))

# 4. full dual (player + rink + feats) — the bench dual stage program
det_d = DualDetector(config=config, frame_hw=(1080, 1920))
timeit("dual_full", lambda: det_d.detect_batch(dev))

# 5. fused detect+track: easy vs hard content at the same shapes.
# Round-2 measured the fused e2e megastep at 125 ms/batch-128; round-4
# at 235 ms — but round 4 also switched the bench clip to hard scenes
# (more actors => more auction while_loop rounds per tracker step).
# This isolates content-driven iteration cost from the added
# containment-NMS / duplicate-kill ops.
from hockey_tpu.tracking.device_tracker import DeviceByteTrack
det_t = Detector("hockey-player-detection", config,
                 frame_hw=(1080, 1920), with_team_features=True)
def mk_tracker():
    return DeviceByteTrack(
        capacity=config.max_tracks,
        track_activation_threshold=config.track_activation_threshold,
        lost_track_buffer=config.lost_track_buffer,
        minimum_matching_threshold=config.minimum_matching_threshold,
        frame_rate=config.frame_rate,
        minimum_consecutive_frames=config.minimum_consecutive_frames,
        duplicate_kill_iomin=config.duplicate_kill_iomin,
        lost_dup_kill_iomin=config.lost_dup_kill_iomin,
    )
easy = jnp.asarray(np.full((32, 1080, 1920, 3), 220, np.uint8))
_ = np.asarray(easy[0, 0, 0, 0])
for name, batch_dev in (("fused_hard", dev), ("fused_easy", easy)):
    tr = mk_tracker()
    def run(b=batch_dev, t=tr):
        r = det_t.detect_track_batch(b, t.state)
        t.state = r[-1]
        return np.asarray(r[0].boxes)
    timeit(name, run)

with open("logs/dual_ablation.json", "w") as f:
    f.write(json.dumps(out) + "\n")
print(json.dumps(out))
PYEOF

echo "=== bench.py (BENCH_r05 preview)"
timeout -k 20 2400 python bench.py | tail -1

echo "=== r5 perf done: $(date)"
