#!/bin/bash
# Round-5g evidence probe: does the f16 ship-time quantization explain the
# candidate-vs-shipped gen-B calibration delta (18.38 vs 24.23 ft, identical
# fine-tier error 17.7 vs 17.6 ft, fine_frames 84 vs 76)?
#
# Design: same harness, same pinned params (--frames 48 --seed 3 --imgsz 640
# --generator b), three runs against the freshest rink checkpoint:
#   A. f32 candidate           (checkpoints/rink_s_ext4.msgpack.best or ext3 fallback)
#   B. f16 roundtrip of A      (exactly what scripts/ship_checkpoint.py does)
#   C. repeat of A             (harness determinism control)
# Artifacts go to logs/f16_ab/ via HOCKEY_E2E_LOGS — canonical logs/*.json are
# never touched. Must only run while no other axon client is in flight
# (CLAUDE.md: two concurrent jitted clients deadlock the tunnel).
cd /root/repo || exit 1
set -o pipefail
SRC=${1:-checkpoints/rink_s_ext4.msgpack.best}
[ -f "$SRC" ] || SRC=banked/rink_s_ext3.msgpack
echo "=== r5g f16 A/B on $SRC: $(date)"
mkdir -p logs/f16_ab
python - "$SRC" <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hockey_tpu.models.checkpoint import load_params, save_params
save_params("logs/f16_ab/ckpt_f16.msgpack", load_params(sys.argv[1]),
            dtype="float16")
print("f16 roundtrip written")
PYEOF
run_one() { # run_one <tag> <ckpt>
  echo "=== run $1 ($2): $(date)"
  HOCKEY_E2E_LOGS=logs/f16_ab timeout -k 20 1800 \
    python scripts/e2e_homography.py --frames 48 --seed 3 --imgsz 640 \
      --generator b --rink-checkpoint "$2" --tag "$1" | tail -1
}
run_one f32_a   "$SRC"
run_one f16     logs/f16_ab/ckpt_f16.msgpack
run_one f32_rep "$SRC"
python - <<'PYEOF'
import json, glob
for p in sorted(glob.glob("logs/f16_ab/e2e_homography_*.json")):
    d = json.load(open(p))
    print(p, {k: d.get(k) for k in ("calibrated_frames", "calib_err_ft_mean",
                                    "fine_frames", "fine_err_ft_mean",
                                    "coarse_err_ft_mean")})
PYEOF
echo "=== r5g f16 A/B done: $(date)"
