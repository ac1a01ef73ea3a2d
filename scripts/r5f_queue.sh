#!/bin/bash
# Round-5f TPU queue: resume the r5e ext4 fine-tune that died at pool
# staging when the environment reset (r5e had 685s left; staging alone
# exceeds that). Phases:
#
#   0. probe the axon tunnel until it answers (timeout -k per CLAUDE.md:
#      the client can ignore SIGTERM on a dead pipe), bounded by the
#      overall deadline.
#   1. ext4 fine-tune from banked/rink_s_ext3.msgpack (lower LR,
#      deployment-matched broadcast mixture), deadline-bounded;
#      in-loop PCK banking -> .best.
#   2. candidate evals + the SAME strict gate as r5c/r5e; auto-ship only
#      if gen-B e2e reaches <= 12 ft with no in-dist regression.
#
# Run detached:  nohup bash scripts/r5f_queue.sh > /tmp/r5f.log 2>&1 &
cd /root/repo || exit 1
set -o pipefail
echo "=== r5f queue start: $(date)"
DEADLINE=$(( $(date +%s) + ${R5F_BUDGET:-5100} ))
left() { echo $(( DEADLINE - $(date +%s) )); }

bank_ckpt() { # bank_ckpt <src> <dst> <msg>
  python - "$1" "$2" <<'PYEOF'
import sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hockey_tpu.models.checkpoint import load_params, save_params
save_params(sys.argv[2] + ".tmp", load_params(sys.argv[1]), dtype="float16")
os.replace(sys.argv[2] + ".tmp", sys.argv[2])
print(f"banked {sys.argv[1]} -> {sys.argv[2]}")
PYEOF
  (
    flock -w 300 9 || exit 1
    git add -f "$2" && git commit -q -m "$3" -- "$2" || true
  ) 9>/tmp/gitbank.lock
}

vrun() { # vrun <artifact> <timeout_s> <cmd...> : JSON on stdout
  local art=$1 tmo=$2; shift 2
  echo "=== $art: $*"
  if timeout -k 20 "$tmo" "$@" > "logs/.tmp.$art" 2>"logs/.tmp.$art.err" \
      && [ -s "logs/.tmp.$art" ] \
      && python -c "import json; json.load(open('logs/.tmp.$art'))" 2>/dev/null; then
    mv "logs/.tmp.$art" "logs/$art"; echo "--- $art OK: $(cat logs/$art)"
  else
    echo "--- $art FAILED - keeping committed copy"; rm -f "logs/.tmp.$art"
    FAIL=1
  fi
  rm -f "logs/.tmp.$art.err"
}
run() { # run <artifact> <timeout_s> <cmd...> : harness writes logs/<artifact>
  local art=$1 tmo=$2; shift 2
  echo "=== $art: $*"
  if timeout -k 20 "$tmo" "$@"; then
    echo "--- $art OK: $(cat logs/$art)"
  else
    echo "--- $art FAILED (exit $?) - restoring committed copy"
    git checkout -- "logs/$art" 2>/dev/null || true
    FAIL=1
  fi
}

# --- 0. wait for the tunnel --------------------------------------------------
while true; do
  if timeout -k 20 240 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((64,))+1)
print('TPU_PROBE_OK')" > /tmp/tpu_probe.out 2>&1 \
      && grep -q TPU_PROBE_OK /tmp/tpu_probe.out; then
    echo "=== tunnel OK at $(date)"; break
  fi
  echo "=== tunnel probe failed at $(date), $(left)s left"
  [ "$(left)" -lt 2700 ] && { echo "=== no time left - stopping"; exit 0; }
  sleep 120
done

# --- 1. ext4 fine-tune, deadline-bounded ------------------------------------
RESERVE=1700   # seconds kept back for phase-2 evals
T=$(( $(left) - RESERVE ))
if [ "$T" -lt 600 ]; then
  echo "=== no time for ext4 training ($(left)s left) - stopping"; exit 0
fi
echo "=== ext4 fine-tune for ${T}s: $(date)"
timeout -k 30 "$T" python -m hockey_tpu.train.loop --model hockey-detection \
  --variant s --imgsz 512 --device-data --domain-rand --steps 6000 \
  --batch 16 --pool 4800 --lr 0.0003 --val-every 250 --val-size 48 \
  --init banked/rink_s_ext3.msgpack --out checkpoints/rink_s_ext4.msgpack
echo "ext4 train exit: $? (timeout-kill expected): $(date)"
CKPT=checkpoints/rink_s_ext4.msgpack.best
[ -f "$CKPT" ] || CKPT=checkpoints/rink_s_ext4.msgpack
[ -f "$CKPT" ] || { echo "no ext4 checkpoint - done"; exit 0; }
bank_ckpt "$CKPT" banked/rink_s_ext4.msgpack \
  "Bank rink_s_ext4 training checkpoint (f16, survives environment resets)"

# --- 2. ext4 candidate evals + strict gate ----------------------------------
rm -f logs/val_rink_ext4_a.json logs/val_rink_ext4_b.json \
  logs/e2e_homography_b_candidate.json
FAIL=0
vrun val_rink_ext4_a.json 900 \
  python -m hockey_tpu.train.val --model hockey-detection --variant s \
    --checkpoint "$CKPT" --imgsz 512 --limit 200 --json
vrun val_rink_ext4_b.json 900 \
  python -m hockey_tpu.train.val --model hockey-detection --variant s \
    --checkpoint "$CKPT" --imgsz 512 --dataset rink-b --limit 100 --json
run e2e_homography_b_candidate.json 1800 \
  python scripts/e2e_homography.py --frames 48 --seed 3 --imgsz 640 \
    --generator b --rink-checkpoint "$CKPT" --tag b_candidate
(
  flock -w 300 9 || exit 1
  git add logs/val_rink_ext4_a.json logs/val_rink_ext4_b.json \
    logs/e2e_homography_b_candidate.json 2>/dev/null
  git commit -q -m "Bank rink_s_ext4 candidate evaluation artifacts" \
    -- logs/val_rink_ext4_a.json logs/val_rink_ext4_b.json \
       logs/e2e_homography_b_candidate.json || true
) 9>/tmp/gitbank.lock

python - <<'PYEOF'
import json, sys
def load(p):
    try:
        with open(p) as f: return json.load(f)
    except Exception as e:
        print(f"gate: cannot read {p}: {e}"); sys.exit(1)
va = load("logs/val_rink_ext4_a.json")
vb = load("logs/val_rink_ext4_b.json")
b  = load("logs/e2e_homography_b_candidate.json")
shipped_a = load("logs/val_rink_shipped.json")
pa = va.get("pck"); pb = vb.get("pck"); sa = shipped_a.get("pck")
cal = b.get("calibrated_frames"); err = b.get("calib_err_ft_mean")
checks = [
    ("in-dist PCK no-regression (>= shipped - 0.01)",
     pa is not None and sa is not None and pa >= sa - 0.01),
    ("rink-b PCK >= shipped ext3 0.603",
     pb is not None and pb >= 0.603),
    ("e2e B calibrated >= 48/96", cal is not None and cal >= 48),
    ("e2e B err <= 12 ft", err is not None and err <= 12.0),
]
ok = True
for name, passed in checks:
    print(f"gate: {name}: {'PASS' if passed else 'FAIL'}")
    ok &= passed
sys.exit(0 if ok else 1)
PYEOF
if [ $? -eq 0 ]; then
  echo "=== ALL GATES PASS - shipping rink_s_ext4: $(date)"
  python scripts/ship_checkpoint.py "$CKPT" hockey-detection || exit 1
  vrun val_rink_shipped.json 900 \
    python -m hockey_tpu.train.val --model hockey-detection --variant s \
      --imgsz 512 --limit 200 --json
  vrun val_rink_shipped_b.json 900 \
    python -m hockey_tpu.train.val --model hockey-detection --variant s \
      --imgsz 512 --dataset rink-b --limit 100 --json
  run e2e_homography_b.json 1800 \
    python scripts/e2e_homography.py --frames 48 --seed 3 --imgsz 640 \
      --generator b
  run e2e_homography.json 1800 \
    python scripts/e2e_homography.py --frames 48 --seed 3 --imgsz 640 \
      --generator a
  (
    flock -w 300 9 || exit 1
    git add hockey_tpu/data/weights/hockey-detection.msgpack \
      logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
      logs/e2e_homography.json logs/e2e_homography_b.json
    git commit -q -m "Ship rink_s_ext4: generator-B calibration reaches the 12-ft bar with no in-dist regression" \
      -- hockey_tpu/data/weights/hockey-detection.msgpack \
         logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
         logs/e2e_homography.json logs/e2e_homography_b.json || true
  ) 9>/tmp/gitbank.lock
else
  echo "=== gate failed - ext4 NOT shipped (candidate artifacts banked)"
fi
echo "=== r5f queue done: $(date)"
