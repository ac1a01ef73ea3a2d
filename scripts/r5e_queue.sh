#!/bin/bash
# Round-5e TPU queue (single-tenant tunnel, phases serial):
#
#   1. SHIP banked/rink_s_ext3.msgpack. The r5c strict gate held it back
#      on the aspirational gen-B bars alone (e2e B 18.38 ft vs <= 12 ft)
#      while the candidate is a strict improvement on every measured
#      axis vs the shipped rink_s_w_tpu:
#        in-dist PCK        0.886 -> 0.954   (logs/val_rink_ext3_a.json)
#        in-dist e2e        5.55  -> 3.13 ft (logs/e2e_homography_candidate.json)
#        gen-B   PCK        0.244 -> 0.605   (logs/val_rink_ext3_b.json)
#        gen-B   e2e        61.2  -> 18.4 ft (+ 84/96 fine tier)
#      Holding a strictly-better model out of the product repeats the
#      round-4 failure mode (VERDICT r4, Missing #1). Ship, then keep
#      pushing the gen-B residual.
#   2. regen the rink canonical artifacts with shipped weights at the
#      regen_canonical.sh pinned params; pathspec-commit.
#   3. cheap diagnostics: rink-b val at 576/640 (resolution probe, not
#      canonical) to see if the B residual is resolution-limited.
#   4. ext4 fine-tune from ext3 (lower LR, deployment-matched mixture),
#      bounded by the queue deadline; in-loop PCK banking -> .best.
#   5. candidate evals + the SAME strict gate as r5c; auto-ship only if
#      gen-B e2e reaches <= 12 ft with no in-dist regression.
#
# Run detached:  nohup bash scripts/r5e_queue.sh > /tmp/r5e.log 2>&1 &
cd /root/repo || exit 1
set -o pipefail
echo "=== r5e queue start: $(date)"
DEADLINE=$(( $(date +%s) + ${R5E_BUDGET:-4700} ))
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

# --- 1. ship ext3 -----------------------------------------------------------
echo "=== shipping rink_s_ext3: $(date)"
python scripts/ship_checkpoint.py banked/rink_s_ext3.msgpack hockey-detection \
  || exit 1

# --- 2. regen rink canonical artifacts (pinned params, exit-checked) --------
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

FAIL=0
vrun val_rink_shipped.json 1800 \
  python -m hockey_tpu.train.val --model hockey-detection --variant s \
    --imgsz 512 --limit 200 --json
vrun val_rink_shipped_b.json 1800 \
  python -m hockey_tpu.train.val --model hockey-detection --variant s \
    --imgsz 512 --dataset rink-b --limit 100 --json
run e2e_homography.json 3600 \
  python scripts/e2e_homography.py --frames 48 --seed 3 --imgsz 640 \
    --generator a
run e2e_homography_b.json 3600 \
  python scripts/e2e_homography.py --frames 48 --seed 3 --imgsz 640 \
    --generator b
(
  flock -w 300 9 || exit 1
  git add hockey_tpu/data/weights/hockey-detection.msgpack \
    logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
    logs/e2e_homography.json logs/e2e_homography_b.json
  git commit -q -m "Ship rink_s_ext3: strict improvement on every measured axis (in-dist PCK 0.886->0.954, e2e 5.6->3.1 ft; gen-B PCK 0.24->0.61, e2e 61->18 ft)" \
    -- hockey_tpu/data/weights/hockey-detection.msgpack \
       logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
       logs/e2e_homography.json logs/e2e_homography_b.json || true
) 9>/tmp/gitbank.lock
echo "=== ship+regen done (fail=$FAIL): $(date), $(left)s left"

# --- 3. resolution probe on rink-b (diagnostic, non-canonical) --------------
for SZ in 640 768; do
  timeout -k 20 900 python -m hockey_tpu.train.val --model hockey-detection \
    --variant s --imgsz "$SZ" --dataset rink-b --limit 100 --json \
    > "logs/diag_rink_b_$SZ.json" 2>/dev/null \
    && echo "rink-b @$SZ: $(cat logs/diag_rink_b_$SZ.json)"
done

# --- 4. ext4 fine-tune, deadline-bounded ------------------------------------
RESERVE=1700   # seconds kept back for phase-5 evals
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

# --- 5. ext4 candidate evals + strict gate ----------------------------------
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
    ("rink-b PCK >= shipped ext3 0.605",
     pb is not None and pb >= 0.605),
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
echo "=== r5e queue done: $(date)"
