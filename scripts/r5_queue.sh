#!/bin/bash
# Round-5 TPU queue: (1) wait for regen_canonical, bank its artifacts;
# (2) rink retrain on the EXTENDED camera family (steep anamorphic
# broadcast views, train/data.py round-5 — the measured root cause of
# the generator-B collapse, logs/diag_rink_b.json); (3) candidate evals
# + strict auto-ship gates (advisor-hardened: stale candidates removed
# first, exit statuses checked, None-safe comparisons, pathspec-limited
# commits); (4) puck gate sweeps with the shipped model.
#
# Run detached:  nohup bash scripts/r5_queue.sh > /tmp/r5_queue.log 2>&1 &
cd /root/repo || exit 1
set -o pipefail
echo "=== r5 queue start: $(date)"

# --- 1. wait for regen_canonical (TPU tunnel is single-tenant) ----------
if [ -f /tmp/regen.pid ]; then
  RPID=$(cat /tmp/regen.pid)
  while kill -0 "$RPID" 2>/dev/null; do sleep 60; done
fi
echo "=== regen done: $(date); tail:"
tail -3 /tmp/regen_r5.log 2>/dev/null

# bank the regenerated canonical artifacts whatever happens next
(
  flock -w 300 9 || exit 1
  git add logs/e2e_quality.json logs/e2e_quality_b.json \
    logs/e2e_puck.json logs/e2e_puck_b.json logs/e2e_puck_demote.json \
    logs/e2e_puck_b_demote.json logs/val_player_shipped.json \
    logs/val_player_shipped_b.json logs/val_puck_shipped.json \
    logs/val_puck_shipped_b.json logs/val_rink_shipped.json \
    logs/val_rink_shipped_b.json logs/e2e_homography.json \
    logs/e2e_homography_b.json logs/e2e_video.json 2>/dev/null
  git commit -q -m "Regenerate canonical artifacts with shipped round-5 weights (pinned params)" \
    -- logs/e2e_quality.json logs/e2e_quality_b.json logs/e2e_puck.json \
       logs/e2e_puck_b.json logs/e2e_puck_demote.json \
       logs/e2e_puck_b_demote.json logs/val_player_shipped.json \
       logs/val_player_shipped_b.json logs/val_puck_shipped.json \
       logs/val_puck_shipped_b.json logs/val_rink_shipped.json \
       logs/val_rink_shipped_b.json logs/e2e_homography.json \
       logs/e2e_homography_b.json logs/e2e_video.json || true
) 9>/tmp/gitbank.lock

# --- 2. rink retrain on the extended camera family ----------------------
RINK_INIT=hockey_tpu/data/weights/hockey-detection.msgpack
[ -f banked/rink_s_ext.msgpack ] && RINK_INIT=banked/rink_s_ext.msgpack
[ -f checkpoints/rink_s_ext.msgpack.best ] && RINK_INIT=checkpoints/rink_s_ext.msgpack.best
echo "=== rink extended-family retrain (TPU, 512, init $RINK_INIT): $(date)"
python -m hockey_tpu.train.loop --model hockey-detection --variant s \
  --imgsz 512 --device-data --domain-rand --steps 6000 --batch 16 \
  --lr 0.002 --val-every 250 --val-size 48 --init "$RINK_INIT" \
  --out checkpoints/rink_s_ext.msgpack
echo "rink ext retrain exit: $?"
CKPT=checkpoints/rink_s_ext.msgpack.best
[ -f "$CKPT" ] || CKPT=checkpoints/rink_s_ext.msgpack
[ -f "$CKPT" ] || { echo "no checkpoint produced - abort"; exit 1; }

# bank the candidate (f16) so an environment reset cannot lose it
python - "$CKPT" banked/rink_s_ext.msgpack <<'PYEOF'
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
  git add -f banked/rink_s_ext.msgpack && \
    git commit -q -m "Bank rink_s_ext training checkpoint (f16, survives environment resets)" \
      -- banked/rink_s_ext.msgpack || true
) 9>/tmp/gitbank.lock

# --- 3. candidate evals (stale artifacts removed FIRST) ------------------
rm -f logs/val_rink_ext_a.json logs/val_rink_ext_b.json \
  logs/e2e_homography_candidate.json logs/e2e_homography_b_candidate.json

echo "=== val rink_ext in-dist (512): $(date)"
timeout -k 20 2400 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --checkpoint "$CKPT" --imgsz 512 --limit 200 --json \
  > logs/val_rink_ext_a.json 2>logs/val_rink_ext_a.err
VA=$?; cat logs/val_rink_ext_a.json; echo "(exit $VA)"
echo "=== val rink_ext generator-B (512): $(date)"
timeout -k 20 2400 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --checkpoint "$CKPT" --imgsz 512 --dataset rink-b \
  --limit 100 --json > logs/val_rink_ext_b.json 2>logs/val_rink_ext_b.err
VB=$?; cat logs/val_rink_ext_b.json; echo "(exit $VB)"
echo "=== e2e homography A with candidate: $(date)"
timeout -k 20 7200 python scripts/e2e_homography.py \
  --rink-checkpoint "$CKPT" --rink-imgsz 512 2>/dev/null | tail -1
EA=$?
echo "=== e2e homography B with candidate: $(date)"
timeout -k 20 7200 python scripts/e2e_homography.py --generator b \
  --rink-checkpoint "$CKPT" --rink-imgsz 512 2>/dev/null | tail -1
EB=$?
(
  flock -w 300 9 || exit 1
  git add logs/val_rink_ext_a.json logs/val_rink_ext_b.json \
    logs/e2e_homography_candidate.json logs/e2e_homography_b_candidate.json 2>/dev/null
  git commit -q -m "Bank rink_s_ext candidate evaluation artifacts" \
    -- logs/val_rink_ext_a.json logs/val_rink_ext_b.json \
       logs/e2e_homography_candidate.json \
       logs/e2e_homography_b_candidate.json || true
) 9>/tmp/gitbank.lock

# --- 4. strict auto-ship gate --------------------------------------------
python - "$VA" "$VB" "$EA" "$EB" <<'PYEOF'
import json, sys
rc = [int(x) for x in sys.argv[1:5]]
if any(rc):
    print(f"gate: an eval failed (exits {rc}) - NOT shipping"); sys.exit(1)
def load(p):
    try:
        with open(p) as f: return json.load(f)
    except Exception as e:
        print(f"gate: cannot read {p}: {e}"); sys.exit(1)
va = load("logs/val_rink_ext_a.json")
a  = load("logs/e2e_homography_candidate.json")
b  = load("logs/e2e_homography_b_candidate.json")
pck = va.get("pck"); cal_a = a.get("calibrated_frames")
err_a = a.get("calib_err_ft_mean"); fine_a = a.get("fine_frames")
cal_b = b.get("calibrated_frames"); err_b = b.get("calib_err_ft_mean")
checks = [
    ("in-dist PCK >= 0.85", pck is not None and pck >= 0.85),
    ("e2e A calibrated >= 90/96", cal_a is not None and cal_a >= 90),
    ("e2e A err <= 6.0 ft", err_a is not None and err_a <= 6.0),
    ("e2e A fine tier >= 80", fine_a is not None and fine_a >= 80),
    ("e2e B calibrated >= 48/96", cal_b is not None and cal_b >= 48),
    ("e2e B err <= 12 ft", err_b is not None and err_b <= 12.0),
]
ok = True
for name, passed in checks:
    print(f"gate: {name}: {'PASS' if passed else 'FAIL'}")
    ok &= passed
sys.exit(0 if ok else 1)
PYEOF
if [ $? -eq 0 ]; then
  echo "=== ALL GATES PASS - shipping rink_s_ext: $(date)"
  python scripts/ship_checkpoint.py "$CKPT" hockey-detection || exit 1
  # regenerate ONLY the rink-affected canonical artifacts at pinned params
  timeout -k 20 2400 python -m hockey_tpu.train.val --model hockey-detection \
    --variant s --imgsz 512 --limit 200 --json > logs/.tmp.vrs.json \
    && python -c "import json; json.load(open('logs/.tmp.vrs.json'))" \
    && mv logs/.tmp.vrs.json logs/val_rink_shipped.json
  timeout -k 20 2400 python -m hockey_tpu.train.val --model hockey-detection \
    --variant s --imgsz 512 --dataset rink-b --limit 100 --json \
    > logs/.tmp.vrsb.json \
    && python -c "import json; json.load(open('logs/.tmp.vrsb.json'))" \
    && mv logs/.tmp.vrsb.json logs/val_rink_shipped_b.json
  rm -f logs/.tmp.vrs.json logs/.tmp.vrsb.json
  timeout -k 20 7200 python scripts/e2e_homography.py 2>/dev/null | tail -1
  timeout -k 20 7200 python scripts/e2e_homography.py --generator b \
    2>/dev/null | tail -1
  (
    flock -w 300 9 || exit 1
    git add hockey_tpu/data/weights/hockey-detection.msgpack \
      logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
      logs/e2e_homography.json logs/e2e_homography_b.json
    git commit -q -m "Ship rink_s_ext: extended-family retrain closes the generator-B calibration gap" \
      -- hockey_tpu/data/weights/hockey-detection.msgpack \
         logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
         logs/e2e_homography.json logs/e2e_homography_b.json || true
  ) 9>/tmp/gitbank.lock
else
  echo "=== gate failed - rink_s_ext NOT shipped (candidate artifacts banked for manual review)"
fi

# --- 5. puck gate sweeps with the shipped model --------------------------
echo "=== puck gate sweep in-dist: $(date)"
timeout -k 20 3600 python scripts/sweep_puck_gate.py --frames 96 --seed 11 \
  --imgsz 960 2>/dev/null | tail -c 600; echo
echo "=== puck gate sweep generator-B: $(date)"
timeout -k 20 3600 python scripts/sweep_puck_gate.py --frames 96 --seed 11 \
  --imgsz 960 --generator b 2>/dev/null | tail -c 600; echo
(
  flock -w 300 9 || exit 1
  git add logs/puck_gate_sweep.json logs/puck_gate_sweep_b.json 2>/dev/null
  git commit -q -m "Re-sweep puck tracker gates with the shipped round-5 model (gt-scaled radii)" \
    -- logs/puck_gate_sweep.json logs/puck_gate_sweep_b.json || true
) 9>/tmp/gitbank.lock

echo "=== r5 queue done: $(date)"
