#!/bin/bash
# Fallback auto-ship for the round-4 pinhole rink candidate.
#
# Waits for scripts/r4_chain2.sh to finish (its log ends with
# "done r4 chain2"), then ships checkpoints/rink_s_ph.msgpack.best as
# hockey-detection ONLY if the candidate's own e2e artifacts clear a
# conservative gate:
#   - in-dist e2e homography (logs/e2e_homography_candidate.json):
#     calibrated_frames >= 91/96 and mean error <= 6.5 ft (shipped today:
#     96/96 at 6.08 ft, logs/e2e_homography.json)
#   - generator-B e2e homography (logs/e2e_homography_b_candidate.json):
#     calibrated_frames >= 1 (shipped today: 0 — the OOD gap this
#     fine-tune attacks, logs/val_rink_b.json PCK 0.060)
# After shipping, regenerates the canonical shipped-weights artifacts.
#
# This script exists because round-4 builder sessions died mid-round
# twice; if a live session is attending it can (and should) make the
# ship decision itself and kill this watcher (/tmp/r4_autoship.pid).
cd /root/repo
{
echo "autoship watcher started $(date)"
while ! grep -q "done r4 chain2" logs/r4_chain2.log 2>/dev/null; do
  sleep 300
done
echo "chain2 done at $(date)"

python - <<'PYEOF'
import json, os, sys

def load(p):
    try:
        with open(p) as f:
            return json.loads(f.read().strip() or "{}")
    except Exception:
        return {}

a = load("logs/e2e_homography_candidate.json")
b = load("logs/e2e_homography_b_candidate.json")
ok_a = (a.get("calibrated_frames", 0) >= 91
        and (a.get("calib_err_ft_mean") or 99) <= 6.5)
ok_b = b.get("calibrated_frames", 0) >= 1
print(f"gate: in-dist {a.get('calibrated_frames')}@"
      f"{a.get('calib_err_ft_mean')}ft ok={ok_a}; "
      f"gen-B {b.get('calibrated_frames')} ok={ok_b}")
sys.exit(0 if (ok_a and ok_b) else 1)
PYEOF
if [ $? -ne 0 ]; then
  echo "gate NOT cleared - not shipping"
  exit 0
fi

echo "gate cleared - shipping rink_s_ph"
python scripts/ship_checkpoint.py checkpoints/rink_s_ph.msgpack.best \
  hockey-detection
# regenerate the canonical shipped-weights artifacts (f16 ship changes
# numerics slightly; artifact discipline wants shipped-weights numbers)
timeout 2400 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --imgsz 384 --cpu --limit 100 --json \
  > logs/val_rink_shipped.json 2>/dev/null
cat logs/val_rink_shipped.json; echo
timeout 2400 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --imgsz 384 --cpu --dataset rink-b --limit 60 --json \
  > logs/val_rink_b.json 2>/dev/null
cat logs/val_rink_b.json; echo
timeout 7200 python scripts/e2e_homography.py --cpu 2>/dev/null | tail -1
timeout 7200 python scripts/e2e_homography.py --cpu --generator b \
  2>/dev/null | tail -1
echo "autoship done $(date)"
} >> logs/r4_autoship.log 2>&1
