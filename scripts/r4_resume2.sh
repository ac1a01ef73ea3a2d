#!/bin/bash
# Round-4 resume chain (post environment reset). The reset wiped
# gitignored checkpoints/ — the chain2 rink pinhole fine-tune (.best at
# step 400, PCK 0.44) and the queued puck body+size fine-tune inits are
# gone. This chain restarts both from the shipped weights (or from a
# git-banked copy if scripts/bank_best.sh has committed one), strictly
# sequentially on the single host core:
#   0. full pytest (suite-green evidence for the round)
#   1. rink pinhole fine-tune (384, domain-rand 50/50 trapezoid/pinhole
#      cameras) -> vals -> e2e homography A+B candidates -> gated ship
#      (same gate as scripts/r4_autoship.sh)
#   2. puck body+size-family fine-tune (v5 renderer: capsule bodies +
#      8-60 px puck sizes) -> vals A/B -> gen-B e2e candidate
# Run scripts/bank_best.sh alongside so .best survives the next reset.
cd /root/repo
echo $$ > /tmp/r4_resume2.pid   # r4_tpu_queue.sh kills this group when the TPU returns
{
echo "=== r4_resume2 start $(date)"

echo "=== full pytest"
timeout 3000 python -m pytest tests/ -q > logs/pytest_r4c.log 2>&1
echo "pytest rc=$? ($(tail -1 logs/pytest_r4c.log))"

RINK_INIT=hockey_tpu/data/weights/hockey-detection.msgpack
[ -f banked/rink_s_ph.msgpack ] && RINK_INIT=banked/rink_s_ph.msgpack
echo "=== rink pinhole fine-tune (384, init $RINK_INIT)"
python - "$RINK_INIT" <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hockey_tpu.train.loop import main
main(["--model", "hockey-detection", "--variant", "s", "--imgsz", "384",
      "--domain-rand", "--steps", "1400", "--batch", "8", "--lr", "0.001",
      "--ema", "0.999", "--val-every", "200", "--val-size", "48",
      "--init", sys.argv[1],
      "--out", "checkpoints/rink_s_ph.msgpack"])
PYEOF
echo "rink pinhole fine-tune exit: $?"

echo "=== val rink_ph in-dist (384)"
timeout 2400 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --checkpoint checkpoints/rink_s_ph.msgpack.best --imgsz 384 \
  --cpu --limit 100 --json > logs/val_rink_ph_a.json 2>/dev/null
cat logs/val_rink_ph_a.json; echo
echo "=== val rink_ph on generator B (OOD, 384)"
timeout 2400 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --checkpoint checkpoints/rink_s_ph.msgpack.best --imgsz 384 \
  --cpu --dataset rink-b --limit 60 --json > logs/val_rink_ph_b.json 2>/dev/null
cat logs/val_rink_ph_b.json; echo
echo "=== e2e homography A (candidate, harness defaults)"
# advisor fix (round 4, high): stale candidate artifacts from a previous
# checkpoint would satisfy the gate below even if these runs crash —
# delete them first so the gate can only see THIS candidate's numbers
rm -f logs/e2e_homography_candidate.json logs/e2e_homography_b_candidate.json
timeout 7200 python scripts/e2e_homography.py --cpu \
  --rink-checkpoint checkpoints/rink_s_ph.msgpack.best 2>/dev/null | tail -1
echo "=== e2e homography B (candidate)"
timeout 7200 python scripts/e2e_homography.py --cpu --generator b \
  --rink-checkpoint checkpoints/rink_s_ph.msgpack.best 2>/dev/null | tail -1

# gated ship (same conservative gate as scripts/r4_autoship.sh):
# in-dist must HOLD (>=91/96 calibrated at <=6.5 ft; shipped today is
# 96/96 @ 6.08) and gen-B must IMPROVE (>=1 calibrated; shipped today: 0)
python - <<'PYEOF'
import json, sys

def load(p):
    try:
        with open(p) as f:
            return json.loads(f.read().strip() or "{}")
    except Exception:
        return {}

a = load("logs/e2e_homography_candidate.json")
b = load("logs/e2e_homography_b_candidate.json")
m = a.get("calib_err_ft_mean")  # advisor fix: `or 99` treated 0.0 as missing
ok_a = (a.get("calibrated_frames", 0) >= 91
        and m is not None and m <= 6.5)
ok_b = b.get("calibrated_frames", 0) >= 1
print(f"gate: in-dist {a.get('calibrated_frames')}@"
      f"{a.get('calib_err_ft_mean')}ft ok={ok_a}; "
      f"gen-B {b.get('calibrated_frames')} ok={ok_b}")
sys.exit(0 if (ok_a and ok_b) else 1)
PYEOF
if [ $? -eq 0 ]; then
  echo "gate cleared - shipping rink_s_ph"
  python scripts/ship_checkpoint.py checkpoints/rink_s_ph.msgpack.best \
    hockey-detection
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
  (
    flock -w 300 9
    git add -f hockey_tpu/data/weights/hockey-detection.msgpack \
      logs/val_rink_shipped.json logs/val_rink_b.json \
      logs/e2e_homography.json logs/e2e_homography_b.json \
      logs/e2e_homography_candidate.json logs/e2e_homography_b_candidate.json \
      logs/val_rink_ph_a.json logs/val_rink_ph_b.json
    git commit -q -m "Ship pinhole-family rink model: gen-B homography gate cleared" \
      -- hockey_tpu/data/weights/hockey-detection.msgpack logs/ || true
  ) 9>/tmp/gitbank.lock
else
  echo "gate NOT cleared - keeping shipped rink model"
  (
    flock -w 300 9
    git add -f logs/e2e_homography_candidate.json \
      logs/e2e_homography_b_candidate.json \
      logs/val_rink_ph_a.json logs/val_rink_ph_b.json 2>/dev/null
    git commit -q -m "Bank rink pinhole candidate artifacts (gate not cleared)" -- logs/ || true
  ) 9>/tmp/gitbank.lock
fi

PUCK_INIT=hockey_tpu/data/weights/hockey-puck-detection.msgpack
[ -f banked/puck_s_bs.msgpack ] && PUCK_INIT=banked/puck_s_bs.msgpack
echo "=== puck body+size-family fine-tune (v5 renderer, init $PUCK_INIT)"
python - "$PUCK_INIT" <<'PYEOF'
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hockey_tpu.train.loop import main
main(["--model", "hockey-puck-detection", "--dataset", "hard-puck",
      "--domain-rand", "--steps", "1500", "--batch", "8", "--lr", "0.0008",
      "--ema", "0.999", "--val-every", "250", "--val-size", "64",
      "--init", sys.argv[1],
      "--out", "checkpoints/puck_s_bs.msgpack"])
PYEOF
echo "puck bs fine-tune exit: $?"
for ds in hard-puck hard-puck-b; do
  tag=$([ "$ds" = hard-puck ] && echo a || echo b)
  timeout 3600 python -m hockey_tpu.train.val --model hockey-puck-detection \
    --checkpoint checkpoints/puck_s_bs.msgpack.best --dataset "$ds" --cpu \
    --limit 100 --json > "logs/val_puck_bs_${tag}.json" 2>/dev/null
  cat "logs/val_puck_bs_${tag}.json"; echo
done
echo "=== e2e puck generator B (candidate puck_s_bs)"
timeout 5400 python scripts/e2e_puck.py --cpu --frames 96 --generator b \
  --checkpoint checkpoints/puck_s_bs.msgpack.best 2>/dev/null | tail -1
echo "=== e2e puck in-dist (candidate puck_s_bs; in-dist must hold)"
timeout 5400 python scripts/e2e_puck.py --cpu --frames 96 \
  --checkpoint checkpoints/puck_s_bs.msgpack.best 2>/dev/null | tail -1
(
  flock -w 300 9
  git add -f logs/val_puck_bs_a.json logs/val_puck_bs_b.json \
    logs/e2e_puck_b_candidate.json logs/e2e_puck_candidate.json 2>/dev/null
  git commit -q -m "Bank puck body+size-family candidate artifacts" -- logs/ || true
) 9>/tmp/gitbank.lock
echo "=== done r4 resume2 $(date)"
} >> logs/r4_resume2.log 2>&1
