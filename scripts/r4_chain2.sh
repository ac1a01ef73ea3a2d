#!/bin/bash
# Round-4 CPU chain #2 (single core: strictly sequential).
# Launched after the dark-limb puck fine-tune is stopped (plateaued at
# step 500: VAL mAP50 0.8769, no improvement through step 1500 —
# logs/train_puck_dl.log). Order:
#  1. score the banked puck_s_dl.best on held-out A and generator B
#     (640, same geometry as the round-3 val_puck_*_{a,b}.json tables)
#  2. gen-B e2e puck with that checkpoint (the round-3 artifact gap:
#     logs/r4_measure.log shows recall 0.0 with the shipped model)
#  3. rink pose fine-tune with the round-4 50/50 pinhole camera family
#     (train/data.py _pinhole_camera; root cause logs/diag_rink_b.json)
#  4. rink vals in-dist + generator B, e2e homography A and B
cd /root/repo
{
echo "=== val puck_dl on held-out A (hard-puck, 640)"
timeout 3600 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_dl.msgpack.best --dataset hard-puck --cpu \
  --limit 100 --json > logs/val_puck_dl_a.json 2>/dev/null
cat logs/val_puck_dl_a.json; echo
echo "=== val puck_dl on generator B (OOD, 640)"
timeout 3600 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_dl.msgpack.best --dataset hard-puck-b --cpu \
  --limit 100 --json > logs/val_puck_dl_b.json 2>/dev/null
cat logs/val_puck_dl_b.json; echo
echo "=== e2e puck generator B (candidate puck_s_dl)"
timeout 5400 python scripts/e2e_puck.py --cpu --frames 96 --generator b \
  --checkpoint checkpoints/puck_s_dl.msgpack.best 2>/dev/null | tail -1 \
  | tee logs/e2e_puck_dl_b.json
echo "=== e2e quality generator B (lost-dup-kill tracker default)"
timeout 3600 python scripts/e2e_quality.py --cpu --frames 96 --generator b \
  --match-iou 0.3 2>/dev/null | tail -1 | tee logs/e2e_quality_b.json
echo "=== rink pinhole fine-tune (384, init shipped window model)"
# 1400 steps at the measured ~18 s/step (logs/rink_s_w_cpu3.log) ~= 7 h;
# in-loop PCK val every 200 steps banks .best (train/eval.py
# InTrainingPoseEvaluator — before round 4 the pose path had no val at
# all and .best never existed)
python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hockey_tpu.train.loop import main
main(["--model", "hockey-detection", "--variant", "s", "--imgsz", "384",
      "--domain-rand", "--steps", "1400", "--batch", "8", "--lr", "0.001",
      "--ema", "0.999", "--val-every", "200", "--val-size", "48",
      "--init", "checkpoints/rink_s_w_cpu3.msgpack",
      "--out", "checkpoints/rink_s_ph.msgpack"])
PYEOF
echo "rink pinhole fine-tune exit: $?"
echo "=== val rink_ph in-dist (sterile windowed trapezoid, 384)"
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
timeout 7200 python scripts/e2e_homography.py --cpu \
  --rink-checkpoint checkpoints/rink_s_ph.msgpack.best 2>/dev/null | tail -1
echo "=== e2e homography B (candidate)"
timeout 7200 python scripts/e2e_homography.py --cpu --generator b \
  --rink-checkpoint checkpoints/rink_s_ph.msgpack.best 2>/dev/null | tail -1
echo "=== done r4 chain2"
} > logs/r4_chain2.log 2>&1
