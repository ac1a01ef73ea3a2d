#!/bin/bash
# Launches the domain-randomized player retrain once phase1b releases
# the chip (marker-based; do NOT run two copies).
cd /root/repo
while ! grep -q "done phase 1b" logs/r3_phase1b.log 2>/dev/null; do sleep 30; done
echo "phase1b done; starting player domain-rand retrain"
python -m hockey_tpu.train.loop --dataset hard --domain-rand --device-data \
  --steps 10000 --batch 16 --lr 0.003 --ema 0.999 --val-every 1000 \
  --mosaic 0.5 --mixup 0.15 \
  --init hockey_tpu/data/weights/hockey-player-detection.msgpack \
  --out checkpoints/player_x_dr.msgpack
echo "retrain exit: $?"
