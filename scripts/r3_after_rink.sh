#!/bin/bash
# Chained: after the rink retrain + vals, retrain the puck model on the
# domain-randomized puck scenes, then val A + B.
cd /root/repo
while ! grep -q "done after-player phase" logs/r3_after_player.log 2>/dev/null; do sleep 60; done
echo "starting puck domain-rand retrain"
python -m hockey_tpu.train.loop --model hockey-puck-detection \
  --dataset hard-puck --domain-rand --device-data --steps 6000 --batch 16 \
  --lr 0.002 --ema 0.999 --val-every 1000 \
  --init hockey_tpu/data/weights/hockey-puck-detection.msgpack \
  --out checkpoints/puck_s_dr.msgpack
echo "puck retrain exit: $?"
echo "=== val puck_dr on held-out A"
timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_dr.msgpack.best --dataset hard-puck \
  --limit 150 --json > logs/val_puck_dr_a.json 2>/dev/null; cat logs/val_puck_dr_a.json
echo "=== val puck_dr on generator B (OOD)"
timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_dr.msgpack.best --dataset hard-puck-b \
  --limit 100 --json > logs/val_puck_dr_b.json 2>/dev/null; cat logs/val_puck_dr_b.json
echo "=== done after-rink phase"
