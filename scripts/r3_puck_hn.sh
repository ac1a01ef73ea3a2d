#!/bin/bash
# Puck retrain with contextual hard negatives (stick/skate blade blobs in
# generator A — logs/diag_puck_b showed B's blades drawing 0.85+ false
# fires) + widened puck-scene zoom span for scale diversity.
cd /root/repo
python -m hockey_tpu.train.loop --model hockey-puck-detection \
  --dataset hard-puck --domain-rand --device-data --steps 6000 --batch 16 \
  --lr 0.001 --ema 0.999 --val-every 1000 \
  --init checkpoints/puck_s_hn.msgpack.best \
  --out checkpoints/puck_s_hn2.msgpack
echo "puck hn2 retrain exit: $?"
echo "=== val puck_hn on held-out A"
timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_hn2.msgpack.best --dataset hard-puck \
  --limit 150 --json > logs/val_puck_hn2_a.json 2>/dev/null; cat logs/val_puck_hn2_a.json
echo "=== val puck_hn on generator B (OOD)"
timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_hn2.msgpack.best --dataset hard-puck-b \
  --limit 100 --json > logs/val_puck_hn2_b.json 2>/dev/null; cat logs/val_puck_hn2_b.json
echo "=== done puck-hn2 phase"
