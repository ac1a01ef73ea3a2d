#!/bin/bash
# Chained TPU queue: waits for the player retrain (r3_retrain.sh) to
# finish, then retrains the rink pose model on rich scenes.
cd /root/repo
while ! grep -q "retrain exit:" logs/train_player_dr.log 2>/dev/null; do sleep 60; done
echo "player retrain done; starting rink rich retrain"
python -m hockey_tpu.train.loop --model hockey-detection --variant s \
  --imgsz 512 --device-data --domain-rand --steps 6000 --batch 16 \
  --lr 0.002 --init checkpoints/rink_s.msgpack \
  --out checkpoints/rink_s_dr.msgpack
echo "rink retrain exit: $?"
echo "=== val rink_s_dr sterile (PCK gate)"
timeout 1800 python -m hockey_tpu.train.val --model hockey-detection --variant s \
  --checkpoint checkpoints/rink_s_dr.msgpack --imgsz 512 --limit 200 --json \
  > logs/val_rink_s_dr.json 2>/dev/null; cat logs/val_rink_s_dr.json
echo "=== val player_x_dr on held-out A"
timeout 2400 python -m hockey_tpu.train.val --checkpoint checkpoints/player_x_dr.msgpack.best \
  --dataset hard --limit 150 --json > logs/val_player_dr_a.json 2>/dev/null; cat logs/val_player_dr_a.json
echo "=== val player_x_dr on generator B (OOD)"
timeout 2400 python -m hockey_tpu.train.val --checkpoint checkpoints/player_x_dr.msgpack.best \
  --dataset hard-b --limit 100 --json > logs/val_player_dr_b.json 2>/dev/null; cat logs/val_player_dr_b.json
echo "=== done after-player phase"
