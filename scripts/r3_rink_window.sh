#!/bin/bash
# Round-3 chained TPU queue #2:
# 1. rink pose retrain on WINDOW cameras (train/data.py: broadcast frames
#    rarely show the full rink; the full-rink-only model regressed toward
#    the memorized layout on windowed clips — 88 px keypoint error,
#    scripts/diag_homography.py) + sterile/OOD/e2e-homography vals;
# 2. puck retrain with shape-randomized glove hard negatives
#    (circle/capsule/ellipse, train/scenes.py) + A/B vals + e2e puck.
cd /root/repo

echo "=== rink window retrain"
python -m hockey_tpu.train.loop --model hockey-detection --variant s \
  --imgsz 512 --device-data --domain-rand --steps 6000 --batch 16 \
  --lr 0.002 --init checkpoints/rink_s_dr.msgpack \
  --out checkpoints/rink_s_w.msgpack
echo "rink window retrain exit: $?"

echo "=== val rink_s_w on window scenes (new in-dist)"
timeout 1800 python -m hockey_tpu.train.val --model hockey-detection --variant s \
  --checkpoint checkpoints/rink_s_w.msgpack.best --imgsz 512 --limit 200 --json \
  > logs/val_rink_w.json 2>/dev/null; cat logs/val_rink_w.json

echo "=== val rink_s_w on generator B (OOD)"
timeout 1800 python -m hockey_tpu.train.val --model hockey-detection --variant s \
  --checkpoint checkpoints/rink_s_w.msgpack.best --imgsz 512 --dataset rink-b \
  --limit 100 --json > logs/val_rink_w_b.json 2>/dev/null; cat logs/val_rink_w_b.json

echo "=== diag keypoint px error on coherent clip (candidate)"
timeout 2400 python scripts/diag_homography.py --frames 6 \
  --rink-checkpoint checkpoints/rink_s_w.msgpack.best 2>/dev/null | tail -1

echo "=== e2e homography (candidate)"
timeout 3600 python scripts/e2e_homography.py \
  --rink-checkpoint checkpoints/rink_s_w.msgpack.best 2>/dev/null | tail -1

echo "=== puck capsule-negative retrain"
python -m hockey_tpu.train.loop --model hockey-puck-detection \
  --dataset hard-puck --domain-rand --device-data --steps 6000 --batch 16 \
  --lr 0.001 --ema 0.999 --val-every 1000 \
  --init checkpoints/puck_s_dr.msgpack.best \
  --out checkpoints/puck_s_cn.msgpack
echo "puck capsule retrain exit: $?"

echo "=== val puck_cn on held-out A"
timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_cn.msgpack.best --dataset hard-puck \
  --limit 150 --json > logs/val_puck_cn_a.json 2>/dev/null; cat logs/val_puck_cn_a.json
echo "=== val puck_cn on generator B (OOD)"
timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_cn.msgpack.best --dataset hard-puck-b \
  --limit 100 --json > logs/val_puck_cn_b.json 2>/dev/null; cat logs/val_puck_cn_b.json
echo "=== diag puck B (candidate)"
timeout 2400 python scripts/diag_puck_b.py --n 30 --gen b --dump 0 \
  --checkpoint checkpoints/puck_s_cn.msgpack.best 2>/dev/null | \
  python -c "import json,sys; d=json.load(sys.stdin); print(json.dumps({k:d[k] for k in ('images','gt_pucks','hit','no_fire','misfire','hit_rate')}))"
echo "=== e2e puck (candidate)"
timeout 2400 python scripts/e2e_puck.py --frames 96 \
  --checkpoint checkpoints/puck_s_cn.msgpack.best 2>/dev/null | tail -1
echo "=== done rink-window + puck-capsule phase"
