#!/bin/bash
# Round-3 TPU evaluation queue, phase 1 (runs after rink-s training
# releases the chip). Serial: the axon tunnel supports one process.
cd /root/repo
# wait for the training run to print its final "saved ..." line (PID
# liveness checks are unreliable across sandboxed shells)
MARKER=${MARKER_LOG:-logs/train_rink_s2.log}
while ! grep -q "^saved " "$MARKER" 2>/dev/null; do sleep 30; done
echo "=== rink-s val (512, PCK)"
python -m hockey_tpu.train.val --model hockey-detection --variant s \
  --checkpoint checkpoints/rink_s.msgpack --imgsz 512 --limit 200 --json \
  | tee logs/val_rink_s.json || true
echo "=== robustness: player (generator B + corruption curves)"
python scripts/robustness.py --limit 100 --corr-limit 40 || true
echo "=== robustness: puck (generator B + corruption curves)"
python scripts/robustness.py --model hockey-puck-detection --pucks \
  --limit 100 --corr-limit 30 || true
echo "=== rink pose on generator B (shipped x model, OOD)"
python -m hockey_tpu.train.val --model hockey-detection --dataset rink-b \
  --imgsz 512 --limit 100 --json | tee logs/val_rink_b.json || true
echo "=== e2e puck trajectory harness"
python scripts/e2e_puck.py || true
echo "=== done phase 1"
