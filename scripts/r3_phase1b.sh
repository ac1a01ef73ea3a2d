#!/bin/bash
cd /root/repo
echo "=== robustness: player (generator B re-run, stick-label fix + batched eval)"
timeout 2400 python scripts/robustness.py --limit 100 --corr-limit 40 || true
echo "=== robustness: puck (generator B + corruption curves)"
timeout 2400 python scripts/robustness.py --model hockey-puck-detection --pucks \
  --limit 100 --corr-limit 30 || true
echo "=== rink pose on generator B (shipped s model, OOD)"
timeout 1200 python -m hockey_tpu.train.val --model hockey-detection --dataset rink-b \
  --imgsz 512 --limit 100 --json > logs/val_rink_b.json 2>/dev/null || true
cat logs/val_rink_b.json
echo "=== e2e puck trajectory harness"
timeout 2400 python scripts/e2e_puck.py || true
echo "=== done phase 1b"
