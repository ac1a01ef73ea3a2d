#!/bin/bash
# Chained: after the puck retrain + vals, rerun the full robustness suite
# (generator-B OOD + corruption curves) with the domain-randomized
# retrain candidates, before any shipping decision.
cd /root/repo
while ! grep -q "done after-rink phase" logs/r3_after_rink.log 2>/dev/null; do sleep 60; done
echo "starting DR robustness evals"
timeout 5400 python scripts/robustness.py \
  --checkpoint checkpoints/player_x_dr.msgpack.best \
  --out logs/robustness_dr.json
echo "player DR robustness exit: $?"
timeout 5400 python scripts/robustness.py --pucks \
  --model hockey-puck-detection \
  --checkpoint checkpoints/puck_s_dr.msgpack.best \
  --out logs/robustness_puck_dr.json
echo "puck DR robustness exit: $?"
echo "=== done after-puck phase"
