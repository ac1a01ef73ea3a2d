#!/bin/bash
# Round-3 chained TPU queue #3: waits for the rink-window + puck-capsule
# phase (scripts/r3_rink_window.sh) to finish, then runs the remaining
# TPU measurements. Shipping decisions are made manually from the logs.
cd /root/repo
while ! grep -q "done rink-window + puck-capsule phase" logs/r3_rink_window.log 2>/dev/null; do sleep 60; done

echo "=== e2e quality, generator B (fused tracker, TPU)"
timeout 3600 python scripts/e2e_quality.py --generator b --frames 96 2>/dev/null | tail -1

echo "=== e2e quality, in-dist seed 7 (fused-fix regression check)"
timeout 3600 python scripts/e2e_quality.py --frames 96 --seed 7 2>/dev/null | tail -1

echo "=== e2e puck, generator B (OOD)"
timeout 2400 python scripts/e2e_puck.py --generator b --frames 96 2>/dev/null | tail -1

echo "=== profile trace (roofline evidence)"
timeout 1800 python scripts/profile_trace.py 2>/dev/null | tail -1

echo "=== bench"
timeout 5400 python bench.py 2>/dev/null | tail -1
echo "=== done post phase"
