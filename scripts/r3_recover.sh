#!/bin/bash
# Short TPU measurement pass for late-round tunnel recovery (the full
# retrain chain no longer fits before round end).
cd /root/repo
{
echo "=== e2e quality, generator B (fused tracker, TPU)"
timeout 2400 python scripts/e2e_quality.py --generator b --frames 96 2>/dev/null | tail -1
echo "=== e2e quality, in-dist seed 7"
timeout 2400 python scripts/e2e_quality.py --frames 96 --seed 7 2>/dev/null | tail -1
echo "=== e2e puck (shipped, TPU)"
timeout 1800 python scripts/e2e_puck.py --frames 96 2>/dev/null | tail -1
echo "=== profile trace"
timeout 1500 python scripts/profile_trace.py 2>/dev/null | tail -1
echo "=== done recover phase"
} > logs/r3_recover.log 2>&1
