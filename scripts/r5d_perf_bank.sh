#!/bin/bash
# Round-5d: after the r5c queue (rink ext3 retrain + evals + gated ship)
# finishes, bank the remaining perf evidence on the free TPU:
#   1. the fused detect+track trace (r5c's attempt died on a transient
#      tunnel remote-compile HTTP 500);
#   2. a FULL-budget bench.py run (r5c's preview ran under a 2400 s cap
#      that cut the puck stage and skipped dual — the dual stage is the
#      headline: the ablation measured the fixed dual program at 134.7
#      fps vs the banked 17.27).
#
# Run detached:  nohup bash scripts/r5d_perf_bank.sh <r5c_pid> > /tmp/r5d.log 2>&1 &
cd /root/repo || exit 1
set -o pipefail

P="$1"
if [ -n "$P" ]; then
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== r5d start (r5c done): $(date)"

echo "=== fused detect+track trace (batch 32)"
timeout -k 20 1800 python scripts/profile_trace.py --program fused --batch 32
echo "fused trace exit: $?"

echo "=== full-budget bench.py"
HOCKEY_BENCH_BUDGET=3600 timeout -k 20 4000 python bench.py | tail -1
echo "bench exit: $?"

(
  flock -w 300 9 || exit 1
  git add logs/profile_trace_fused.json logs/bench_last_good.json \
    logs/bench_partial.json 2>/dev/null
  git commit -q -m "Bank round-5 full-budget bench + fused-program trace" \
    -- logs/profile_trace_fused.json logs/bench_last_good.json \
       logs/bench_partial.json || true
) 9>/tmp/gitbank.lock
echo "=== r5d done: $(date)"
