#!/bin/bash
# Round-4 CPU measurement queue (single core: strictly sequential).
# Backfills every round-3 verdict artifact gap:
#  - post-BYTE_FLOOR-fix OOD tracking (e2e_quality --generator b)
#  - puck gate operating-point sweep (verdict weak #5)
#  - generator-B e2e puck run (verdict missing #3, renderer landed 5c6510c)
#  - rink OOD PCK backfill (val_rink_b.json was 0 bytes)
cd /root/repo
{
echo "=== e2e quality, generator B, 96 frames (post-fix fused tracker)"
timeout 14400 python scripts/e2e_quality.py --cpu --generator b --frames 96 2>/dev/null | tail -1
echo "=== puck gate sweep (96 frames, in-dist)"
timeout 10800 python scripts/sweep_puck_gate.py --cpu --frames 96 2>/dev/null | tail -c 600
echo ""
echo "=== e2e puck, generator B (OOD moving puck)"
timeout 10800 python scripts/e2e_puck.py --cpu --generator b --frames 96 2>/dev/null | tail -1
echo "=== val rink OOD PCK backfill (generator B)"
timeout 7200 python - <<'PYEOF' | tail -1 | tee logs/val_rink_b.json
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, "/root/repo")
from hockey_tpu.train.val import main
main(["--model", "hockey-detection", "--variant", "s", "--dataset",
      "rink-b", "--imgsz", "384", "--limit", "60", "--json"])
PYEOF
echo "=== done r4 measurement queue"
} > logs/r4_measure.log 2>&1
