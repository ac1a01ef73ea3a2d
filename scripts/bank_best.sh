#!/bin/bash
# Checkpoint banker: training checkpoints live in gitignored checkpoints/
# and were WIPED by an environment reset mid-round-4 (the rink pinhole
# fine-tune's step-400 .best, the dark-limb puck .best and every other
# intermediate died with /tmp). This sidecar makes training progress
# durable: every INTERVAL seconds, any checkpoints/*.best newer than its
# banked copy is re-encoded f16 (halves size; load_params restores f32
# masters) into git-tracked banked/ and committed.
#
# Git operations run under flock so the banker never races an
# interactive session's commits. Stop with: kill $(cat /tmp/bank_best.pid)
cd /root/repo || exit 1
echo $$ > /tmp/bank_best.pid
INTERVAL=${BANK_INTERVAL:-900}
mkdir -p banked
while true; do
  for src in checkpoints/*.best; do
    [ -e "$src" ] || continue
    name=$(basename "$src" .best)          # e.g. rink_s_ph.msgpack
    dst="banked/$name"
    if [ ! -e "$dst" ] || [ "$src" -nt "$dst" ]; then
      python - "$src" "$dst" <<'PYEOF' || continue
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")  # CLAUDE.md: env vars do not work
from hockey_tpu.models.checkpoint import load_params, save_params
src, dst = sys.argv[1], sys.argv[2]
save_params(dst + ".tmp", load_params(src), dtype="float16")
import os
os.replace(dst + ".tmp", dst)
print(f"banked {src} -> {dst} ({os.path.getsize(dst)/1e6:.1f} MB)")
PYEOF
      touch -r "$src" "$dst" 2>/dev/null
      (
        flock -w 300 9 || exit 1
        git add -f "$dst" && \
          git commit -q -m "Bank $name training checkpoint (f16, survives environment resets)" -- "$dst" || true
      ) 9>/tmp/gitbank.lock
    fi
  done
  sleep "$INTERVAL"
done
