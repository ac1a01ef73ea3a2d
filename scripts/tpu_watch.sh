#!/bin/bash
# Probe the axon TPU tunnel every 10 min; when a probe succeeds, write
# /tmp/tpu_up and exit (so the watcher never runs a jitted client
# concurrently with real TPU work — the documented tunnel deadlock mode).
LOG=/tmp/tpu_watch_r4.log
rm -f /tmp/tpu_up
while true; do
  echo "$(date +%H:%M:%S) probing" >> "$LOG"
  if timeout 300 python - <<'EOF' >> "$LOG" 2>&1
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
v = float(np.asarray(x @ x)[0, 0])
assert v == 128.0, v
print("TPU OK:", d)
EOF
  then
    touch /tmp/tpu_up
    echo "$(date +%H:%M:%S) TPU UP — watcher exiting" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) down" >> "$LOG"
  sleep 600
done
