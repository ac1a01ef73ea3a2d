#!/bin/bash
# TPU tunnel watcher + round-4 queue launcher. Probes the axon tunnel;
# on the first successful end-to-end device computation it records
# /tmp/tpu_ok and launches scripts/r4_tpu_queue.sh (which first stops
# the CPU rescue fine-tune so the tunnel's jitted client is the only
# one — two concurrent clients deadlock the tunnel).
#
# timeout -k: the axon client can ignore SIGTERM while blocked on the
# dead pipe (observed round 4: a probe hung >1.5 h under plain
# `timeout 300`), so follow up with SIGKILL.
rm -f /tmp/tpu_ok
while true; do
  if timeout -k 20 180 python -c "
import jax, jax.numpy as jnp, numpy as np
np.asarray(jnp.ones((64,))+1)
print('TPU_PROBE_OK')" > /tmp/tpu_probe.out 2>&1 \
      && grep -q TPU_PROBE_OK /tmp/tpu_probe.out; then
    date > /tmp/tpu_ok
    echo "tunnel recovered at $(date)" >> /tmp/tpu_watch.log
    bash /root/repo/scripts/r4_tpu_queue.sh &
    echo $! > /tmp/r4_queue.pid
    exit 0
  fi
  echo "probe failed at $(date)" >> /tmp/tpu_watch.log
  sleep 240
done
