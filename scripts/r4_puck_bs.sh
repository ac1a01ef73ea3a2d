#!/bin/bash
# Round-4 CPU fallback: puck fine-tune on the v5 renderer (capsule bodies
# + 8-60px size family — both measured root causes of the gen-B silence,
# STATUS round-4 item 5). Starts only when chain2 AND the measurement
# chains have released the core. The TPU queue runs the full-strength
# version if the tunnel returns first (r4_tpu_queue.sh kills this via
# /tmp/puck_bs.pid).
cd /root/repo
while grep -q . <(ps -p "$(cat /tmp/r4_measure4.pid 2>/dev/null)" -o pid= 2>/dev/null) \
   || ! grep -q "done r4 chain2" logs/r4_chain2.log 2>/dev/null; do
  sleep 300
done
echo $$ > /tmp/puck_bs.pid
{
echo "=== puck body+size-family fine-tune (CPU, v5 renderer)"
nice -n 10 python - <<'PYEOF'
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
from hockey_tpu.train.loop import main
main(["--model", "hockey-puck-detection", "--dataset", "hard-puck",
      "--domain-rand", "--steps", "1500", "--batch", "8", "--lr", "0.0008",
      "--ema", "0.999", "--val-every", "250", "--val-size", "64",
      "--init", "checkpoints/puck_s_dl.msgpack.best",
      "--out", "checkpoints/puck_s_bs.msgpack"])
PYEOF
echo "puck bs fine-tune exit: $?"
for ds in hard-puck hard-puck-b; do
  tag=$([ "$ds" = hard-puck ] && echo a || echo b)
  timeout 3600 python -m hockey_tpu.train.val --model hockey-puck-detection \
    --checkpoint checkpoints/puck_s_bs.msgpack.best --dataset "$ds" --cpu \
    --limit 100 --json > "logs/val_puck_bs_${tag}.json" 2>/dev/null
  cat "logs/val_puck_bs_${tag}.json"; echo
done
echo "=== done r4 puck bs"
} >> logs/r4_puck_bs.log 2>&1
