#!/bin/bash
# Round-4 TPU queue: launched by scripts/tpu_watch.sh the moment the
# axon tunnel is confirmed back (/tmp/tpu_ok). Strictly sequential —
# the tunnel deadlocks with two concurrent jitted clients.
# Priorities per VERDICT round-3: (1) bank a bench number, (2) puck OOD
# retrain with the round-4 dark-limb negatives, (3) full-strength 512
# rink window retrain, (4) e2e + profile trace artifacts.
cd /root/repo
{
# the CPU puck fine-tune becomes redundant once the TPU can run the
# full-strength version — free the single host core for data feeding
for pidf in /tmp/puck_dl.pid /tmp/puck_bs.pid /tmp/r4_resume2.pid; do
  if [ -f "$pidf" ] && kill -0 "$(cat "$pidf")" 2>/dev/null; then
    echo "killing CPU fine-tune chain $pidf (TPU takes over)"
    # the chains are setsid group leaders; kill the whole group so the
    # in-flight python training child dies too, not just the bash wrapper
    kill -TERM -- "-$(cat "$pidf")" 2>/dev/null || kill "$(cat "$pidf")"
  fi
done

echo "=== bank a bench run (streams partials to logs/bench_partial.json)"
timeout 2700 python bench.py | tail -1 | tee logs/bench_r4_banked.json

# continue from the CPU fine-tunes if one banked a best; the gitignored
# checkpoints/ tree does NOT survive environment resets (it was wiped
# mid-round-4), so fall back to git-banked copies (scripts/bank_best.sh)
# and finally to the shipped weights
PUCK_INIT=hockey_tpu/data/weights/hockey-puck-detection.msgpack
[ -f banked/puck_s_bs.msgpack ] && PUCK_INIT=banked/puck_s_bs.msgpack
# advisor fix (round 4, medium): prefer the banked f16 copy of THIS run's
# output over shipped weights after an environment reset
[ -f banked/puck_s_dl_tpu.msgpack ] && PUCK_INIT=banked/puck_s_dl_tpu.msgpack
[ -f checkpoints/puck_s_dr.msgpack.best ] && PUCK_INIT=checkpoints/puck_s_dr.msgpack.best
[ -f checkpoints/puck_s_dl.msgpack.best ] && PUCK_INIT=checkpoints/puck_s_dl.msgpack.best
[ -f checkpoints/puck_s_bs.msgpack.best ] && PUCK_INIT=checkpoints/puck_s_bs.msgpack.best
echo "=== puck dark-limb retrain (TPU, full strength, init $PUCK_INIT)"
python -m hockey_tpu.train.loop --model hockey-puck-detection \
  --dataset hard-puck --domain-rand --device-data --steps 6000 --batch 16 \
  --lr 0.001 --ema 0.999 --val-every 1000 --val-size 100 \
  --init "$PUCK_INIT" \
  --out checkpoints/puck_s_dl_tpu.msgpack
echo "puck dl retrain exit: $?"
for ds in hard-puck hard-puck-b; do
  tag=$([ "$ds" = hard-puck ] && echo a || echo b)
  timeout 2400 python -m hockey_tpu.train.val --model hockey-puck-detection \
    --checkpoint checkpoints/puck_s_dl_tpu.msgpack.best --dataset "$ds" \
    --limit 120 --json > "logs/val_puck_dl_tpu_${tag}.json" 2>/dev/null
  cat "logs/val_puck_dl_tpu_${tag}.json"
done
timeout 2400 python scripts/e2e_puck.py --frames 96 --generator b \
  --checkpoint checkpoints/puck_s_dl_tpu.msgpack.best 2>/dev/null | tail -1
echo "=== e2e puck gen-B: capsule-retrained ckpt + player-context demotion"
timeout 2400 python scripts/e2e_puck.py --frames 96 --generator b \
  --checkpoint checkpoints/puck_s_dl_tpu.msgpack.best --player-demote 0.3 \
  2>/dev/null | tail -1

# NOTE (round-4 commit 422db05): --domain-rand now includes the capsule
# body-shape family (scenes.sample_style "body_capsule"), so the puck
# retrain above trains against capsule-mitt context natively and this
# player fine-tune widens the silhouette family the box head regresses.
PLAYER_INIT=hockey_tpu/data/weights/hockey-player-detection.msgpack
# advisor fix (round 4, medium): resume from banked progress after a reset
[ -f banked/player_x_bs.msgpack ] && PLAYER_INIT=banked/player_x_bs.msgpack
[ -f checkpoints/player_x_dr.msgpack.best ] && PLAYER_INIT=checkpoints/player_x_dr.msgpack.best
echo "=== player body-family fine-tune (TPU, init $PLAYER_INIT)"
python -m hockey_tpu.train.loop --model hockey-player-detection \
  --domain-rand --device-data --steps 3000 --batch 16 --lr 0.0005 \
  --ema 0.999 --val-every 500 --val-size 100 \
  --init "$PLAYER_INIT" \
  --out checkpoints/player_x_bs.msgpack
echo "player bs fine-tune exit: $?"
for ds in hard hard-b; do
  tag=$([ "$ds" = hard ] && echo a || echo b)
  timeout 2400 python -m hockey_tpu.train.val --model hockey-player-detection \
    --checkpoint checkpoints/player_x_bs.msgpack.best --dataset "$ds" \
    --limit 120 --json > "logs/val_player_bs_${tag}.json" 2>/dev/null
  cat "logs/val_player_bs_${tag}.json"; echo
done
echo "=== e2e quality gen B with the body-family candidate"
timeout 3600 python scripts/e2e_quality.py --frames 96 --generator b \
  --match-iou 0.3 --player-checkpoint checkpoints/player_x_bs.msgpack.best \
  2>/dev/null | tail -1 | tee logs/e2e_quality_bs_b.json

RINK_INIT=hockey_tpu/data/weights/hockey-detection.msgpack
[ -f banked/rink_s_ph.msgpack ] && RINK_INIT=banked/rink_s_ph.msgpack
[ -f checkpoints/rink_s_ph.msgpack.best ] && RINK_INIT=checkpoints/rink_s_ph.msgpack.best
echo "=== rink window retrain (TPU, 512, full strength, init $RINK_INIT)"
python -m hockey_tpu.train.loop --model hockey-detection --variant s \
  --imgsz 512 --device-data --domain-rand --steps 6000 --batch 16 \
  --lr 0.002 --init "$RINK_INIT" \
  --out checkpoints/rink_s_w_tpu.msgpack
echo "rink retrain exit: $?"
timeout 1800 python -m hockey_tpu.train.val --model hockey-detection \
  --variant s --checkpoint checkpoints/rink_s_w_tpu.msgpack --imgsz 512 \
  --limit 200 --json > logs/val_rink_w_tpu.json 2>/dev/null
cat logs/val_rink_w_tpu.json
timeout 3600 python scripts/e2e_homography.py \
  --rink-checkpoint checkpoints/rink_s_w_tpu.msgpack --rink-imgsz 512 \
  2>/dev/null | tail -1

echo "=== short e2e + trace pass (round-3 recover list)"
bash scripts/r3_recover.sh
echo "=== done r4 TPU queue"
} > logs/r4_tpu_queue.log 2>&1
