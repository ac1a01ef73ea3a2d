#!/bin/bash
# Round-5h: ship the ext3+ext4 weight soup IF its candidate evals won
# (run manually after inspecting /tmp/soup.log), then regenerate the four
# rink canonical artifacts into a STAGING dir and only swap + commit when
# every run succeeded — the repo never holds a half-regenerated state if
# the round clock expires mid-way. README is updated by hand afterwards
# (tests/test_readme_consistency.py enforces the match).
cd /root/repo || exit 1
set -o pipefail
set -e
CKPT=checkpoints/rink_s_soup.msgpack
STAGE=logs/.soup_stage
rm -rf "$STAGE"; mkdir -p "$STAGE"
echo "=== r5h ship soup: $(date)"
python scripts/ship_checkpoint.py "$CKPT" hockey-detection

jval() { # jval <out> <args...>
  local out=$1; shift
  timeout -k 20 900 python -m hockey_tpu.train.val "$@" > "$STAGE/$out"
  python -c "import json,sys; json.load(open('$STAGE/$out'))"
  echo "--- $out: $(cat $STAGE/$out)"
}
jval val_rink_shipped.json --model hockey-detection --variant s \
  --imgsz 512 --limit 200 --json
jval val_rink_shipped_b.json --model hockey-detection --variant s \
  --imgsz 512 --dataset rink-b --limit 100 --json
HOCKEY_E2E_LOGS="$STAGE" timeout -k 20 1800 python scripts/e2e_homography.py \
  --frames 48 --seed 3 --imgsz 640 --generator b | tail -1
HOCKEY_E2E_LOGS="$STAGE" timeout -k 20 1800 python scripts/e2e_homography.py \
  --frames 48 --seed 3 --imgsz 640 --generator a | tail -1
for f in val_rink_shipped.json val_rink_shipped_b.json \
         e2e_homography.json e2e_homography_b.json; do
  [ -s "$STAGE/$f" ] || { echo "MISSING $STAGE/$f - aborting"; exit 1; }
  python -c "import json; json.load(open('$STAGE/$f'))"
done
mv "$STAGE"/val_rink_shipped.json "$STAGE"/val_rink_shipped_b.json \
   "$STAGE"/e2e_homography.json "$STAGE"/e2e_homography_b.json logs/
rmdir "$STAGE" 2>/dev/null || true
(
  flock -w 300 9 || exit 1
  git add hockey_tpu/data/weights/hockey-detection.msgpack \
    logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
    logs/e2e_homography.json logs/e2e_homography_b.json
  git commit -q -m "Ship the ext3+ext4 rink weight soup; regenerate the four rink canonicals" \
    -- hockey_tpu/data/weights/hockey-detection.msgpack \
       logs/val_rink_shipped.json logs/val_rink_shipped_b.json \
       logs/e2e_homography.json logs/e2e_homography_b.json
) 9>/tmp/gitbank.lock
echo "=== r5h done (README update still required): $(date)"
for f in val_rink_shipped.json val_rink_shipped_b.json \
         e2e_homography.json e2e_homography_b.json; do
  echo "$f: $(cat logs/$f)"
done
