#!/bin/bash
# Full reference training envelope, end to end, on TPU (VERDICT r3 item 1).
#
# Reproduces the reference's complete training campaign at production scale
# on the 250k-item synthetic dataset:
#   CP   200 epochs, batch 3072 x accum 4 (global 12288), lr 2e-5 OneCycle,
#        remat (compatibility_prediction_train_config.py:9-18)
#   CIR  300 epochs, batch 512, curriculum switch easy->hard at epoch 150,
#        warm-started from CP best-AUC
#        (complementary_item_retrieval_train_config.py:16-19)
#   FITB test from CIR best-Recall@1 (fill_in_the_blank_trainer.py:100-107)
#
# Every phase runs through the public CLI against the on-disk dataset and
# survives relay drops: a rolling 'latest' checkpoint (params+opt_state) is
# saved every $SAVE_EVERY epochs and each phase retries with --resume.
#
#   bash scripts/envelope_campaign.sh [dataset_dir] [ckpt_dir]
set -u
cd /root/repo

DS=${1:-/tmp/polyvore250k}
CK=${2:-/tmp/envelope_ckpt}
LOGDIR=${LOGDIR:-/root/repo/logs/envelope}
SAVE_EVERY=${SAVE_EVERY:-15}
MAX_RETRIES=${MAX_RETRIES:-30}
MODEL=outfitx-tpu-siglip-d1536
mkdir -p "$LOGDIR"
PHASES="$LOGDIR/phases.jsonl"

record() { # phase status t0 t1 attempts
  echo "{\"phase\": \"$1\", \"status\": \"$2\", \"seconds\": $(($4 - $3)), \"attempts\": $5, \"t0\": $3, \"t1\": $4}" >> "$PHASES"
}

STALL_S=${STALL_S:-2400} # no log output for 40 min => backend hang; kill+retry

run_phase() { # name cmd... ; retries with --resume latest when a checkpoint exists
  local name=$1; shift
  local t0 attempts rc resume pid
  t0=$(date +%s); attempts=0
  while :; do
    attempts=$((attempts + 1))
    resume=""
    if [ -d "$CK/$MODEL-$name/latest" ]; then resume="--resume latest"; fi
    echo "=== [$name] attempt $attempts $(date -u +%FT%TZ) $resume ===" >> "$LOGDIR/$name.out"
    # Stall watchdog: the relay's device init can HANG (not fail) for
    # hours; a silent attempt would otherwise block the campaign forever.
    # Remote compiles take 1-7 min and recall epochs a few more, so 40 min
    # of log silence is decisive. `kill $pid` (exact pid, never a pattern).
    "$@" $resume >> "$LOGDIR/$name.out" 2>&1 &
    pid=$!
    while kill -0 "$pid" 2>/dev/null; do
      sleep 60
      local age
      age=$(( $(date +%s) - $(stat -c %Y "$LOGDIR/$name.out") ))
      if [ "$age" -gt "$STALL_S" ]; then
        echo "=== [$name] attempt $attempts STALLED (${age}s silent); killing $pid ===" >> "$LOGDIR/$name.out"
        kill "$pid" 2>/dev/null
        sleep 10
        kill -9 "$pid" 2>/dev/null
        break
      fi
    done
    wait "$pid"
    rc=$?
    if [ $rc -eq 0 ]; then
      record "$name" ok "$t0" "$(date +%s)" "$attempts"
      return 0
    fi
    echo "=== [$name] attempt $attempts FAILED rc=$rc ===" >> "$LOGDIR/$name.out"
    if [ $attempts -ge $MAX_RETRIES ]; then
      record "$name" failed "$t0" "$(date +%s)" "$attempts"
      return 1
    fi
    sleep 90 # ride out transient axon refusals
  done
}

# Continuously pin the committed record (phase wall-clocks + metric
# trajectories) so a round boundary mid-campaign still leaves the partial
# trajectories in the repo (logs/ itself is gitignored).
ART=${ART:-/root/repo/parity_artifacts/envelope}
sync_artifacts() {
  mkdir -p "$ART"
  cp "$PHASES" "$ART/" 2>/dev/null
  cp "$LOGDIR"/*_metrics.jsonl "$ART/" 2>/dev/null
}
( while :; do sleep 600; sync_artifacts; done ) &
SYNC_PID=$!
trap 'kill $SYNC_PID 2>/dev/null' EXIT

if [ ! -f "$DS/item_metadata.json" ]; then
  t0=$(date +%s)
  python scripts/make_synthetic_polyvore.py --out "$DS" \
    --items 250000 --outfits 98304 --cir-outfits 49152 --categories 60 \
    >> "$LOGDIR/datagen.out" 2>&1 || exit 1
  record datagen ok "$t0" "$(date +%s)" 1
fi

run_phase cp python -m outfitx_tpu.cli cp \
  --dataset-dir "$DS" --checkpoint-dir "$CK" --log-dir "$LOGDIR" \
  --remat --save-every "$SAVE_EVERY" || exit 1

run_phase cir python -m outfitx_tpu.cli cir \
  --dataset-dir "$DS" --checkpoint-dir "$CK" --log-dir "$LOGDIR" \
  --save-every "$SAVE_EVERY" \
  --warm-start-from "$CK/$MODEL-cp/best_auc" || exit 1

t0=$(date +%s)
python -m outfitx_tpu.cli fitb \
  --dataset-dir "$DS" --checkpoint-dir "$CK" --log-dir "$LOGDIR" \
  --checkpoint-from "$CK/$MODEL-cir/best_recall@1" \
  >> "$LOGDIR/fitb.out" 2>&1 || { record fitb failed "$t0" "$(date +%s)" 1; exit 1; }
record fitb ok "$t0" "$(date +%s)" 1

sync_artifacts
echo "=== ENVELOPE CAMPAIGN DONE ==="
