#!/bin/bash
# Tiny-scale CPU replica of scripts/envelope_campaign.sh — validates the
# exact phase/flag sequence (on-disk dataset -> cp with remat+save-every ->
# interrupted cp resumed from 'latest' -> cir warm-started from cp
# best_auc, resumed across the curriculum switch -> fitb chained from cir
# best_recall@1) in ~5 min on CPU, so the multi-hour unattended TPU
# campaign cannot die on plumbing. Passed 2026-08-18 (accuracy 0.906 on
# the tiny synthetic chain).
#
#   bash scripts/campaign_smoke.sh
set -e
cd /root/repo
DS=/tmp/polyvore_tiny
CK=/tmp/envelope_smoke_ckpt
LOG=/tmp/envelope_smoke_logs
rm -rf "$CK" "$LOG"; mkdir -p "$LOG"
MODEL=outfitx-tpu-siglip-d1536
export JAX_PLATFORMS=cpu  # honored by the CLI via force_platform_from_env
if [ ! -f "$DS/item_metadata.json" ]; then
  python scripts/make_synthetic_polyvore.py --out "$DS" \
    --items 512 --outfits 256 --cir-outfits 128 --categories 8
fi
echo "=== cp (2 epochs) ==="
python -m outfitx_tpu.cli cp --dataset-dir "$DS" --checkpoint-dir "$CK" \
  --log-dir "$LOG" --remat --save-every 1 --epochs 2 --batch-size 64 --accum 2
echo "=== cp resumed from latest (to epoch 4) ==="
python -m outfitx_tpu.cli cp --dataset-dir "$DS" --checkpoint-dir "$CK" \
  --log-dir "$LOG" --remat --save-every 1 --epochs 4 --batch-size 64 --accum 2 \
  --resume latest
echo "=== cir warm-started (2 epochs, switch @1) ==="
python -m outfitx_tpu.cli cir --dataset-dir "$DS" --checkpoint-dir "$CK" \
  --log-dir "$LOG" --save-every 1 --epochs 2 --batch-size 32 \
  --switch-to-hard-epoch 1 \
  --warm-start-from "$CK/$MODEL-cp/best_auc"
echo "=== cir resumed across the switch (to epoch 4) ==="
python -m outfitx_tpu.cli cir --dataset-dir "$DS" --checkpoint-dir "$CK" \
  --log-dir "$LOG" --save-every 1 --epochs 4 --batch-size 32 \
  --switch-to-hard-epoch 1 \
  --warm-start-from "$CK/$MODEL-cp/best_auc" --resume latest
echo "=== fitb chained from best_recall@1 ==="
python -m outfitx_tpu.cli fitb --dataset-dir "$DS" --checkpoint-dir "$CK" \
  --log-dir "$LOG" --checkpoint-from "$CK/$MODEL-cir/best_recall@1"
echo "=== SMOKE OK ==="
