#!/bin/bash
set -e
export PYTHONPATH="/root/repo:$PYTHONPATH"
cd /root/repo
DS=/tmp/polyvore2
CK=/tmp/chain_ckpt2
echo "=== CP train (disk dataset) ==="
python -m outfitx_tpu.cli cp --dataset-dir $DS --epochs 3 --batch-size 1024 --lr 3e-4 --checkpoint-dir $CK 2>&1 | grep -vE "WARNING|WARN" | tail -2
echo "=== CIR train (warm start from CP) ==="
python -m outfitx_tpu.cli cir --dataset-dir $DS --epochs 2 --batch-size 512 --lr 3e-4 --switch-to-hard-epoch 1 --checkpoint-dir $CK --warm-start-from "$CK/outfitx-tpu-siglip-d1536-cp/best_auc" 2>&1 | grep -vE "WARNING|WARN" | tail -2
echo "=== FITB test (CIR checkpoint) ==="
python -m outfitx_tpu.cli fitb --dataset-dir $DS --checkpoint-dir $CK --checkpoint-from "$CK/outfitx-tpu-siglip-d1536-cir/best_recall@1" 2>&1 | grep -vE "WARNING|WARN" | tail -2
echo "=== CHAIN DONE ==="
