#!/bin/bash
# One-command real-data parity run (PARITY.md mechanized).
#
#   POLYVORE=/data/polyvore TOWERS=/data/fashionSigLIP \
#       bash scripts/run_parity.sh [--encoder siglip] [extra run_parity.py args]
#
#   bash scripts/run_parity.sh --smoke     # no downloads, synthetic disk data
#
# Produces PARITY_RESULTS.json at the repo root.
set -e
cd "$(dirname "$0")/.."

ARGS=()
[ -n "$POLYVORE" ] && ARGS+=(--dataset-dir "$POLYVORE")
[ -n "$TOWERS" ] && ARGS+=(--weights "$TOWERS")
exec python scripts/run_parity.py "${ARGS[@]}" "$@"
