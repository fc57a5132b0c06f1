#!/bin/bash
# On-chip measurement batch (bounded, default ~90 min), then the envelope
# campaign. Queued work from round 4 (BENCHMARKS.md "Round 4 status"):
# runs each probe under a timeout, logs to parity_artifacts/measure_r4/
# (committed by the driver's end-of-round snapshot), then launches
# scripts/envelope_campaign.sh in the background.
#
#   bash scripts/measure_batch.sh [budget_seconds]
cd /root/repo
M=/root/repo/parity_artifacts/measure_r4
mkdir -p "$M"
T0=$(date +%s)
BUDGET=${1:-5400}
left() { echo $(( BUDGET - ($(date +%s) - T0) )); }

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  if [ "$(left)" -lt 120 ]; then echo "SKIP $name (budget)" >> "$M/batch.log"; return; fi
  [ "$to" -gt "$(left)" ] && to=$(left)
  echo "=== $name t=$(($(date +%s) - T0))s timeout=${to}s ===" >> "$M/batch.log"
  timeout "$to" "$@" > "$M/$name.out" 2>&1
  echo "=== $name rc=$? t=$(($(date +%s) - T0))s ===" >> "$M/batch.log"
}

run drive          900  python scripts/verify_drive.py
run tpu_smoke      1500 python scripts/tpu_smoke.py
run ffn_pad        2700 python scripts/bench_ffn_pad.py --train
run clip_text_xla    1200 python scripts/bench_clip_text_attn.py xla
run clip_text_pallas 1200 python scripts/bench_clip_text_attn.py pallas
run attn_block     1500 python scripts/bench_attn_block.py
run dh_pack        1500 python scripts/bench_dh_pack.py
run bench_pin      1800 python bench.py
run coalesce       1500 python scripts/bench_coalesce.py

echo "=== measurement batch done, launching campaign ===" >> "$M/batch.log"
MAX_RETRIES=200 nohup bash scripts/envelope_campaign.sh > /tmp/envelope.out 2>&1 &
echo $! > /tmp/envelope.pid
