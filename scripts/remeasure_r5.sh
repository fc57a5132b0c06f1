#!/bin/bash
# Round-5 re-measurement of the probes that failed in the round-4 batch on
# the attn_block Mosaic layout bug (parity_artifacts/measure_r4/): the fused
# attention block now uses 3D x 2D dot_generals with a lane-aligned padded
# head dim (ops/attn_block.py). Runs on a quiet chip (envelope campaign
# paused), then relaunches the campaign.
#
#   nohup bash scripts/remeasure_r5.sh > /tmp/remeasure.log 2>&1 &
cd /root/repo
M=/root/repo/parity_artifacts/measure_r5
mkdir -p "$M"
T0=$(date +%s)

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name t=$(($(date +%s) - T0))s timeout=${to}s ===" >> "$M/batch.log"
  timeout "$to" "$@" > "$M/$name.out" 2>&1
  echo "=== $name rc=$? t=$(($(date +%s) - T0))s ===" >> "$M/batch.log"
}

run drive            900  python scripts/verify_drive.py
run tpu_smoke        1500 python scripts/tpu_smoke.py
run attn_block       2400 python scripts/bench_attn_block.py --tiles 8,16,32
run dh_pack          1500 python scripts/bench_dh_pack.py
run clip_text_xla    1200 python scripts/bench_clip_text_attn.py xla
run clip_text_pallas 1200 python scripts/bench_clip_text_attn.py pallas

echo "=== remeasure done, relaunching envelope campaign ===" >> "$M/batch.log"
MAX_RETRIES=200 nohup bash scripts/envelope_campaign.sh > /tmp/envelope.out 2>&1 &
echo $! > /tmp/envelope.pid
