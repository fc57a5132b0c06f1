#!/bin/bash
# On-chip measurement batch (bounded, default ~90 min), then the envelope
# campaign. All round-4 study probes landed and were adopted/recorded
# (BENCHMARKS.md), so the standing queue is now the health + headline set:
# verify drive, compiled golden checks, headline re-pin (bench.py measures
# pinned AND fresh, keeps the better executable), and the 10-minute
# production serving soak. Logs to parity_artifacts/measure_auto/
# (committed by the driver's end-of-round snapshot), then launches
# scripts/envelope_campaign.sh in the background.
#
#   bash scripts/measure_batch.sh [budget_seconds]
cd /root/repo
M=${M:-/root/repo/parity_artifacts/measure_auto}
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

run drive      900  python scripts/verify_drive.py
run tpu_smoke  1500 python scripts/tpu_smoke.py
run bench_pin  1800 python bench.py
run soak       3600 python scripts/soak_serving.py --minutes 10
# Freshness first: if the remote compiler service changed version since
# the pack was built (canary cache-key miss), rebuild the pack from this
# batch's warm cache — a stale pack must be flagged, never silent.
run pack_fresh 900  python scripts/probe_pack_freshness.py --refresh
# Refresh the committed warm-start pack from whatever this batch compiled
# (no --prune: a partial batch must not evict still-valid entries).
run cache_pack 600  python scripts/build_cache_pack.py

# Two complete envelope campaigns are already committed (BENCHMARKS.md);
# a third only re-proves the same thing, so the campaign is opt-in now.
if [ "${CAMPAIGN:-0}" = "1" ]; then
  echo "=== measurement batch done, launching campaign ===" >> "$M/batch.log"
  MAX_RETRIES=200 nohup bash scripts/envelope_campaign.sh > /tmp/envelope.out 2>&1 &
  echo $! > /tmp/envelope.pid
else
  echo "=== measurement batch done (campaign opt-in: CAMPAIGN=1) ===" >> "$M/batch.log"
fi
