#!/bin/bash
# Remat-vs-microbatch study: same global batch 12288, flagship config,
# dropout 0.3. Does a smaller microbatch WITHOUT remat (3F FLOPs/step)
# beat the shipping 3072x4 WITH remat (~4F)?
cd /root/repo
M=parity_artifacts/measure_r6
T0=$(date +%s)
run() {
  local name=$1; shift
  echo "=== $name t=$(($(date +%s) - T0))s ===" >> "$M/remat_study.log"
  timeout 1500 "$@" >> "$M/remat_study.log" 2>&1
  echo "=== $name rc=$? t=$(($(date +%s) - T0))s ===" >> "$M/remat_study.log"
}
run baseline_3072x4_remat   python scripts/bench_train_step.py --batch 3072 --accum 4 --iters 8
run noremat_1024x12         python scripts/bench_train_step.py --batch 1024 --accum 12 --no-remat --iters 8
run noremat_1536x8          python scripts/bench_train_step.py --batch 1536 --accum 8 --no-remat --iters 8
run remat_1024x12           python scripts/bench_train_step.py --batch 1024 --accum 12 --iters 8
run noremat_768x16          python scripts/bench_train_step.py --batch 768 --accum 16 --no-remat --iters 8
echo "ALL DONE t=$(($(date +%s) - T0))s" >> "$M/remat_study.log"
