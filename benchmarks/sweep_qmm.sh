#!/bin/bash
# Serial sweep of fused-GEMM kernel knobs, scored by the ONLY trusted
# metric (bench.py end-to-end tok/s). Run on the real chip:
#   nohup bash benchmarks/sweep_qmm.sh > /tmp/sweep_qmm.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
export BENCH_ITERS=${BENCH_ITERS:-24}

run() {
    label="$1"; shift
    echo "=== $label ($*)"
    out=$(env "$@" timeout 560 python bench.py 2>/tmp/sweep_err.log | tail -1)
    [ -z "$out" ] && out="FAILED: $(tail -2 /tmp/sweep_err.log | head -c 200)"
    echo "$label $out"
}

run baseline            DUMMY=1
run tn512               VLLM_TPU_QMM_TN=512
run budget6M            VLLM_TPU_QMM_BUDGET=6291456
run budget10M           VLLM_TPU_QMM_BUDGET=10485760
run budget1p5M          VLLM_TPU_QMM_BUDGET=1572864
run dimsem              VLLM_TPU_QMM_DIMSEM=1
run dimsem_budget6M     VLLM_TPU_QMM_DIMSEM=1 VLLM_TPU_QMM_BUDGET=6291456
echo "=== sweep done"
