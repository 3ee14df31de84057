#!/bin/bash
# Run the full round-3 on-chip measurement battery
# (benchmarks/ONCHIP_RUNBOOK.md) in order, appending everything to a
# results log. Resilient: each item runs under timeout and a failure
# does not stop the battery. Never pattern-kills — the serving step
# tracks its exact server PID (run_serving_bench.sh).
#
# Usage:  nohup benchmarks/run_onchip_battery.sh > /tmp/battery.log 2>&1 &
set -u -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/repo/benchmarks/BATTERY_RESULTS.txt}
# Synthetic checkpoints (benchmarks/make_synthetic_checkpoint.py);
# regenerate with --preset 7b/1b if the scratch dir was cleaned.
CKPTS=${CKPTS:-/tmp/ckpts}
CKPT7B=$CKPTS/llama7b_awq_synth
CKPT1B=$CKPTS/llama1b_awq_synth

say() { echo; echo "#### $* [$(date -u +%H:%M:%S)]"; }
run() { # run <timeout-s> <label> cmd...
    local t=$1 label=$2; shift 2
    say "$label"
    # grep exiting 1 just means every line was filtered noise — only
    # the command's own failure (via pipefail) marks the step FAILED.
    # A step whose output carries no parseable metric line is ALSO
    # marked FAILED (round 3's serving "timeout" hid the real error).
    local out
    out=$(timeout "$t" "$@" 2>&1) || {
        echo "$out" | grep -v -E "WARN|INFO|absl|libtpu" | tail -40
        echo "!! $label FAILED/timeout"; return 0; }
    echo "$out" | { grep -v -E \
        "WARN|INFO|absl|libtpu|oneDNN|cudart|torch_dtype" \
        || [ $? -eq 1 ]; }
    if ! echo "$out" | grep -q -E '"metric"|GB/s|tok/s|ms|OK'; then
        echo "!! $label FAILED: no metric line in output"
    fi
    if echo "$out" | grep -q "breakdown-capture: INVALID"; then
        echo "!! $label FAILED: breakdown capture invalid (glitched rows)"
    fi
}

{
say "BATTERY START $(date -u)"

# 1. Anchor (best-of-3 built in) + regression gate: the round-4
#    anchor measured 158.6-162.9 tok/s depending on tunnel weather;
#    anything >5% below the low edge of that band is a real regression
#    (VERDICT r4 weak-2: a 1.7x latency regression went unnoticed).
ANCHOR_MIN=${ANCHOR_MIN:-150.7}
say "1. anchor bench.py"
anchor_out=$(timeout 1200 python bench.py 2>&1 | grep '"metric"') \
    || echo "!! 1. anchor FAILED/timeout"
echo "$anchor_out"
anchor_val=$(echo "$anchor_out" | sed -n 's/.*"value": \([0-9.]*\).*/\1/p')
if [ -n "$anchor_val" ] && \
   awk -v v="$anchor_val" -v m="$ANCHOR_MIN" 'BEGIN{exit !(v<m)}'; then
    echo "!! 1. anchor REGRESSION: $anchor_val < gate $ANCHOR_MIN tok/s"
fi

# 2. Multi-step decode sweep.
for k in 4 8 16; do
    run 1200 "2. multi-step K=$k" env BENCH_DECODE_STEPS=$k python bench.py
done

# 3. (removed) The rolling fused-linears A/B: the VLLM_TPU_ROLLING gate
#    and its code path were deleted after round 3 measured it 4% slower
#    on chip — re-running the old command would just record a mislabeled
#    baseline.

# 4. KV-layout probe.
run 1200 "4. kv-layout probe" python benchmarks/kernels/probe_kv_layout.py

# 5. Breakdown refresh.
run 2400 "5. breakdown" env BENCH_BREAKDOWN=1 python bench.py

# 6. Batched + fp8 (incl. the batch-1 fp8 retry under the i8 kernel).
run 1200 "6a. batch32 bf16" env BENCH_BATCH=32 python bench.py
run 1200 "6b. batch32 fp8 block32" env BENCH_BATCH=32 BENCH_KV_DTYPE=fp8_e5m2 BENCH_BLOCK=32 python bench.py
run 1200 "6c. batch1 fp8 retry" env BENCH_KV_DTYPE=fp8_e5m2 BENCH_BLOCK=32 python bench.py

# 7. Prefill tok/s rows.
run 1200 "7a. prefill ctx512" env BENCH_PREFILL=1 BENCH_CTX=512 python bench.py
run 1200 "7b. prefill ctx2048" env BENCH_PREFILL=1 BENCH_CTX=2048 python bench.py

# 8. Serving TTFT/TPOT sweep (server + rates; own PID management).
#    Perf config = the ppl-gated defaults the headline bench uses
#    (fp8 KV + block 32 + int8 head; docs/engine_args.md decisions)
#    plus multi-step decode: the tunnel adds ~30 ms per device->host
#    fetch (round-5 RTT probe), so one dispatch per token caps TPOT at
#    ~35 ms regardless of the 6 ms device step — K=8 amortizes it.
say "8. serving sweep (fp8 KV, block 32, int8 head, K=8)"
timeout 5400 env SERVER_ARGS="--kv-cache-dtype fp8_e5m2 --block-size 32 --lm-head-dtype int8 --num-decode-steps 8" \
    benchmarks/run_serving_bench.sh "$CKPT7B" 1 2 4 \
    || echo "!! serving sweep FAILED/timeout"

# 9. Offline throughput + latency (same perf config; round-4 9b ran
#    fp8 KV at the DEFAULT block size 16 — a config never validated —
#    and recorded a 1.7x "regression"; always pass the full config).
run 3600 "9a. offline throughput" python benchmarks/benchmark_throughput.py \
    --model "$CKPT7B" --num-prompts 64 --input-len 128 --output-len 128 \
    --kv-cache-dtype fp8_e5m2 --block-size 32 --lm-head-dtype int8 \
    --num-decode-steps 8 --warmup
run 2400 "9b. latency batch8" python benchmarks/benchmark_latency.py \
    --model "$CKPT7B" --input-len 128 --output-len 64 --batch-size 8 \
    --num-iters 3 --kv-cache-dtype fp8_e5m2 --block-size 32 \
    --lm-head-dtype int8 --num-decode-steps 8

# 10. Speculative decoding bench.
run 5400 "10. spec decode" python benchmarks/benchmark_spec_decode.py \
    --target "$CKPT7B" --draft "$CKPT1B" --k 0 2 4 8 --num-tokens 128

# 11. Mixtral depth-slope cross-check at 8 true layers.
run 5400 "11. mixtral 2,4,8 layers" env MIXTRAL_LAYERS=2,4,8 \
    python benchmarks/benchmark_mixtral_decode.py

# 12. Compile-check the partials decode kernel at 7B decode shapes.
run 1200 "12. partials kernel compile" python - <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from vllm_quick_tpu.ops.paged_attention import paged_decode_attention_partials
nb, s, h, d = 64, 16, 32, 128
cache = jnp.zeros((nb, 2, h, s, d), jnp.bfloat16)
q = jnp.zeros((1, 32, d), jnp.bfloat16)
bt = jnp.asarray(np.arange(32, dtype=np.int32)[None, :])
cl = jnp.full((1,), 500, jnp.int32)
num, l, m = paged_decode_attention_partials(q, cache, bt, cl, d**-0.5)
print("partials compile OK", np.asarray(num).shape,
      float(np.asarray(l).sum()), float(np.asarray(m).max()))
EOF

say "BATTERY DONE $(date -u)"
} | tee -a "$OUT"
