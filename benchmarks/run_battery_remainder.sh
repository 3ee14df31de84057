#!/bin/bash
# Trimmed remainder of the round-3 on-chip battery, reordered by
# evidence value (serving/spec/mixtral first) so a hard wall-clock stop
# still leaves the VERDICT-requested numbers recorded.
# Usage: nohup env CKPTS=/tmp/ckpts benchmarks/run_battery_remainder.sh &
set -u -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${OUT:-/root/repo/benchmarks/BATTERY_RESULTS.txt}
CKPTS=${CKPTS:-/tmp/ckpts}
CKPT7B=$CKPTS/llama7b_awq_synth
CKPT1B=$CKPTS/llama1b_awq_synth

say() { echo; echo "#### $* [$(date -u +%H:%M:%S)]"; }
run() { # run <timeout-s> <label> cmd...
    local t=$1 label=$2; shift 2
    say "$label"
    timeout "$t" "$@" 2>&1 \
        | { grep -v -E "WARN|INFO|absl|libtpu|oneDNN|cudart|torch_dtype" \
            || [ $? -eq 1 ]; } \
        || echo "!! $label FAILED/timeout"
}

{
say "REMAINDER START $(date -u)"

# Serving TTFT/TPOT (VERDICT item 3) — one rate sweep, small prompt set.
say "S1. serving sweep"
timeout 2700 benchmarks/run_serving_bench.sh "$CKPT7B" 2 inf \
    || echo "!! serving sweep FAILED/timeout"

# Offline throughput (VERDICT item 3).
run 1800 "S2. offline throughput" python benchmarks/benchmark_throughput.py \
    --model "$CKPT7B" --num-prompts 32 --input-len 128 --output-len 128

# Spec decode acceptance/projections (VERDICT item 5).
run 2700 "S3. spec decode" python benchmarks/benchmark_spec_decode.py \
    --target "$CKPT7B" --draft "$CKPT1B" --k 0 4 8 --num-tokens 64

# Mixtral depth-slope cross-check at 8 true layers (VERDICT weak 3).
run 2700 "S4. mixtral 2,4,8 layers" env MIXTRAL_LAYERS=2,4,8 \
    python benchmarks/benchmark_mixtral_decode.py

# Latency percentiles (was S9; promoted ahead of the re-run rows so a
# wall-clock-limited pass captures the still-missing measurement first).
run 1800 "S9. latency batch8" python benchmarks/benchmark_latency.py \
    --model "$CKPT7B" --input-len 128 --output-len 64 --batch-size 8 \
    --num-iters 3

# S5-S8 (prefill ctx512/2048, fp8 batch-1 retry, batch-32 fp8) were
# dropped: BATTERY_RESULTS.txt already records them as completed
# (7a/7b/6c/6b); re-running duplicates ~80 min of chip time.

# Compile-check the partials decode kernel at 7B decode shapes.
run 1200 "S10. partials kernel compile" python - <<'EOF'
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

say "REMAINDER DONE $(date -u)"
} | tee -a "$OUT"
