#!/bin/bash
# One-command serving benchmark: start the OpenAI server on the given
# checkpoint, wait for health (first TPU compile can take minutes),
# sweep request rates with benchmark_serving.py, then kill the exact
# server PID (never pattern-kill).
#
# Usage: benchmarks/run_serving_bench.sh [model-dir] [rates...]
set -u
MODEL=${1:-/root/ckpts/llama7b_awq_synth}
shift || true
RATES=${@:-"1 2 4"}
PORT=${PORT:-8421}
LOG=${LOG:-/tmp/serving_bench_server.log}
export PYTHONPATH=/root/repo:/root/.axon_site

python -m vllm_quick_tpu.entrypoints.openai.api_server \
    --model "$MODEL" --max-model-len 2048 --port "$PORT" \
    ${SERVER_ARGS:-} > "$LOG" 2>&1 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null' EXIT

for i in $(seq 1 120); do
    if curl -sf "localhost:$PORT/health" > /dev/null; then
        break
    fi
    if ! kill -0 $SERVER_PID 2>/dev/null; then
        echo "server died; tail of $LOG:" >&2
        tail -20 "$LOG" >&2
        exit 1
    fi
    sleep 10
done
curl -sf "localhost:$PORT/health" > /dev/null || {
    echo "server never became healthy; tail of $LOG:" >&2
    tail -20 "$LOG" >&2
    exit 1
}

# Warm the compile caches before timed runs: an untimed burst at the
# sweep's own input length walks the prefill batch buckets (1..32) and
# the decode buckets the timed rates will hit — through the tunnel a
# single new-bucket compile is minutes, which would otherwise land in
# the middle of a timed TTFT sample (round-4 first sweep: mean TTFT
# 17.8 s, all compile).
echo "== warm burst (untimed) =="
python benchmarks/benchmark_serving.py --model "$MODEL" --port "$PORT" \
    --num-prompts 48 --input-len 128 --output-len 16 --request-rate 1000 \
    2>&1 | tail -2
# A second, paced warm pass: low rates produce SINGLETON prefill
# buckets (1/2/4-prompt batches) the burst never compiles — without
# this, the first timed low-rate samples eat multi-minute compiles.
echo "== warm paced (untimed) =="
python benchmarks/benchmark_serving.py --model "$MODEL" --port "$PORT" \
    --num-prompts 24 --input-len 128 --output-len 32 --request-rate 2 \
    2>&1 | tail -2

for rate in $RATES; do
    echo "== request rate $rate =="
    python benchmarks/benchmark_serving.py --model "$MODEL" \
        --port "$PORT" --num-prompts 64 --input-len 128 \
        --output-len 128 --request-rate "$rate"
done

kill $SERVER_PID 2>/dev/null
wait $SERVER_PID 2>/dev/null
