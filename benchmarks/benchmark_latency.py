"""Batch-of-N decode latency benchmark (reference parity:
benchmarks/benchmark_latency.py:14-40 — single batch, percentiles,
optional profiler trace).

Usage:
    python benchmarks/benchmark_latency.py --model <dir> \
        [--batch-size 8] [--input-len 32] [--output-len 128] \
        [--num-iters 3] [--profile]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import numpy as np


def main(args):
    from vllm_quick_tpu import LLM, SamplingParams

    model = args.model
    if model is None:
        from tests.utils import make_tiny_llama_dir
        model = make_tiny_llama_dir()

    llm = LLM(model=model, tokenizer=args.tokenizer,
              quantization=args.quantization,
              tensor_parallel_size=args.tensor_parallel_size,
              dtype=args.dtype, enforce_eager=args.enforce_eager,
              kv_cache_dtype=args.kv_cache_dtype,
              block_size=args.block_size,
              lm_head_dtype=args.lm_head_dtype,
              num_decode_steps=args.num_decode_steps,
              disable_log_stats=True)

    sampling_params = SamplingParams(
        n=args.n,
        temperature=0.0 if args.use_beam_search else 1.0,
        top_p=1.0,
        use_beam_search=args.use_beam_search,
        ignore_eos=True,
        max_tokens=args.output_len,
    )
    dummy_prompt_token_ids = np.random.randint(
        10, 100, size=(args.batch_size, args.input_len)).tolist()

    def run_to_completion(profile_dir=None):
        if profile_dir:
            import jax
            jax.profiler.start_trace(profile_dir)
        start = time.perf_counter()
        llm.generate(prompt_token_ids=dummy_prompt_token_ids,
                     sampling_params=sampling_params, use_tqdm=False)
        end = time.perf_counter()
        if profile_dir:
            import jax
            jax.profiler.stop_trace()
        return end - start

    print("Warming up...")
    run_to_completion()

    if args.profile:
        profile_dir = args.profile_result_dir or "vllm_benchmark_result"
        print(f"Profiling (results to {profile_dir})...")
        run_to_completion(profile_dir=profile_dir)
        return

    latencies = []
    for _ in range(args.num_iters):
        latencies.append(run_to_completion())
    latencies = np.asarray(latencies)
    tok_s = args.batch_size * args.output_len / latencies.mean()
    print(f"Avg latency: {latencies.mean():.3f} s")
    print(f"P50/P90/P99: {np.percentile(latencies, 50):.3f} / "
          f"{np.percentile(latencies, 90):.3f} / "
          f"{np.percentile(latencies, 99):.3f} s")
    print(f"Decode throughput: {tok_s:.1f} tok/s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark the latency of one batch of requests.")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--quantization", choices=["awq", "gptq",
                                                   "squeezellm", None],
                        default=None)
    parser.add_argument("--tensor-parallel-size", "-tp", type=int,
                        default=1)
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--use-beam-search", action="store_true")
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--enforce-eager", action="store_true")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--lm-head-dtype", type=str, default="auto")
    parser.add_argument("--num-decode-steps", type=int, default=1,
                        help="decode tokens per device dispatch; "
                        "amortizes the per-dispatch host round trip")
    parser.add_argument("--profile", action="store_true")
    parser.add_argument("--profile-result-dir", type=str, default=None)
    main(parser.parse_args())
