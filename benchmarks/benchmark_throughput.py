"""Offline throughput benchmark (reference parity:
benchmarks/benchmark_throughput.py:14-58 — ShareGPT-sampled or
synthetic requests -> tokens/s).

Usage:
    python benchmarks/benchmark_throughput.py --model <dir> \
        [--dataset sharegpt.json] [--num-prompts 100] \
        [--input-len 128 --output-len 128]
"""
import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")


def sample_requests(dataset_path, num_requests, tokenizer,
                    fixed_input_len=None, fixed_output_len=None):
    """(prompt_token_ids, output_len) pairs: ShareGPT-style JSON when
    provided, synthetic otherwise (reference :14-58)."""
    if dataset_path is None:
        rng = random.Random(0)
        return [
            ([rng.randint(10, 1000) for _ in range(fixed_input_len)],
             fixed_output_len)
            for _ in range(num_requests)
        ]
    with open(dataset_path) as f:
        dataset = json.load(f)
    dataset = [d for d in dataset if len(d.get("conversations", [])) >= 2]
    rng = random.Random(0)
    rng.shuffle(dataset)
    requests = []
    for d in dataset:
        if len(requests) == num_requests:
            break
        prompt = d["conversations"][0]["value"]
        completion = d["conversations"][1]["value"]
        prompt_ids = tokenizer(prompt).input_ids
        output_len = fixed_output_len or len(
            tokenizer(completion).input_ids)
        if len(prompt_ids) < 4 or output_len < 4:
            continue
        if len(prompt_ids) + output_len > 2048:
            continue
        requests.append((prompt_ids, output_len))
    return requests


def main(args):
    from vllm_quick_tpu import LLM, SamplingParams

    model = args.model
    if model is None:
        from tests.utils import make_tiny_llama_dir
        model = make_tiny_llama_dir()

    llm = LLM(model=model, tokenizer=args.tokenizer,
              quantization=args.quantization,
              tensor_parallel_size=args.tensor_parallel_size,
              dtype=args.dtype, max_model_len=args.max_model_len,
              enforce_eager=args.enforce_eager,
              kv_cache_dtype=args.kv_cache_dtype,
              block_size=args.block_size,
              lm_head_dtype=args.lm_head_dtype,
              num_decode_steps=args.num_decode_steps,
              disable_log_stats=True)

    requests = sample_requests(args.dataset, args.num_prompts,
                               llm.get_tokenizer(), args.input_len,
                               args.output_len)

    if args.warmup:
        # Untimed pass over a small slice of the workload: walks the
        # prefill/decode buckets so the timed window below measures
        # steady-state execution, not XLA compilation (reference
        # counterpart: CUDA-graph capture before serving,
        # vllm/worker/model_runner.py:658-737). With the persistent
        # compilation cache this also warms future processes.
        # v2: warm with the FULL prompt set at a tiny output length, so
        # the timed window's actual buckets compile here — every prefill
        # bucket the workload hits AND the max-concurrency decode bucket
        # (v1 warmed only a 1/8 slice, which compiles the batch-8 bucket
        # and leaves the batch-64 decode + large prefill compiles inside
        # the timed window; battery r5-8 measured that as a 13x gap).
        k = max(1, args.num_decode_steps)
        for i, (prompt_ids, output_len) in enumerate(requests):
            # Numeric ids: LLM._drain orders results by int(request_id).
            llm.llm_engine.add_request(
                str(1_000_000 + i), None,
                SamplingParams(n=args.n, temperature=1.0, top_p=1.0,
                               ignore_eos=True,
                               max_tokens=min(output_len, k + 1)),
                prompt_ids)
        llm._drain(use_tqdm=False)

    for i, (prompt_ids, output_len) in enumerate(requests):
        llm.llm_engine.add_request(
            str(i), None,
            SamplingParams(n=args.n, temperature=1.0, top_p=1.0,
                           ignore_eos=True, max_tokens=output_len),
            prompt_ids)

    start = time.perf_counter()
    outputs = llm._drain(use_tqdm=True)
    elapsed = time.perf_counter() - start

    total_in = sum(len(p) for p, _ in requests)
    total_out = sum(len(o.token_ids) for out in outputs
                    for o in out.outputs)
    print(f"Throughput: {len(requests) / elapsed:.2f} requests/s, "
          f"{(total_in + total_out) / elapsed:.1f} total tok/s, "
          f"{total_out / elapsed:.1f} output tok/s")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark offline serving throughput.")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--tokenizer", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None,
                        help="ShareGPT-format JSON; synthetic if unset.")
    parser.add_argument("--num-prompts", type=int, default=64)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--quantization", choices=["awq", "gptq",
                                                   "squeezellm", None],
                        default=None)
    parser.add_argument("--tensor-parallel-size", "-tp", type=int,
                        default=1)
    parser.add_argument("--dtype", type=str, default="auto")
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--enforce-eager", action="store_true")
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--lm-head-dtype", type=str, default="auto")
    parser.add_argument("--num-decode-steps", type=int, default=1,
                        help="decode tokens per device dispatch; "
                        "amortizes the per-dispatch host round trip")
    parser.add_argument("--warmup", action="store_true",
                        help="run an untimed bucket-warming pass first")
    main(parser.parse_args())
