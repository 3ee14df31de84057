"""Online serving benchmark (reference parity:
benchmarks/benchmark_serving.py:40-50 — request-rate sweep against a
running server; reports request/input/output throughput and
mean/median/p99 TTFT + TPOT).

Launch a server first, e.g.:
    python -m vllm_quick_tpu.entrypoints.openai.api_server --model <dir>
then:
    python benchmarks/benchmark_serving.py --model <dir> \
        --num-prompts 64 --request-rate 4
"""
import argparse
import asyncio
import json
import os
import random
import sys
import time
from dataclasses import dataclass, field
from typing import List

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import aiohttp
import numpy as np


@dataclass
class BenchmarkMetrics:
    completed: int = 0
    total_input: int = 0
    total_output: int = 0
    ttfts: List[float] = field(default_factory=list)
    tpots: List[float] = field(default_factory=list)
    latencies: List[float] = field(default_factory=list)


_errors: List[str] = []


async def send_request(session, url, model, prompt, output_len, metrics):
    payload = {
        "model": model,
        "prompt": prompt,
        "max_tokens": output_len,
        "temperature": 0.0,
        "ignore_eos": True,
        "stream": True,
    }
    start = time.perf_counter()
    first_token_time = None
    n_chunks = 0
    try:
        async with session.post(url, json=payload) as resp:
            if resp.status != 200:
                _errors.append(f"HTTP {resp.status}: "
                               f"{(await resp.text())[:200]}")
                return
            async for line in resp.content:
                line = line.decode().strip()
                if not line.startswith("data: ") or line == "data: [DONE]":
                    continue
                if first_token_time is None:
                    first_token_time = time.perf_counter()
                n_chunks += 1
    except (aiohttp.ClientError, asyncio.TimeoutError) as e:
        # One dropped stream must not sink the whole sweep — count it
        # and keep the surviving samples (a round-4 engine death turned
        # an entire battery step into a stack trace with no metrics).
        _errors.append(f"{type(e).__name__}: {e}")
        return
    end = time.perf_counter()
    if first_token_time is None:
        return
    metrics.completed += 1
    metrics.total_output += output_len
    metrics.ttfts.append(first_token_time - start)
    if output_len > 1:
        metrics.tpots.append((end - first_token_time)
                             / max(output_len - 1, 1))
    metrics.latencies.append(end - start)


async def run(args):
    rng = random.Random(0)
    # Token-id prompts (the completions API accepts List[int]): the
    # only way --input-len means what it says. The previous word-soup
    # strings ("123 456 ...") tokenized to ~3.5x the requested length
    # (each 3-digit number is 2-4 Llama tokens), silently inflating KV
    # demand past capacity and putting every sweep into a
    # preemption-thrash regime (round 4: 35 blocks/seq for "128-token"
    # prompts, decode at 2 tok/s/seq).
    prompts = [[rng.randint(10, 999) for _ in range(args.input_len)]
               for _ in range(args.num_prompts)]

    url = f"http://{args.host}:{args.port}/v1/completions"
    metrics = BenchmarkMetrics()
    start = time.perf_counter()
    async with aiohttp.ClientSession(
            timeout=aiohttp.ClientTimeout(total=3600)) as session:
        tasks = []
        for prompt in prompts:
            tasks.append(asyncio.create_task(send_request(
                session, url, args.model, prompt, args.output_len,
                metrics)))
            if args.request_rate != float("inf"):
                await asyncio.sleep(
                    rng.expovariate(args.request_rate))
        await asyncio.gather(*tasks)
    elapsed = time.perf_counter() - start

    if not metrics.completed:
        detail = f" last error: {_errors[-1]}" if _errors else ""
        raise SystemExit("no request completed — is the OpenAI server "
                         f"(/v1/completions) running on {url}?{detail}")
    if _errors:
        print(f"warning: {len(_errors)} request(s) failed; last: "
              f"{_errors[-1]}", file=sys.stderr)
    print(json.dumps({
        "completed": metrics.completed,
        "errors": len(_errors),
        "duration_s": round(elapsed, 2),
        "request_throughput": round(metrics.completed / elapsed, 3),
        "output_tok_s": round(metrics.total_output / elapsed, 1),
        "mean_ttft_s": round(float(np.mean(metrics.ttfts)), 4),
        "median_ttft_s": round(float(np.median(metrics.ttfts)), 4),
        "p99_ttft_s": round(float(np.percentile(metrics.ttfts, 99)), 4),
        "mean_tpot_s": round(float(np.mean(metrics.tpots)), 4)
        if metrics.tpots else None,
        "p99_tpot_s": round(float(np.percentile(metrics.tpots, 99)), 4)
        if metrics.tpots else None,
    }))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Benchmark online serving TTFT/TPOT/throughput.")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model", type=str, required=True)
    parser.add_argument("--num-prompts", type=int, default=64)
    parser.add_argument("--input-len", type=int, default=64)
    parser.add_argument("--output-len", type=int, default=64)
    parser.add_argument("--request-rate", type=float,
                        default=float("inf"),
                        help="Poisson arrival rate (req/s); inf = all "
                        "at once.")
    asyncio.run(run(parser.parse_args()))
