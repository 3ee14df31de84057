"""Speculative-decoding benchmark: tok/s and acceptance vs K.

VERDICT r2 item 5: the feature's whole point is speed, so measure it.
For each --k, runs a warm greedy generation with the draft model and
reports decode tok/s, the measured acceptance (mean emitted tokens per
spec step is 1 + accepted drafts), and — because synthetic random
checkpoints give near-chance acceptance — the projected tok/s at
hypothetical acceptance rates from the measured per-step costs, so the
break-even acceptance is recorded alongside the raw overhead floor.

The reference stopped short of this harness (it has only the draft
half: vllm/worker/spec_decode/multi_step_worker.py:10).

Usage:
    python benchmarks/benchmark_spec_decode.py \
        --target /root/ckpts/llama7b_awq_synth \
        --draft /root/ckpts/llama1b_awq_synth --k 0 2 4 8
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")


def run_one(target, draft, k, num_tokens, input_len, max_model_len,
            block_size):
    from vllm_quick_tpu.entrypoints.llm import LLM
    from vllm_quick_tpu.sampling_params import SamplingParams

    kwargs = {}
    if k > 0:
        kwargs = dict(speculative_model=draft,
                      num_speculative_tokens=k)
    llm = LLM(model=target, max_model_len=max_model_len,
              block_size=block_size, **kwargs)
    prompt_ids = list(range(4, 4 + input_len))
    sp = SamplingParams(max_tokens=num_tokens, temperature=0.0,
                        ignore_eos=True)

    # Warm (compile) run, then timed run.
    llm.generate(prompt_token_ids=[prompt_ids], sampling_params=sp,
                 use_tqdm=False)
    worker = llm.llm_engine.worker
    em0 = getattr(worker, "emitted_tokens", 0)
    st0 = getattr(worker, "spec_steps", 0)
    t0 = time.perf_counter()
    out = llm.generate(prompt_token_ids=[prompt_ids],
                       sampling_params=sp, use_tqdm=False)
    dt = time.perf_counter() - t0
    n_out = len(out[0].outputs[0].token_ids)
    emitted = getattr(worker, "emitted_tokens", 0) - em0
    steps = getattr(worker, "spec_steps", 0) - st0

    # step_ms is cost per SPEC STEP (draft k + verify) when spec ran,
    # else per plain decode step — the quantity the projections need.
    denom = steps if steps else n_out
    row = {
        "k": k,
        "tok_s": round(n_out / dt, 2),
        "step_ms": round(dt / denom * 1e3, 2),
        "output_tokens": n_out,
    }
    if k > 0 and steps:
        # emitted per spec step = 1 + mean accepted drafts.
        row["spec_steps"] = steps
        row["tokens_per_step"] = round(emitted / steps, 3)
        row["acceptance"] = round((emitted / steps - 1) / k, 3)
    del llm, worker, out
    # Each k builds a fresh engine in the same process: force the old
    # engine's device buffers dead before the next ~11 GB allocation.
    import gc
    gc.collect()
    return row


def project(rows):
    """Projected tok/s at hypothetical acceptance from measured costs:
    spec step cost c_k (ms) emits 1 + a*k tokens at acceptance a."""
    base = next((r for r in rows if r["k"] == 0), None)
    if base is None:
        return []
    proj = []
    for r in rows:
        if r["k"] == 0 or "spec_steps" not in r:
            continue
        for a in (0.6, 0.8, 1.0):
            tok_s = (1 + a * r["k"]) / r["step_ms"] * 1e3
            proj.append({"k": r["k"], "acceptance": a,
                         "projected_tok_s": round(tok_s, 1),
                         "vs_plain": round(
                             tok_s / (1e3 / base["step_ms"]), 2)})
    return proj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", required=True)
    ap.add_argument("--draft", required=True)
    ap.add_argument("--k", type=int, nargs="+", default=[0, 2, 4])
    ap.add_argument("--num-tokens", type=int, default=128)
    ap.add_argument("--input-len", type=int, default=32)
    ap.add_argument("--max-model-len", type=int, default=1024)
    ap.add_argument("--block-size", type=int, default=16)
    args = ap.parse_args()

    rows = []
    for k in args.k:
        row = run_one(args.target, args.draft, k, args.num_tokens,
                      args.input_len, args.max_model_len,
                      args.block_size)
        print(json.dumps(row))
        rows.append(row)
    for p in project(rows):
        print(json.dumps(p))


if __name__ == "__main__":
    main()
