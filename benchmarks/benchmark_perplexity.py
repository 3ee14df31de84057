"""Perplexity harness (the BASELINE.md accuracy metric: WikiText-2 ppl
within 0.1 of the reference CUDA kernels).

Usage:
    python benchmarks/benchmark_perplexity.py --model <dir> \
        --text wikitext2.txt [--max-len 2048] [--stride 2048]

Computes sliding-window perplexity over a local text file with the
model's full-prefill logits (no network access required: supply the
dataset file).
"""
import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import numpy as np


def compute_perplexity(model, params, token_ids, max_len=2048,
                       stride=None, block_size=16):
    """Mean NLL over all predicted positions, strided-window style
    (standard HF perplexity recipe)."""
    import jax.numpy as jnp
    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata

    stride = stride or max_len
    nll_sum = 0.0
    n_tokens = 0
    for start in range(0, max(len(token_ids) - 1, 1), stride):
        window = token_ids[start:start + max_len]
        if len(window) < 2:
            break
        l = len(window)
        num_blocks = 1 + -(-l // block_size)
        caches = [jnp.zeros(model.kv_cache_shape(num_blocks, block_size),
                            jnp.bfloat16)
                  for _ in range(model.num_layers)]
        ids = jnp.asarray([window], jnp.int32)
        pos = jnp.arange(l, dtype=jnp.int32)[None, :]
        slots = jnp.asarray(
            [[(1 + t // block_size) * block_size + t % block_size
              for t in range(l)]], jnp.int32)
        meta = InputMetadata(is_prompt=True, slot_mapping=slots,
                             prompt_lens=jnp.asarray([l], jnp.int32))
        hidden, _ = model.forward(params, ids, pos, caches, meta)
        logits = model.compute_logits(params, hidden)[0]
        logp = np.asarray(
            logits.astype(jnp.float32)
            - jnp.log(jnp.sum(jnp.exp(logits.astype(jnp.float32)),
                              axis=-1, keepdims=True)))
        # first `start and overlap` positions were already scored.
        first = 0 if start == 0 else max_len - stride
        targets = np.asarray(window[1:])
        rows = np.arange(l - 1)
        token_nll = -logp[rows, targets]
        nll_sum += float(token_nll[first:].sum())
        n_tokens += int(l - 1 - first)
        if start + max_len >= len(token_ids):
            break
    return math.exp(nll_sum / max(n_tokens, 1)), n_tokens


def compute_perplexity_decode(model, params, token_ids, max_len=256,
                              block_size=16, kv_dtype=None):
    """Teacher-forced DECODE-path perplexity: one prompt token, then
    every following token scored through the decode step (paged
    attention over the cached history). Unlike the prefill harness
    above, this exercises the KV-cache dtype (fp8_e5m2 store +
    in-kernel load-convert) and the decode attention kernel — the
    numerics the fp8-KV accuracy gate must bound (reference
    counterpart: csrc/quantization/fp8_e5m2_kvcache/quant_utils.cuh).
    """
    import jax.numpy as jnp
    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata

    kv_dtype = kv_dtype or jnp.bfloat16
    ids = token_ids[:max_len]
    l = len(ids)
    assert l >= 2
    nb = 1 + -(-l // block_size)
    caches = [jnp.zeros(model.kv_cache_shape(nb, block_size), kv_dtype)
              for _ in range(model.num_layers)]
    bt = jnp.asarray([1 + np.arange(nb - 1, dtype=np.int32)])

    # Prompt = first token only.
    meta0 = InputMetadata(
        is_prompt=True,
        slot_mapping=jnp.asarray([[block_size]], jnp.int32),
        prompt_lens=jnp.asarray([1], jnp.int32))
    hidden, caches = model.forward(params, jnp.asarray([[ids[0]]],
                                                       jnp.int32),
                                   jnp.asarray([[0]], jnp.int32),
                                   caches, meta0)
    logp_rows = [np.asarray(_log_softmax_row(
        model.compute_logits(params, hidden[:, -1])))]

    for t in range(1, l - 1):
        meta = InputMetadata(
            is_prompt=False,
            slot_mapping=jnp.asarray(
                [(1 + t // block_size) * block_size + t % block_size],
                jnp.int32),
            context_lens=jnp.asarray([t + 1], jnp.int32),
            block_tables=bt)
        hidden, caches = model.forward(
            params, jnp.asarray([ids[t]], jnp.int32),
            jnp.asarray([t], jnp.int32), caches, meta)
        logp_rows.append(np.asarray(_log_softmax_row(
            model.compute_logits(params, hidden))))

    nll = 0.0
    for t in range(l - 1):
        nll += float(-logp_rows[t][0, ids[t + 1]])
    return math.exp(nll / (l - 1)), l - 1


def _log_softmax_row(logits):
    import jax.numpy as jnp
    x = logits.astype(jnp.float32)
    return x - jnp.log(jnp.sum(jnp.exp(x), axis=-1, keepdims=True))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--text", type=str, default=None,
                        help="Plain-text dataset file (e.g. WikiText-2 "
                        "test split concatenated).")
    parser.add_argument("--max-len", type=int, default=2048)
    parser.add_argument("--stride", type=int, default=None)
    args = parser.parse_args()

    from vllm_quick_tpu.config import ModelConfig
    from vllm_quick_tpu.model_executor.model_loader import get_model
    from vllm_quick_tpu.transformers_utils.tokenizer import get_tokenizer

    model_dir = args.model
    if model_dir is None:
        from tests.utils import make_tiny_llama_dir
        model_dir = make_tiny_llama_dir()

    mc = ModelConfig(model=model_dir, dtype="bfloat16")
    model, params = get_model(mc)
    tokenizer = get_tokenizer(model_dir)

    if args.text:
        with open(args.text) as f:
            text = f.read()
    else:
        text = ("The quick brown fox jumps over the lazy dog. " * 200)
    token_ids = tokenizer(text).input_ids

    ppl, n = compute_perplexity(model, params, token_ids,
                                max_len=args.max_len, stride=args.stride)
    print(f"perplexity: {ppl:.4f} over {n} tokens "
          f"(model={model_dir}, max_len={args.max_len})")


if __name__ == "__main__":
    main()
