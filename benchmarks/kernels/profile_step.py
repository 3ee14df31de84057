"""Decode-step composition probe: times the full jitted step and its
isolated pieces (quant-GEMM chain, attention+KV, lm_head) so the
residual "glue" (norms, RoPE, reshapes, scatter writes, embed) can be
attributed. Timing is fetch-drained (tunnel-safe, see bench.py).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/kernels/profile_step.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=16, cache_arg=None):
    """Times fn; if cache_arg is set, fn's second output is the updated
    cache pytree that must be threaded back into that positional arg
    (donated buffers can't be reused)."""
    args = list(args)

    def call():
        out = fn(*args)
        if cache_arg is not None:
            args[cache_arg] = out[1]
        return out

    out = call()
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)
    t0 = time.perf_counter()
    np.asarray(leaf)
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = call()
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    return (time.perf_counter() - t0 - rtt) / iters


def main():
    from transformers import LlamaConfig
    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
    from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
    from vllm_quick_tpu.ops.paged_attention import paged_decode_attention
    from vllm_quick_tpu.ops.cache_ops import reshape_and_cache
    from vllm_quick_tpu.ops.quant_matmul import quant_matmul
    import bench

    cfg = LlamaConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=11008,
        num_hidden_layers=32, num_attention_heads=32,
        num_key_value_heads=32, max_position_embeddings=4096,
        rms_norm_eps=1e-6, tie_word_embeddings=False)

    class _Q:
        method = "awq"
        group_size = 128
        desc_act = False

    model = LlamaForCausalLM(cfg, quant=_Q(), dtype="bfloat16")
    params = bench.build_7b_params(model)

    batch = int(os.environ.get("BENCH_BATCH", "1"))
    ctx_len = 512
    block_size = 16
    blocks_per_seq = -(-ctx_len // block_size)
    num_blocks = 1 + batch * blocks_per_seq
    shape = model.kv_cache_shape(num_blocks, block_size)
    caches = [jnp.zeros(shape, jnp.bfloat16)
              for _ in range(model.num_layers)]

    bt = np.zeros((batch, blocks_per_seq), np.int32)
    for i in range(batch):
        bt[i] = 1 + i * blocks_per_seq + np.arange(blocks_per_seq)
    pos = ctx_len - 1
    slots = bt[:, pos // block_size] * block_size + pos % block_size
    meta = InputMetadata(
        is_prompt=False,
        slot_mapping=jnp.asarray(slots.astype(np.int32)),
        context_lens=jnp.full((batch,), ctx_len, jnp.int32),
        block_tables=jnp.asarray(bt))
    ids = jnp.zeros((batch,), jnp.int32)
    positions = jnp.full((batch,), pos, jnp.int32)
    plens = jnp.zeros((batch,), jnp.int32)

    # 1) full step
    def _step(params, ids, positions, caches, meta, plens):
        hidden, new_caches = model.forward(params, ids, positions,
                                           caches, meta)
        return model.compute_logits(params, hidden), new_caches

    step = jax.jit(_step, donate_argnums=(3,))
    dt_full = timed(step, params, ids, positions, caches, meta, plens,
                    cache_arg=3)

    # 2) GEMM chain only: the 4 quantized matmuls x 32 layers
    layer_ws = params["layers"]

    @jax.jit
    def gemm_chain(h, layers):
        for lw in layers:
            qkv = quant_matmul(h, lw["qkv"].qw)
            a = qkv[..., :model.hidden_size]
            o = quant_matmul(a, lw["o"].qw)
            gu = quant_matmul(h, lw["gate_up"].qw)
            g, u = jnp.split(gu, 2, axis=-1)
            h = h + quant_matmul(g * u, lw["down"].qw)
        return h

    h0 = jnp.zeros((batch, model.hidden_size), jnp.bfloat16)
    dt_gemm = timed(gemm_chain, h0, layer_ws)

    # 3) attention + KV write only, 32 layers
    @functools.partial(jax.jit, donate_argnums=(3,))
    def attn_chain(q, k, v, caches, slots, bt, cl):
        outs = q
        new = []
        for c in caches:
            c = reshape_and_cache(k, v, c, slots)
            outs = paged_decode_attention(outs, c, bt, cl,
                                          scale=model.head_dim**-0.5)
            outs = outs.astype(jnp.bfloat16)
            new.append(c)
        return outs, new

    qh = jnp.zeros((batch, model.num_heads, model.head_dim), jnp.bfloat16)
    kh = jnp.zeros((batch, model.num_kv_heads, model.head_dim),
                   jnp.bfloat16)
    caches2 = [jnp.zeros(shape, jnp.bfloat16)
               for _ in range(model.num_layers)]
    dt_attn = timed(attn_chain, qh, kh, kh, caches2, meta.slot_mapping,
                    meta.block_tables, meta.context_lens, cache_arg=3)

    # 4) lm_head matmul only
    @jax.jit
    def lm_head(h, w):
        return h.astype(jnp.bfloat16) @ w

    dt_head = timed(lm_head, h0, params["lm_head"])

    glue = dt_full - dt_gemm - dt_attn - dt_head
    print(f"batch={batch} ctx={ctx_len}")
    print(f"full step : {dt_full*1e3:7.2f} ms   ({1/dt_full*batch:.1f} tok/s)")
    print(f"gemm chain: {dt_gemm*1e3:7.2f} ms   "
          f"({3.36e9/dt_gemm/1e9:.0f} GB/s wt)")
    print(f"attn+KV   : {dt_attn*1e3:7.2f} ms")
    print(f"lm_head   : {dt_head*1e3:7.2f} ms   "
          f"({4096*32000*2/dt_head/1e9:.0f} GB/s)")
    print(f"glue      : {glue*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
