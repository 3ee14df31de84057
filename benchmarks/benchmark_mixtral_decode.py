"""Mixtral-8x7B INT4 decode benchmark (grouped MoE kernel).

Full Mixtral-8x7B INT4 (~23 GB) exceeds one v5e chip's 16 GB HBM, so
this measures TWO depth-reduced models at the TRUE per-layer shapes
(D=4096, F=14336, E=8, top-2, 32 heads/8 kv) and derives the per-layer
decode cost from the DEPTH SLOPE — per-step dispatch overhead (large on
tunneled dev rigs, overlapped in production serving) cancels exactly.
Reports measured tok/s at both depths, ms/layer, and the 32-layer
extrapolation.

MIXTRAL_LAYERS=<a,b> (default "2,4") sets the two depths; BENCH_BATCH
as usual. MIXTRAL_DENSE=1 benchmarks the all-experts einsum path (the
round-1 baseline) instead of the grouped kernel.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")


def run_depth(n_layers: int, batch: int, ctx_len: int) -> float:
    """Returns measured ms/step for an n_layers model."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from transformers import MixtralConfig

    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
    from vllm_quick_tpu.model_executor.models.mixtral_quant import (
        MixtralQuantForCausalLM)

    block_size = 16

    cfg = MixtralConfig(
        vocab_size=32000, hidden_size=4096, intermediate_size=14336,
        num_hidden_layers=n_layers, num_attention_heads=32,
        num_key_value_heads=8, num_local_experts=8,
        num_experts_per_tok=2, max_position_embeddings=4096,
        tie_word_embeddings=False)

    class _Q:
        method = "awq"
        group_size = 128
        desc_act = False

    model = MixtralQuantForCausalLM(cfg, quant=_Q(), dtype="bfloat16")
    params = model.init_dummy_params(seed=0)
    if os.environ.get("MIXTRAL_DENSE"):
        # Force the all-experts path by patching the token threshold.
        import vllm_quick_tpu.ops.quant_matmul as qm
        qm.FUSED_KERNEL_MAX_TOKENS = -1

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

    def _step(params, input_ids, positions, kv_caches, meta, prompt_lens):
        hidden, new_caches = model.forward(params, input_ids, positions,
                                           kv_caches, meta)
        logits = model.compute_logits(params, hidden)
        return logits, new_caches

    step = jax.jit(_step, donate_argnums=(3,))
    logits, caches = step(params, ids, positions, caches, meta, plens)
    np.asarray(logits)
    t0 = time.perf_counter()
    np.asarray(logits)
    rtt = time.perf_counter() - t0

    iters = int(os.environ.get("BENCH_ITERS", "16"))
    t0 = time.perf_counter()
    for _ in range(iters):
        logits, caches = step(params, ids, positions, caches, meta, plens)
    np.asarray(logits)
    dt = time.perf_counter() - t0 - rtt
    del params, caches
    return dt / iters * 1e3


def main():
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    ctx_len = int(os.environ.get("BENCH_CTX", "512"))
    depths = [int(x) for x in
              os.environ.get("MIXTRAL_LAYERS", "2,4").split(",")]
    assert len(depths) >= 2, "need at least two layer depths"
    ms = [run_depth(d, batch, ctx_len) for d in depths]
    # Least-squares slope over all depths (2+ points; the round-3
    # battery passed 2,4,8 and the two-value unpack crashed).
    import numpy as _np
    per_layer, fixed = _np.polyfit(_np.asarray(depths, float),
                                   _np.asarray(ms, float), 1)
    for d, m in zip(depths, ms):
        print(f"# depth {d}: {m:.3f} ms/step")
    fixed = max(fixed, 0.0)
    full_ms = fixed + 32 * per_layer
    print(json.dumps({
        "metric": "mixtral_int4_decode_tok_s_extrapolated_32layer",
        "value": round(batch * 1000.0 / full_ms, 2),
        "unit": "tokens/s",
        "measured_step_ms": {str(d): round(m, 2)
                             for d, m in zip(depths, ms)},
        "ms_per_layer": round(per_layer, 3),
        "fixed_ms": round(fixed, 2),
        "path": "dense" if os.environ.get("MIXTRAL_DENSE") else "grouped",
    }))


if __name__ == "__main__":
    main()
