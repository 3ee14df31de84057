"""Vocab embedding / LM head.

Reference parity: vllm/model_executor/layers/vocab_parallel_embedding.py
(vocab sharded over TP ranks, padded to 64; masked lookup + all-reduce).
On TPU the embedding table is sharded over the tp mesh axis; the masked
lookup + psum happens inside shard_map via ParallelContext.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_quick_tpu.parallel.mesh import ParallelContext

VOCAB_PAD_TO = 64


def pad_vocab_size(vocab_size: int, pad_to: int = VOCAB_PAD_TO) -> int:
    return -(-vocab_size // pad_to) * pad_to


def embed(weight: jax.Array, input_ids: jax.Array,
          ctx: ParallelContext = ParallelContext()) -> jax.Array:
    """weight: [V_local, E] (this rank's vocab shard); ids are global."""
    if ctx.tp_size == 1:
        return weight[input_ids]
    v_local = weight.shape[0]
    start = ctx.tp_rank() * v_local
    local_ids = input_ids - start
    in_range = (local_ids >= 0) & (local_ids < v_local)
    local_ids = jnp.clip(local_ids, 0, v_local - 1)
    out = weight[local_ids]
    out = jnp.where(in_range[..., None], out, 0)
    return ctx.tp_all_reduce(out)


def unembed(hidden: jax.Array, lm_head_weight: jax.Array,
            vocab_size: int,
            ctx: ParallelContext = ParallelContext(),
            bias: Optional[jax.Array] = None) -> jax.Array:
    """Logits = hidden @ W_local [E, V_local]; gathered across TP ranks
    (the reference's driver-side gather, sampler.py:38-48). Decode-time
    M is tiny, so the matmul goes through the streaming Pallas kernel
    (ops/dense_matmul.py) — XLA's batch-1 matvec runs ~6x under the
    HBM copy rate on this part."""
    if isinstance(lm_head_weight, dict):
        # int8 PTQ'd head ({"wi8", "s"}, layers/…/quantize_lm_head_i8):
        # halves the last large bf16 stream in the decode step.
        from vllm_quick_tpu.ops.dense_matmul import dense_matmul_small_m_i8
        logits = dense_matmul_small_m_i8(hidden, lm_head_weight["wi8"],
                                         lm_head_weight["s"],
                                         out_dtype=jnp.float32)
    else:
        from vllm_quick_tpu.ops.dense_matmul import dense_matmul_small_m
        logits = dense_matmul_small_m(hidden, lm_head_weight,
                                      out_dtype=jnp.float32)
    if bias is not None:
        logits = logits + bias
    logits = ctx.tp_all_gather(logits, axis=-1)
    return logits[..., :vocab_size]
