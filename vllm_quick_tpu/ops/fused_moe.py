"""Mixture-of-experts compute (reference parity:
vllm/model_executor/layers/fused_moe.py:11-327 + csrc/moe kernels).

TPU-native restatement: instead of the reference's token-sorting
(`moe_align_block_size`) + Triton grouped GEMM, experts are evaluated
with *batched einsums over the stacked expert weights* — dense [E, D, F]
operands keep the MXU fully tiled with static shapes, and the top-k
gate mask zeroes non-selected (token, expert) pairs. At Mixtral scale
(E=8, top-2) this trades a bounded 4x FLOP overhead for zero dynamic
shapes; the planned Pallas grouped-GEMM (scalar-prefetched expert ids
per tile) will remove that overhead for prefill-sized batches.

Expert parallelism: expert stacks are sharded over the ``ep`` mesh axis
(each rank holds E/ep experts and computes only their contribution);
tensor parallelism column/row-shards each expert's F dim over ``tp``.
One psum over (ep, tp) combines both partial sums.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_quick_tpu.parallel.mesh import ParallelContext


def moe_routing(router_logits: jax.Array, top_k: int,
                renormalize: bool = True) -> jax.Array:
    """Full gate matrix [T, E]: softmax routing weights with only the
    top-k experts per token non-zero (fused_moe.py:213 top-k semantics,
    matching HF Mixtral: softmax -> top-k -> renormalize)."""
    weights = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(weights, top_k)
    if renormalize:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    num_experts = router_logits.shape[-1]
    # Scatter the kept weights back to a dense [T, E] mask.
    onehot = jax.nn.one_hot(top_i, num_experts,
                            dtype=top_w.dtype)       # [T, k, E]
    return jnp.einsum("tk,tke->te", top_w, onehot)


def fused_moe(
    x: jax.Array,              # [T, D]
    gate_full: jax.Array,      # [T, E_total] dense routing weights
    w13: jax.Array,            # [E_local, D, 2*F_local] (gate|up stacked)
    w2: jax.Array,             # [E_local, F_local, D]
    ctx: ParallelContext = ParallelContext(),
    shared_out: Optional[jax.Array] = None,
) -> jax.Array:
    """Gated-SiLU expert FFN + weighted combine; psum over (ep, tp)."""
    dtype = x.dtype
    e_local = w13.shape[0]
    if ctx.ep_size > 1:
        off = jax.lax.axis_index(ctx.ep_axis) * e_local
        gate = jax.lax.dynamic_slice_in_dim(gate_full, off, e_local,
                                            axis=1)
    else:
        gate = gate_full[:, :e_local]
    # [E, T, 2F] -> gated -> [E, T, F]
    h = jnp.einsum("td,edf->etf", x, w13,
                   preferred_element_type=jnp.float32).astype(dtype)
    g, u = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(g.astype(jnp.float32)).astype(dtype) * u
    y = jnp.einsum("etf,efd->etd", h, w2,
                   preferred_element_type=jnp.float32)   # [E, T, D] f32
    out = jnp.einsum("te,etd->td", gate.astype(jnp.float32), y)
    out = out.astype(dtype)
    if shared_out is not None:
        out = out + shared_out
    # Partial over ep (local experts) and tp (row-sharded w2).
    axes = []
    if ctx.ep_size > 1:
        axes.append(ctx.ep_axis)
    if ctx.tp_size > 1:
        axes.append(ctx.tp_axis)
    if axes:
        out = jax.lax.psum(out, tuple(axes))
    return out
