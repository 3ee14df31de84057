"""Mixture-of-experts compute (reference parity:
vllm/model_executor/layers/fused_moe.py:11-327 + csrc/moe kernels).

Three TPU-native paths replace the reference's token-sorting
(`moe_align_block_size`) + Triton grouped GEMM:

* **Quantized decode** (the Mixtral-INT4 hot path): a Pallas grouped
  GEMM over *stacked* packed expert weights with scalar-prefetched
  expert ids — grid dimension ``s`` walks the batch's selected-expert
  slots and the BlockSpec index map picks each slot's weight tiles
  straight out of HBM, so a batch touching U unique experts streams
  exactly U experts' bytes (the dense einsum would read all E: the 4x
  overhead the round-1 review flagged).
* **Dense small-batch**: batched einsum over the stacked expert
  weights with a top-k gate mask — static shapes, full MXU tiles.
* **Dense/dequantized prefill**: same einsum; at prefill token counts
  the FLOPs, not weight bytes, dominate and XLA tiles it well.

Expert parallelism: expert stacks are sharded over the ``ep`` mesh axis
(each rank holds E/ep experts and computes only their contribution);
tensor parallelism column/row-shards each expert's F dim over ``tp``.
One psum over (ep, tp) combines both partial sums.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_quick_tpu.ops.quant_formats import (EFF_GROUP, SUPERBLOCK,
                                              QuantizedWeight)
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


def topk_routing(router_logits: jax.Array, top_k: int,
                 renormalize: bool = True
                 ) -> Tuple[jax.Array, jax.Array]:
    """(weights [T, k], expert_ids [T, k]) — softmax -> top-k
    (-> renormalize), HF-Mixtral semantics."""
    weights = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(weights, top_k)
    if renormalize:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return top_w, top_i


def build_expert_slots(top_w: jax.Array, top_i: jax.Array,
                       num_experts: int
                       ) -> Tuple[jax.Array, jax.Array]:
    """Compact the batch's routed experts into S = min(E, T*k) slots.

    Returns (sel [S] expert ids, gates [S, T] combine weights). Experts
    actually hit by the batch occupy the leading slots; dead slots
    duplicate the last live expert with a zero gate — they re-stream at
    most the slot-bound's worth of weight tiles, keeping total weight
    traffic <= min(E, T*k) experts (never worse than the dense path).
    """
    t, k = top_i.shape
    s_max = min(num_experts, t * k)
    hit = jnp.zeros((num_experts,), jnp.bool_).at[
        top_i.reshape(-1)].set(True, mode="drop")
    order = jnp.argsort(~hit, stable=True)       # live experts first
    count = jnp.maximum(jnp.sum(hit.astype(jnp.int32)), 1)
    slot = jnp.minimum(jnp.arange(s_max), count - 1)
    sel = order[slot].astype(jnp.int32)          # [S]
    # Dense [T, E] gate matrix, then gather the slot columns.
    onehot = jax.nn.one_hot(top_i, num_experts, dtype=top_w.dtype)
    dense = jnp.einsum("tk,tke->te", top_w, onehot)      # [T, E]
    gates = dense[:, sel].T                               # [S, T]
    live = (jnp.arange(s_max) < count)[:, None]
    return sel, jnp.where(live, gates, 0.0)


def _moe_qmm_kernel(sel_ref, x_ref, g_ref, p_ref, s_ref, z_ref, o_ref,
                    acc_e, acc_t, *, tile_k: int, combine: bool):
    """Grouped INT4 (i8pair) dequant+matmul over expert slots.

    combine=False: per-slot output [S, T, N] (first MoE matmul).
    combine=True:  gate-weighted sum over slots -> [T, N] (second).
    Same superblock math as ops/quant_matmul._decode_kernel_i8pair.
    """
    s = pl.program_id(1)
    k_idx = pl.program_id(2)

    @pl.when(k_idx == 0)
    def _init_e():
        acc_e[:] = jnp.zeros_like(acc_e)

    if combine:
        @pl.when(jnp.logical_and(s == 0, k_idx == 0))
        def _init_t():
            acc_t[:] = jnp.zeros_like(acc_t)

    from vllm_quick_tpu.ops.quant_matmul import _sb_contribution
    n_sb = tile_k // SUPERBLOCK
    half = SUPERBLOCK // 2
    acc = acc_e[:]
    for sb in range(n_sb):
        p = p_ref[0, sb * half:(sb + 1) * half, :]
        xlo = x_ref[0, :, sb * SUPERBLOCK:sb * SUPERBLOCK + half]
        xhi = x_ref[0, :, sb * SUPERBLOCK + half:(sb + 1) * SUPERBLOCK]
        slo = s_ref[0, 2 * sb:2 * sb + 1, :].astype(jnp.float32)
        shi = s_ref[0, 2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        zlo = z_ref[0, 2 * sb:2 * sb + 1, :].astype(jnp.float32)
        zhi = z_ref[0, 2 * sb + 1:2 * sb + 2, :].astype(jnp.float32)
        acc = acc + _sb_contribution(xlo, xhi, p, slo, shi, zlo, zhi)
    acc_e[:] = acc

    @pl.when(k_idx == pl.num_programs(2) - 1)
    def _finish():
        if combine:
            # Whole gates array is resident; pick this slot's row
            # dynamically (a (1, T) block would break the sublane rule).
            coef = g_ref[pl.ds(s, 1), :].astype(jnp.float32)[0]
            acc_t[:] = acc_t[:] + coef[:, None] * acc_e[:]

            @pl.when(s == pl.num_programs(1) - 1)
            def _write():
                o_ref[0] = acc_t[:].astype(o_ref.dtype)
        else:
            o_ref[0] = acc_e[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("combine", "out_dtype",
                                             "interpret"))
def _moe_qmm(x: jax.Array, packed: jax.Array, scales: jax.Array,
             zeros: jax.Array, sel: jax.Array, gates: jax.Array, *,
             combine: bool, out_dtype=jnp.bfloat16,
             interpret: bool = False) -> jax.Array:
    """Grouped quantized matmul over expert slots.

    x: [Tp, Kp] (combine=False, shared input) or [S, Tp, Kp]
    (combine=True, per-slot input). packed/scales/zeros: stacked
    [E, ...] i8pair arrays. Returns [S, Tp, Np] or [Tp, Np].
    """
    from vllm_quick_tpu.ops.quant_matmul import _choose_tiles
    s_max = sel.shape[0]
    if combine:
        _, tp_, kp = x.shape
    else:
        tp_, kp = x.shape
    np_ = packed.shape[-1]
    tile_k, tile_n = _choose_tiles(kp, np_)
    grid = (np_ // tile_n, s_max, kp // tile_k)

    if combine:
        x_spec = pl.BlockSpec((1, tp_, tile_k),
                              lambda j, s, k, sel_r: (s, 0, k))
    else:
        x3 = x[None]
        x_spec = pl.BlockSpec((1, tp_, tile_k),
                              lambda j, s, k, sel_r: (0, 0, k))
    g_spec = pl.BlockSpec((s_max, tp_), lambda j, s, k, sel_r: (0, 0))
    p_spec = pl.BlockSpec((1, tile_k // 2, tile_n),
                          lambda j, s, k, sel_r: (sel_r[s], k, j))
    sz_spec = pl.BlockSpec((1, tile_k // EFF_GROUP, tile_n),
                           lambda j, s, k, sel_r: (sel_r[s], k, j))
    if combine:
        o_spec = pl.BlockSpec((1, tp_, tile_n),
                              lambda j, s, k, sel_r: (0, 0, j))
        out_shape = jax.ShapeDtypeStruct((1, tp_, np_), out_dtype)
    else:
        o_spec = pl.BlockSpec((1, tp_, tile_n),
                              lambda j, s, k, sel_r: (s, 0, j))
        out_shape = jax.ShapeDtypeStruct((s_max, tp_, np_), out_dtype)

    kernel = functools.partial(_moe_qmm_kernel, tile_k=tile_k,
                               combine=combine)
    flops = 2 * s_max * tp_ * kp * np_
    bytes_accessed = s_max * (kp * np_ // 2
                              + 2 * (kp // EFF_GROUP) * np_ * 2)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[x_spec, g_spec, p_spec, sz_spec, sz_spec],
            out_specs=o_spec,
            scratch_shapes=[pltpu.VMEM((tp_, tile_n), jnp.float32),
                            pltpu.VMEM((tp_, tile_n), jnp.float32)],
        ),
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=0),
        interpret=interpret,
    )(sel, x if combine else x3, gates, packed, scales, zeros)
    return out[0] if combine else out



def moe_quant_expert_ffn(
    x: jax.Array,              # [T, D]
    top_w: jax.Array,          # [T, k]
    top_i: jax.Array,          # [T, k]
    qw13: QuantizedWeight,     # stacked [E, ...] gate|up (col layout)
    qw2: QuantizedWeight,      # stacked [E, ...] down (row layout)
    num_experts: int,
    *,
    ctx: Optional[ParallelContext] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Grouped-GEMM expert FFN for quantized MoE at decode batch sizes:
    silu-gated w13 -> w2, combining with routing weights. Streams only
    the selected experts' weights (reference fused_moe.py:11-227
    capability, TPU-native shape discipline).

    Expert parallelism (``ctx.ep_size > 1``): the stacked qw13/qw2 the
    caller passes are this rank's E/ep-expert shard. Tokens routed to
    remote experts get an out-of-range slot id, which
    ``build_expert_slots`` drops (zero gate), so this rank computes only
    its own experts' contribution — a PARTIAL sum the caller must
    ``psum`` over (ep, tp). ``num_experts`` stays the global count.
    """
    from vllm_quick_tpu.ops.quant_matmul import default_backend_is_tpu
    if interpret is None:
        interpret = not default_backend_is_tpu()
    t, d = x.shape
    dtype = x.dtype
    if ctx is not None and ctx.ep_size > 1:
        e_local = qw13.packed.shape[0]
        off = jax.lax.axis_index(ctx.ep_axis) * e_local
        local_i = top_i - off
        # Remote experts -> index e_local: out of range for the local
        # stack, so the hit-scatter (mode="drop") and one_hot gate both
        # zero them out.
        local_i = jnp.where((local_i >= 0) & (local_i < e_local),
                            local_i, e_local)
        sel, gates = build_expert_slots(top_w, local_i, e_local)
    else:
        sel, gates = build_expert_slots(top_w, top_i, num_experts)
    tp_ = max(8, -(-t // 8) * 8)
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, tp_ - t), (0, qw13.padded_in - d)))
    gp = jnp.pad(gates, ((0, 0), (0, tp_ - t)))

    # Two grouped-GEMM passes with the silu gate between them. A
    # single-kernel gate->silu->down variant was measured SLOWER at
    # Mixtral shapes (0.53 vs 0.36 ms/layer: its 256-wide hidden
    # slices starve the MXU more than the saved inter-kernel drain
    # pays back) and was removed.
    h = _moe_qmm(xp, qw13.packed, qw13.scales, qw13.zeros, sel, gp,
                 combine=False, interpret=interpret)   # [S, Tp, 2F]
    h = h[..., :qw13.out_features]
    g, u = jnp.split(h, 2, axis=-1)
    h = (jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16)
         * u.astype(jnp.bfloat16))
    f = qw2.in_features
    if qw2.padded_in != f:
        h = jnp.pad(h, ((0, 0), (0, 0), (0, qw2.padded_in - f)))
    y = _moe_qmm(h, qw2.packed, qw2.scales, qw2.zeros, sel, gp,
                 combine=True, interpret=interpret)    # [Tp, D]
    return y[:t, :qw2.out_features].astype(dtype)


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
