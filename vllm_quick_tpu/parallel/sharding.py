"""PartitionSpec derivation + sharded param assembly for TP/DP execution.

TPU-native replacement for the reference's NCCL parallel layers
(vllm/model_executor/layers/linear.py:127-552 Column/RowParallelLinear
and vocab_parallel_embedding.py): instead of per-rank processes holding
local shards, one host process assembles *global* arrays whose sharded
axis is laid out rank-major, places them on the mesh with
``NamedSharding``, and runs the model inside ``jax.shard_map`` — each
device then sees exactly the shard the reference's ``weight_loader``
would have loaded for that rank, and ``psum``/``all_gather`` inside the
model (parallel/mesh.py ParallelContext) become ICI collectives.

PartitionSpecs are derived mechanically from the param pytree:
``LinearWeights.shard`` ('col' | 'row') marks how each linear splits,
dict keys 'embed' / 'lm_head' mark the vocab-parallel tables, and
everything else (norms, biases of row layers) is replicated.
"""
import dataclasses
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.layers.linear import LinearWeights
from vllm_quick_tpu.ops.quant_formats import QuantizedWeight
from vllm_quick_tpu.parallel.mesh import EP_AXIS, TP_AXIS


# ---------------------------------------------------------------------------
# PartitionSpec derivation
# ---------------------------------------------------------------------------

def _quant_pspecs(qw: QuantizedWeight, shard: str, tp_axis: str,
                  lead_axis: Optional[str] = None) -> QuantizedWeight:
    """Spec tree for a packed INT4 weight. All three arrays share the
    [K-like, N] layout, so col-parallel shards axis 1 and row-parallel
    shards axis 0 (each rank's K-shard was packed independently, so the
    global packed array is a rank-major concat along axis 0). Stacked
    expert weights [E, K-like, N] shard the expert axis over
    ``lead_axis`` (the ep mesh axis) when given, else replicate it."""
    n_lead = getattr(qw.packed, "ndim", 2) - 2
    lead = ((lead_axis,) + (None,) * (n_lead - 1) if n_lead and lead_axis
            else (None,) * n_lead)
    if shard == "col":
        arr = P(*lead, None, tp_axis)
    elif shard == "row":
        arr = P(*lead, tp_axis, None)
    else:
        arr = P()
    perm = None
    if qw.perm is not None:
        # GPTQ act-order permutation indexes this rank's local K shard.
        perm = P(tp_axis) if shard == "row" else P()
    lut = None
    if qw.lut is not None:
        # [N, 16] codebook follows the output dim.
        lut = P(tp_axis, None) if shard == "col" else P()
    sb = None
    if qw.scales_sb is not None:
        # [Kp//SUPERBLOCK, 2, Np] superblock view: same K/N roles as
        # the flat scales, with the pair axis unsharded.
        if shard == "col":
            sb = P(*lead, None, None, tp_axis)
        elif shard == "row":
            sb = P(*lead, tp_axis, None, None)
        else:
            sb = P()
    return dataclasses.replace(
        qw, packed=arr, scales=arr, zeros=arr, perm=perm, lut=lut,
        scales_sb=sb, zeros_sb=sb)


def _linear_pspecs(lw: LinearWeights, tp_axis: str,
                   lead_axis: Optional[str] = None) -> LinearWeights:
    if lw.shard == "col":
        w = P(None, tp_axis)
        bias = P(tp_axis)
        la, lb = P(), P(None, None, tp_axis)
    elif lw.shard == "row":
        w = P(tp_axis, None)
        bias = P()   # row bias is applied once after the psum
        la, lb = P(None, tp_axis, None), P()
    else:
        w = P()
        bias = P()
        la, lb = P(), P()
    return dataclasses.replace(
        lw,
        w=None if lw.w is None else w,
        qw=None if lw.qw is None else _quant_pspecs(lw.qw, lw.shard,
                                                    tp_axis, lead_axis),
        bias=None if lw.bias is None else bias,
        lora_a=None if lw.lora_a is None else la,
        lora_b=None if lw.lora_b is None else lb,
    )


# dict-key based rules for plain arrays (vocab-parallel tables, expert
# stacks). Axis names are the global mesh axes (parallel/mesh.py).
_NAME_RULES = {
    "embed": P(TP_AXIS, None),       # [V_local, E] stacked over ranks
    "lm_head": P(None, TP_AXIS),     # [E, V_local]
    "alibi_slopes": P(TP_AXIS),      # per-head slopes
    "moe_w13": P(EP_AXIS, None, TP_AXIS),   # [E, D, 2F]
    "moe_w2": P(EP_AXIS, TP_AXIS, None),    # [E, F, D]
}


def param_pspecs(params: Any, tp_axis: str = TP_AXIS) -> Any:
    """Derive a PartitionSpec pytree with the exact treedef of ``params``.

    Works for any model whose params are nests of dict/list/tuple with
    LinearWeights / QuantizedWeight / array / None leaves.
    """
    def walk(node, name: str):
        if node is None:
            return None
        if isinstance(node, LinearWeights):
            # Stacked quantized expert weights additionally shard their
            # leading expert axis over ep (mixtral_quant EP).
            lead = EP_AXIS if name in ("experts_w13",
                                       "experts_w2") else None
            return _linear_pspecs(node, tp_axis, lead_axis=lead)
        if isinstance(node, QuantizedWeight):
            # bare quantized tensor (e.g. MoE expert stack): caller
            # should wrap in LinearWeights; default to replicated.
            return _quant_pspecs(node, "col", tp_axis)
        if isinstance(node, dict):
            return {k: walk(v, k) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v, name) for v in node)
        rule = _NAME_RULES.get(name)
        if rule is not None:
            return P(*[tp_axis if a == TP_AXIS else a for a in rule])
        return P()

    return walk(params, "")


def kv_cache_pspec(tp_axis: str = TP_AXIS,
                   dp_axis: Optional[str] = None,
                   sp_axis: Optional[str] = None) -> P:
    """Paged KV caches are fused [NB, 2, H, S, D]: KV heads shard over
    tp (config.py:259-267 analogue); with dp, each replica owns its own
    block pool so NB shards over dp; with sp (context parallelism) the
    pool additionally shards its blocks over sp ranks."""
    lead = tuple(a for a in (dp_axis, sp_axis) if a)
    return P(lead if len(lead) > 1 else (lead[0] if lead else None),
             None, tp_axis, None, None)


# ---------------------------------------------------------------------------
# Global param assembly (rank shards -> mesh-sharded global arrays)
# ---------------------------------------------------------------------------

def _tp_dim(spec: P, tp_axis: str) -> Optional[int]:
    for i, ax in enumerate(spec):
        if ax == tp_axis or (isinstance(ax, tuple) and tp_axis in ax):
            return i
    return None


def assemble_global_params(
    rank_params: Sequence[Any],
    specs: Any,
    mesh: Optional[Mesh] = None,
    tp_axis: str = TP_AXIS,
) -> Any:
    """Concatenate per-rank param pytrees (as loaded by
    ``model.load_params(weights, tp_rank=r)``) into global arrays along
    each leaf's tp-sharded axis, optionally placing them on ``mesh``.

    The resulting global layout is rank-major, i.e. sharding it back
    over the tp mesh axis hands every device exactly its original
    shard — the moral equivalent of the reference loading shards
    directly into per-GPU memory (weight_utils.py:203-261).
    """
    def combine(spec, *leaves):
        dim = _tp_dim(spec, tp_axis) if isinstance(spec, P) else None
        if dim is None or len(leaves) == 1:
            out = jnp.asarray(leaves[0])
        else:
            out = jnp.concatenate([jnp.asarray(l) for l in leaves],
                                  axis=dim)
        if mesh is not None:
            out = jax.device_put(out, NamedSharding(mesh, spec))
        return out

    return jax.tree_util.tree_map(combine, specs, *rank_params)


def shard_pytree(tree: Any, specs: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its NamedSharding."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        tree, specs)


# ---------------------------------------------------------------------------
# Sharded step construction
# ---------------------------------------------------------------------------

def make_sharded_step(
    raw_step: Callable,
    mesh: Mesh,
    param_specs: Any,
    tp_axis: str = TP_AXIS,
    dp_axis: Optional[str] = None,
    donate_caches: bool = True,
    n_extra_outputs: int = 0,
) -> Callable:
    """Wrap ``raw_step(params, ids, pos, kv_caches, meta, prompt_lens)``
    in shard_map over ``mesh`` and jit it.

    TP: params sharded per ``param_specs``; KV heads sharded; batch
    inputs replicated; logits replicated on exit (the model all-gathers
    vocab shards, vocab_embedding.py:47).
    DP (optional): batch inputs and the KV block pool additionally split
    over ``dp_axis`` — each replica runs an independent continuous batch.
    """
    batch = P(dp_axis) if dp_axis else P()
    cache = kv_cache_pspec(tp_axis, dp_axis)
    in_specs = (param_specs, batch, batch, cache, batch, batch)
    out_specs = (batch, cache)
    if n_extra_outputs:
        # Step variants returning extra batch-aligned arrays (e.g. the
        # prompt-logprobs echo outputs) — all replicated over tp.
        out_specs = out_specs + (tuple(batch
                                       for _ in range(n_extra_outputs)),)
    step = jax.shard_map(raw_step, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    donate = (3,) if donate_caches else ()
    return jax.jit(step, donate_argnums=donate)


def make_sp_sharded_step(
    raw_step: Callable,
    mesh: Mesh,
    param_specs: Any,
    is_prompt: bool,
    tp_axis: str = TP_AXIS,
    sp_axis: str = "sp",
    donate_caches: bool = True,
    replicated_out: bool = False,
) -> Callable:
    """Context-parallel (sp) step: the sequence (prefill) or block pool
    (decode) shards over ``sp_axis``; params/weights replicate over sp
    and shard over tp as usual. The reference has no equivalent — it
    rejects prompts longer than one batch (core/scheduler.py:193-202).

    Prefill program (``is_prompt=True``):
      ids/positions/slot_mapping come as global [B, T] arrays, T sharded
      over sp (rank r sees its contiguous chunk and writes KV into its
      LOCAL pool shard via local slot values); ``prompt_lens`` is
      global. Ring attention exchanges K/V chunks. Output logits are
      per-rank last-LOCAL-token rows, returned stacked as [sp*B, V] —
      the caller selects row ``(prompt_len-1)//(T//sp)*B + b``.

    Decode program:
      ids/positions replicate; ``slot_mapping``/``block_tables``/
      ``context_lens`` come stacked per rank with a leading [sp] axis
      (each rank's view of ITS pool shard; non-owner ranks point
      slot_mapping at their local null block 0 and their context_lens
      exclude the token). Partial attention + LSE-combine makes logits
      identical on every rank, so outputs replicate.
    """
    cache = kv_cache_pspec(tp_axis, None, sp_axis)
    if is_prompt:
        seq = P(None, sp_axis)
        in_specs = (param_specs, seq, seq, cache,
                    InputMetadata(is_prompt=True, slot_mapping=seq,
                                  prompt_lens=P(),
                                  lora_indices=seq), P())
        # ``replicated_out``: the raw step psum-selects the owner
        # rank's logits itself (engine path), so outputs replicate;
        # default returns per-rank rows stacked [sp*B, V].
        out_specs = (P() if replicated_out else P(sp_axis), cache)
        fn = raw_step
    else:
        stacked = P(sp_axis)
        in_specs = (param_specs, P(), P(), cache,
                    InputMetadata(is_prompt=False, slot_mapping=stacked,
                                  context_lens=stacked,
                                  block_tables=stacked,
                                  lora_indices=P()), P())
        out_specs = (P(), cache)

        def fn(params, ids, pos, caches, meta, plens):
            import dataclasses as _dc
            meta = _dc.replace(
                meta, slot_mapping=meta.slot_mapping[0],
                context_lens=meta.context_lens[0],
                block_tables=meta.block_tables[0])
            return raw_step(params, ids, pos, caches, meta, plens)

    step = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    donate = (3,) if donate_caches else ()
    return jax.jit(step, donate_argnums=donate)
