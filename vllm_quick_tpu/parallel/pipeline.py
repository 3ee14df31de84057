"""Pipeline parallelism: layer stages over a ``pp`` mesh axis.

Capability the reference explicitly rejects ("Pipeline parallelism is
not supported yet", vllm/config.py:388-390; stage groups are built but
unused, parallel_utils/parallel_state.py:76-86). Here PP is real and
TPU-native: the decoder's layers are split into ``pp`` contiguous
stages, each stage's per-layer params are stacked into arrays with a
leading stage axis sharded over the ``pp`` mesh axis, and one jitted
GPipe-style schedule runs all stages in SPMD lockstep — activations hop
stage-to-stage with ``lax.ppermute`` while every rank works on a
different microbatch, so the pipeline fills instead of serializing.

Schedule (S stages, M microbatches, S + M - 1 ticks):

  tick t: rank r runs its stage on microbatch ``t - r`` (clamped;
  out-of-range ticks compute on don't-care data whose KV writes are
  pointed at the null block and whose outputs are masked), then
  ppermutes its activation to rank r+1. Rank 0 injects
  ``embed(microbatch t)``; rank S-1 collects final-norm hidden rows.
  A final ``psum`` over pp replicates the collected hidden states so
  the logits (and the sampler above) are identical on every rank.

KV caches follow their layers: each stage-slot cache is a global
``[pp, NB, 2, H, S, D]`` array sharded P('pp', ...) — stage r owns the
pool for its own layers, which is exactly how PP shrinks per-chip HBM
(weights AND cache divide by ``pp``).

Composes with TP (params additionally sharded over ``tp`` inside each
stage; the per-layer psums ride ICI) and with the engine's bucketed
static shapes. Fill/drain overhead is the usual (S-1)/(S+M-1) tax —
pick M >= S.
"""
import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.parallel.mesh import PP_AXIS, TP_AXIS
from vllm_quick_tpu.parallel.sharding import param_pspecs, shard_pytree


def _is_spec(x) -> bool:
    return isinstance(x, P)


def _layers_per_stage(layers: Sequence[Any], pp: int) -> int:
    num_layers = len(layers)
    assert num_layers % pp == 0, (
        f"num_layers={num_layers} must divide by pp={pp}")
    return num_layers // pp


def _stack_slot(layers: Sequence[Any], pp: int, lps: int, j: int) -> Any:
    """Stage-slot j: layer ``r*lps + j`` of stage r, leaves stacked
    ``[pp, ...]`` across stages."""
    stage_trees = [layers[r * lps + j] for r in range(pp)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                  *stage_trees)


def _slot_spec(layer0: Any, tp_axis: str) -> Any:
    """P(pp, *orig) for every leaf of a representative layer tree."""
    layer_specs = param_pspecs({"layers": [layer0]}, tp_axis)["layers"][0]
    return jax.tree_util.tree_map(
        lambda s: P(PP_AXIS, *s), layer_specs, is_leaf=_is_spec)


def split_pp_stages(params: Dict[str, Any], pp: int) -> Dict[str, Any]:
    """Restructure ``params`` for PP: the ``layers`` list (length L,
    uniform treedef) becomes ``pp_layers`` — L//pp stage-slot trees
    whose leaves are stacked ``[pp, ...]`` across stages (slot j holds
    layer ``r*(L//pp) + j`` of stage r). Everything else (embed,
    final_norm, lm_head, ...) is kept as-is and replicated over pp.
    """
    layers = params["layers"]
    lps = _layers_per_stage(layers, pp)
    out = {k: v for k, v in params.items() if k != "layers"}
    out["pp_layers"] = [_stack_slot(layers, pp, lps, j)
                        for j in range(lps)]
    return out


def pp_param_specs(params: Dict[str, Any], pp_params: Dict[str, Any],
                   tp_axis: str = TP_AXIS) -> Dict[str, Any]:
    """PartitionSpecs for ``split_pp_stages`` output: non-layer params
    keep their param_pspecs (tp-sharded / replicated; implicitly
    replicated over pp), stage-slot leaves get P(pp, *orig)."""
    base = {k: v for k, v in params.items() if k != "layers"}
    specs = param_pspecs(base, tp_axis)
    specs["pp_layers"] = ([_slot_spec(params["layers"][0], tp_axis)]
                          * len(pp_params["pp_layers"]))
    return specs


def build_pp_params(params: Dict[str, Any], pp: int, mesh: Mesh,
                    tp_axis: str = TP_AXIS
                    ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """split_pp_stages + pp_param_specs + placement, but stacking and
    placing ONE stage-slot at a time so the transient unsharded copy
    peaks at pp x one layer instead of 2 x the whole model (matters
    when the model barely fits one chip pre-split)."""
    layers = params["layers"]
    lps = _layers_per_stage(layers, pp)
    spec = _slot_spec(layers[0], tp_axis)
    slots = [shard_pytree(_stack_slot(layers, pp, lps, j), spec, mesh)
             for j in range(lps)]
    base = {k: v for k, v in params.items() if k != "layers"}
    base_specs = param_pspecs(base, tp_axis)
    out = shard_pytree(base, base_specs, mesh)
    out["pp_layers"] = slots
    base_specs["pp_layers"] = [spec] * lps
    return out, base_specs


def stack_pp_caches(caches: Sequence[jax.Array], pp: int) -> List[jax.Array]:
    """Per-layer cache list (length L) -> per-stage-slot stacked list
    (length L//pp, each [pp, NB, 2, H, S, D]); slot j of stage r holds
    layer r*(L//pp)+j's pool."""
    lps = len(caches) // pp
    return [jnp.stack([caches[r * lps + j] for r in range(pp)])
            for j in range(lps)]


def unstack_pp_caches(stacked: Sequence[jax.Array]) -> List[jax.Array]:
    """Inverse of stack_pp_caches (host-side; for tests)."""
    pp = stacked[0].shape[0]
    lps = len(stacked)
    return [stacked[j][r] for r in range(pp) for j in range(lps)]


def pp_cache_pspec(tp_axis: str = TP_AXIS) -> P:
    return P(PP_AXIS, None, None, tp_axis, None, None)


def place_pp(tree: Any, specs: Any, mesh: Mesh) -> Any:
    return shard_pytree(tree, specs, mesh)


def _mb_slice(x: Optional[jax.Array], mb: jax.Array,
              mb_size: int) -> Optional[jax.Array]:
    if x is None:
        return None
    start = (mb * mb_size,) + (0,) * (x.ndim - 1)
    return jax.lax.dynamic_slice(x, start, (mb_size,) + x.shape[1:])


def make_pp_sharded_step(
    model,
    mesh: Mesh,
    param_specs: Dict[str, Any],
    pp: int,
    num_microbatches: int,
    is_prompt: bool,
    tp_axis: str = TP_AXIS,
    donate_caches: bool = True,
    echo_k: int = 0,
    score: bool = False,
) -> Callable:
    """Build the jitted PP serving step.

    Signature matches the other sharded steps:
    ``step(params, ids, positions, caches, meta, prompt_lens)
    -> (logits [B, V], caches)`` where ``caches`` is the
    ``stack_pp_caches`` list and B = num_microbatches * mb_size.
    Inputs replicate over pp (every rank sees the whole batch and
    slices its current microbatch); logits replicate on exit.

    ``echo_k > 0`` (prefill only) additionally returns all-position
    prompt logprobs ``(tgt [B, L], top_lp [B, L, k], top_ids)`` — the
    last stage emits its full hidden states instead of the last token's
    and the echo math runs replicated after the pp psum.

    ``score=True`` (prefill only) returns ALL positions' logits
    ``[B, L, V]`` — the spec-decode target scorer. ``slot_mapping``
    comes FLAT ``[B*L]`` (the per-token cache-write path); the body
    reshapes it per microbatch.
    """
    assert num_microbatches >= 1
    assert not echo_k or is_prompt, "echo is a prefill-only feature"
    assert not score or (is_prompt and not echo_k), (
        "score is a prefill-shaped variant exclusive with echo")
    full_hidden = bool(echo_k) or score

    def body(params, ids, positions, caches, meta, prompt_lens):
        rank = jax.lax.axis_index(PP_AXIS)
        stage_layers = [jax.tree_util.tree_map(lambda x: x[0], t)
                        for t in params["pp_layers"]]
        local_caches = [c[0] for c in caches]

        batch = ids.shape[0]
        assert batch % num_microbatches == 0, (batch, num_microbatches)
        mb_size = batch // num_microbatches
        n_ticks = pp + num_microbatches - 1
        zero = jnp.int32(0)

        # Shape probe for the carried activation state (XLA CSEs this
        # against tick 0's real prologue).
        state_buf = jax.tree_util.tree_map(
            jnp.zeros_like,
            model.pp_prologue(params, _mb_slice(ids, zero, mb_size),
                              _mb_slice(positions, zero, mb_size)))
        out_tail = ((ids.shape[1], model.hidden_size) if full_hidden
                    else (model.hidden_size,))
        out_acc = jnp.zeros((num_microbatches, mb_size) + out_tail,
                            params["embed"].dtype)
        slot_src = meta.slot_mapping
        if score and slot_src.ndim == 1:
            # Flat per-token slots -> [B, L] so microbatch slicing
            # works; re-flattened per microbatch below.
            slot_src = slot_src.reshape(ids.shape)

        for t in range(n_ticks):
            mb = t - rank
            valid = (mb >= 0) & (mb < num_microbatches)
            mbc = jnp.clip(mb, 0, num_microbatches - 1)

            ids_mb = _mb_slice(ids, mbc, mb_size)
            pos_mb = _mb_slice(positions, mbc, mb_size)
            slots_mb = _mb_slice(slot_src, mbc, mb_size)
            # Don't-care ticks write their K/V to the null block.
            slots_mb = jnp.where(valid, slots_mb,
                                 jnp.zeros_like(slots_mb))
            if score:
                # Back to the flat per-token cache-write layout.
                slots_mb = slots_mb.reshape(-1)
            meta_mb = dataclasses.replace(
                meta,
                slot_mapping=slots_mb,
                prompt_lens=_mb_slice(meta.prompt_lens, mbc, mb_size),
                context_lens=_mb_slice(meta.context_lens, mbc, mb_size),
                block_tables=_mb_slice(meta.block_tables, mbc, mb_size),
                lora_indices=_mb_slice(meta.lora_indices, mbc,
                                       mb_size))

            state0 = model.pp_prologue(params, ids_mb, pos_mb)
            state = jax.tree_util.tree_map(
                lambda a, b: jnp.where(rank == 0, a, b), state0,
                state_buf)

            for j, layer in enumerate(stage_layers):
                state, new_cache = model.pp_layer(
                    layer, state, pos_mb, local_caches[j], meta_mb)
                local_caches[j] = new_cache

            # Last-stage epilogue: final norm (+ last-token select;
            # echo/score keep every position for the pass below).
            hl = model.pp_epilogue(params, state)
            if is_prompt and not full_hidden:
                idx = jnp.maximum(meta_mb.prompt_lens - 1, 0)
                hl = jnp.take_along_axis(
                    hl, idx[:, None, None], axis=1)[:, 0]
            emit = valid & (rank == pp - 1)
            cur = jax.lax.dynamic_slice_in_dim(out_acc, mbc, 1, 0)[0]
            row = jnp.where(emit, hl.astype(out_acc.dtype), cur)
            out_acc = jax.lax.dynamic_update_slice_in_dim(
                out_acc, row[None], mbc, 0)

            if pp > 1 and t < n_ticks - 1:
                state_buf = jax.tree_util.tree_map(
                    lambda a: jax.lax.ppermute(
                        a, PP_AXIS,
                        [(i, (i + 1) % pp) for i in range(pp)]),
                    state)

        # Only rank pp-1 accumulated; replicate to all pp ranks.
        hidden = jax.lax.psum(out_acc, PP_AXIS)
        caches_out = [lc[None] for lc in local_caches]
        if score:
            full = hidden.reshape(batch * ids.shape[1],
                                  model.hidden_size)
            logits = model.compute_logits(params, full)
            return (logits.reshape(batch, ids.shape[1], -1),
                    caches_out)
        if echo_k:
            from vllm_quick_tpu.model_executor.prompt_logprobs import (
                echo_prompt_logprobs)
            full = hidden.reshape(batch, ids.shape[1],
                                  model.hidden_size)
            idx = jnp.maximum(prompt_lens - 1, 0)
            last = jnp.take_along_axis(
                full, idx[:, None, None], axis=1)[:, 0]
            logits = model.compute_logits(params, last)
            tgt, tl, ti = echo_prompt_logprobs(model, params, full,
                                               ids, echo_k)
            return logits, caches_out, (tgt, tl, ti)
        hidden = hidden.reshape(batch, model.hidden_size)
        logits = model.compute_logits(params, hidden)
        return logits, caches_out

    cache_spec = pp_cache_pspec(tp_axis)
    meta_spec = InputMetadata(is_prompt=is_prompt, slot_mapping=P(),
                              prompt_lens=P(), context_lens=P(),
                              block_tables=P(), lora_indices=P())
    in_specs = (param_specs, P(), P(), cache_spec, meta_spec, P())
    out_specs = (P(), cache_spec)
    if echo_k:
        out_specs = out_specs + ((P(), P(), P()),)
    step = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    donate = (3,) if donate_caches else ()
    return jax.jit(step, donate_argnums=donate)
