"""Full-model context parallelism: sp prefill + decode vs single-device.

A tiny Llama runs one prefill and one decode step twice: (a) on one
device with the standard paged path, (b) under shard_map on an sp (and
sp x tp) mesh with the sequence / block pool sharded
(parallel/sharding.py make_sp_sharded_step). Logits must agree to
numerical epsilon — proving the sp axis changes the partitioning, not
the math. The reference has no counterpart capability (prompts longer
than one batch are rejected, core/scheduler.py:193-202).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
from vllm_quick_tpu.parallel.sharding import (make_sp_sharded_step,
                                              param_pspecs)

S = 8                       # block size: one whole block per sp-4 rank


def _cfg(model_dir):
    return ModelConfig(
        model=model_dir, tokenizer=model_dir, tokenizer_mode="auto",
        trust_remote_code=False, download_dir=None, load_format="auto",
        dtype="float32", seed=0, quantization=None)


def _plain_step(model):
    def step(params, ids, pos, caches, meta, plens):
        hidden, caches = model.forward(params, ids, pos, caches, meta)
        if meta.is_prompt:
            idx = jnp.maximum(plens - 1, 0)
            hidden = jnp.take_along_axis(
                hidden, idx[:, None, None], axis=1)[:, 0]
        return model.compute_logits(params, hidden), caches
    return step


def _sp_prefill_step(model):
    def step(params, ids, pos, caches, meta, plens):
        hidden, caches = model.forward(params, ids, pos, caches, meta)
        r = jax.lax.axis_index("sp")
        tl = hidden.shape[1]
        idx = jnp.clip(plens - 1 - r * tl, 0, tl - 1)
        h = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
        return model.compute_logits(params, h), caches
    return step


@pytest.mark.parametrize("sp,tp", [(4, 1), (2, 2)])
def test_sp_prefill_decode_matches_single_device(sp, tp):
    b, t = 2, 32
    tl = t // sp
    bpr = tl // S                  # whole blocks per rank per seq
    plens = np.asarray([t, t - 5], np.int32)
    model_dir = make_tiny_llama_dir()
    cfg = _cfg(model_dir)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 500, size=(b, t)).astype(np.int32)
    pos = np.tile(np.arange(t, dtype=np.int32), (b, 1))
    d_ids = np.asarray([7, 9], np.int32)

    # --- single-device reference --------------------------------------
    model1, params1 = get_model(cfg, ParallelContext())
    nb_ref = 1 + b * (t // S + 1)
    caches = [jnp.zeros(model1.kv_cache_shape(nb_ref, S), jnp.float32)
              for _ in range(model1.num_layers)]
    bt_ref = np.zeros((b, t // S + 1), np.int32)
    slots = np.zeros((b, t), np.int32)
    for i in range(b):
        for j in range(t // S + 1):
            bt_ref[i, j] = 1 + i * (t // S + 1) + j
        for p in range(t):
            slots[i, p] = bt_ref[i, p // S] * S + p % S
    meta_p = InputMetadata(is_prompt=True,
                           slot_mapping=jnp.asarray(slots),
                           prompt_lens=jnp.asarray(plens))
    step1 = jax.jit(_plain_step(model1), donate_argnums=(3,))
    ref_p, caches = step1(params1, jnp.asarray(ids), jnp.asarray(pos),
                          caches, meta_p, jnp.asarray(plens))
    d_slots = np.asarray([bt_ref[i, plens[i] // S] * S + plens[i] % S
                          for i in range(b)], np.int32)
    meta_d = InputMetadata(is_prompt=False,
                           slot_mapping=jnp.asarray(d_slots),
                           context_lens=jnp.asarray(plens + 1),
                           block_tables=jnp.asarray(bt_ref))
    ref_d, _ = step1(params1, jnp.asarray(d_ids), jnp.asarray(plens),
                     caches, meta_d, jnp.asarray(plens))

    # --- sp (x tp) ----------------------------------------------------
    mesh = make_mesh(tensor_parallel_size=tp,
                     sequence_parallel_size=sp)
    ctx = ParallelContext(tp_size=tp, sp_size=sp)
    modelN, paramsN = get_model(cfg, ctx, mesh=mesh)
    specs = param_pspecs(paramsN)

    nb_local = 1 + b * (bpr + 1)   # local null + prefill + growth
    shape = modelN.kv_cache_shape(nb_local * sp, S)
    shape = shape[:2] + (shape[2] * tp,) + shape[3:]
    sp_caches = [jnp.zeros(shape, jnp.float32)
                 for _ in range(modelN.num_layers)]

    # Prefill: column p holds the LOCAL slot on rank p // tl.
    sl = np.zeros((b, t), np.int32)
    for i in range(b):
        for p in range(t):
            tt = p % tl
            blk = 1 + i * (bpr + 1) + tt // S
            sl[i, p] = blk * S + tt % S
    meta_sp = InputMetadata(is_prompt=True,
                            slot_mapping=jnp.asarray(sl),
                            prompt_lens=jnp.asarray(plens))
    pre = make_sp_sharded_step(_sp_prefill_step(modelN), mesh, specs,
                               is_prompt=True)
    logits_p, sp_caches = pre(paramsN, jnp.asarray(ids),
                              jnp.asarray(pos), sp_caches, meta_sp,
                              jnp.asarray(plens))
    logits_p = np.asarray(logits_p).reshape(sp, b, -1)
    for i in range(b):
        owner = (plens[i] - 1) // tl
        np.testing.assert_allclose(logits_p[owner, i],
                                   np.asarray(ref_p)[i],
                                   rtol=2e-4, atol=2e-4)

    # Decode: per-rank stacked views. Sequence block j lives on rank
    # j // bpr; the growth block (position >= t) goes to rank 0's
    # spare local block.
    mb_local = bpr + 1
    bt_l = np.zeros((sp, b, mb_local), np.int32)
    cl_l = np.zeros((sp, b), np.int32)
    sl_l = np.zeros((sp, b), np.int32)
    for i in range(b):
        p_new = int(plens[i])
        for r in range(sp):
            for j in range(bpr):
                bt_l[r, i, j] = 1 + i * (bpr + 1) + j
            cl_l[r, i] = int(np.clip(p_new + 1 - r * tl, 0, tl))
            sl_l[r, i] = 0             # local null block
        if p_new >= t:                 # growth block on rank 0
            grow = 1 + i * (bpr + 1) + bpr
            bt_l[0, i, bpr] = grow
            cl_l[0, i] = tl + (p_new - t) + 1
            sl_l[0, i] = grow * S + (p_new - t) % S
        else:
            owner = p_new // tl
            tt = p_new % tl
            blk = 1 + i * (bpr + 1) + tt // S
            sl_l[owner, i] = blk * S + tt % S
    meta_spd = InputMetadata(is_prompt=False,
                             slot_mapping=jnp.asarray(sl_l),
                             context_lens=jnp.asarray(cl_l),
                             block_tables=jnp.asarray(bt_l))
    dec = make_sp_sharded_step(_plain_step(modelN), mesh, specs,
                               is_prompt=False)
    logits_d, _ = dec(paramsN, jnp.asarray(d_ids), jnp.asarray(plens),
                      sp_caches, meta_spd, jnp.asarray(plens))
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(ref_d),
                               rtol=2e-4, atol=2e-4)
