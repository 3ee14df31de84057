"""Full-model pipeline parallelism: staged prefill + decode vs single-device.

A tiny 4-layer Llama runs one prefill and one decode step twice: (a) on
one device with the standard path, (b) under shard_map on a pp (and
pp x tp) mesh with layers split into stages, stage params/caches
sharded over pp, and the GPipe microbatch schedule exchanging
activations via ppermute (parallel/pipeline.py). Logits must agree to
numerical epsilon — PP changes the partitioning, not the math. The
reference rejects pipeline parallelism outright (config.py:388-390).
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
from vllm_quick_tpu.parallel.pipeline import (make_pp_sharded_step,
                                              place_pp, pp_cache_pspec,
                                              pp_param_specs,
                                              split_pp_stages,
                                              stack_pp_caches,
                                              unstack_pp_caches)

S = 8                           # block size


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


def _layout(b, t):
    """Block tables / prefill slots / decode slots for b seqs of len t
    (one spare growth block per seq; block 0 = null)."""
    bps = t // S + 1
    bt = np.zeros((b, bps), np.int32)
    slots = np.zeros((b, t), np.int32)
    for i in range(b):
        for j in range(bps):
            bt[i, j] = 1 + i * bps + j
        for p in range(t):
            slots[i, p] = bt[i, p // S] * S + p % S
    return bt, slots


@pytest.mark.parametrize("pp,tp,mb", [(2, 1, 1), (2, 1, 2), (4, 1, 4),
                                      (2, 2, 2)])
def test_pp_prefill_decode_matches_single_device(pp, tp, mb):
    b, t = 4, 16
    plens = np.asarray([t, t - 3, t - 7, t // 2], np.int32)
    model_dir = make_tiny_llama_dir(num_layers=4, key="pp4")
    cfg = _cfg(model_dir)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 500, size=(b, t)).astype(np.int32)
    pos = np.tile(np.arange(t, dtype=np.int32), (b, 1))
    d_ids = np.asarray([7, 9, 11, 13], np.int32)

    bt, slots = _layout(b, t)
    nb = 1 + b * (t // S + 1)
    d_slots = np.asarray([bt[i, plens[i] // S] * S + plens[i] % S
                          for i in range(b)], np.int32)

    # --- single-device reference --------------------------------------
    model1, params1 = get_model(cfg, ParallelContext())
    caches = [jnp.zeros(model1.kv_cache_shape(nb, S), jnp.float32)
              for _ in range(model1.num_layers)]
    meta_p = InputMetadata(is_prompt=True,
                           slot_mapping=jnp.asarray(slots),
                           prompt_lens=jnp.asarray(plens))
    step1 = jax.jit(_plain_step(model1), donate_argnums=(3,))
    ref_p, caches = step1(params1, jnp.asarray(ids), jnp.asarray(pos),
                          caches, meta_p, jnp.asarray(plens))
    meta_d = InputMetadata(is_prompt=False,
                           slot_mapping=jnp.asarray(d_slots),
                           context_lens=jnp.asarray(plens + 1),
                           block_tables=jnp.asarray(bt))
    ref_d, ref_caches = step1(params1, jnp.asarray(d_ids),
                              jnp.asarray(plens), caches, meta_d,
                              jnp.asarray(plens))

    # --- pp (x tp) ----------------------------------------------------
    mesh = make_mesh(tensor_parallel_size=tp, pipeline_parallel_size=pp)
    ctx = ParallelContext(tp_size=tp, pp_size=pp)
    modelN, paramsN = get_model(cfg, ctx, mesh=mesh)
    pp_params = split_pp_stages(paramsN, pp)
    specs = pp_param_specs(paramsN, pp_params)
    pp_params = place_pp(pp_params, specs, mesh)

    shape = modelN.kv_cache_shape(nb, S)
    shape = shape[:2] + (shape[2] * tp,) + shape[3:]
    layer_caches = [jnp.zeros(shape, jnp.float32)
                    for _ in range(modelN.num_layers)]
    pp_caches = stack_pp_caches(layer_caches, pp)
    pp_caches = [jax.device_put(
        c, jax.sharding.NamedSharding(mesh, pp_cache_pspec()))
        for c in pp_caches]

    pre = make_pp_sharded_step(modelN, mesh, specs, pp,
                               num_microbatches=mb, is_prompt=True)
    logits_p, pp_caches = pre(pp_params, jnp.asarray(ids),
                              jnp.asarray(pos), pp_caches, meta_p,
                              jnp.asarray(plens))
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(ref_p),
                               rtol=2e-4, atol=2e-4)

    dec = make_pp_sharded_step(modelN, mesh, specs, pp,
                               num_microbatches=mb, is_prompt=False)
    logits_d, pp_caches = dec(pp_params, jnp.asarray(d_ids),
                              jnp.asarray(plens), pp_caches, meta_d,
                              jnp.asarray(plens))
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(ref_d),
                               rtol=2e-4, atol=2e-4)

    if tp == 1:
        # Cache contents must match layer-for-layer (block 0 is the
        # null/trash block don't-care ticks write into — exclude it).
        got = unstack_pp_caches([np.asarray(c) for c in pp_caches])
        for li in range(modelN.num_layers):
            np.testing.assert_allclose(got[li][1:],
                                       np.asarray(ref_caches[li])[1:],
                                       rtol=2e-4, atol=2e-4)
