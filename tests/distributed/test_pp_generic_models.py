"""Pipeline parallelism over GenericDecoder families.

test_pp_model.py pins the flagship Llama (fused-residual pp hooks);
here the GenericDecoder hook set (base.py pp_prologue/pp_layer/
pp_epilogue) is exercised across structurally different families:
learned positions + LayerNorm (gpt2), parallel residual + rotary
(gpt-neox), and ALiBi (bloom). pp=2 logits must match the
single-device path to epsilon for prefill and decode.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.models.test_models_golden import FAMILIES, _save
from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
from vllm_quick_tpu.parallel.pipeline import (make_pp_sharded_step,
                                              place_pp, pp_cache_pspec,
                                              pp_param_specs,
                                              split_pp_stages,
                                              stack_pp_caches)

S = 16


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


@pytest.mark.parametrize("family", ["gpt2", "gpt_neox_parallel",
                                    "bloom"])
def test_pp_generic_family_matches_single_device(family):
    pp, mb = 2, 2
    b, t = 4, 16
    plens = np.asarray([t, t - 3, t - 7, t // 2], np.int32)
    model_dir, _, _ = _save(FAMILIES[family])
    cfg = _cfg(model_dir)

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=(b, t)).astype(np.int32)
    pos = np.tile(np.arange(t, dtype=np.int32), (b, 1))
    d_ids = np.asarray([7, 9, 11, 13], np.int32)

    bps = t // S + 1
    nb = 1 + b * bps
    bt = np.zeros((b, bps), np.int32)
    slots = np.zeros((b, t), np.int32)
    for i in range(b):
        for j in range(bps):
            bt[i, j] = 1 + i * bps + j
        for p in range(t):
            slots[i, p] = bt[i, p // S] * S + p % S
    d_slots = np.asarray([bt[i, plens[i] // S] * S + plens[i] % S
                          for i in range(b)], np.int32)

    meta_p = InputMetadata(is_prompt=True,
                           slot_mapping=jnp.asarray(slots),
                           prompt_lens=jnp.asarray(plens))
    meta_d = InputMetadata(is_prompt=False,
                           slot_mapping=jnp.asarray(d_slots),
                           context_lens=jnp.asarray(plens + 1),
                           block_tables=jnp.asarray(bt))

    # --- single-device reference --------------------------------------
    model1, params1 = get_model(cfg, ParallelContext())
    assert model1.num_layers % pp == 0
    caches = [jnp.zeros(model1.kv_cache_shape(nb, S), jnp.float32)
              for _ in range(model1.num_layers)]
    step1 = jax.jit(_plain_step(model1), donate_argnums=(3,))
    ref_p, caches = step1(params1, jnp.asarray(ids), jnp.asarray(pos),
                          caches, meta_p, jnp.asarray(plens))
    ref_d, _ = step1(params1, jnp.asarray(d_ids), jnp.asarray(plens),
                     caches, meta_d, jnp.asarray(plens))

    # --- pp -----------------------------------------------------------
    mesh = make_mesh(pipeline_parallel_size=pp)
    ctx = ParallelContext(pp_size=pp)
    modelN, paramsN = get_model(cfg, ctx, mesh=mesh)
    pp_params = split_pp_stages(paramsN, pp)
    specs = pp_param_specs(paramsN, pp_params)
    pp_params = place_pp(pp_params, specs, mesh)
    pp_caches = stack_pp_caches(
        [jnp.zeros(modelN.kv_cache_shape(nb, S), jnp.float32)
         for _ in range(modelN.num_layers)], pp)
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
    logits_d, _ = dec(pp_params, jnp.asarray(d_ids),
                      jnp.asarray(plens), pp_caches, meta_d,
                      jnp.asarray(plens))
    np.testing.assert_allclose(np.asarray(logits_d), np.asarray(ref_d),
                               rtol=2e-4, atol=2e-4)
