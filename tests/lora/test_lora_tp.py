"""Multi-LoRA under tensor parallelism.

The adapter stacks shard with their base layer (B's output axis for
col-parallel, A's input axis for row-parallel; reference
lora/layers.py:281-781), so a tp=2 sharded step with an active adapter
must reproduce the tp=1 logits exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.lora.test_lora import _make_adapter
from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.config import LoRAConfig, ModelConfig
from vllm_quick_tpu.lora.models import LoRAModel, LoRAModelManager
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model
from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
from vllm_quick_tpu.parallel.sharding import (make_sharded_step,
                                              param_pspecs)

BLOCK = 16


def _step_fn(model):
    def _step(params, input_ids, positions, kv_caches, meta, prompt_lens):
        hidden, new_caches = model.forward(params, input_ids, positions,
                                           kv_caches, meta)
        idx = jnp.maximum(prompt_lens - 1, 0)
        hidden = jnp.take_along_axis(
            hidden, idx[:, None, None], axis=1)[:, 0]
        logits = model.compute_logits(params, hidden)
        return logits, new_caches
    return _step


def _prompt_inputs(slot: int):
    ids = np.array([[3, 5, 7, 11, 13, 17, 19, 23],
                    [2, 4, 6, 8, 10, 12, 14, 16]], np.int32)
    pos = np.tile(np.arange(8, dtype=np.int32), (2, 1))
    slots = np.stack([np.arange(8) + 1 * BLOCK,
                      np.arange(8) + 2 * BLOCK]).astype(np.int32)
    lora_idx = np.full((2, 8), slot, np.int32)
    meta = InputMetadata(is_prompt=True,
                         slot_mapping=jnp.asarray(slots),
                         prompt_lens=jnp.asarray([8, 8], np.int32),
                         lora_indices=jnp.asarray(lora_idx))
    return (jnp.asarray(ids), jnp.asarray(pos), meta,
            jnp.asarray([8, 8], np.int32))


def _caches(model, tp=1, num_blocks=8):
    shape = model.kv_cache_shape(num_blocks, BLOCK)
    shape = shape[:2] + (shape[2] * tp,) + shape[3:]
    return [jnp.zeros(shape, jnp.float32)
            for _ in range(model.num_layers)]


@pytest.mark.parametrize("tp", [2])
def test_lora_tp_matches_single_chip(tp):
    model_dir = make_tiny_llama_dir(key="lora_tp_base")
    adapter_dir, _ = _make_adapter(model_dir, seed=11)
    lora_model = LoRAModel.from_local_checkpoint(adapter_dir, 7)
    cfg = ModelConfig(model=model_dir, dtype="float32", seed=0)
    lc = LoRAConfig(max_lora_rank=8, max_loras=2)

    # tp=1 ground truth with the adapter active.
    model1, params1 = get_model(cfg, ParallelContext())
    mgr1 = LoRAModelManager(params1, model1, lc, dtype=jnp.float32)
    slot1 = mgr1.ensure_loaded([lora_model])[7]
    step1 = jax.jit(_step_fn(model1))
    p_in = _prompt_inputs(slot1)
    logits1, _ = step1(params1, *p_in[:2], _caches(model1), *p_in[2:])

    # tp-sharded with the same adapter written into sharded stacks.
    mesh = make_mesh(tensor_parallel_size=tp)
    ctx = ParallelContext(tp_size=tp)
    modelN, paramsN = get_model(cfg, ctx, mesh=mesh)
    mgrN = LoRAModelManager(paramsN, modelN, lc, dtype=jnp.float32,
                            mesh=mesh)
    slotN = mgrN.ensure_loaded([lora_model])[7]
    # Specs derived AFTER the stacks exist so they join the pytree.
    specs = param_pspecs(paramsN)
    stepN = make_sharded_step(_step_fn(modelN), mesh, specs,
                              donate_caches=False)
    p_inN = _prompt_inputs(slotN)
    logitsN, _ = stepN(paramsN, *p_inN[:2], _caches(modelN, tp=tp),
                       *p_inN[2:])

    np.testing.assert_allclose(np.asarray(logits1), np.asarray(logitsN),
                               rtol=2e-4, atol=2e-4)

    # Sanity: the adapter actually changes the logits.
    p_base = _prompt_inputs(-1)
    base1, _ = step1(params1, *p_base[:2], _caches(model1), *p_base[2:])
    assert not np.allclose(np.asarray(base1), np.asarray(logits1),
                           atol=1e-3)
