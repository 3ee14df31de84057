"""Full TPU-fused decode stack vs the plain fallback path, on CPU.

On TPU the decode step runs: fused norm+qkv kernel -> fused
rope+cache-write+attend kernel -> fused o+norm+MLP kernel -> streaming
lm_head. None of that executes in the CPU test suite by default (the
gates check default_backend_is_tpu / use_pallas_attention), so this
test forces every fused kernel on in interpret mode and checks the
resulting greedy decode is token-identical to the unfused CPU path on
the same quantized checkpoint — the regression net over the whole
composed decode program, not just each kernel alone.
"""
import functools

import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.config import ModelConfig
from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.model_loader import get_model


def _greedy_decode(model, params, prompt, n_steps, block_size=16):
    kv_caches = [
        jnp.zeros(model.kv_cache_shape(16, block_size), jnp.float32)
        for _ in range(model.num_layers)
    ]
    l = len(prompt)
    ids = jnp.asarray([prompt], jnp.int32)
    pos = jnp.arange(l, dtype=jnp.int32)[None, :]
    slots = jnp.asarray(
        [[(1 + t // block_size) * block_size + t % block_size
          for t in range(l)]], jnp.int32)
    meta = InputMetadata(is_prompt=True, slot_mapping=slots,
                         prompt_lens=jnp.asarray([l], jnp.int32))
    hidden, kv_caches = model.forward(params, ids, pos, kv_caches, meta)
    logits = model.compute_logits(params, hidden)
    token = int(np.argmax(np.asarray(logits[0, l - 1], np.float32)))
    out = [token]
    ctx = l
    for _ in range(n_steps - 1):
        p = ctx
        ctx += 1
        slot = (1 + p // block_size) * block_size + p % block_size
        meta = InputMetadata(
            is_prompt=False,
            slot_mapping=jnp.asarray([slot], jnp.int32),
            context_lens=jnp.asarray([ctx], jnp.int32),
            block_tables=jnp.asarray([[1 + j for j in range(8)]],
                                     jnp.int32))
        hidden, kv_caches = model.forward(
            params, jnp.asarray([token], jnp.int32),
            jnp.asarray([p], jnp.int32), kv_caches, meta)
        logits = model.compute_logits(params, hidden)
        token = int(np.argmax(np.asarray(logits[0], np.float32)))
        out.append(token)
    return out


@pytest.fixture(scope="module")
def tiny_awq_dir(tmp_path_factory):
    from benchmarks.make_synthetic_checkpoint import generate
    d = str(tmp_path_factory.mktemp("awq") / "ckpt")
    generate(d, preset="tiny", group_size=128)
    return d


def test_fused_stack_matches_plain_decode(tiny_awq_dir, monkeypatch):
    import vllm_quick_tpu.ops.dense_matmul as dm
    import vllm_quick_tpu.ops.paged_attention as pa
    import vllm_quick_tpu.ops.quant_matmul as qm

    mc = ModelConfig(model=tiny_awq_dir, dtype="float32")
    model, params = get_model(mc)
    prompt = [1, 9, 77, 5, 123, 40]
    n_steps = 6

    plain = _greedy_decode(model, params, prompt, n_steps)

    # Force every TPU-fused decode kernel on, in interpret mode.
    monkeypatch.setenv("VLLM_TPU_FUSED_O_MLP", "1")
    monkeypatch.setattr(qm, "default_backend_is_tpu", lambda: True)
    for name in ("fused_qkv_norm", "fused_mlp_norm", "fused_mlp",
                 "fused_o_mlp_norm"):
        monkeypatch.setattr(qm, name, functools.partial(
            getattr(qm, name), interpret=True))
    monkeypatch.setattr(qm, "quant_matmul", functools.partial(
        qm.quant_matmul, interpret=True))
    monkeypatch.setattr(pa, "use_pallas_attention", lambda *a, **k: True)
    monkeypatch.setattr(pa, "paged_decode_attention_fused",
                        functools.partial(pa.paged_decode_attention_fused,
                                          interpret=True))
    monkeypatch.setattr(pa, "paged_decode_attention",
                        functools.partial(pa.paged_decode_attention,
                                          interpret=True))
    monkeypatch.setattr(dm, "dense_matmul_small_m", functools.partial(
        dm.dense_matmul_small_m, interpret=True))

    # Rebuild the model so layer gates re-evaluate under the patches.
    model2, params2 = get_model(mc)
    fused = _greedy_decode(model2, params2, prompt, n_steps)
    assert fused == plain, (fused, plain)
