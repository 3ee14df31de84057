"""Context-parallel (sp) inference over a device mesh.

Demonstrates the sp building blocks end to end: a prompt sharded into
per-rank chunks prefills via ring attention, then tokens decode over
the sp-sharded paged KV pool (partial attention + log-sum-exp
combine). Runs on any mesh — real TPU chips or the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/offline_inference_sp.py

The reference rejects prompts longer than one scheduler batch
(core/scheduler.py:193-202); with sp, context scales with chips
instead. See docs/distributed.md ("Context parallelism").
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
    from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
    from vllm_quick_tpu.parallel.mesh import ParallelContext, make_mesh
    from vllm_quick_tpu.parallel.sharding import (make_sp_sharded_step,
                                                  param_pspecs,
                                                  shard_pytree)
    from transformers import LlamaConfig

    sp = int(os.environ.get("SP", "4"))
    assert len(jax.devices()) >= sp, "need >= SP devices"
    mesh = make_mesh(sequence_parallel_size=sp)
    ctx = ParallelContext(sp_size=sp)

    cfg = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=1024,
        rms_norm_eps=1e-6, tie_word_embeddings=False)
    model = LlamaForCausalLM(cfg, ctx=ctx, dtype="float32")
    params = model.init_dummy_params(seed=0)
    specs = param_pspecs(params)
    params = shard_pytree(params, specs, mesh)

    # One long prompt, sharded into sp contiguous chunks.
    s = 16                          # block size
    t = 64 * sp                     # prompt length (tl = 64 per rank)
    tl = t // sp
    bpr = tl // s                   # blocks per rank for the prompt
    max_new = 16
    grow = -(-max_new // s)         # growth blocks (on rank 0)
    nb_local = 1 + bpr + grow       # + local null block
    b = 1

    shape = model.kv_cache_shape(nb_local * sp, s)
    caches = [jnp.zeros(shape, jnp.float32)
              for _ in range(model.num_layers)]

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 500, size=(b, t)).astype(np.int32)
    pos = np.tile(np.arange(t, dtype=np.int32), (b, 1))
    sl = np.zeros((b, t), np.int32)
    for p in range(t):
        tt = p % tl
        sl[0, p] = (1 + tt // s) * s + tt % s
    plens = jnp.full((b,), t, jnp.int32)

    def _prefill_step(params, ids_, pos_, caches_, meta, plens_):
        hidden, caches_ = model.forward(params, ids_, pos_, caches_,
                                        meta)
        r = jax.lax.axis_index("sp")
        idx = jnp.clip(plens_ - 1 - r * hidden.shape[1], 0,
                       hidden.shape[1] - 1)
        h = jnp.take_along_axis(hidden, idx[:, None, None],
                                axis=1)[:, 0]
        return model.compute_logits(params, h), caches_

    def _decode_step(params, ids_, pos_, caches_, meta, plens_):
        hidden, caches_ = model.forward(params, ids_, pos_, caches_,
                                        meta)
        return model.compute_logits(params, hidden), caches_

    pre = make_sp_sharded_step(_prefill_step, mesh, specs,
                               is_prompt=True)
    dec = make_sp_sharded_step(_decode_step, mesh, specs,
                               is_prompt=False)

    meta = InputMetadata(is_prompt=True, slot_mapping=jnp.asarray(sl),
                         prompt_lens=plens)
    logits, caches = pre(params, jnp.asarray(ids), jnp.asarray(pos),
                         caches, meta, plens)
    owner = (t - 1) // tl
    tok = int(np.asarray(logits).reshape(sp, b, -1)[owner, 0].argmax())
    out = [tok]

    # Decode: growth blocks live on rank 0; other ranks' slot_mapping
    # points at their local null block 0 and their context excludes the
    # new token.
    bt_l = np.zeros((sp, b, bpr + grow), np.int32)
    for r in range(sp):
        bt_l[r, 0, :bpr] = 1 + np.arange(bpr)
    bt_l[0, 0, bpr:] = 1 + bpr + np.arange(grow)

    for i in range(max_new - 1):
        p_new = t + i
        cl_l = np.full((sp, b), tl, np.int32)
        cl_l[0, 0] = tl + i + 1
        sl_l = np.zeros((sp, b), np.int32)
        sl_l[0, 0] = (1 + bpr + i // s) * s + i % s
        meta_d = InputMetadata(
            is_prompt=False, slot_mapping=jnp.asarray(sl_l),
            context_lens=jnp.asarray(cl_l),
            block_tables=jnp.asarray(bt_l))
        logits, caches = dec(params, jnp.asarray([tok], np.int32),
                             jnp.asarray([p_new], np.int32), caches,
                             meta_d, plens)
        tok = int(np.asarray(logits)[0].argmax())
        out.append(tok)

    print(f"sp={sp}: prompt {t} tokens -> generated {len(out)} tokens:")
    print(out)


if __name__ == "__main__":
    main()
