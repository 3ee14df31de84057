"""Paged decode attention: Pallas kernel (interpret) and jnp reference vs
a straightforward per-sequence numpy oracle. Mirrors the grid style of
the reference's tests/kernels/test_attention.py."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_quick_tpu.ops.attention import (make_alibi_slopes,
                                          paged_decode_attention_ref,
                                          prefill_attention)
from vllm_quick_tpu.ops.cache_ops import reshape_and_cache
from vllm_quick_tpu.ops.paged_attention import paged_decode_attention


def oracle_decode(q, k_cache, v_cache, block_tables, context_lens, scale,
                  alibi=None, window=None):
    b, hq, d = q.shape
    _, hkv, bs, _ = k_cache.shape
    g = hq // hkv
    out = np.zeros((b, hq, d), dtype=np.float32)
    for i in range(b):
        ctx = int(context_lens[i])
        if ctx == 0:
            continue
        nb = -(-ctx // bs)
        ks = np.concatenate([k_cache[block_tables[i, j]]
                             for j in range(nb)], axis=1)[:, :ctx]
        vs = np.concatenate([v_cache[block_tables[i, j]]
                             for j in range(nb)], axis=1)[:, :ctx]
        lo = max(0, ctx - window) if window else 0
        for h in range(hq):
            kh = ks[h // g].astype(np.float32)
            vh = vs[h // g].astype(np.float32)
            logits = kh @ q[i, h].astype(np.float32) * scale
            if alibi is not None:
                logits += alibi[h] * (np.arange(ctx) - (ctx - 1))
            logits = logits[lo:ctx]
            p = np.exp(logits - logits.max())
            p /= p.sum()
            out[i, h] = p @ vh[lo:ctx]
    return out


def make_case(rng, b, hq, hkv, d, bs, max_blocks, dtype=jnp.float32):
    """Returns a fused [NB, 2, H, S, D] cache (ops/cache_ops.py layout)."""
    nb = b * max_blocks + 1
    kv_cache = jnp.asarray(rng.standard_normal((nb, 2, hkv, bs, d)),
                           dtype=dtype)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype=dtype)
    # Distinct physical blocks (block 0 = null, never used).
    perm = rng.permutation(nb - 1)[:b * max_blocks] + 1
    block_tables = jnp.asarray(perm.reshape(b, max_blocks), dtype=jnp.int32)
    context_lens = jnp.asarray(
        rng.integers(1, bs * max_blocks + 1, size=(b,)), dtype=jnp.int32)
    return q, kv_cache, block_tables, context_lens


@pytest.mark.parametrize("b,hq,hkv,d,bs,mb", [
    (2, 4, 4, 128, 16, 4),    # MHA
    (3, 8, 2, 128, 16, 3),    # GQA
    (1, 8, 1, 128, 16, 8),    # MQA
    (5, 4, 4, 64, 16, 2),     # small head_dim
])
def test_ref_matches_oracle(rng, b, hq, hkv, d, bs, mb):
    q, kv, bt, cl = make_case(rng, b, hq, hkv, d, bs, mb)
    kc, vc = kv[:, 0], kv[:, 1]
    scale = d**-0.5
    got = np.asarray(paged_decode_attention_ref(q, kc, vc, bt, cl, scale))
    want = oracle_decode(np.asarray(q), np.asarray(kc), np.asarray(vc),
                         np.asarray(bt), np.asarray(cl), scale)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("b,hq,hkv,d,bs,mb", [
    (2, 4, 4, 128, 16, 4),
    (3, 8, 2, 128, 16, 3),
    (2, 16, 2, 128, 16, 2),   # group > 8
])
def test_pallas_matches_ref(rng, b, hq, hkv, d, bs, mb):
    q, kv, bt, cl = make_case(rng, b, hq, hkv, d, bs, mb,
                              dtype=jnp.bfloat16)
    scale = d**-0.5
    got = np.asarray(
        paged_decode_attention(q, kv, bt, cl, scale, interpret=True),
        dtype=np.float32)
    want = np.asarray(
        paged_decode_attention_ref(q, kv[:, 0], kv[:, 1], bt, cl, scale),
        dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_pallas_contiguous_block_tables(rng):
    """Sequentially allocated block tables take the kernel's fused
    one-DMA-per-window fast path; result must match the scattered path
    (which the permuted make_case tables exercise)."""
    b, hq, hkv, d, bs, mb = 2, 8, 8, 128, 16, 8
    nb = b * mb + 1
    kv = jnp.asarray(rng.standard_normal((nb, 2, hkv, bs, d)),
                     jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    bt = jnp.asarray(
        np.arange(1, 1 + b * mb, dtype=np.int32).reshape(b, mb))
    # One full-window context and one mid-window tail.
    cl = jnp.asarray([bs * mb, bs * mb - 21], jnp.int32)
    scale = d**-0.5
    got = np.asarray(
        paged_decode_attention(q, kv, bt, cl, scale, interpret=True),
        dtype=np.float32)
    want = np.asarray(
        paged_decode_attention_ref(q, kv[:, 0], kv[:, 1], bt, cl, scale),
        dtype=np.float32)
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_pallas_sliding_window_and_alibi(rng):
    b, hq, hkv, d, bs, mb = 2, 8, 4, 128, 16, 4
    q, kv, bt, cl = make_case(rng, b, hq, hkv, d, bs, mb,
                              dtype=jnp.bfloat16)
    scale = d**-0.5
    alibi = make_alibi_slopes(hq)
    for window in (None, 20):
        got = np.asarray(paged_decode_attention(
            q, kv, bt, cl, scale, alibi_slopes=alibi,
            sliding_window=window, interpret=True), dtype=np.float32)
        want = oracle_decode(np.asarray(q, np.float32),
                             np.asarray(kv[:, 0], np.float32),
                             np.asarray(kv[:, 1], np.float32),
                             np.asarray(bt),
                             np.asarray(cl), scale,
                             alibi=np.asarray(alibi), window=window)
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_prefill_then_decode_consistency(rng):
    """Write a prompt via reshape_and_cache, then decode step must attend
    over exactly the cached prompt + itself."""
    hq = hkv = 2
    d, bs = 64, 16
    ctx = 21
    nb = 8
    kv_cache = jnp.zeros((nb, 2, hkv, bs, d), dtype=jnp.float32)
    keys = jnp.asarray(rng.standard_normal((ctx, hkv, d)), jnp.float32)
    vals = jnp.asarray(rng.standard_normal((ctx, hkv, d)), jnp.float32)
    blocks = [3, 5]
    slots = jnp.asarray([blocks[t // bs] * bs + t % bs for t in range(ctx)],
                        dtype=jnp.int32)
    kv_cache = reshape_and_cache(keys, vals, kv_cache, slots)
    q = jnp.asarray(rng.standard_normal((1, hq, d)), jnp.float32)
    bt = jnp.asarray([[3, 5, 0, 0]], dtype=jnp.int32)
    cl = jnp.asarray([ctx], dtype=jnp.int32)
    got = np.asarray(paged_decode_attention_ref(q, kv_cache[:, 0],
                                                kv_cache[:, 1], bt, cl,
                                                d**-0.5))
    # oracle directly from keys/vals
    out = np.zeros((1, hq, d), np.float32)
    for h in range(hq):
        logits = np.asarray(keys)[:, h] @ np.asarray(q)[0, h] * d**-0.5
        p = np.exp(logits - logits.max())
        p /= p.sum()
        out[0, h] = p @ np.asarray(vals)[:, h]
    np.testing.assert_allclose(got, out, rtol=2e-3, atol=2e-3)


def test_reshape_and_cache_prefill_matches_flat(rng):
    """Block-granular prefill write must produce the same cache as the
    per-token path for block-aligned prompts (incl. padded tails)."""
    from vllm_quick_tpu.ops.cache_ops import reshape_and_cache_prefill
    b, l, h, s, d, nb = 2, 48, 4, 16, 64, 12
    key = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    val = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    # seq 0: full 48 tokens over blocks [3, 7, 2]; seq 1: 21 tokens over
    # blocks [5, 9] with pad slots 0 afterwards.
    blocks0, blocks1 = [3, 7, 2], [5, 9, 0]
    slots = np.zeros((b, l), np.int32)
    for t in range(48):
        slots[0, t] = blocks0[t // s] * s + t % s
    for t in range(21):
        slots[1, t] = blocks1[t // s] * s + t % s
    slots = jnp.asarray(slots)
    cache0 = jnp.zeros((nb, 2, h, s, d), jnp.float32)
    got = reshape_and_cache_prefill(key, val, cache0, slots)
    want = reshape_and_cache(key.reshape(-1, h, d), val.reshape(-1, h, d),
                             cache0, slots.reshape(-1))
    # Compare only real-token positions: the block path may write
    # garbage to tail positions of the last block / the null block.
    for seq, blocks, n in ((0, blocks0, 48), (1, blocks1, 21)):
        for t in range(n):
            blk, off = blocks[t // s], t % s
            np.testing.assert_array_equal(
                np.asarray(got[blk, :, :, off]),
                np.asarray(want[blk, :, :, off]))


def test_prefill_attention_masks_pads(rng):
    b, l, hq, hkv, d = 2, 12, 4, 2, 64
    q = jnp.asarray(rng.standard_normal((b, l, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, hkv, d)), jnp.float32)
    lens = jnp.asarray([12, 7], jnp.int32)
    out = prefill_attention(q, k, v, lens, d**-0.5)
    # Row i of seq 1 (i < 7) must be unaffected by tokens >= 7:
    out2 = prefill_attention(q[:, :7], k[:, :7], v[:, :7],
                             jnp.asarray([7, 7], jnp.int32), d**-0.5)
    np.testing.assert_allclose(np.asarray(out[1, :7]),
                               np.asarray(out2[1]), rtol=1e-4, atol=1e-4)


def test_decode_partials_combine_matches_full(rng):
    """The partials variant (sp combine inputs) must reconstruct the
    full-context attention exactly when combined across two pool
    shards — interpret-mode check of the kernel's (acc, l, m) contract
    (real-TPU compile covered by the on-chip microbench)."""
    import jax.numpy as jnp
    from vllm_quick_tpu.ops.attention import paged_decode_attention_ref
    from vllm_quick_tpu.ops.paged_attention import (
        paged_decode_attention_partials)

    b, hq, hkv, d, s = 2, 4, 2, 128, 8
    nb_local, mb_local = 5, 4
    sp = 2
    cache = jnp.asarray(
        rng.standard_normal((nb_local * sp, 2, hkv, s, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)

    bt_global = np.zeros((b, mb_local * sp), np.int32)
    for i in range(b):
        for j in range(mb_local * sp):
            r = j // mb_local
            bt_global[i, j] = r * nb_local + j % mb_local + i
    ctx = np.asarray([mb_local * sp * s - 3, s + 2], np.int32)
    ref = paged_decode_attention_ref(
        q, cache[:, 0], cache[:, 1], jnp.asarray(bt_global),
        jnp.asarray(ctx), d ** -0.5)

    outs = []
    for r in range(sp):
        shard = cache[r * nb_local:(r + 1) * nb_local]
        bt_l = bt_global[:, r * mb_local:(r + 1) * mb_local] \
            - r * nb_local
        cl_l = np.clip(ctx - r * mb_local * s, 0, mb_local * s)
        outs.append(paged_decode_attention_partials(
            q, shard, jnp.asarray(bt_l), jnp.asarray(cl_l), d ** -0.5,
            interpret=True))
    import numpy as np_
    ms = jnp.stack([o[2] for o in outs])
    mg = jnp.max(ms, axis=0)
    mg_safe = jnp.where(jnp.isfinite(mg), mg, 0.0)
    num = sum(o[0] * jnp.where(jnp.isfinite(o[2]),
                               jnp.exp(o[2] - mg_safe), 0.0)[..., None]
              for o in outs)
    den = sum(o[1] * jnp.where(jnp.isfinite(o[2]),
                               jnp.exp(o[2] - mg_safe), 0.0)
              for o in outs)
    combined = num / jnp.maximum(den[..., None], 1e-20)
    np_.testing.assert_allclose(np_.asarray(combined, np_.float32),
                                np_.asarray(ref, np_.float32),
                                rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("b,hq,hkv,d,bs,mb,cache_dtype", [
    (2, 4, 4, 128, 16, 4, jnp.float32),       # MHA
    (3, 8, 2, 128, 16, 3, jnp.float32),       # GQA
    (1, 8, 8, 128, 32, 4, jnp.float8_e5m2),   # fp8 KV, block 32
])
def test_fused_rope_write_matches_unfused(rng, b, hq, hkv, d, bs, mb,
                                          cache_dtype):
    """The single-call rope+write+attend kernel must produce the SAME
    cache state and attention output as the unfused pipeline
    (rope -> reshape_and_cache -> paged_decode_attention_ref)."""
    from vllm_quick_tpu.model_executor.layers.rotary_embedding import (
        RotaryEmbedding)
    from vllm_quick_tpu.ops.paged_attention import (
        paged_decode_attention_fused)

    q0, kv, bt, cl = make_case(rng, b, hq, hkv, d, bs, mb,
                               dtype=jnp.float32)
    kv = kv.astype(cache_dtype)
    # Decode step: context_lens INCLUDES the current token; its slot is
    # position cl-1 within the sequence's block list.
    cl = jnp.maximum(cl, 1)
    pos = cl - 1
    rows = jnp.arange(b)
    slots = bt[rows, pos // bs] * bs + pos % bs
    # bf16 activations: what the qkv projection emits in production —
    # and what aligns the two paths' fp8 rounding exactly.
    q0 = q0.astype(jnp.bfloat16).astype(jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((b, hkv, d)),
                        jnp.bfloat16).astype(jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((b, hkv, d)),
                        jnp.bfloat16).astype(jnp.float32)

    rope = RotaryEmbedding(d, d, 4096, 10000.0, is_neox_style=True)
    scale = d**-0.5

    # Unfused reference pipeline (mimics layers/attention.py);
    # rope() expects [..., heads, d] with positions [...].
    qr, kr = rope(pos, q0, k_new)
    kv_ref = reshape_and_cache(kr.astype(cache_dtype).astype(jnp.float32)
                               .astype(cache_dtype),
                               v_new.astype(cache_dtype), kv, slots)
    want = oracle_decode(np.asarray(qr, np.float32),
                         np.asarray(kv_ref[:, 0], np.float32),
                         np.asarray(kv_ref[:, 1], np.float32),
                         np.asarray(bt), np.asarray(cl), scale)

    # Fused path: cos/sin rows duplicated across halves ([B, 2, D]).
    cs = rope.cos_sin[pos]                           # [B, d] (cos|sin)
    cos_h, sin_h = jnp.split(cs, 2, axis=-1)
    cos_sin = jnp.stack([jnp.concatenate([cos_h, cos_h], axis=-1),
                         jnp.concatenate([sin_h, sin_h], axis=-1)],
                        axis=1)                      # [B, 2, d]
    got, kv_got = paged_decode_attention_fused(
        q0, k_new, v_new, cos_sin, kv, bt, cl, slots, scale,
        interpret=True)

    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-2, atol=2e-2)
    # Cache state identical to the unfused write.
    np.testing.assert_allclose(
        np.asarray(kv_got, np.float32), np.asarray(kv_ref, np.float32),
        rtol=1e-2, atol=1e-2)
