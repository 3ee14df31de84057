"""Ring-attention prefill + sp decode combine vs single-device refs.

Runs on the 8-virtual-CPU-device mesh (conftest). The references are
the same functions the single-chip execution path uses
(ops/attention.py), so agreement here means enabling sp changes the
math by epsilon only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from vllm_quick_tpu.ops.attention import (paged_decode_attention_ref,
                                          prefill_attention)
from vllm_quick_tpu.ops.ring_attention import (ring_prefill_attention,
                                               sp_decode_attention)


def _mesh(sp):
    return Mesh(np.asarray(jax.devices()[:sp]), ("sp",))


@pytest.mark.parametrize("sp", [2, 4])
@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2)])
def test_ring_prefill_matches_reference(rng, sp, hq, hkv):
    b, t, d = 2, 32, 16
    tl = t // sp
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    # One full-length prompt, one padded (tests the global pad mask).
    prompt_lens = jnp.asarray([t, t - 5], jnp.int32)

    ref = prefill_attention(q, k, v, prompt_lens, scale)

    mesh = _mesh(sp)
    ring = jax.jit(jax.shard_map(
        lambda q, k, v, pl: ring_prefill_attention(
            q, k, v, pl, scale, "sp", sp),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P()),
        out_specs=P(None, "sp"), check_vma=False))
    out = ring(q, k, v, prompt_lens)

    # Positions beyond the prompt are don't-care (ref produces values
    # there from pad K/V; ring masks them) — compare valid rows only.
    for i, pl in enumerate([t, t - 5]):
        np.testing.assert_allclose(np.asarray(out[i, :pl]),
                                   np.asarray(ref[i, :pl]),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_decode_matches_reference(rng, sp):
    b, hq, hkv, d, bs = 2, 4, 2, 16, 8
    nb_local, mb_local = 5, 4
    nb, mb = nb_local * sp, mb_local * sp
    scale = d ** -0.5

    # Fused cache [NB, 2, Hkv, S, D]; shard r owns blocks
    # [r*nb_local, (r+1)*nb_local).
    cache = jnp.asarray(
        rng.standard_normal((nb, 2, hkv, bs, d)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)

    # Sequence blocks assigned ROUND-ROBIN-in-chunks: logical block j of
    # a sequence lives on rank j // mb_local (contiguous chunks), using
    # per-rank pool ids. Global table uses matching global ids.
    bt_global = np.zeros((b, mb), np.int32)
    for i in range(b):
        for j in range(mb):
            r = j // mb_local
            bt_global[i, j] = (r * nb_local + (j % mb_local)
                               + i % (nb_local - mb_local + 1))
    ctx = np.asarray([mb * bs - 3, 2 * bs + 5], np.int32)

    ref = paged_decode_attention_ref(
        q, cache[:, 0], cache[:, 1], jnp.asarray(bt_global),
        jnp.asarray(ctx), scale)

    # Per-rank local views: table columns for rank r, ids made local;
    # local context = valid tokens within this rank's chunk of the
    # sequence.
    bt_local = np.zeros((sp, b, mb_local), np.int32)
    ctx_local = np.zeros((sp, b), np.int32)
    for r in range(sp):
        cols = slice(r * mb_local, (r + 1) * mb_local)
        bt_local[r] = bt_global[:, cols] - r * nb_local
        ctx_local[r] = np.clip(ctx - r * mb_local * bs, 0,
                               mb_local * bs)

    mesh = _mesh(sp)
    cache_sh = cache.reshape(sp, nb_local, 2, hkv, bs, d)
    f = jax.jit(jax.shard_map(
        lambda q, c, bt, cl: sp_decode_attention(
            q, c[0], bt[0], cl[0], scale, "sp"),
        mesh=mesh,
        in_specs=(P(), P("sp"), P("sp"), P("sp")),
        out_specs=P(), check_vma=False))
    out = f(q, cache_sh, jnp.asarray(bt_local), jnp.asarray(ctx_local))

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_prefill_ksliced_long_chunk(rng):
    """Chunks > 512 use the O(Tl*512) k-sliced inner loop — same math."""
    sp, b, t, hq, hkv, d = 2, 1, 2048, 2, 2, 8
    tl = t // sp
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    pl_ = jnp.asarray([t - 100], jnp.int32)
    ref = prefill_attention(q, k, v, pl_, scale)
    mesh = _mesh(sp)
    ring = jax.jit(jax.shard_map(
        lambda q, k, v, p: ring_prefill_attention(
            q, k, v, p, scale, "sp", sp),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P()),
        out_specs=P(None, "sp"), check_vma=False))
    out = ring(q, k, v, pl_)
    np.testing.assert_allclose(np.asarray(out[0, :t - 100]),
                               np.asarray(ref[0, :t - 100]),
                               rtol=2e-4, atol=2e-4)


def test_ring_prefill_block_strided_layout(rng):
    """Explicit positions admit ANY chunk-to-rank layout: here the
    engine's block-strided one (block j of the sequence on rank
    j % sp), which also balances causal work across ranks."""
    sp, b, t, hq, hkv, d, blk = 4, 2, 64, 4, 2, 16, 8
    tl = t // sp
    scale = d ** -0.5
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)), jnp.float32)
    prompt_lens = jnp.asarray([t, t - 11], jnp.int32)
    ref = prefill_attention(q, k, v, prompt_lens, scale)

    # Permute the T axis so rank r's contiguous shard holds the tokens
    # of blocks r, r+sp, r+2sp, ... (positions array carries truth).
    perm = np.concatenate([
        np.concatenate([np.arange(j * blk, (j + 1) * blk)
                        for j in range(t // blk) if j % sp == r])
        for r in range(sp)])
    pos_perm = np.tile(perm[None, :], (b, 1)).astype(np.int32)

    mesh = _mesh(sp)
    ring = jax.jit(jax.shard_map(
        lambda q, k, v, pl, pos: ring_prefill_attention(
            q, k, v, pl, scale, "sp", sp, positions=pos),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp"), P(),
                  P(None, "sp")),
        out_specs=P(None, "sp"), check_vma=False))
    out = ring(q[:, perm], k[:, perm], v[:, perm], prompt_lens,
               jnp.asarray(pos_perm))

    ref_perm = np.asarray(ref)[:, perm]
    for i, pl in enumerate([t, t - 11]):
        valid = perm < pl
        np.testing.assert_allclose(np.asarray(out)[i, valid[:t]],
                                   ref_perm[i, valid[:t]],
                                   rtol=2e-5, atol=2e-5)
