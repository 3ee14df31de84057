"""fused_moe vs a per-token loop reference (mirror of the reference's
tests/kernels/test_moe.py: Triton fused_moe vs torch loop)."""
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.ops.fused_moe import fused_moe, moe_routing


def ref_moe(x, logits, w13, w2, top_k, renormalize):
    t, d = x.shape
    e = w13.shape[0]
    weights = np.exp(logits - logits.max(-1, keepdims=True))
    weights = weights / weights.sum(-1, keepdims=True)
    out = np.zeros((t, d), np.float32)
    for i in range(t):
        top = np.argsort(-weights[i])[:top_k]
        ws = weights[i][top]
        if renormalize:
            ws = ws / ws.sum()
        for wexp, eidx in zip(ws, top):
            h = x[i] @ w13[eidx]
            g, u = np.split(h, 2)
            act = g / (1 + np.exp(-g)) * u
            out[i] += wexp * (act @ w2[eidx])
    return out


def test_fused_moe_matches_loop():
    rng = np.random.default_rng(0)
    t, d, f, e, k = 7, 16, 24, 6, 2
    x = rng.standard_normal((t, d)).astype(np.float32)
    logits = rng.standard_normal((t, e)).astype(np.float32)
    w13 = rng.standard_normal((e, d, 2 * f)).astype(np.float32) * 0.1
    w2 = rng.standard_normal((e, f, d)).astype(np.float32) * 0.1

    for renorm in (True, False):
        gate = moe_routing(jnp.asarray(logits), k, renormalize=renorm)
        got = fused_moe(jnp.asarray(x), gate, jnp.asarray(w13),
                        jnp.asarray(w2))
        want = ref_moe(x, logits, w13, w2, k, renorm)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)
