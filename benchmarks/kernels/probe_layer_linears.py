"""On-chip compile + correctness probe for the whole-layer linears
kernel (ops/quant_matmul.fused_layer_linears) at Llama-like shapes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python \
    benchmarks/kernels/probe_layer_linears.py
"""
import numpy as np
import jax
import jax.numpy as jnp

from vllm_quick_tpu.ops.quant_matmul import (fused_layer_linears,
                                             layer_linears_fusable)
from vllm_quick_tpu.ops.quant_formats import (quant_matmul_ref,
                                              quantize_reference)


def main():
    rng = np.random.default_rng(0)
    t, d, f, nq = 1, 4096, 2816, 12288
    eps = 1e-6

    def qw(k, n):
        return quantize_reference(
            rng.standard_normal((k, n)).astype(np.float32) * 0.02)

    qw_o = qw(d, d)
    qw13 = qw(d, 2 * f)
    qw2 = qw(f, d)
    qw_qkv = qw(d, nq)
    assert layer_linears_fusable(qw_o, qw13, qw2, qw_qkv)

    ao = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    res = jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.bfloat16)
    wp = jnp.asarray(1.0 + 0.1 * rng.standard_normal((d,)), jnp.bfloat16)
    wn = jnp.asarray(1.0 - 0.1 * rng.standard_normal((d,)), jnp.bfloat16)

    for qq, tag in ((qw_qkv, "with_qkv"), (None, "final")):
        out, r2 = jax.jit(
            lambda a, r, qq=qq: fused_layer_linears(
                a, r, wp, wn, qw_o, qw13, qw2, qq, eps=eps))(ao, res)
        out = np.asarray(out, np.float32)

        y_o = quant_matmul_ref(ao, qw_o).astype(jnp.float32)
        r1 = y_o + res.astype(jnp.float32)

        def norm(v, w):
            var = jnp.mean(v * v, axis=-1, keepdims=True)
            return (v * jax.lax.rsqrt(var + eps)
                    * w.astype(jnp.float32)).astype(jnp.bfloat16)

        x1 = norm(r1, wp)
        gu = quant_matmul_ref(x1, qw13)
        g, u = jnp.split(gu, 2, axis=-1)
        hh = (jax.nn.silu(g.astype(jnp.float32))
              * u.astype(jnp.float32)).astype(jnp.bfloat16)
        y = quant_matmul_ref(hh, qw2).astype(jnp.float32)
        r2w = y + r1.astype(jnp.bfloat16).astype(jnp.float32)
        x2 = norm(r2w, wn)
        want = np.asarray(quant_matmul_ref(x2, qq) if qq is not None
                          else x2, np.float32)
        err = np.abs(out - want).max()
        ref = np.abs(want).max()
        print(f"{tag}: maxabserr={err:.5f} refmax={ref:.3f} "
              f"rel={err / ref:.5f}")
        assert err / ref < 3e-2, tag
        r2e = np.abs(np.asarray(r2, np.float32)
                     - np.asarray(r2w.astype(jnp.bfloat16),
                                  np.float32)).max()
        print(f"{tag}: r2 err={r2e:.5f}")
    print("OK")


if __name__ == "__main__":
    main()
