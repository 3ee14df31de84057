"""Probe: where does prefill GEMM time go at M=512 on the real chip?

Compares, per 7B layer shape:
  1. plain XLA bf16 GEMM            (the ceiling XLA can reach)
  2. Pallas dense bf16 GEMM         (same 3-D tiling; isolates the
                                     grid/pipeline cost from dequant)
  3. fused INT4 prefill kernel      (adds in-kernel dequant)
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vllm_quick_tpu.ops import quant_formats as qf
from vllm_quick_tpu.ops.quant_matmul import (_choose_tiles_prefill,
                                             quant_matmul)

SHAPES = [(4096, 4096), (4096, 22016)]
ITERS = 20


def bench(f, *args):
    def loop(x, rest):
        def body(c, _):
            y = f(x + c * 0.0, *rest)
            return y.reshape(-1)[0].astype(x.dtype), None
        out, _ = jax.lax.scan(body, x.dtype.type(0.0), None, length=ITERS)
        return out
    g = jax.jit(loop)
    g(args[0], args[1:]).block_until_ready()
    t0 = time.perf_counter()
    g(args[0], args[1:]).block_until_ready()
    return (time.perf_counter() - t0) / ITERS


def dense_kernel(x_ref, w_ref, o_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k", "tile_n"))
def pallas_dense(x, w, *, tile_m, tile_k, tile_n):
    mp, kp = x.shape
    np_ = w.shape[1]
    grid = (mp // tile_m, np_ // tile_n, kp // tile_k)
    return pl.pallas_call(
        dense_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, tile_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((tile_k, tile_n), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((tile_m, tile_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(x, w)


def main():
    m = 512
    rng = np.random.default_rng(0)
    print("devices:", jax.devices())
    peak = 197e12
    for k, n in SHAPES:
        kp = -(-k // 1024) * 1024
        x = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        xp = jnp.asarray(rng.standard_normal((m, kp)), dtype=jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05,
                        dtype=jnp.bfloat16)
        wp = jnp.asarray(rng.standard_normal((kp, n)) * 0.05,
                         dtype=jnp.bfloat16)
        flops = 2 * m * k * n

        t1 = bench(lambda x: jnp.dot(x, w,
                                     preferred_element_type=jnp.float32)
                   .astype(jnp.bfloat16), x)

        tile_k, tile_n = _choose_tiles_prefill(kp, -(-n // 128) * 128, m)
        t2 = bench(lambda x: pallas_dense(x, wp, tile_m=m, tile_k=tile_k,
                                          tile_n=tile_n), xp)

        qw = qf.quantize_reference(
            (rng.standard_normal((k, n)) * 0.05).astype(np.float32))
        t3 = bench(lambda x: quant_matmul(x, qw, use_kernel=True,
                                          interpret=False), x)

        # W4A8: s8 x s8 MXU dots (peak 2x bf16 on v5e) + per-token
        # activation quantization. Failure to compile (older Mosaic
        # without s8 dot support) is reported, not fatal.
        import os as _os
        try:
            _os.environ["VLLM_TPU_W4A8"] = "1"
            t4 = bench(lambda x: quant_matmul(x, qw, use_kernel=True,
                                              interpret=False), x)
            w4a8 = f"w4a8 {t4*1e6:7.1f}us ({flops/t4/peak*100:4.1f}%)"
        except Exception as e:  # pragma: no cover - chip-dependent
            w4a8 = f"w4a8 FAILED ({type(e).__name__})"
        finally:
            del _os.environ["VLLM_TPU_W4A8"]

        print(f"K={k:6d} N={n:6d} tiles=({tile_k},{tile_n}): "
              f"XLA {t1*1e6:7.1f}us ({flops/t1/peak*100:4.1f}%)  "
              f"pallas-dense {t2*1e6:7.1f}us ({flops/t2/peak*100:4.1f}%)  "
              f"fused-int4 {t3*1e6:7.1f}us ({flops/t3/peak*100:4.1f}%)  "
              f"{w4a8}")


if __name__ == "__main__":
    main()
