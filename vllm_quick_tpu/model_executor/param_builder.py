"""Builds model parameter pytrees from HF checkpoint tensors.

The TPU restatement of the reference's per-parameter ``weight_loader``
machinery (vllm/model_executor/layers/linear.py loaders + model
``load_weights``, e.g. llama.py:346-387): fused-shard concatenation
(qkv, gate+up), tensor-parallel slicing at load time, KV-head
replication when tp > num_kv_heads (config.py:259-267), and quantized
tensor ingestion (AWQ/GPTQ -> TPU packed format, ops/quant_formats.py).

Quantized tensors are first unpacked to a *canonical* form
(q [K, N] int, zeros/scales [K/G, N] float) so TP slicing is uniform
across checkpoint formats, then re-packed into the TPU layout.
"""
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.model_executor.layers.linear import LinearWeights
from vllm_quick_tpu.model_executor.weight_utils import QuantCheckpointConfig
from vllm_quick_tpu.ops import quant_formats as qf


class ParamBuilder:
    """Stateless helpers bound to one checkpoint + TP rank."""

    def __init__(
        self,
        weights: Dict[str, np.ndarray],
        quant: Optional[QuantCheckpointConfig],
        dtype: str = "bfloat16",
        tp_rank: int = 0,
        tp_size: int = 1,
        fmt: str = "i8pair",
    ) -> None:
        self.weights = weights
        self.quant = quant
        self.dtype = dtype
        self.tp_rank = tp_rank
        self.tp_size = tp_size
        self.fmt = fmt

    # -- plain arrays ------------------------------------------------------

    def array(self, name: str, transpose: bool = False,
              shard_axis: Optional[int] = None,
              dtype: Optional[str] = None) -> jnp.ndarray:
        w = self.weights[name]
        if transpose:
            w = w.T
        if shard_axis is not None and self.tp_size > 1:
            n = w.shape[shard_axis]
            assert n % self.tp_size == 0, (name, w.shape, self.tp_size)
            sz = n // self.tp_size
            idx = [slice(None)] * w.ndim
            idx[shard_axis] = slice(self.tp_rank * sz,
                                    (self.tp_rank + 1) * sz)
            w = w[tuple(idx)]
        return jnp.asarray(np.ascontiguousarray(w), dtype=dtype or self.dtype)

    def has(self, name: str) -> bool:
        return name in self.weights

    # -- TP ranges -----------------------------------------------------------

    def _unit_range(self, total_units: int) -> Tuple[int, int]:
        """This rank's (start, count) over ``total_units`` shardable
        units (heads / whole tensors). When tp > units, units are
        replicated across rank groups (KV-head replication,
        reference config.py:259-267)."""
        if self.tp_size == 1:
            return 0, total_units
        if total_units % self.tp_size == 0:
            per = total_units // self.tp_size
            return self.tp_rank * per, per
        assert self.tp_size % total_units == 0, (total_units, self.tp_size)
        rep = self.tp_size // total_units
        return self.tp_rank // rep, 1

    def _col_slice(self, w: np.ndarray, axis: int) -> np.ndarray:
        """Even slice of this rank's shard along ``axis``."""
        if self.tp_size == 1:
            return w
        n = w.shape[axis]
        assert n % self.tp_size == 0, (w.shape, axis, self.tp_size)
        sz = n // self.tp_size
        idx = [slice(None)] * w.ndim
        idx[axis] = slice(self.tp_rank * sz, (self.tp_rank + 1) * sz)
        return w[tuple(idx)]

    # -- canonical quant form ------------------------------------------------

    def _is_quant(self, prefix: str) -> bool:
        return (self.quant is not None
                and f"{prefix}.qweight" in self.weights)

    def _canonical_quant(
        self, prefix: str
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, Optional[np.ndarray]]:
        """One layer's quantized tensors -> (q [K,N] uint8-valued,
        zeros [K/G,N] f32, scales [K/G,N] f32, perm [K] | None)."""
        q_cfg = self.quant
        qw = self.weights[f"{prefix}.qweight"]
        qz = self.weights[f"{prefix}.qzeros"]
        sc = self.weights[f"{prefix}.scales"].astype(np.float32)
        if q_cfg.method == "awq":
            # qweight int32 [K, N/8]; qzeros int32 [K/G, N/8]
            q = qf.awq_unpack_int32(qw)
            z = qf.awq_unpack_int32(qz).astype(np.float32)
            return q, z, sc, None
        if q_cfg.method == "gptq":
            # qweight int32 [K/8, N]; qzeros int32 [K/G, N/8]
            q = qf.gptq_unpack_int32(qw, axis=0)
            z = qf.gptq_unpack_int32(qz, axis=1).astype(np.float32) + 1.0
            perm = None
            gi = self.weights.get(f"{prefix}.g_idx")
            if gi is not None and q_cfg.desc_act:
                gi = np.asarray(gi)
                k = q.shape[0]
                g = q_cfg.group_size if q_cfg.group_size > 0 else k
                if not np.array_equal(gi, np.arange(k) // g):
                    perm = np.argsort(gi, kind="stable").astype(np.int32)
                    q = q[perm]
            return q, z, sc, perm
        raise ValueError(f"Unsupported quant method {q_cfg.method}")

    def _group_size(self, k: int) -> int:
        g = self.quant.group_size
        return k if g in (-1, None) else g

    # -- linear layers -----------------------------------------------------

    def linear(
        self,
        prefixes: Sequence[str],
        shard: str = "col",          # 'col' | 'row' | 'none'
        bias: bool = False,
        part_units: Optional[List[int]] = None,
    ) -> Tuple[LinearWeights, Optional[jnp.ndarray]]:
        """Build one (possibly fused) linear from HF prefixes.

        ``part_units``: shardable unit count per prefix for 'col' layers
        (e.g. head counts for q/k/v); defaults to ``tp_size`` even
        slicing. Returns (LinearWeights, row_bias): row-parallel bias
        must be applied after the TP reduce, so it is returned
        separately.
        """
        if part_units is None:
            part_units = [None] * len(prefixes)

        def col_range(n_cols: int, units: Optional[int]
                      ) -> Tuple[int, int]:
            if shard != "col" or self.tp_size == 1:
                return 0, n_cols
            if units is None:
                assert n_cols % self.tp_size == 0, (n_cols, self.tp_size)
                sz = n_cols // self.tp_size
                return self.tp_rank * sz, sz
            start, cnt = self._unit_range(units)
            dim = n_cols // units
            assert dim * units == n_cols
            return start * dim, cnt * dim

        if self._is_quant(prefixes[0]):
            lw = self._quant_fused(prefixes, shard, part_units, col_range)
        else:
            parts = []
            for p, units in zip(prefixes, part_units):
                w = self.weights[f"{p}.weight"].T      # HF [N,K] -> [K,N]
                if shard == "col":
                    s, c = col_range(w.shape[1], units)
                    w = w[:, s:s + c]
                elif shard == "row":
                    w = self._col_slice(w, axis=0)
                parts.append(w)
            w = np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            lw = LinearWeights(w=jnp.asarray(np.ascontiguousarray(w),
                                             dtype=self.dtype), shard=shard)

        b = None
        if bias and f"{prefixes[0]}.bias" in self.weights:
            bs = []
            for p, units in zip(prefixes, part_units):
                bv = self.weights[f"{p}.bias"]
                if shard == "col":
                    s, c = col_range(bv.shape[0], units)
                    bv = bv[s:s + c]
                bs.append(bv)
            b = jnp.asarray(np.concatenate(bs) if len(bs) > 1 else bs[0],
                            dtype=self.dtype)
            if shard != "row":
                lw.bias = b
                b = None
        return lw, b

    def qkv(
        self,
        q_prefix: str,
        k_prefix: str,
        v_prefix: str,
        total_heads: int,
        total_kv_heads: int,
        head_dim: int,
        bias: bool = False,
    ) -> LinearWeights:
        """Fused QKV with head-aware TP sharding + KV replication
        (reference QKVParallelLinear, linear.py:312)."""
        del head_dim  # implied by column count / head count
        lw, _ = self.linear(
            [q_prefix, k_prefix, v_prefix], shard="col", bias=bias,
            part_units=[total_heads, total_kv_heads, total_kv_heads])
        return lw

    def _quant_fused(self, prefixes, shard, part_units, col_range
                     ) -> LinearWeights:
        if self.quant.method == "squeezellm":
            return self._sqllm_fused(prefixes, shard, part_units,
                                     col_range)
        qs, zs, ss = [], [], []
        perm = None
        perms = []
        for p, units in zip(prefixes, part_units):
            q, z, s, pm = self._canonical_quant(p)
            perms.append(pm)
            if shard == "col":
                st, c = col_range(q.shape[1], units)
                q, z, s = q[:, st:st + c], z[:, st:st + c], s[:, st:st + c]
            elif shard == "row" and self.tp_size > 1:
                assert pm is None, \
                    "GPTQ act-order + row-parallel TP is unsupported; " \
                    "load with desc_act handling on a single chip."
                k = q.shape[0]
                g = self._group_size(k)
                k_local = k // self.tp_size
                assert g <= k_local and k_local % g == 0, (
                    "row-parallel K shard must align to quant groups",
                    k, g, self.tp_size)
                q = q[self.tp_rank * k_local:(self.tp_rank + 1) * k_local]
                gl = k_local // g
                z = z[self.tp_rank * gl:(self.tp_rank + 1) * gl]
                s = s[self.tp_rank * gl:(self.tp_rank + 1) * gl]
            qs.append(q)
            zs.append(z)
            ss.append(s)
        # GPTQ act-order: the runtime gathers the activation ONCE for the
        # whole fused weight, so every fused part must have been permuted
        # by the same g_idx (None = identity). Differing permutations
        # would silently mis-permute K for some parts — refuse instead.
        if any(pm is not None for pm in perms):
            k_full = next(len(pm) for pm in perms if pm is not None)
            ident = np.arange(k_full, dtype=np.int32)
            resolved = [pm if pm is not None else ident for pm in perms]
            for pm in resolved[1:]:
                if not np.array_equal(resolved[0], pm):
                    raise ValueError(
                        "GPTQ act-order (desc_act) g_idx permutations "
                        f"differ across fused shards {list(prefixes)}; "
                        "fused QKV/gate-up loading requires an identical "
                        "permutation for every part. Re-export the "
                        "checkpoint without desc_act or with a shared "
                        "g_idx.")
            if not np.array_equal(resolved[0], ident):
                perm = resolved[0]
        q = np.concatenate(qs, axis=1) if len(qs) > 1 else qs[0]
        z = np.concatenate(zs, axis=1) if len(zs) > 1 else zs[0]
        s = np.concatenate(ss, axis=1) if len(ss) > 1 else ss[0]
        g = self._group_size(q.shape[0] * (self.tp_size
                                           if shard == "row" else 1))
        if g > q.shape[0]:
            g = q.shape[0]
        qw = qf.build_quantized_weight(q, z, s, g, self.fmt)
        if perm is not None:
            qw.perm = jnp.asarray(perm)
        return LinearWeights(qw=qw, shard=shard)

    def _sqllm_fused(self, prefixes, shard, part_units, col_range
                     ) -> LinearWeights:
        """SqueezeLLM: per-column LUT quant (reference squeezellm.py:
        qweight int32 [K/8, N] + lookup_table [N, 16])."""
        import jax.numpy as jnp_
        qs, luts = [], []
        for p, units in zip(prefixes, part_units):
            q = qf.gptq_unpack_int32(self.weights[f"{p}.qweight"], axis=0)
            lut = self.weights[f"{p}.lookup_table"].astype(np.float32)
            if shard == "col":
                st, c = col_range(q.shape[1], units)
                q = q[:, st:st + c]
                lut = lut[st:st + c]
            elif shard == "row":
                q = self._col_slice(q, axis=0)
            qs.append(q)
            luts.append(lut)
        q = np.concatenate(qs, axis=1) if len(qs) > 1 else qs[0]
        lut = np.concatenate(luts, axis=0) if len(luts) > 1 else luts[0]
        k, n = q.shape
        from vllm_quick_tpu.ops.quant_formats import QuantizedWeight
        qw = QuantizedWeight(
            packed=jnp_.asarray(q.astype(np.uint8), dtype=jnp_.uint4),
            scales=jnp_.zeros((1, n), dtype=jnp_.float32),
            zeros=jnp_.zeros((1, n), dtype=jnp_.float32),
            group_size=k, fmt="sqllm",
            in_features=k, out_features=n, padded_in=k, padded_out=n,
            lut=jnp_.asarray(lut))
        return LinearWeights(qw=qw, shard=shard)

    def linear_from_arrays(
        self,
        parts: Sequence[np.ndarray],          # each [K, N_part] (x @ W)
        shard: str = "col",
        part_units: Optional[List[int]] = None,
        bias_parts: Optional[Sequence[Optional[np.ndarray]]] = None,
    ) -> Tuple[LinearWeights, Optional[jnp.ndarray]]:
        """Build a (fused) linear from raw [K, N] arrays — for HF layouts
        the name-based loader can't express (Conv1D tensors, interleaved
        fused QKV such as GPT-NeoX/Falcon/Bloom)."""
        if part_units is None:
            part_units = [None] * len(parts)
        ws, bs = [], []
        for idx, (w, units) in enumerate(zip(parts, part_units)):
            bv = bias_parts[idx] if bias_parts is not None else None
            if shard == "col" and self.tp_size > 1:
                n = w.shape[1]
                if units is None:
                    assert n % self.tp_size == 0, (n, self.tp_size)
                    st, c = self.tp_rank * (n // self.tp_size), \
                        n // self.tp_size
                else:
                    u0, uc = self._unit_range(units)
                    dim = n // units
                    st, c = u0 * dim, uc * dim
                w = w[:, st:st + c]
                if bv is not None:
                    bv = bv[st:st + c]
            elif shard == "row":
                w = self._col_slice(w, axis=0)
            ws.append(w)
            bs.append(bv)
        w = np.concatenate(ws, axis=1) if len(ws) > 1 else ws[0]
        lw = LinearWeights(w=jnp.asarray(np.ascontiguousarray(w),
                                         dtype=self.dtype), shard=shard)
        b = None
        if bias_parts is not None and any(x is not None for x in bs):
            b = jnp.asarray(np.concatenate(
                [x for x in bs if x is not None])
                if len(bs) > 1 else bs[0], dtype=self.dtype)
            if shard != "row":
                lw.bias = b
                b = None
        return lw, b

    def quantize_dense(self, prefixes: Sequence[str], shard: str = "col",
                       group_size: int = 128) -> LinearWeights:
        """Quantize-on-the-fly for unquantized checkpoints (testing and
        weight-only compression without a calibrated checkpoint)."""
        parts = []
        for p in prefixes:
            w = self.weights[f"{p}.weight"].T
            if shard == "col":
                w = self._col_slice(w, axis=1)
            elif shard == "row":
                w = self._col_slice(w, axis=0)
            parts.append(w)
        w = np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
        return LinearWeights(qw=qf.quantize_reference(
            w.astype(np.float32), group_size=group_size, fmt=self.fmt),
            shard=shard)
