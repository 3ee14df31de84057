"""Builds model parameter pytrees from HF checkpoint tensors.

The TPU restatement of the reference's per-parameter ``weight_loader``
machinery (vllm/model_executor/layers/linear.py loaders + model
``load_weights``, e.g. llama.py:346-387): fused-shard concatenation
(qkv, gate+up), tensor-parallel slicing at load time, and quantized
tensor ingestion (AWQ/GPTQ -> TPU packed format, ops/quant_formats.py).
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

    # -- linear layers -----------------------------------------------------

    def _col_slice(self, w: np.ndarray, axis: int, div: int = 1
                   ) -> np.ndarray:
        """Slice this rank's column shard along ``axis`` (dim already
        divided by ``div`` for packed tensors)."""
        if self.tp_size == 1:
            return w
        n = w.shape[axis]
        assert n % self.tp_size == 0
        sz = n // self.tp_size
        idx = [slice(None)] * w.ndim
        idx[axis] = slice(self.tp_rank * sz, (self.tp_rank + 1) * sz)
        return w[tuple(idx)]

    def linear(
        self,
        prefixes: Sequence[str],
        shard: str = "col",          # 'col' | 'row' | 'none'
        bias: bool = False,
    ) -> Tuple[LinearWeights, Optional[jnp.ndarray]]:
        """Build one (possibly fused) linear from HF prefixes.

        Returns (LinearWeights, row_bias). For row-parallel layers the
        bias must be applied after the TP all-reduce, so it is returned
        separately instead of living inside LinearWeights.
        """
        is_quant = (self.quant is not None
                    and f"{prefixes[0]}.qweight" in self.weights)
        if is_quant:
            lw = self._quant_linear(prefixes, shard)
        else:
            parts = []
            for p in prefixes:
                w = self.weights[f"{p}.weight"].T      # HF [N,K] -> [K,N]
                if shard == "col":
                    w = self._col_slice(w, axis=1)
                elif shard == "row":
                    w = self._col_slice(w, axis=0)
                parts.append(w)
            w = np.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
            lw = LinearWeights(w=jnp.asarray(np.ascontiguousarray(w),
                                             dtype=self.dtype))

        b = None
        if bias and f"{prefixes[0]}.bias" in self.weights:
            bs = []
            for p in prefixes:
                bv = self.weights[f"{p}.bias"]
                if shard == "col":
                    bv = self._col_slice(bv, axis=0)
                bs.append(bv)
            b = jnp.asarray(np.concatenate(bs) if len(bs) > 1 else bs[0],
                            dtype=self.dtype)
            if shard != "row":
                lw.bias = b
                b = None
        return lw, b

    def _quant_linear(self, prefixes: Sequence[str],
                      shard: str) -> LinearWeights:
        q = self.quant
        qws, qzs, scs, gidxs = [], [], [], []
        for p in prefixes:
            qw = self.weights[f"{p}.qweight"]
            qz = self.weights[f"{p}.qzeros"]
            sc = self.weights[f"{p}.scales"].astype(np.float32)
            gi = self.weights.get(f"{p}.g_idx")
            if shard == "col":
                # N is packed /8 in AWQ qweight/qzeros (axis 1 for both).
                qw = self._col_slice(qw, axis=1)
                qz = self._col_slice(qz, axis=1)
                sc = self._col_slice(sc, axis=1)
            elif shard == "row":
                qw = self._col_slice(qw, axis=0)
                qz = self._col_slice(qz, axis=0)
                sc = self._col_slice(sc, axis=0)
                if gi is not None:
                    gi = self._col_slice(gi, axis=0)
            qws.append(qw)
            qzs.append(qz)
            scs.append(sc)
            gidxs.append(gi)
        if q.method == "awq":
            qw = np.concatenate(qws, axis=1) if len(qws) > 1 else qws[0]
            qz = np.concatenate(qzs, axis=1) if len(qzs) > 1 else qzs[0]
            sc = np.concatenate(scs, axis=1) if len(scs) > 1 else scs[0]
            return LinearWeights(qw=qf.from_awq(
                qw, qz, sc, group_size=q.group_size, fmt=self.fmt))
        if q.method == "gptq":
            qw = np.concatenate(qws, axis=1) if len(qws) > 1 else qws[0]
            qz = np.concatenate(qzs, axis=1) if len(qzs) > 1 else qzs[0]
            sc = np.concatenate(scs, axis=1) if len(scs) > 1 else scs[0]
            gi = gidxs[0] if gidxs[0] is not None and q.desc_act else None
            return LinearWeights(qw=qf.from_gptq(
                qw, qz, sc, group_size=q.group_size, g_idx=gi,
                fmt=self.fmt))
        raise ValueError(f"Unsupported quant method {q.method}")

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
            w.astype(np.float32), group_size=group_size, fmt=self.fmt))
