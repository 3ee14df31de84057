"""Linear layers: dense or INT4-quantized, tensor-parallel aware.

TPU-native restatement of the reference's parallel linear zoo
(vllm/model_executor/layers/linear.py:74-552). Instead of NCCL-backed
Column/RowParallelLinear classes, weights are *loaded pre-sharded* (the
loader slices each TP rank's shard, like the reference's weight_loader
does at load time) and the model runs inside ``shard_map`` over the
device mesh; row-parallel outputs are reduced with an explicit
``psum`` via the parallel context. The quantization method abstraction
(LinearMethodBase, linear.py:20) collapses into the ``QuantizedWeight``
union below — one ``apply_linear`` for every scheme.
"""
import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from vllm_quick_tpu.ops.quant_formats import QuantizedWeight
from vllm_quick_tpu.ops.quant_matmul import quant_matmul


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LinearWeights:
    """One linear layer's parameters: exactly one of (w, qw) is set."""
    w: Optional[jax.Array] = None           # dense [K, N]
    qw: Optional[QuantizedWeight] = None    # packed INT4
    bias: Optional[jax.Array] = None        # [N]
    # Multi-LoRA slot stacks (lora/models.py writes slot slices):
    # col-parallel: A replicated [L, K, R], B sharded [L, R, N_local];
    # row-parallel: A sharded [L, K_local, R], B replicated — the
    # partial LoRA sum rides the layer's existing output psum.
    lora_a: Optional[jax.Array] = None
    lora_b: Optional[jax.Array] = None
    # TP sharding of this layer: 'col' (N split, like ColumnParallelLinear),
    # 'row' (K split + psum after, like RowParallelLinear) or 'none'.
    # Drives mechanical PartitionSpec derivation (parallel/sharding.py).
    shard: str = dataclasses.field(default="none",
                                   metadata=dict(static=True))

    @property
    def out_features(self) -> int:
        if self.qw is not None:
            return self.qw.out_features
        return self.w.shape[1]

    @property
    def in_features(self) -> int:
        if self.qw is not None:
            return self.qw.in_features
        return self.w.shape[0]


def apply_linear(lw: LinearWeights, x: jax.Array,
                 lora_indices: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ W (+ bias) (+ per-token LoRA). Dispatches dense vs fused
    INT4 kernel; LoRA via the BGMV analogue (ops/bgmv.py)."""
    if lw.qw is not None:
        y = quant_matmul(x, lw.qw, out_dtype=x.dtype)
    else:
        y = jnp.dot(x, lw.w, preferred_element_type=jnp.float32).astype(
            x.dtype)
    if lw.bias is not None:
        y = y + lw.bias
    if lw.lora_a is not None and lora_indices is not None:
        from vllm_quick_tpu.ops.bgmv import apply_lora
        y = apply_lora(y, x, lw.lora_a, lw.lora_b, lora_indices)
    return y
