"""DeepSeek-MoE v1 (reference parity:
vllm/model_executor/models/deepseek.py — MoE with shared experts and
first_k_dense_replace dense layers).
"""
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.model_executor.layers.activation import silu_and_mul
from vllm_quick_tpu.model_executor.layers.linear import apply_linear
from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
from vllm_quick_tpu.ops.fused_moe import fused_moe, moe_routing


class DeepseekForCausalLM(LlamaForCausalLM):
    supports_quantization = False

    def __init__(self, hf_config, quant=None, ctx=None,
                 dtype: str = "bfloat16") -> None:
        from vllm_quick_tpu.parallel.mesh import ParallelContext
        ctx = ctx or ParallelContext()
        super().__init__(hf_config, quant=None, ctx=ctx, dtype=dtype)
        self.num_experts = getattr(hf_config, "n_routed_experts", 0)
        self.top_k = getattr(hf_config, "num_experts_per_tok", 2)
        self.norm_topk = getattr(hf_config, "norm_topk_prob", False)
        self.first_dense = getattr(hf_config, "first_k_dense_replace", 0)
        self.moe_freq = getattr(hf_config, "moe_layer_freq", 1)
        self.n_shared = getattr(hf_config, "n_shared_experts", None)

    def _is_moe_layer(self, i: int) -> bool:
        return (self.num_experts > 0 and i >= self.first_dense
                and i % self.moe_freq == 0)

    def _mlp_block(self, layer, x, lora_indices=None):
        if "moe_w13" not in layer:
            return super()._mlp_block(layer, x, lora_indices)
        lead = x.shape[:-1]
        xf = x.reshape(-1, x.shape[-1])
        router_logits = apply_linear(layer["router"], xf)
        gate = moe_routing(router_logits, self.top_k,
                           renormalize=self.norm_topk)
        shared = None
        if "shared_gate_up" in layer:
            s = silu_and_mul(apply_linear(layer["shared_gate_up"], xf))
            shared = apply_linear(layer["shared_down"], s)
        out = fused_moe(xf, gate, layer["moe_w13"], layer["moe_w2"],
                        ctx=self.ctx, shared_out=shared)
        return out.reshape(*lead, -1)

    def build_params(self, pb) -> Dict[str, Any]:
        self._pb_layer_idx = -1
        return super().build_params(pb)

    def _build_mlp_params(self, pb, pfx: str, layer: Dict[str, Any]
                          ) -> None:
        i = int(pfx.rsplit(".", 1)[1])
        if not self._is_moe_layer(i):
            return super()._build_mlp_params(pb, pfx, layer)
        moe = f"{pfx}.mlp"
        router, _ = pb.linear_from_arrays(
            [pb.weights[f"{moe}.gate.weight"].T], shard="none")
        w13, w2 = [], []
        for e in range(self.num_experts):
            g = pb._col_slice(
                pb.weights[f"{moe}.experts.{e}.gate_proj.weight"].T,
                axis=1)
            u = pb._col_slice(
                pb.weights[f"{moe}.experts.{e}.up_proj.weight"].T, axis=1)
            d = pb._col_slice(
                pb.weights[f"{moe}.experts.{e}.down_proj.weight"].T,
                axis=0)
            w13.append(np.concatenate([g, u], axis=1))
            w2.append(d)
        layer["router"] = router
        layer["moe_w13"] = jnp.asarray(np.stack(w13), dtype=self.dtype)
        layer["moe_w2"] = jnp.asarray(np.stack(w2), dtype=self.dtype)
        if self.n_shared:
            sgu, _ = pb.linear([f"{moe}.shared_experts.gate_proj",
                                f"{moe}.shared_experts.up_proj"],
                               shard="col")
            sd, _ = pb.linear([f"{moe}.shared_experts.down_proj"],
                              shard="row")
            layer["shared_gate_up"] = sgu
            layer["shared_down"] = sd
