"""Mixtral 8x7B (reference parity: vllm/model_executor/models/mixtral.py,
448 LoC — MixtralMoE tensor-sharded experts :66-130).

Llama attention + top-2 MoE FFN. Expert stacks live as [E, D, 2F] /
[E, F, D] arrays: tp shards each expert's FFN dim (the reference's
scheme — every rank holds a slice of every expert), ep shards the
expert dim (capability the reference lacks; SURVEY §2.6).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.model_executor.layers.linear import apply_linear
from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
from vllm_quick_tpu.ops.fused_moe import fused_moe, moe_routing


class MixtralForCausalLM(LlamaForCausalLM):
    supports_quantization = False   # mixtral_quant parity: future work

    def __init__(self, hf_config, quant=None, ctx=None,
                 dtype: str = "bfloat16") -> None:
        from vllm_quick_tpu.parallel.mesh import ParallelContext
        ctx = ctx or ParallelContext()
        super().__init__(hf_config, quant=None, ctx=ctx, dtype=dtype)
        self.num_experts = hf_config.num_local_experts
        self.top_k = hf_config.num_experts_per_tok
        assert self.num_experts % ctx.ep_size == 0

    def _mlp_block(self, layer, x, lora_indices=None):
        lead = x.shape[:-1]
        xf = x.reshape(-1, x.shape[-1])
        router_logits = apply_linear(layer["router"], xf)  # [T, E] repl
        gate = moe_routing(router_logits, self.top_k, renormalize=True)
        out = fused_moe(xf, gate, layer["moe_w13"], layer["moe_w2"],
                        ctx=self.ctx)
        return out.reshape(*lead, -1)

    def _build_mlp_params(self, pb, pfx: str, layer: Dict[str, Any]
                          ) -> None:
        moe = f"{pfx}.block_sparse_moe"
        router, _ = pb.linear_from_arrays(
            [pb.weights[f"{moe}.gate.weight"].T], shard="none")
        w13, w2 = [], []
        for e in range(self.num_experts):
            w1 = pb._col_slice(
                pb.weights[f"{moe}.experts.{e}.w1.weight"].T, axis=1)
            w3 = pb._col_slice(
                pb.weights[f"{moe}.experts.{e}.w3.weight"].T, axis=1)
            w2e = pb._col_slice(
                pb.weights[f"{moe}.experts.{e}.w2.weight"].T, axis=0)
            w13.append(np.concatenate([w1, w3], axis=1))
            w2.append(w2e)
        layer["router"] = router
        layer["moe_w13"] = jnp.asarray(np.stack(w13), dtype=self.dtype)
        layer["moe_w2"] = jnp.asarray(np.stack(w2), dtype=self.dtype)

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        params = super().init_dummy_params(seed)
        rng = np.random.default_rng(seed + 1)
        e_dim = self.hidden_size
        f_local = self.config.intermediate_size // self.ctx.tp_size
        e_local = self.num_experts // self.ctx.ep_size
        from vllm_quick_tpu.model_executor.layers.linear import (
            LinearWeights)
        for layer in params["layers"]:
            layer.pop("gate_up", None)
            layer.pop("down", None)
            layer["router"] = LinearWeights(w=jnp.asarray(
                rng.standard_normal((e_dim, self.num_experts)) * 0.02,
                dtype=self.dtype))
            layer["moe_w13"] = jnp.asarray(
                rng.standard_normal((e_local, e_dim, 2 * f_local)) * 0.02,
                dtype=self.dtype)
            layer["moe_w2"] = jnp.asarray(
                rng.standard_normal((e_local, f_local, e_dim)) * 0.02,
                dtype=self.dtype)
        return params
