"""Quantized Mixtral (reference parity:
vllm/model_executor/models/mixtral_quant.py, 412 LoC — per-expert
quantized linears, mixtral_quant.py:50-120).

Like the reference, every expert FFN is three quantized linears
(w1/w3 fused column-parallel, w2 row-parallel) evaluated for *all*
tokens and combined with the routing weights — the variant the loader
swaps in for AWQ/GPTQ Mixtral checkpoints (model_loader.py:27-29 in the
reference). TP shards each expert's FFN dim; expert parallelism is the
dense path's exclusive (same scope as the reference, which has no EP).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.model_executor.layers.linear import (LinearWeights,
                                                         apply_linear)
from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
from vllm_quick_tpu.ops.fused_moe import moe_routing


class MixtralQuantForCausalLM(LlamaForCausalLM):
    supports_quantization = True

    def __init__(self, hf_config, quant=None, ctx=None,
                 dtype: str = "bfloat16") -> None:
        from vllm_quick_tpu.parallel.mesh import ParallelContext
        ctx = ctx or ParallelContext()
        assert ctx.ep_size == 1, (
            "expert parallelism requires the dense Mixtral path "
            "(models/mixtral.py); quantized experts are TP-sharded only, "
            "matching the reference's mixtral_quant scope")
        super().__init__(hf_config, quant=quant, ctx=ctx, dtype=dtype)
        self.num_experts = hf_config.num_local_experts
        self.top_k = hf_config.num_experts_per_tok

    def _mlp_block(self, layer, x, lora_indices=None):
        lead = x.shape[:-1]
        xf = x.reshape(-1, x.shape[-1])
        router_logits = apply_linear(layer["router"], xf)    # [T, E]
        gate = moe_routing(router_logits, self.top_k,
                           renormalize=True)                 # [T, E]
        out = None
        for e, ew in enumerate(layer["experts"]):
            gu = apply_linear(ew["w13"], xf)
            g, u = jnp.split(gu, 2, axis=-1)
            h = jax.nn.silu(g.astype(jnp.float32)).astype(xf.dtype) * u
            y = apply_linear(ew["w2"], h).astype(jnp.float32)
            y = y * gate[:, e:e + 1]
            out = y if out is None else out + y
        out = self.ctx.tp_all_reduce(out).astype(xf.dtype)
        return out.reshape(*lead, -1)

    def _build_mlp_params(self, pb, pfx: str, layer: Dict[str, Any]
                          ) -> None:
        moe = f"{pfx}.block_sparse_moe"
        router, _ = pb.linear_from_arrays(
            [pb.weights[f"{moe}.gate.weight"].T], shard="none")
        layer["router"] = router
        experts = []
        for e in range(self.num_experts):
            w13, _ = pb.linear([f"{moe}.experts.{e}.w1",
                                f"{moe}.experts.{e}.w3"], shard="col")
            w2, _ = pb.linear([f"{moe}.experts.{e}.w2"], shard="row")
            experts.append({"w13": w13, "w2": w2})
        layer["experts"] = experts

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        from vllm_quick_tpu.ops.quant_formats import dummy_quantized_weight
        params = super().init_dummy_params(seed)
        rng = np.random.default_rng(seed + 1)
        e_dim = self.hidden_size
        f_local = self.config.intermediate_size // self.ctx.tp_size
        for layer in params["layers"]:
            layer.pop("gate_up", None)
            layer.pop("down", None)
            layer["router"] = LinearWeights(w=jnp.asarray(
                rng.standard_normal((e_dim, self.num_experts)) * 0.02,
                dtype=self.dtype))
            layer["experts"] = [
                {"w13": LinearWeights(
                    qw=dummy_quantized_weight(e_dim, 2 * f_local),
                    shard="col"),
                 "w2": LinearWeights(
                    qw=dummy_quantized_weight(f_local, e_dim),
                    shard="row")}
                for _ in range(self.num_experts)]
        return params
