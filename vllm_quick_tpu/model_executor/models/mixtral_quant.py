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

import dataclasses

from vllm_quick_tpu.model_executor.layers.linear import (LinearWeights,
                                                         apply_linear)
from vllm_quick_tpu.model_executor.models.llama import LlamaForCausalLM
from vllm_quick_tpu.ops.fused_moe import moe_routing
from vllm_quick_tpu.ops.quant_matmul import quant_matmul


def _expert_view(stacked, e: int):
    """2-D view of one expert in a stacked QuantizedWeight."""
    return dataclasses.replace(stacked, packed=stacked.packed[e],
                               scales=stacked.scales[e],
                               zeros=stacked.zeros[e])


class MixtralQuantForCausalLM(LlamaForCausalLM):
    supports_quantization = True

    def __init__(self, hf_config, quant=None, ctx=None,
                 dtype: str = "bfloat16") -> None:
        from vllm_quick_tpu.parallel.mesh import ParallelContext
        ctx = ctx or ParallelContext()
        super().__init__(hf_config, quant=quant, ctx=ctx, dtype=dtype)
        self.num_experts = hf_config.num_local_experts
        self.top_k = hf_config.num_experts_per_tok
        # EP shards the stacked expert weights' leading axis over the
        # ``ep`` mesh axis (sharding.py routes experts_w13/w2 there);
        # each rank computes only its local experts' partial sum.
        # Capability the reference's mixtral_quant.py lacks (INT4
        # Mixtral-8x7B is ~23 GB and only deploys multi-chip).
        assert self.num_experts % ctx.ep_size == 0, (
            f"num_experts={self.num_experts} not divisible by "
            f"ep_size={ctx.ep_size}")

    def _mlp_block(self, layer, x, lora_indices=None):
        from vllm_quick_tpu.ops.fused_moe import (moe_quant_expert_ffn,
                                                  topk_routing)
        from vllm_quick_tpu.ops.quant_matmul import (
            FUSED_KERNEL_MAX_TOKENS, default_backend_is_tpu)
        lead = x.shape[:-1]
        xf = x.reshape(-1, x.shape[-1])
        t = xf.shape[0]
        router_logits = apply_linear(layer["router"], xf)    # [T, E]
        if "moe_w13" in layer:
            # Dense checkpoint loaded through this class: use the
            # stacked-einsum path (models/mixtral.py).
            from vllm_quick_tpu.ops.fused_moe import fused_moe
            gate = moe_routing(router_logits, self.top_k,
                               renormalize=True)
            out = fused_moe(xf, gate, layer["moe_w13"], layer["moe_w2"],
                            ctx=self.ctx)
            return out.reshape(*lead, -1)
        qw13 = layer["experts_w13"].qw
        qw2 = layer["experts_w2"].qw

        if (t <= FUSED_KERNEL_MAX_TOKENS and qw13.fmt == "i8pair"
                and default_backend_is_tpu()):
            # Grouped Pallas kernel: streams only the batch's selected
            # experts' weights (decode regime is HBM-bound). Under EP
            # the stacks are local shards and the result is a partial
            # sum (combined by moe_all_reduce below).
            top_w, top_i = topk_routing(router_logits, self.top_k)
            out = moe_quant_expert_ffn(xf, top_w, top_i, qw13, qw2,
                                       self.num_experts, ctx=self.ctx)
            out = out.astype(jnp.float32)
        else:
            # Prefill: every expert sees all tokens (dense masked path,
            # like the reference's mixtral_quant.py:50-120) through the
            # memory-bounded M-tiled kernel — no expert matrix is ever
            # dequantized whole (an f32 [4K, 28K] expert temp is ~0.5 GB
            # and OOM'd engine init on chip in round 3).
            gate = moe_routing(router_logits, self.top_k,
                               renormalize=True)             # [T, E]
            e_local = qw13.packed.shape[0]
            if self.ctx.ep_size > 1:
                off = jax.lax.axis_index(self.ctx.ep_axis) * e_local
                gate = jax.lax.dynamic_slice_in_dim(gate, off, e_local,
                                                    axis=1)
            out = None
            for e in range(e_local):
                gu = quant_matmul(xf, _expert_view(qw13, e))
                g, u = jnp.split(gu, 2, axis=-1)
                h = jax.nn.silu(g.astype(jnp.float32)).astype(
                    xf.dtype) * u
                y = quant_matmul(h, _expert_view(qw2, e)).astype(
                    jnp.float32)
                y = y * gate[:, e:e + 1]
                out = y if out is None else out + y
        out = self.ctx.moe_all_reduce(out).astype(xf.dtype)
        return out.reshape(*lead, -1)

    def _build_mlp_params(self, pb, pfx: str, layer: Dict[str, Any]
                          ) -> None:
        from vllm_quick_tpu.ops.quant_formats import stack_quantized_weights
        moe = f"{pfx}.block_sparse_moe"
        router, _ = pb.linear_from_arrays(
            [pb.weights[f"{moe}.gate.weight"].T], shard="none")
        layer["router"] = router
        w13s, w2s = [], []
        for e in range(self.num_experts):
            w13, _ = pb.linear([f"{moe}.experts.{e}.w1",
                                f"{moe}.experts.{e}.w3"], shard="col")
            w2, _ = pb.linear([f"{moe}.experts.{e}.w2"], shard="row")
            w13s.append(w13.qw if w13.qw is not None else w13.w)
            w2s.append(w2.qw if w2.qw is not None else w2.w)
        if w13s[0] is None or not hasattr(w13s[0], "fmt"):
            # Unquantized checkpoint: fall back to the dense stacked
            # arrays (einsum path).
            layer["moe_w13"] = jnp.stack(w13s)
            layer["moe_w2"] = jnp.stack(w2s)
        else:
            layer["experts_w13"] = LinearWeights(
                qw=stack_quantized_weights(w13s), shard="col")
            layer["experts_w2"] = LinearWeights(
                qw=stack_quantized_weights(w2s), shard="row")

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        from vllm_quick_tpu.ops.quant_formats import (
            dummy_quantized_weight, stack_quantized_weights)
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
            layer["experts_w13"] = LinearWeights(
                qw=stack_quantized_weights(
                    [dummy_quantized_weight(e_dim, 2 * f_local)
                     for _ in range(self.num_experts)]), shard="col")
            layer["experts_w2"] = LinearWeights(
                qw=stack_quantized_weights(
                    [dummy_quantized_weight(f_local, e_dim)
                     for _ in range(self.num_experts)]), shard="row")
        return params
