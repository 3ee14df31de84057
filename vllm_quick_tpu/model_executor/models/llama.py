"""Llama-family causal LM (functional JAX).

Capability parity with the reference implementation
(vllm/model_executor/models/llama.py:1-387): RMSNorm pre-norm decoder
with fused QKV, RoPE, GQA paged attention, SwiGLU MLP, optional
quantized linears, tied or untied LM head. The same module also serves
Llama-derived architectures (Mistral's sliding window is a config knob,
reference mistral.py).

Design: static layer objects + a params pytree; ``forward`` is a pure
function suitable for jit/shard_map with donated KV caches.
"""
import functools
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.layers.activation import silu_and_mul
from vllm_quick_tpu.model_executor.layers.attention import Attention, KVCache
from vllm_quick_tpu.model_executor.layers.layernorm import (
    fused_add_rms_norm, rms_norm)
from vllm_quick_tpu.model_executor.layers.linear import apply_linear
from vllm_quick_tpu.model_executor.layers.rotary_embedding import get_rope
from vllm_quick_tpu.model_executor.layers.vocab_embedding import (
    embed, unembed)
from vllm_quick_tpu.model_executor.param_builder import ParamBuilder
from vllm_quick_tpu.parallel.mesh import ParallelContext


class LlamaForCausalLM:
    supports_quantization = True

    def __init__(self, hf_config, quant=None,
                 ctx: ParallelContext = ParallelContext(),
                 dtype: str = "bfloat16") -> None:
        self.config = hf_config
        self.quant = quant
        self.ctx = ctx
        self.dtype = dtype
        # Fused gate->silu->down Pallas MLP: one kernel per layer
        # instead of two, +4% measured batch-1 decode
        # (ops/quant_matmul.fused_mlp). VLLM_TPU_NO_FUSED_MLP opts out.
        self._use_fused_mlp = not os.environ.get("VLLM_TPU_NO_FUSED_MLP")

        tp = ctx.tp_size
        self.vocab_size = hf_config.vocab_size
        self.hidden_size = hf_config.hidden_size
        self.num_layers = hf_config.num_hidden_layers
        total_heads = hf_config.num_attention_heads
        total_kv = getattr(hf_config, "num_key_value_heads", total_heads)
        assert total_heads % tp == 0, (total_heads, tp)
        assert total_kv % tp == 0 or tp % total_kv == 0
        self.num_heads = total_heads // tp
        self.num_kv_heads = max(1, total_kv // tp)
        self.head_dim = getattr(hf_config, "head_dim", None) or \
            hf_config.hidden_size // total_heads
        self.scale = self.head_dim**-0.5
        self.rms_eps = getattr(hf_config, "rms_norm_eps", 1e-6)
        self.sliding_window = getattr(hf_config, "sliding_window", None)
        self.tie_embeddings = getattr(hf_config, "tie_word_embeddings",
                                      False)

        rope_theta = getattr(hf_config, "rope_theta", 10000.0)
        max_pos = getattr(hf_config, "max_position_embeddings", 8192)
        self.rope = get_rope(self.head_dim, self.head_dim, max_pos,
                             rope_theta, is_neox_style=True,
                             rope_scaling=getattr(hf_config, "rope_scaling",
                                                  None))
        self.attn = Attention(self.num_heads, self.head_dim, self.scale,
                              num_kv_heads=self.num_kv_heads,
                              sliding_window=self.sliding_window,
                              ctx=ctx)

    # -- forward -----------------------------------------------------------

    def forward(
        self,
        params: Dict[str, Any],
        input_ids: jax.Array,          # [B, L] prefill | [B] decode
        positions: jax.Array,          # same shape as input_ids
        kv_caches: List[KVCache],
        meta: InputMetadata,
    ) -> Tuple[jax.Array, List[KVCache]]:
        h = self._embed_tokens(params, input_ids, meta)
        residual = None
        new_caches = []
        for i, layer in enumerate(params["layers"]):
            fused_qkv = self._qkv_norm_fused(layer, h, residual, meta)
            if fused_qkv is not None:
                qkv, residual = fused_qkv
                x, cache = self._attention_core(qkv, positions,
                                                kv_caches[i], meta)
                new_caches.append(cache)
                fused = self._o_mlp_norm_fused(layer, x, residual)
                if fused is not None:
                    h, residual = fused
                    continue
                x = apply_linear(layer["o"], x, meta.lora_indices)
                x = self.ctx.tp_all_reduce(x)
                fused = self._mlp_block_norm_fused(layer, x, residual,
                                                   meta.lora_indices)
                if fused is not None:
                    h, residual = fused
                    continue
                x, residual = fused_add_rms_norm(
                    x, residual, layer["post_norm"], self.rms_eps)
                h = self._mlp_block(layer, x, meta.lora_indices)
                continue
            if residual is None:
                residual = h
                x = rms_norm(h, layer["input_norm"], self.rms_eps)
            else:
                x, residual = fused_add_rms_norm(
                    h, residual, layer["input_norm"], self.rms_eps)
            x, cache = self._attention_block(layer, x, positions,
                                             kv_caches[i], meta)
            new_caches.append(cache)
            fused = self._mlp_block_norm_fused(layer, x, residual,
                                               meta.lora_indices)
            if fused is not None:
                h, residual = fused
                continue
            x, residual = fused_add_rms_norm(
                x, residual, layer["post_norm"], self.rms_eps)
            x = self._mlp_block(layer, x, meta.lora_indices)
            h = x
        h, _ = fused_add_rms_norm(h, residual, params["final_norm"],
                                  self.rms_eps)
        return h, new_caches

    def _attention_core(self, qkv, positions, kv_cache, meta):
        """rope + cache write + paged attention from a precomputed qkv
        projection; returns the flat [.., Hq*dh] attention output
        (pre-o-proj)."""
        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        q = qkv[..., :q_sz]
        k = qkv[..., q_sz:q_sz + kv_sz]
        v = qkv[..., q_sz + kv_sz:]
        lead = q.shape[:-1]
        qh = q.reshape(*lead, self.num_heads, self.head_dim)
        kh = k.reshape(*lead, self.num_kv_heads, self.head_dim)
        if (len(lead) == 1
                and getattr(self.rope, "is_neox_style", False)
                and self.rope.rotary_dim == self.head_dim
                and not os.environ.get("VLLM_TPU_NO_FUSED_ATTN_RW")
                and self.attn.fused_rope_write_ok(
                    meta, kv_cache, self.rope.rotary_dim, True)):
            # Decode: rope + cache write + attend in ONE pallas call
            # (ops/paged_attention.py) — removes the per-layer XLA rope
            # fusions and the fp8-convert + dus cache write.
            cs = self.rope.full_cos_sin(positions)      # [B, 2, D]
            vh = v.reshape(*lead, self.num_kv_heads, self.head_dim)
            return self.attn.decode_fused_rope_write(
                qh, kh, vh, cs, kv_cache, meta)
        qh, kh = self.rope(positions, qh, kh)
        return self.attn(qh.reshape(*lead, -1), kh.reshape(*lead, -1),
                         v, kv_cache, meta, positions=positions)

    def _qkv_norm_fused(self, layer, h, residual, meta):
        """Pre-attention residual-add + RMSNorm + qkv projection in one
        Pallas call (decode). Returns (qkv, new_residual) or None when
        the fused path doesn't apply (prefill token counts, LoRA, bias,
        non-i8pair, non-TPU). First layer: residual=None is a zero
        residual (fused(h, 0) == (rms_norm(h) @ W, h))."""
        qkv_w = layer.get("qkv")
        if not (meta.lora_indices is None
                and qkv_w is not None and qkv_w.qw is not None
                and qkv_w.bias is None and qkv_w.lora_a is None
                and not os.environ.get("VLLM_TPU_NO_FUSED_QKV_NORM")):
            return None
        from vllm_quick_tpu.ops.quant_matmul import (
            FUSED_KERNEL_MAX_TOKENS, default_backend_is_tpu,
            fused_qkv_norm, qkv_norm_fusable)
        t = 1
        for d in h.shape[:-1]:
            t *= d
        if not (t <= FUSED_KERNEL_MAX_TOKENS
                and qkv_norm_fusable(qkv_w.qw)
                and default_backend_is_tpu()):
            return None
        res = residual if residual is not None else jnp.zeros_like(h)
        return fused_qkv_norm(h, res, layer["input_norm"], qkv_w.qw,
                              eps=self.rms_eps)

    def _attention_block(self, layer, x, positions, kv_cache, meta):
        li = meta.lora_indices
        qkv = apply_linear(layer["qkv"], x, li)
        out, kv_cache = self._attention_core(qkv, positions, kv_cache,
                                             meta)
        out = apply_linear(layer["o"], out, li)
        out = self.ctx.tp_all_reduce(out)
        return out, kv_cache

    # -- pipeline-parallel stage hooks (parallel/pipeline.py) --------------

    def pp_prologue(self, params, input_ids, positions):
        """Stage-0 work; returns the carried activation state. The
        residual starts at zeros so every layer (including the first)
        runs the same fused_add_rms_norm program:
        fused_add_rms_norm(h, 0) == (rms_norm(h), h)."""
        h = embed(params["embed"], input_ids, self.ctx)
        return (h, jnp.zeros_like(h))

    def pp_layer(self, layer, state, positions, kv_cache, meta):
        h, residual = state
        x, residual = fused_add_rms_norm(h, residual,
                                         layer["input_norm"],
                                         self.rms_eps)
        x, kv_cache = self._attention_block(layer, x, positions,
                                            kv_cache, meta)
        fused = self._mlp_block_norm_fused(layer, x, residual,
                                           meta.lora_indices)
        if fused is not None:
            h, residual = fused
        else:
            x, residual = fused_add_rms_norm(x, residual,
                                             layer["post_norm"],
                                             self.rms_eps)
            h = self._mlp_block(layer, x, meta.lora_indices)
        return (h, residual), kv_cache

    def pp_epilogue(self, params, state):
        h, _ = fused_add_rms_norm(state[0], state[1],
                                  params["final_norm"], self.rms_eps)
        return h

    def _o_mlp_norm_fused(self, layer, attn_out, residual):
        """o-projection + post-attention residual/norm + whole MLP in
        ONE Pallas call (decode, single-chip): a full decoder layer
        below the attention kernel is two launches (qkv_norm + this).
        Returns (h, new_residual) or None when not applicable (tp>1 —
        o is row-sharded and needs the all-reduce between o and norm —
        LoRA, bias, non-i8pair, prefill token counts, non-TPU)."""
        o_w = layer.get("o")
        gu, dn = layer.get("gate_up"), layer.get("down")
        if not (self._use_fused_mlp
                and self.ctx.tp_size == 1
                and o_w is not None and o_w.qw is not None
                and o_w.bias is None and o_w.lora_a is None
                and gu is not None and dn is not None
                and gu.qw is not None and dn.qw is not None
                and gu.bias is None and dn.bias is None
                and gu.lora_a is None and dn.lora_a is None
                # Opt-in until the on-chip A/B lands (round 4); the
                # full CPU-interpret stack is already gated green
                # (tests/models/test_fused_decode_stack.py).
                and os.environ.get("VLLM_TPU_FUSED_O_MLP")):
            return None
        from vllm_quick_tpu.ops.quant_matmul import (
            FUSED_KERNEL_MAX_TOKENS, default_backend_is_tpu,
            fused_o_mlp_norm, o_mlp_fusable)
        t = 1
        for d in attn_out.shape[:-1]:
            t *= d
        if not (t <= FUSED_KERNEL_MAX_TOKENS
                and o_mlp_fusable(o_w.qw, gu.qw, dn.qw)
                and default_backend_is_tpu()):
            return None
        return fused_o_mlp_norm(attn_out, residual, layer["post_norm"],
                                o_w.qw, gu.qw, dn.qw, eps=self.rms_eps)

    def _mlp_block_norm_fused(self, layer, x, residual, lora_indices):
        """Post-attention residual update + norm + MLP in one Pallas
        call (decode). Returns (h, new_residual) or None if the fused
        path doesn't apply (prefill token counts, LoRA, non-i8pair,
        non-TPU)."""
        gu, dn = layer.get("gate_up"), layer.get("down")
        if not (self._use_fused_mlp and lora_indices is None
                and gu is not None and dn is not None
                and gu.qw is not None and dn.qw is not None
                and gu.bias is None and dn.bias is None
                and gu.lora_a is None
                and not os.environ.get("VLLM_TPU_NO_FUSED_MLP_NORM")):
            return None
        from vllm_quick_tpu.ops.quant_matmul import (
            FUSED_KERNEL_MAX_TOKENS, default_backend_is_tpu,
            fused_mlp_norm, mlp_fusable)
        t = 1
        for d in x.shape[:-1]:
            t *= d
        if not (t <= FUSED_KERNEL_MAX_TOKENS
                and mlp_fusable(gu.qw, dn.qw)
                and default_backend_is_tpu()):
            return None
        y, r = fused_mlp_norm(x, residual, layer["post_norm"], gu.qw,
                              dn.qw, eps=self.rms_eps)
        return self.ctx.tp_all_reduce(y), r

    def _mlp_block(self, layer, x, lora_indices=None):
        gu, dn = layer["gate_up"], layer["down"]
        if (self._use_fused_mlp and lora_indices is None
                and gu.qw is not None and dn.qw is not None
                and gu.bias is None and dn.bias is None
                and gu.lora_a is None):
            from vllm_quick_tpu.ops.quant_matmul import (
                FUSED_KERNEL_MAX_TOKENS, default_backend_is_tpu,
                fused_mlp, mlp_fusable)
            t = 1
            for d in x.shape[:-1]:
                t *= d
            if (t <= FUSED_KERNEL_MAX_TOKENS and mlp_fusable(gu.qw, dn.qw)
                    and default_backend_is_tpu()):
                return self.ctx.tp_all_reduce(fused_mlp(x, gu.qw, dn.qw))
        gate_up = apply_linear(layer["gate_up"], x, lora_indices)
        x = silu_and_mul(gate_up)
        x = apply_linear(layer["down"], x, lora_indices)
        return self.ctx.tp_all_reduce(x)

    def _embed_tokens(self, params: Dict[str, Any], input_ids, meta):
        """Embedding-LoRA + adapter-added tokens when stacks are
        installed (reference: vllm/lora/layers.py:147-280)."""
        el = params.get("embed_lora")
        li = getattr(meta, "lora_indices", None) if meta is not None \
            else None
        if el is not None and li is not None:
            from vllm_quick_tpu.lora.layers import embed_with_lora
            return embed_with_lora(params["embed"], input_ids, el, li,
                                   self.ctx, self.vocab_size)
        return embed(params["embed"], input_ids, self.ctx)

    def _extend_logits(self, params: Dict[str, Any], logits, hidden,
                       lora_indices):
        """Extra-vocab columns + lm_head LoRA delta (reference:
        vllm/lora/layers.py:783-944); static extended width whenever
        stacks exist."""
        hl = params.get("head_lora")
        if hl is None:
            return logits
        from vllm_quick_tpu.lora.layers import logits_with_lora
        return logits_with_lora(logits, hidden, hl, lora_indices)

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array,
                       lora_indices=None) -> jax.Array:
        logits = unembed(hidden, params["lm_head"], self.vocab_size,
                         self.ctx)
        return self._extend_logits(params, logits, hidden, lora_indices)

    def lora_target_map(self):
        """Fused-module composition for the LoRA manager: param key ->
        [(hf_module, out_col_start, out_cols)] (lora/models.py packing;
        reference lora/layers.py packed modules)."""
        e = self.hidden_size
        q = self.num_heads * self.head_dim
        kvs = self.num_kv_heads * self.head_dim
        inter = self.config.intermediate_size // self.ctx.tp_size
        return {
            "qkv": [("self_attn.q_proj", 0, q),
                    ("self_attn.k_proj", q, kvs),
                    ("self_attn.v_proj", q + kvs, kvs)],
            "o": [("self_attn.o_proj", 0, e)],
            "gate_up": [("mlp.gate_proj", 0, inter),
                        ("mlp.up_proj", inter, inter)],
            "down": [("mlp.down_proj", 0, e)],
        }

    # -- loading -----------------------------------------------------------

    def kv_cache_shape(self, num_blocks: int,
                       block_size: int) -> Tuple[int, ...]:
        # Fused K/V layout [NB, 2, H, S, D] (ops/cache_ops.py).
        return (num_blocks, 2, self.num_kv_heads, block_size,
                self.head_dim)

    def load_params(self, weights: Dict[str, np.ndarray],
                    tp_rank: int = 0) -> Dict[str, Any]:
        pb = ParamBuilder(weights, self.quant, self.dtype,
                          tp_rank=tp_rank, tp_size=self.ctx.tp_size)
        return self.build_params(pb)

    def build_params(self, pb: ParamBuilder) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        params["embed"] = pb.array("model.embed_tokens.weight",
                                   shard_axis=0 if pb.tp_size > 1 else None)
        cfg = self.config
        total_heads = cfg.num_attention_heads
        total_kv = getattr(cfg, "num_key_value_heads", total_heads)
        layers = []
        for i in range(self.num_layers):
            pfx = f"model.layers.{i}"
            qkv = pb.qkv(f"{pfx}.self_attn.q_proj",
                         f"{pfx}.self_attn.k_proj",
                         f"{pfx}.self_attn.v_proj",
                         total_heads, total_kv, self.head_dim, bias=True)
            o, _ = pb.linear([f"{pfx}.self_attn.o_proj"], shard="row")
            layer = {
                "input_norm": pb.array(f"{pfx}.input_layernorm.weight"),
                "post_norm": pb.array(
                    f"{pfx}.post_attention_layernorm.weight"),
                "qkv": qkv,
                "o": o,
            }
            self._build_mlp_params(pb, pfx, layer)
            layers.append(layer)
        params["layers"] = layers
        params["final_norm"] = pb.array("model.norm.weight")
        return self._finish_params(pb, params)

    def _build_mlp_params(self, pb: ParamBuilder, pfx: str,
                          layer: Dict[str, Any]) -> None:
        gate_up, _ = pb.linear([f"{pfx}.mlp.gate_proj",
                                f"{pfx}.mlp.up_proj"], shard="col")
        down, _ = pb.linear([f"{pfx}.mlp.down_proj"], shard="row")
        layer["gate_up"] = gate_up
        layer["down"] = down

    def _finish_params(self, pb: ParamBuilder,
                       params: Dict[str, Any]) -> Dict[str, Any]:
        if self.tie_embeddings or not pb.has("lm_head.weight"):
            params["lm_head"] = params["embed"].T
        else:
            params["lm_head"] = pb.array(
                "lm_head.weight", transpose=True,
                shard_axis=1 if pb.tp_size > 1 else None)
        return params

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random init with checkpoint-equivalent shapes (reference:
        weight_utils.py:286 initialize_dummy_weights)."""
        rng = np.random.default_rng(seed)
        cfg = self.config
        e = self.hidden_size
        inter = cfg.intermediate_size

        def dense(k, n, shard="none"):
            from vllm_quick_tpu.model_executor.layers.linear import (
                LinearWeights)
            from vllm_quick_tpu.ops import quant_formats as qf
            w = (rng.standard_normal((k, n)) * 0.02).astype(np.float32)
            if self.quant is not None:
                return LinearWeights(qw=qf.quantize_reference(w),
                                     shard=shard)
            return LinearWeights(w=jnp.asarray(w, dtype=self.dtype),
                                 shard=shard)

        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        layers = []
        for _ in range(self.num_layers):
            layers.append({
                "input_norm": jnp.ones((e,), dtype=self.dtype),
                "post_norm": jnp.ones((e,), dtype=self.dtype),
                "qkv": dense(e, q_sz + 2 * kv_sz, shard="col"),
                "o": dense(q_sz, e, shard="row"),
                "gate_up": dense(e, 2 * inter // self.ctx.tp_size,
                                 shard="col"),
                "down": dense(inter // self.ctx.tp_size, e, shard="row"),
            })
        # Vocab-parallel: each rank holds a [V/tp, E] shard (padded up).
        v_local = -(-self.vocab_size // self.ctx.tp_size)
        embed_w = jnp.asarray(
            rng.standard_normal((v_local, e)) * 0.02,
            dtype=self.dtype)
        return {
            "embed": embed_w,
            "layers": layers,
            "final_norm": jnp.ones((e,), dtype=self.dtype),
            "lm_head": embed_w.T,
        }


class MistralForCausalLM(LlamaForCausalLM):
    """Mistral = Llama decoder + sliding-window attention
    (reference: vllm/model_executor/models/mistral.py, 377 LoC)."""
