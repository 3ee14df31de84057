"""Generic decoder-only transformer base.

The reference's 26 model files (vllm/model_executor/models/, 7.5 kLoC)
share one decoder skeleton with per-family knobs; here the skeleton is
a single configurable class and each family file supplies the knobs +
checkpoint weight mapping. Covered axes:

* norm: RMSNorm vs LayerNorm (+bias), per-layer pre/post norms
* residual: sequential (llama) vs parallel attn+mlp (gpt-j/neox/phi/
  falcon), with shared or separate parallel norms
* positions: rotary (full/partial, neox/gptj style), ALiBi, learned
  absolute embeddings (+offset, OPT), or none
* attention: MHA/GQA/MQA via num_kv_heads, optional qkv clipping (MPT)
* MLP: gated (SwiGLU/GeGLU) vs plain two-layer with any activation
* heads: tied/untied lm_head, optional final-logit bias, embedding LN
"""
import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vllm_quick_tpu.model_executor.input_metadata import InputMetadata
from vllm_quick_tpu.model_executor.layers.activation import (gelu_and_mul,
                                                             get_act_fn,
                                                             silu_and_mul)
from vllm_quick_tpu.model_executor.layers.attention import Attention, KVCache
from vllm_quick_tpu.model_executor.layers.layernorm import (layer_norm,
                                                            rms_norm)
from vllm_quick_tpu.model_executor.layers.linear import (LinearWeights,
                                                         apply_linear)
from vllm_quick_tpu.model_executor.layers.vocab_embedding import (embed,
                                                                  unembed)
from vllm_quick_tpu.parallel.mesh import ParallelContext


def _flat_tokens(x) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


def alibi_slopes(total_num_heads: int) -> np.ndarray:
    """Standard ALiBi slopes (csrc reference semantics; bloom.py:46)."""
    closest_power_of_2 = 2**math.floor(math.log2(total_num_heads))
    base = 2**(-(2**-(math.log2(closest_power_of_2) - 3)))
    powers = np.arange(1, 1 + closest_power_of_2)
    slopes = np.power(base, powers)
    if closest_power_of_2 != total_num_heads:
        extra_base = 2**(-(2**-(math.log2(2 * closest_power_of_2) - 3)))
        num_remaining = min(closest_power_of_2,
                            total_num_heads - closest_power_of_2)
        extra_powers = np.arange(1, 1 + 2 * num_remaining, 2)
        slopes = np.concatenate(
            [slopes, np.power(extra_base, extra_powers)])
    return slopes.astype(np.float32)


class GenericDecoder:
    """Configure in ``__init__`` of the subclass, then implement
    ``build_params`` (checkpoint mapping) and optionally
    ``init_dummy_params``."""

    supports_quantization = False

    # -- knobs subclasses set ----------------------------------------------
    norm_type: str = "ln"              # 'rms' | 'ln'
    parallel_residual: bool = False
    shared_parallel_norm: bool = False  # gpt-j/phi: one LN feeds both
    gated_mlp: bool = False
    act_name: str = "gelu"
    pos_mode: str = "none"             # 'rope' | 'alibi' | 'learned'
    pos_offset: int = 0                # OPT's +2
    clip_qkv: Optional[float] = None
    norm_eps: float = 1e-5
    embed_ln: bool = False             # bloom
    sliding_window: Optional[int] = None
    logit_scale: float = 1.0

    def __init__(self, hf_config, quant=None,
                 ctx: ParallelContext = ParallelContext(),
                 dtype: str = "bfloat16") -> None:
        self.config = hf_config
        self.quant = quant
        self.ctx = ctx
        self.dtype = dtype
        self._configure(hf_config)
        tp = ctx.tp_size
        assert self.total_heads % tp == 0, (self.total_heads, tp)
        self.num_heads = self.total_heads // tp
        self.num_kv_heads = max(1, self.total_kv_heads // tp)
        self.scale = self.head_dim**-0.5
        self.rope = None
        self._alibi_full = None
        if self.pos_mode == "rope":
            self.rope = self._make_rope(hf_config)
        elif self.pos_mode == "alibi":
            self._alibi_full = alibi_slopes(self.total_heads)
        self.attn = Attention(
            self.num_heads, self.head_dim, self.scale,
            num_kv_heads=self.num_kv_heads,
            alibi_slopes=self._local_alibi(),
            sliding_window=self.sliding_window,
            ctx=ctx)
        self.act = get_act_fn(self.act_name)
        # Fused gate->silu->down Pallas MLP (one kernel per layer
        # instead of two; back-to-back weight streams, +4% measured
        # batch-1 decode). VLLM_TPU_NO_FUSED_MLP opts out.
        import os as _os
        self._use_fused_mlp = not _os.environ.get("VLLM_TPU_NO_FUSED_MLP")

    # subclasses must set: vocab_size, hidden_size, num_layers,
    # total_heads, total_kv_heads, head_dim (+ knobs) here.
    def _configure(self, cfg) -> None:
        raise NotImplementedError

    def _make_rope(self, cfg):
        raise NotImplementedError

    def _local_alibi(self) -> Optional[jax.Array]:
        if self._alibi_full is None:
            return None
        if self.ctx.tp_size == 1:
            return jnp.asarray(self._alibi_full)
        # Per-rank head slice happens inside shard_map via dynamic slice.
        return None  # set per-step from params['alibi_slopes']

    # -- forward -----------------------------------------------------------

    def forward(
        self,
        params: Dict[str, Any],
        input_ids: jax.Array,
        positions: jax.Array,
        kv_caches: List[KVCache],
        meta: InputMetadata,
    ) -> Tuple[jax.Array, List[KVCache]]:
        h = self._embed_tokens(params, input_ids, meta)
        if self.embed_ln:
            h = self._norm(h, params["embed_ln"])
        if self.pos_mode == "learned":
            h = h + params["pos_embed"][positions + self.pos_offset]

        alibi = params.get("alibi_slopes")
        if alibi is not None:
            self.attn.alibi_slopes = alibi

        new_caches = []
        for i, layer in enumerate(params["layers"]):
            h, cache = self._layer(layer, h, positions, kv_caches[i], meta)
            new_caches.append(cache)
        h = self._norm(h, params["final_norm"])
        return h, new_caches

    # -- pipeline-parallel stage hooks (parallel/pipeline.py) --------------

    def pp_prologue(self, params, input_ids, positions):
        h = embed(params["embed"], input_ids, self.ctx)
        if self.embed_ln:
            h = self._norm(h, params["embed_ln"])
        if self.pos_mode == "learned":
            h = h + params["pos_embed"][positions + self.pos_offset]
        alibi = params.get("alibi_slopes")
        if alibi is not None:
            self.attn.alibi_slopes = alibi
        return (h,)

    def pp_layer(self, layer, state, positions, kv_cache, meta):
        h, kv_cache = self._layer(layer, state[0], positions, kv_cache,
                                  meta)
        return (h,), kv_cache

    def pp_epilogue(self, params, state):
        return self._norm(state[0], params["final_norm"])

    def _layer(self, layer, h, positions, kv_cache, meta):
        li = meta.lora_indices
        x = self._norm(h, layer["ln1"])
        a, kv_cache = self._attention(layer, x, positions, kv_cache, meta)
        if self.parallel_residual:
            x2 = x if self.shared_parallel_norm else self._norm(
                h, layer["ln2"])
            m = self._mlp(layer, x2, li)
            h = self._add3(h, a, m)
        else:
            h = self._add2(h, a)
            x = self._norm(h, layer["ln2"])
            m = self._mlp(layer, x, li)
            h = self._add2(h, m)
        return h, kv_cache

    @staticmethod
    def _add2(a, b):
        return (a.astype(jnp.float32) + b.astype(jnp.float32)).astype(
            a.dtype)

    @staticmethod
    def _add3(a, b, c):
        return (a.astype(jnp.float32) + b.astype(jnp.float32)
                + c.astype(jnp.float32)).astype(a.dtype)

    def _norm(self, x, norm_params) -> jax.Array:
        w = norm_params["w"]
        b = norm_params.get("b")
        if self.norm_type == "rms":
            return rms_norm(x, w, self.norm_eps)
        return layer_norm(x, w, b, self.norm_eps)

    def _attention(self, layer, x, positions, kv_cache, meta):
        li = meta.lora_indices
        qkv = apply_linear(layer["qkv"], x, li)
        if self.clip_qkv is not None:
            qkv = jnp.clip(qkv, -self.clip_qkv, self.clip_qkv)
        q_sz = self.num_heads * self.head_dim
        kv_sz = self.num_kv_heads * self.head_dim
        q = qkv[..., :q_sz]
        k = qkv[..., q_sz:q_sz + kv_sz]
        v = qkv[..., q_sz + kv_sz:]
        if self.rope is not None:
            lead = q.shape[:-1]
            qh = q.reshape(*lead, self.num_heads, self.head_dim)
            kh = k.reshape(*lead, self.num_kv_heads, self.head_dim)
            qh, kh = self.rope(positions, qh, kh)
            q = qh.reshape(*lead, -1)
            k = kh.reshape(*lead, -1)
        out, kv_cache = self.attn(q, k, v, kv_cache, meta,
                                  positions=positions)
        out = apply_linear(layer["o"], out, li)
        out = self.ctx.tp_all_reduce(out)
        if layer.get("o_bias") is not None:
            out = out + layer["o_bias"]
        return out, kv_cache

    def _mlp(self, layer, x, lora_indices=None):
        fc1, fc2 = layer["fc1"], layer["fc2"]
        if (self._use_fused_mlp and self.gated_mlp
                and self.act_name == "silu" and lora_indices is None
                and fc1.qw is not None and fc2.qw is not None
                and fc1.bias is None and fc2.bias is None
                and fc1.lora_a is None
                and _flat_tokens(x) <= 64):
            from vllm_quick_tpu.ops.quant_matmul import (fused_mlp,
                                                         mlp_fusable)
            if mlp_fusable(fc1.qw, fc2.qw):
                out = fused_mlp(x, fc1.qw, fc2.qw)
                out = self.ctx.tp_all_reduce(out)
                return out
        up = apply_linear(layer["fc1"], x, lora_indices)
        if self.gated_mlp:
            if self.act_name == "silu":
                up = silu_and_mul(up)
            else:
                up = gelu_and_mul(up)
        else:
            up = self.act(up)
        out = apply_linear(layer["fc2"], up, lora_indices)
        out = self.ctx.tp_all_reduce(out)
        if layer.get("fc2_bias") is not None:
            out = out + layer["fc2_bias"]
        return out

    def _embed_tokens(self, params: Dict[str, Any], input_ids, meta):
        """Token embedding; applies embedding-LoRA + adapter-added
        tokens when the manager installed stacks (reference:
        vllm/lora/layers.py:147-280)."""
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
        """Append extra-vocab columns + lm_head LoRA delta when head
        stacks exist (reference: vllm/lora/layers.py:783-944). Always
        returns the EXTENDED static width when stacks are installed, so
        the jitted step/sampler shapes never depend on which adapters
        are active."""
        hl = params.get("head_lora")
        if hl is None:
            return logits
        from vllm_quick_tpu.lora.layers import logits_with_lora
        return logits_with_lora(logits, hidden, hl, lora_indices)

    def compute_logits(self, params: Dict[str, Any],
                       hidden: jax.Array,
                       lora_indices=None) -> jax.Array:
        logits = unembed(hidden, params["lm_head"], self.vocab_size,
                         self.ctx, bias=None)
        if params.get("lm_head_bias") is not None:
            logits = logits + params["lm_head_bias"]
        if self.logit_scale != 1.0:
            logits = logits * self.logit_scale
        return self._extend_logits(params, logits, hidden, lora_indices)

    # -- cache/loading -------------------------------------------------------

    def kv_cache_shape(self, num_blocks: int,
                       block_size: int) -> Tuple[int, ...]:
        # Fused K/V layout [NB, 2, H, S, D] (ops/cache_ops.py).
        return (num_blocks, 2, self.num_kv_heads, block_size,
                self.head_dim)

    def load_params(self, weights: Dict[str, np.ndarray],
                    tp_rank: int = 0) -> Dict[str, Any]:
        from vllm_quick_tpu.model_executor.param_builder import ParamBuilder
        pb = ParamBuilder(weights, self.quant, self.dtype,
                          tp_rank=tp_rank, tp_size=self.ctx.tp_size)
        return self.build_params(pb)

    def build_params(self, pb) -> Dict[str, Any]:
        raise NotImplementedError

    # -- helpers for subclasses ---------------------------------------------

    def _norm_params(self, pb, prefix: str, bias: bool = True) -> Dict:
        p = {"w": pb.array(f"{prefix}.weight")}
        if bias and pb.has(f"{prefix}.bias"):
            p["b"] = pb.array(f"{prefix}.bias")
        return p

    def _alibi_param(self) -> Optional[jax.Array]:
        """Full per-head slopes; sharded over tp by the spec rules."""
        if self._alibi_full is None:
            return None
        if self.ctx.tp_size == 1:
            return None  # already baked into the Attention module
        return jnp.asarray(self._alibi_full)

    def init_dummy_params(self, seed: int = 0) -> Dict[str, Any]:
        """Random init via a synthetic weights dict is model-specific;
        default raises (engine dummy mode targets the flagship models)."""
        raise NotImplementedError(
            f"{type(self).__name__} has no dummy init")
