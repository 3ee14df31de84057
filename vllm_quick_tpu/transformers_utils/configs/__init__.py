"""Config classes for trust-remote-code model families (capability
parity: vllm/transformers_utils/configs/ — baichuan, chatglm, qwen,
internlm2, deepseek).

These checkpoints ship their config class as remote code; to load them
without ``trust_remote_code`` we need local equivalents. Rather than
vendoring each family's boilerplate class, every config is declared as
a defaults TABLE and a tiny factory builds the PretrainedConfig
subclass: ``__init__`` pops each table field from kwargs (falling back
to the default), applies the family's derived-attribute hook, and
forwards the remainder (token ids, tie_word_embeddings, ...) to
``PretrainedConfig``.
"""
from transformers import PretrainedConfig


def _declare(name: str, model_type: str, fields: dict, *,
             super_defaults: dict = None, attribute_map: dict = None,
             post=None):
    sup = super_defaults or {}

    def __init__(self, **kwargs):
        for key, default in fields.items():
            setattr(self, key, kwargs.pop(key, default))
        if post is not None:
            post(self)
        for key, default in sup.items():
            kwargs.setdefault(key, default)
        PretrainedConfig.__init__(self, **kwargs)

    ns = {
        "model_type": model_type,
        "keys_to_ignore_at_inference": ["past_key_values"],
        "__init__": __init__,
    }
    if attribute_map:
        ns["attribute_map"] = attribute_map
    cls = type(name, (PretrainedConfig,), ns)
    cls.__module__ = __name__
    return cls


_LLAMA_LIKE = dict(hidden_act="silu", initializer_range=0.02,
                   rms_norm_eps=1e-6, use_cache=True)
_TOKENS_012 = dict(pad_token_id=0, bos_token_id=1, eos_token_id=2,
                   tie_word_embeddings=False)


BaiChuanConfig = _declare(
    "BaiChuanConfig", "baichuan",
    dict(vocab_size=64000, hidden_size=4096, intermediate_size=11008,
         num_hidden_layers=32, num_attention_heads=32,
         max_position_embeddings=4096, **_LLAMA_LIKE),
    super_defaults=_TOKENS_012,
)

# 13B variant uses ALiBi; same schema, distinct model_type string.
BaichuanConfig = _declare(
    "BaichuanConfig", "baichuan",
    dict(vocab_size=64000, hidden_size=5120, intermediate_size=13696,
         num_hidden_layers=40, num_attention_heads=40,
         model_max_length=4096, **_LLAMA_LIKE),
    super_defaults=_TOKENS_012,
)

InternLM2Config = _declare(
    "InternLM2Config", "internlm2",
    dict(vocab_size=103168, hidden_size=4096, intermediate_size=11008,
         num_hidden_layers=32, num_attention_heads=32,
         num_key_value_heads=None, max_position_embeddings=2048,
         bias=True, rope_theta=10000, rope_scaling=None, **_LLAMA_LIKE),
    super_defaults=_TOKENS_012,
    post=lambda c: setattr(
        c, "num_key_value_heads",
        c.num_key_value_heads or c.num_attention_heads),
)

DeepseekConfig = _declare(
    "DeepseekConfig", "deepseek",
    dict(vocab_size=102400, hidden_size=4096, intermediate_size=11008,
         moe_intermediate_size=1407, num_hidden_layers=30,
         num_attention_heads=32, num_key_value_heads=32,
         n_shared_experts=None, n_routed_experts=None,
         num_experts_per_tok=None, moe_layer_freq=1,
         first_k_dense_replace=0, norm_topk_prob=False,
         scoring_func="softmax", max_position_embeddings=2048,
         rope_theta=10000.0, rope_scaling=None, attention_bias=False,
         **_LLAMA_LIKE),
    super_defaults=dict(pad_token_id=None, bos_token_id=100000,
                        eos_token_id=100001, tie_word_embeddings=False),
    post=lambda c: setattr(
        c, "num_key_value_heads",
        c.num_key_value_heads or c.num_attention_heads),
)

QWenConfig = _declare(
    "QWenConfig", "qwen",
    dict(vocab_size=151936, hidden_size=4096, num_hidden_layers=32,
         num_attention_heads=32, emb_dropout_prob=0.0,
         attn_dropout_prob=0.0, layer_norm_epsilon=1e-6,
         initializer_range=0.02, max_position_embeddings=8192,
         scale_attn_weights=True, use_cache=True, bf16=False,
         fp16=False, fp32=False, kv_channels=128, rotary_pct=1.0,
         rotary_emb_base=10000, use_dynamic_ntk=True,
         use_logn_attn=True, use_flash_attn="auto",
         intermediate_size=22016, no_bias=True),
    super_defaults=dict(tie_word_embeddings=False),
)


def _chatglm_post(c):
    c.vocab_size = c.padded_vocab_size


ChatGLMConfig = _declare(
    "ChatGLMConfig", "chatglm",
    dict(num_layers=28, padded_vocab_size=65024, hidden_size=4096,
         ffn_hidden_size=13696, kv_channels=128, num_attention_heads=32,
         seq_length=2048, hidden_dropout=0.0, attention_dropout=0.0,
         layernorm_epsilon=1e-5, rmsnorm=True,
         apply_residual_connection_post_layernorm=False,
         post_layer_norm=True, add_bias_linear=False,
         add_qkv_bias=False, interleaved_qkv=False,
         bias_dropout_fusion=True, multi_query_attention=False,
         multi_query_group_num=1, apply_query_key_layer_scaling=True,
         attention_softmax_in_fp32=True, fp32_residual_connection=False,
         quantization_bit=0, pre_seq_len=None, prefix_projection=False),
    attribute_map={"num_hidden_layers": "num_layers",
                   "n_head_kv": "multi_query_group_num"},
    post=_chatglm_post,
)

__all__ = ["BaiChuanConfig", "BaichuanConfig", "ChatGLMConfig",
           "DeepseekConfig", "InternLM2Config", "QWenConfig"]
