"""Vendored HF configs for trust-remote-code model families
(reference parity: vllm/transformers_utils/configs/ — aquila, baichuan,
chatglm, falcon, mpt, qwen vendored configs)."""
from vllm_quick_tpu.transformers_utils.configs.baichuan import (
    BaiChuanConfig)
from vllm_quick_tpu.transformers_utils.configs.chatglm import ChatGLMConfig
from vllm_quick_tpu.transformers_utils.configs.internlm2 import (
    InternLM2Config)
from vllm_quick_tpu.transformers_utils.configs.qwen import QWenConfig

__all__ = ["BaiChuanConfig", "ChatGLMConfig", "InternLM2Config",
           "QWenConfig"]
