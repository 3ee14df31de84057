"""Model registry: HF architecture string -> model class.

Reference parity: vllm/model_executor/models/__init__.py:12-45 (lazy
import registry). Families are added as they land; Llama-derived
architectures share the Llama module.
"""
import importlib
from typing import Optional, Type

_MODEL_REGISTRY = {
    # arch -> (module, class)
    "LlamaForCausalLM": ("llama", "LlamaForCausalLM"),
    "MistralForCausalLM": ("llama", "MistralForCausalLM"),
    "MixtralForCausalLM": ("mixtral", "MixtralForCausalLM"),
    "GPT2LMHeadModel": ("gpt2", "GPT2LMHeadModel"),
    "OPTForCausalLM": ("opt", "OPTForCausalLM"),
    "GPTNeoXForCausalLM": ("gpt_neox", "GPTNeoXForCausalLM"),
    "Qwen2ForCausalLM": ("qwen2", "Qwen2ForCausalLM"),
    "PhiForCausalLM": ("phi", "PhiForCausalLM"),
    "GPTJForCausalLM": ("gpt_j", "GPTJForCausalLM"),
    "BloomForCausalLM": ("bloom", "BloomForCausalLM"),
    "FalconForCausalLM": ("falcon", "FalconForCausalLM"),
    "RWForCausalLM": ("falcon", "FalconForCausalLM"),
    "StableLmForCausalLM": ("stablelm", "StableLmForCausalLM"),
    "GPTBigCodeForCausalLM": ("gpt_bigcode", "GPTBigCodeForCausalLM"),
    "MPTForCausalLM": ("mpt", "MPTForCausalLM"),
    "MptForCausalLM": ("mpt", "MPTForCausalLM"),
    "InternLM2ForCausalLM": ("internlm2", "InternLM2ForCausalLM"),
    "AquilaForCausalLM": ("llama", "LlamaForCausalLM"),
    "AquilaModel": ("llama", "LlamaForCausalLM"),
    "InternLMForCausalLM": ("llama", "LlamaForCausalLM"),
    "YiForCausalLM": ("llama", "LlamaForCausalLM"),
    "DeciLMForCausalLM": ("decilm", "DeciLMForCausalLM"),
    "DeepseekForCausalLM": ("deepseek", "DeepseekForCausalLM"),
    "BaiChuanForCausalLM": ("baichuan", "BaiChuanForCausalLM"),
    "BaichuanForCausalLM": ("baichuan", "BaichuanForCausalLM"),
    "ChatGLMModel": ("chatglm", "ChatGLMForCausalLM"),
    "ChatGLMForConditionalGeneration": ("chatglm", "ChatGLMForCausalLM"),
    "QWenLMHeadModel": ("qwen", "QWenLMHeadModel"),
    "PhiForCausalLM_": ("phi", "PhiForCausalLM"),
}


class ModelRegistry:

    @staticmethod
    def load_model_cls(arch: str) -> Optional[Type]:
        if arch not in _MODEL_REGISTRY:
            return None
        module_name, cls_name = _MODEL_REGISTRY[arch]
        try:
            module = importlib.import_module(
                f"vllm_quick_tpu.model_executor.models.{module_name}")
        except ModuleNotFoundError:
            return None
        return getattr(module, cls_name, None)

    @staticmethod
    def get_supported_archs():
        return list(_MODEL_REGISTRY.keys())
