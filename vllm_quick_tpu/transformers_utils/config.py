"""HF config loading with vendored fallbacks (reference parity:
vllm/transformers_utils/config.py — get_config with trust-remote-code
fallback to vendored config classes)."""
import json
import os
from typing import Optional

from transformers import AutoConfig, PretrainedConfig

from vllm_quick_tpu.transformers_utils.configs import (BaiChuanConfig,
                                                       ChatGLMConfig,
                                                       DeepseekConfig,
                                                       InternLM2Config,
                                                       QWenConfig)

_CONFIG_REGISTRY = {
    "baichuan": BaiChuanConfig,
    "chatglm": ChatGLMConfig,
    "internlm2": InternLM2Config,
    "qwen": QWenConfig,
    "deepseek": DeepseekConfig,
}


def get_config(model: str, trust_remote_code: bool = False,
               revision: Optional[str] = None) -> PretrainedConfig:
    # Vendored configs first for known remote-code model types, so no
    # remote code execution is ever needed.
    cfg_path = os.path.join(model, "config.json")
    if os.path.isdir(model) and os.path.exists(cfg_path):
        with open(cfg_path) as f:
            raw = json.load(f)
        model_type = raw.get("model_type", "")
        if model_type in _CONFIG_REGISTRY:
            return _CONFIG_REGISTRY[model_type].from_pretrained(
                model, revision=revision)
    try:
        return AutoConfig.from_pretrained(
            model, trust_remote_code=trust_remote_code, revision=revision)
    except ValueError as e:
        if (not trust_remote_code
                and "requires you to execute" in str(e)):
            raise RuntimeError(
                "Failed to load the model config. If the repo relies on "
                "custom code, pass trust_remote_code=True.") from e
        raise
