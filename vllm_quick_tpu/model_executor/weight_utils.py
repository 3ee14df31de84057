"""Checkpoint loading utilities.

Reference parity: vllm/model_executor/weight_utils.py:86-300 — format
detection (safetensors / pt / npcache / dummy), weight iteration, quant
config discovery. Zero-egress build: models load from local paths only
(a hub download hook can be layered on where egress exists).
"""
import glob
import json
import os
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from vllm_quick_tpu.logger import init_logger

logger = init_logger(__name__)


class QuantCheckpointConfig:
    """Quantization facts read from the checkpoint (reference:
    get_quant_config, weight_utils.py:86-122)."""

    def __init__(self, method: str, weight_bits: int, group_size: int,
                 desc_act: bool = False, zero_point: bool = True) -> None:
        self.method = method
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.desc_act = desc_act
        self.zero_point = zero_point
        if weight_bits != 4:
            raise ValueError(
                f"Only 4-bit weights are supported, got {weight_bits}-bit "
                f"{method}.")

    @classmethod
    def from_model_dir(cls, model_dir: str,
                       method_hint: Optional[str] = None
                       ) -> Optional["QuantCheckpointConfig"]:
        cfg = None
        # HF-style config.json quantization_config
        cfg_path = os.path.join(model_dir, "config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                hf = json.load(f)
            cfg = hf.get("quantization_config")
        if cfg is None:
            # vllm-style quant_config.json / quantize_config.json
            for name in ("quant_config.json", "quantize_config.json"):
                p = os.path.join(model_dir, name)
                if os.path.exists(p):
                    with open(p) as f:
                        cfg = json.load(f)
                    break
        if cfg is None:
            return None
        method = (cfg.get("quant_method") or method_hint or "awq").lower()
        bits = cfg.get("w_bit") or cfg.get("bits") or 4
        group = cfg.get("q_group_size") or cfg.get("group_size") or 128
        desc_act = bool(cfg.get("desc_act", False))
        zero_point = bool(cfg.get("zero_point", True))
        return cls(method, int(bits), int(group), desc_act, zero_point)


def _torch_to_numpy(t) -> np.ndarray:
    import torch
    if t.dtype == torch.bfloat16:
        return t.float().numpy()
    return t.numpy()


def hf_weights_iterator(
    model_dir: str,
    load_format: str = "auto",
) -> Iterator[Tuple[str, np.ndarray]]:
    """Yield (name, numpy array) for every tensor in the checkpoint.

    ``npcache``: converts once to a per-tensor .npy cache under
    <model_dir>/np_cache and memory-maps from there afterwards
    (reference: weight_utils.py npcache format).
    """
    if load_format == "npcache":
        cache_dir = os.path.join(model_dir, "np_cache")
        manifest = os.path.join(cache_dir, "manifest.json")
        if not os.path.exists(manifest):
            os.makedirs(cache_dir, exist_ok=True)
            names = []
            for name, arr in hf_weights_iterator(model_dir, "auto"):
                np.save(os.path.join(cache_dir,
                                     name.replace("/", "_") + ".npy"),
                        arr)
                names.append(name)
            with open(manifest, "w") as f:
                json.dump(names, f)
        with open(manifest) as f:
            names = json.load(f)
        for name in names:
            yield name, np.load(
                os.path.join(cache_dir, name.replace("/", "_") + ".npy"),
                mmap_mode="r")
        return

    st_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    bin_files = sorted(glob.glob(os.path.join(model_dir, "*.bin")) +
                       glob.glob(os.path.join(model_dir, "*.pt")))
    use_st = load_format in ("auto", "safetensors") and st_files
    if load_format == "safetensors" and not st_files:
        raise ValueError(f"No safetensors files found in {model_dir}")
    if use_st:
        from safetensors import safe_open
        for path in st_files:
            with safe_open(path, framework="np") as f:
                for name in f.keys():
                    yield name, f.get_tensor(name)
    elif bin_files:
        import torch
        for path in bin_files:
            state = torch.load(path, map_location="cpu",
                               weights_only=True)
            for name, tensor in state.items():
                yield name, _torch_to_numpy(tensor)
    else:
        raise ValueError(f"No checkpoint files found in {model_dir}")


def collect_weights(model_dir: str,
                    load_format: str = "auto") -> Dict[str, np.ndarray]:
    return dict(hf_weights_iterator(model_dir, load_format))
