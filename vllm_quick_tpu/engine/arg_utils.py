"""EngineArgs: the CLI/dataclass flag system.

Reference parity: vllm/engine/arg_utils.py:10-337 — same flag names
(so reference users can switch without relearning), producing the six
config objects.
"""
import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Tuple

from vllm_quick_tpu.config import (CacheConfig, DeviceConfig, LoRAConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)


@dataclass
class EngineArgs:
    model: str
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    trust_remote_code: bool = False
    download_dir: Optional[str] = None
    load_format: str = "auto"
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    lm_head_dtype: str = "auto"
    seed: int = 0
    max_model_len: Optional[int] = None
    worker_use_ray: bool = False        # accepted for CLI parity; unused
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    sequence_parallel_size: int = 1
    max_parallel_loading_workers: Optional[int] = None
    block_size: int = 16
    swap_space: int = 4                 # GiB
    gpu_memory_utilization: float = 0.90
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_paddings: int = 256
    speculative_model: Optional[str] = None
    num_speculative_tokens: int = 4
    num_decode_steps: int = 1
    enable_chunked_prefill: bool = False
    disable_log_stats: bool = False
    revision: Optional[str] = None
    tokenizer_revision: Optional[str] = None
    quantization: Optional[str] = None
    enforce_eager: bool = False
    max_context_len_to_capture: int = 8192
    disable_custom_all_reduce: bool = False  # CLI parity; ICI is native
    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    lora_extra_vocab_size: int = 256
    lora_dtype: str = "auto"
    max_cpu_loras: Optional[int] = None
    device: str = "auto"
    num_tpu_blocks_override: Optional[int] = None

    def __post_init__(self):
        if self.tokenizer is None:
            self.tokenizer = self.model

    @classmethod
    def add_cli_args(cls, parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        for f in dataclasses.fields(cls):
            name = "--" + f.name.replace("_", "-")
            if f.type == bool or f.default is False:
                parser.add_argument(name, action="store_true",
                                    default=f.default)
            else:
                ftype = f.type
                if ftype in (Optional[int], ):
                    ftype = int
                elif ftype in (Optional[str], ):
                    ftype = str
                elif ftype is float:
                    ftype = float
                elif ftype is int:
                    ftype = int
                else:
                    ftype = str
                parser.add_argument(name, type=ftype, default=f.default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        return cls(**{a: getattr(args, a) for a in attrs
                      if hasattr(args, a)})

    def create_engine_configs(
        self,
    ) -> Tuple[ModelConfig, CacheConfig, ParallelConfig, SchedulerConfig,
               DeviceConfig, Optional[LoRAConfig]]:
        model_config = ModelConfig(
            model=self.model,
            tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code,
            download_dir=self.download_dir,
            load_format=self.load_format,
            dtype=self.dtype,
            seed=self.seed,
            revision=self.revision,
            tokenizer_revision=self.tokenizer_revision,
            max_model_len=self.max_model_len,
            quantization=self.quantization,
            enforce_eager=self.enforce_eager,
            max_context_len_to_capture=self.max_context_len_to_capture,
            lm_head_dtype=self.lm_head_dtype,
        )
        cache_config = CacheConfig(
            block_size=self.block_size,
            gpu_memory_utilization=self.gpu_memory_utilization,
            swap_space=self.swap_space,
            cache_dtype=self.kv_cache_dtype,
            sliding_window=model_config.get_sliding_window(),
            num_tpu_blocks_override=self.num_tpu_blocks_override,
        )
        parallel_config = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            expert_parallel_size=self.expert_parallel_size,
            sequence_parallel_size=self.sequence_parallel_size,
            worker_use_ray=self.worker_use_ray,
            max_parallel_loading_workers=self.max_parallel_loading_workers,
            disable_custom_all_reduce=self.disable_custom_all_reduce,
        )
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            max_paddings=self.max_paddings,
            speculative_model=self.speculative_model,
            num_speculative_tokens=self.num_speculative_tokens,
            num_decode_steps=self.num_decode_steps,
            enable_chunked_prefill=self.enable_chunked_prefill,
        )
        device_config = DeviceConfig(self.device)
        lora_config = LoRAConfig(
            max_lora_rank=self.max_lora_rank,
            max_loras=self.max_loras,
            max_cpu_loras=self.max_cpu_loras,
            lora_dtype=self.lora_dtype,
            lora_extra_vocab_size=self.lora_extra_vocab_size,
        ) if self.enable_lora else None

        model_config.verify_with_parallel_config(parallel_config)
        cache_config.verify_with_parallel_config(parallel_config)
        if lora_config:
            lora_config.verify_with_model_config(model_config)
            lora_config.verify_with_scheduler_config(scheduler_config)
        return (model_config, cache_config, parallel_config,
                scheduler_config, device_config, lora_config)


@dataclass
class AsyncEngineArgs(EngineArgs):
    """Extra knobs for the async engine (reference: arg_utils.py:313)."""
    engine_use_ray: bool = False
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None
