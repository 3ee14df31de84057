"""Per-step batch metadata handed to the jitted model step.

Reference parity: vllm/model_executor/input_metadata.py:6. All array
fields are padded to bucketed static shapes (the TPU analogue of the
reference's CUDA-graph padded batches, model_runner.py:32).
"""
import dataclasses
from typing import Optional

import jax


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class InputMetadata:
    # Static: selects the prefill vs decode program.
    is_prompt: bool = dataclasses.field(metadata=dict(static=True))
    # Flat KV slot per token: prefill [B, L]; decode [B]. Pads -> slot 0
    # (the null block, see ops/cache_ops.py).
    slot_mapping: jax.Array = None
    # Prefill: [B] true prompt lengths (pad rows -> 0).
    prompt_lens: Optional[jax.Array] = None
    # Decode: [B] context lengths including the current token (pad -> 0).
    context_lens: Optional[jax.Array] = None
    # Decode (and prefix-cached prefill): [B, max_blocks] physical block
    # numbers, padded with the null block.
    block_tables: Optional[jax.Array] = None
    # Multi-LoRA: per-token adapter slot (prefill [B, L], decode [B]);
    # -1 selects no adapter. None when LoRA is disabled.
    lora_indices: Optional[jax.Array] = None
