"""LoRA request descriptor (reference parity: vllm/lora/request.py)."""
import dataclasses


@dataclasses.dataclass
class LoRARequest:
    """Identifies one adapter for a request.

    ``lora_int_id`` must be a globally unique positive id (0 means
    base model).
    """
    lora_name: str
    lora_int_id: int
    lora_local_path: str

    def __post_init__(self):
        if self.lora_int_id < 1:
            raise ValueError(
                f"lora_int_id must be > 0, got {self.lora_int_id}")

    def __eq__(self, value) -> bool:
        return (isinstance(value, LoRARequest)
                and self.lora_int_id == value.lora_int_id)

    def __hash__(self) -> int:
        return self.lora_int_id
