"""Logical and physical KV-cache token blocks.

Same data model as the reference (vllm/block.py:1-66): a sequence owns a
list of fixed-size *logical* blocks; the block manager maps each to a
ref-counted *physical* block that lives in TPU HBM or host RAM.
"""
from typing import List

from vllm_quick_tpu.utils import Device

_BLANK_TOKEN_ID = -1


class LogicalTokenBlock:
    """A fixed-size run of token ids within one sequence."""

    def __init__(self, block_number: int, block_size: int) -> None:
        self.block_number = block_number
        self.block_size = block_size
        self.token_ids: List[int] = [_BLANK_TOKEN_ID] * block_size
        self.num_tokens = 0

    def is_empty(self) -> bool:
        return self.num_tokens == 0

    def get_num_empty_slots(self) -> int:
        return self.block_size - self.num_tokens

    def is_full(self) -> bool:
        return self.num_tokens == self.block_size

    def append_tokens(self, token_ids: List[int]) -> None:
        assert len(token_ids) <= self.get_num_empty_slots()
        start = self.num_tokens
        self.token_ids[start:start + len(token_ids)] = token_ids
        self.num_tokens += len(token_ids)

    def get_token_ids(self) -> List[int]:
        return self.token_ids[:self.num_tokens]

    def get_last_token_id(self) -> int:
        assert self.num_tokens > 0
        return self.token_ids[self.num_tokens - 1]


class PhysicalTokenBlock:
    """A slot in the paged KV cache on a particular device."""

    def __init__(self, device: Device, block_number: int,
                 block_size: int) -> None:
        self.device = device
        self.block_number = block_number
        self.block_size = block_size
        self.ref_count = 0

    def __repr__(self) -> str:
        return (f"PhysicalTokenBlock(device={self.device}, "
                f"block_number={self.block_number}, "
                f"ref_count={self.ref_count})")


# A sequence's physical block mapping, ordered by logical block index.
BlockTable = List[PhysicalTokenBlock]
