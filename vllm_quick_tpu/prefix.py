"""Shared-prefix pool for prefix caching.

Same semantics as the reference's experimental prefix caching
(vllm/prefix.py): a ``Prefix`` is an immutable, block-aligned prompt
prefix whose KV blocks can be shared by many sequence groups; the pool
deduplicates by token-hash.
"""
from typing import Dict, List, Optional, Sequence, Tuple

from vllm_quick_tpu.block import BlockTable


class Prefix:
    """A block-aligned token prefix with a shared block table.

    ``computed`` flips to True once a forward pass has filled its KV
    blocks; until then schedulers must treat its tokens as uncached.
    """

    def __init__(self, token_ids: Sequence[int], block_size: int) -> None:
        self.token_ids = tuple(token_ids)
        self.block_size = block_size
        self.length = len(token_ids)
        self.hash = hash(self.token_ids)
        assert self.length % block_size == 0
        self.block_table: Optional[BlockTable] = None
        self.computed = False

    @property
    def allocated(self) -> bool:
        return self.block_table is not None

    def get_num_blocks(self) -> int:
        return self.length // self.block_size

    def get_block_numbers(self) -> List[int]:
        assert self.block_table is not None
        return [block.block_number for block in self.block_table]

    def get_length(self) -> int:
        return self.length

    def __hash__(self) -> int:
        return self.hash

    def set_block_table(self, block_table: BlockTable) -> None:
        self.block_table = block_table.copy()


class PrefixPool:
    """Deduplicating pool of prefixes, keyed by token hash."""

    def __init__(self, block_size: int) -> None:
        self.prefixes: Dict[int, Prefix] = {}
        self.block_size = block_size

    def _truncate(self, token_ids: Sequence[int]) -> Tuple[int, ...]:
        new_length = len(token_ids) // self.block_size * self.block_size
        return tuple(token_ids[:new_length])

    def add_or_get_prefix(self, token_ids: Sequence[int]) -> Optional[Prefix]:
        token_ids = self._truncate(token_ids)
        if len(token_ids) == 0:
            return None
        prefix = Prefix(token_ids, self.block_size)
        prefix_hash = hash(prefix)
        if prefix_hash not in self.prefixes:
            self.prefixes[prefix_hash] = prefix
        return self.prefixes[prefix_hash]
