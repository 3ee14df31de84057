"""Shared-prefix registry for prefix caching.

Capability parity with the reference's experimental prefix caching
(vllm/prefix.py): a ``Prefix`` is an immutable block-aligned run of
prompt tokens whose KV blocks many requests can share. Block tables
here are plain ``List[int]`` physical ids (core/block_manager.py);
reference counting happens in the manager's pools.
"""
from typing import Dict, List, Optional, Sequence, Tuple


class Prefix:
    """A block-aligned token prefix plus its pinned device blocks.

    ``computed`` flips True after the first forward pass fills the KV
    blocks; until then the prefix must be treated as uncached.
    """

    __slots__ = ("token_ids", "block_size", "length", "hash",
                 "block_table", "computed")

    def __init__(self, token_ids: Sequence[int], block_size: int) -> None:
        assert len(token_ids) % block_size == 0
        self.token_ids: Tuple[int, ...] = tuple(token_ids)
        self.block_size = block_size
        self.length = len(self.token_ids)
        self.hash = hash(self.token_ids)
        self.block_table: Optional[List[int]] = None
        self.computed = False

    @property
    def allocated(self) -> bool:
        return self.block_table is not None

    def get_num_blocks(self) -> int:
        return self.length // self.block_size

    def get_block_numbers(self) -> List[int]:
        assert self.block_table is not None
        return list(self.block_table)

    def get_length(self) -> int:
        return self.length

    def __hash__(self) -> int:
        return self.hash

    def set_block_table(self, block_table: List[int]) -> None:
        self.block_table = list(block_table)


class PrefixPool:
    """Deduplicates prefixes by token-tuple hash; truncates candidate
    prefixes down to a whole number of blocks."""

    def __init__(self, block_size: int) -> None:
        self.prefixes: Dict[int, Prefix] = {}
        self.block_size = block_size

    def add_or_get_prefix(self, token_ids: Sequence[int]
                          ) -> Optional[Prefix]:
        usable = len(token_ids) // self.block_size * self.block_size
        if usable == 0:
            return None
        candidate = Prefix(token_ids[:usable], self.block_size)
        return self.prefixes.setdefault(candidate.hash, candidate)
