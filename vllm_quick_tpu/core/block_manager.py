"""Paged-KV block accounting: logical position -> physical HBM block.

Capability parity with the reference block manager
(vllm/core/block_manager.py) — watermark admission, copy-on-write,
fork sharing, device<->host swap maps, sliding-window ring, shared
prefix pinning — but with a different data organization suited to this
engine:

* Physical blocks are plain ``int`` ids; reference counts live in one
  numpy array per pool (``BlockPool``), not in per-block objects.
  Block tables are ``List[int]`` and feed the model runner's numpy
  batch builders directly.
* The device free stack hands out ids in ascending order, so fresh
  prompts get (mostly) consecutive blocks — the decode attention
  kernel's contiguous-window DMA fast path keys off exactly that
  (ops/paged_attention.py group_is_contiguous).
* Device block 0 is the reserved null/pad block (ops/cache_ops.py);
  the device pool therefore starts at id 1.
* A sequence's table lives either on-device or swapped-to-host; a
  swapped table may keep its first ``pinned`` entries (shared prefix
  blocks) resident on device.
"""
import enum
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from vllm_quick_tpu.sequence import Sequence, SequenceGroup, SequenceStatus


class BlockPool:
    """Ref-counted pool of integer block ids [base, base + size)."""

    def __init__(self, size: int, base: int = 0) -> None:
        self.size = size
        self.base = base
        self._refs = np.zeros(base + size, dtype=np.int32)
        # Stack popped from the tail; reversed so low ids go out first.
        self._free: List[int] = list(range(base + size - 1, base - 1, -1))

    def acquire(self, refs: int = 1) -> int:
        if not self._free:
            raise ValueError(
                "KV block pool exhausted — scheduler admitted more than "
                "the pool can hold (accounting bug).")
        blk = self._free.pop()
        self._refs[blk] = refs
        return blk

    def retain(self, blk: int, count: int = 1) -> None:
        self._refs[blk] += count

    def set_refs(self, blk: int, refs: int) -> None:
        self._refs[blk] = refs

    def refs(self, blk: int) -> int:
        return int(self._refs[blk])

    def release(self, blk: int) -> None:
        if self._refs[blk] <= 0:
            raise ValueError(f"Double release of block {blk}.")
        self._refs[blk] -= 1
        if self._refs[blk] == 0:
            self._free.append(blk)

    def available(self) -> int:
        return len(self._free)


class AllocStatus(enum.Enum):
    OK = enum.auto()       # fits now
    LATER = enum.auto()    # retry once blocks free up
    NEVER = enum.auto()    # cannot fit even in an empty pool


@dataclass
class _SeqTable:
    """Physical mapping of one sequence. ``on_host`` marks a
    swapped-out table; its first ``pinned`` ids are prefix blocks that
    never left the device."""

    blocks: List[int] = field(default_factory=list)
    on_host: bool = False
    pinned: int = 0


class BlockSpaceManager:
    """Owns the device and host pools plus every live block table."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
        sp_size: int = 1,
    ) -> None:
        assert watermark >= 0.0
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        self.watermark_blocks = int(watermark * num_gpu_blocks)
        self.sp_size = sp_size

        self.ring_blocks: Optional[int] = None
        if sliding_window is not None:
            assert sliding_window % block_size == 0, (
                "sliding window must be a block multiple", sliding_window,
                block_size)
            self.ring_blocks = sliding_window // block_size

        if sp_size > 1:
            # Context parallelism: the device pool is sharded over sp
            # ranks (global ids laid out shard-major: shard r owns
            # [r*nb_local, (r+1)*nb_local), local id 0 of each shard is
            # that shard's null/pad block). Logical block i of every
            # sequence is placed on shard i % sp so causal work and
            # per-step KV reads balance; swapping and sliding windows
            # are out of scope for the sp pool.
            assert sliding_window is None, (
                "sliding window + sequence parallelism is unsupported")
            self.nb_local = num_gpu_blocks // sp_size
            self.device_pools = [
                BlockPool(self.nb_local - 1, base=r * self.nb_local + 1)
                for r in range(sp_size)]
            self.device_pool = None
        else:
            # Device ids start at 1 (0 = null/pad block).
            self.device_pool = BlockPool(num_gpu_blocks, base=1)
            self.device_pools = None
        self.host_pool = BlockPool(num_cpu_blocks)
        self._tables: Dict[int, _SeqTable] = {}

    # ---- sp shard helpers -------------------------------------------------

    def shard_of(self, block_id: int) -> int:
        return block_id // self.nb_local

    def local_id(self, block_id: int) -> int:
        return block_id - self.shard_of(block_id) * self.nb_local

    def _dev(self, block_id: int) -> BlockPool:
        """Pool owning a device block id (shard pool under sp)."""
        if self.sp_size > 1:
            return self.device_pools[self.shard_of(block_id)]
        return self.device_pool

    # ---- prompt admission ------------------------------------------------

    def _blocks_needed(self, seq_group: SequenceGroup) -> int:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        needed = seq.num_logical_blocks()
        prefix = seq_group.prefix
        if prefix is not None and prefix.allocated:
            needed -= prefix.get_num_blocks()
        if self.ring_blocks is not None:
            needed = min(needed, self.ring_blocks)
        return needed

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        needed = self._blocks_needed(seq_group)
        if self.sp_size > 1:
            # Logical block i lands on shard i % sp: the binding
            # constraint is the fullest shard.
            per = [-(-max(needed - r, 0) // self.sp_size)
                   for r in range(self.sp_size)]
            wm = self.watermark_blocks // self.sp_size
            for r, pool in enumerate(self.device_pools):
                if self.nb_local - 1 - per[r] < wm:
                    return AllocStatus.NEVER
            if all(pool.available() - per[r] >= wm
                   for r, pool in enumerate(self.device_pools)):
                return AllocStatus.OK
            return AllocStatus.LATER
        if self.num_total_gpu_blocks - needed < self.watermark_blocks:
            return AllocStatus.NEVER
        if self.device_pool.available() - needed >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        """Build the shared prompt table for every waiting candidate.
        All candidates of a group alias the same prompt blocks until
        copy-on-write separates them."""
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        total = seq.num_logical_blocks()
        fanout = seq_group.num_seqs()
        prefix = seq_group.prefix

        table: List[int] = []
        if prefix is not None and prefix.allocated:
            # Shared prefix already resident: alias its blocks.
            for blk in prefix.block_table:
                self._dev(blk).retain(blk, fanout)
                table.append(blk)

        while len(table) < total:
            if (self.ring_blocks is not None
                    and len(table) >= self.ring_blocks):
                # Sliding window: wrap onto the ring, no new block.
                table.append(table[len(table) % self.ring_blocks])
                continue
            pool = (self.device_pools[len(table) % self.sp_size]
                    if self.sp_size > 1 else self.device_pool)
            blk = pool.acquire()
            pool.set_refs(blk, fanout)
            table.append(blk)

        if prefix is not None and not prefix.allocated:
            # This group computes the prefix: pin its leading blocks.
            head = table[:prefix.get_num_blocks()]
            for blk in head:
                self._dev(blk).retain(blk)
            prefix.set_block_table(head)

        for s in seq_group.get_seqs(status=SequenceStatus.WAITING):
            self._tables[s.seq_id] = _SeqTable(blocks=list(table))

    # ---- decode growth ---------------------------------------------------

    def can_append_slot(self, seq_group: SequenceGroup,
                        lookahead: int = 0) -> bool:
        # Worst case each running candidate starts a fresh block (plus
        # the speculative-lookahead blocks when spec decoding).
        per_seq = 1 + -(-lookahead // self.block_size)
        running = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        if self.sp_size > 1:
            # A fresh block may land on any shard; be conservative.
            return running * per_seq <= min(
                p.available() for p in self.device_pools)
        return running * per_seq <= self.device_pool.available()

    def append_slot(self, seq: Sequence,
                    lookahead: int = 0) -> Optional[Tuple[int, int]]:
        """Reserve KV room for the sequence's next token (plus
        ``lookahead`` speculative tokens). Returns a (src, dst) pair
        when a shared tail block had to be copied."""
        table = self._tables[seq.seq_id].blocks
        target = -(-(seq.get_len() + lookahead) // self.block_size)
        if len(table) < target:
            while len(table) < target:
                if (self.ring_blocks is not None
                        and len(table) >= self.ring_blocks):
                    table.append(table[len(table) % self.ring_blocks])
                elif self.sp_size > 1:
                    table.append(self.device_pools[
                        len(table) % self.sp_size].acquire())
                else:
                    table.append(self.device_pool.acquire())
            return None
        tail = table[-1]
        if self._dev(tail).refs(tail) == 1:
            return None
        # Tail block aliased by a sibling: copy-on-write (the fresh
        # block comes from the same shard so the table's logical->shard
        # invariant holds under sp).
        fresh = self._dev(tail).acquire()
        table[-1] = fresh
        self._dev(tail).release(tail)
        return tail, fresh

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        src = self._tables[parent_seq.seq_id].blocks
        for blk in set(src):
            self._dev(blk).retain(blk)
        self._tables[child_seq.seq_id] = _SeqTable(blocks=list(src))

    # ---- swapping --------------------------------------------------------

    def _swap_footprint(self, seq_group: SequenceGroup) -> int:
        """Distinct device blocks a swap would move (prefix blocks stay
        resident and don't count)."""
        pinned = set()
        if seq_group.prefix is not None and seq_group.prefix.allocated:
            pinned = set(seq_group.prefix.block_table)
        moved = set()
        for seq in seq_group.get_seqs():
            if seq.status.finished:
                continue
            moved.update(self._tables[seq.seq_id].blocks)
        return len(moved - pinned)

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        if self.sp_size > 1:
            # Swapping an sp-sharded pool would need per-shard host
            # pools + shard-preserving swap-in; out of scope — the
            # scheduler falls back to RECOMPUTE preemption.
            return False
        return self._swap_footprint(seq_group) <= self.host_pool.available()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Move every RUNNING candidate's non-prefix blocks to host.
        Returns {device_block: host_block} for the cache engine."""
        pinned = set()
        prefix = seq_group.prefix
        if prefix is not None and prefix.allocated:
            pinned = set(prefix.block_table)

        moved: Dict[int, int] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            entry = self._tables[seq.seq_id]
            new_blocks: List[int] = []
            n_pinned = 0
            for blk in entry.blocks:
                if blk in pinned:
                    # Prefix blocks stay on device, still referenced.
                    self.device_pool.retain(blk)
                    new_blocks.append(blk)
                    n_pinned += 1
                    continue
                if blk in moved:
                    host_blk = moved[blk]
                    self.host_pool.retain(host_blk)
                else:
                    host_blk = self.host_pool.acquire()
                    moved[blk] = host_blk
                new_blocks.append(host_blk)
            for blk in set(entry.blocks):
                self.device_pool.release(blk)
            self._tables[seq.seq_id] = _SeqTable(
                blocks=new_blocks, on_host=True, pinned=n_pinned)
        return moved

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        needed = self._swap_footprint(seq_group) + seq_group.num_seqs(
            status=SequenceStatus.SWAPPED)
        return (self.device_pool.available() - needed
                >= self.watermark_blocks)

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        """Bring every SWAPPED candidate back. Returns
        {host_block: device_block} for the cache engine."""
        pinned = set()
        prefix = seq_group.prefix
        if prefix is not None and prefix.allocated:
            pinned = set(prefix.block_table)

        moved: Dict[int, int] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            entry = self._tables[seq.seq_id]
            new_blocks: List[int] = []
            for i, blk in enumerate(entry.blocks):
                if i < entry.pinned and blk in pinned:
                    # Device-resident prefix block; re-take a reference.
                    self.device_pool.retain(blk)
                    new_blocks.append(blk)
                    continue
                if blk in moved:
                    dev_blk = moved[blk]
                    self.device_pool.retain(dev_blk)
                else:
                    dev_blk = self.device_pool.acquire()
                    moved[blk] = dev_blk
                new_blocks.append(dev_blk)
            host_ids = entry.blocks[entry.pinned:]
            for blk in set(host_ids):
                self.host_pool.release(blk)
            for blk in set(entry.blocks[:entry.pinned]):
                self.device_pool.release(blk)
            self._tables[seq.seq_id] = _SeqTable(blocks=new_blocks)
        return moved

    # ---- release ---------------------------------------------------------

    def _drop_table(self, entry: _SeqTable) -> None:
        if entry.on_host:
            for blk in set(entry.blocks[:entry.pinned]):
                self._dev(blk).release(blk)
            for blk in set(entry.blocks[entry.pinned:]):
                self.host_pool.release(blk)
        else:
            for blk in set(entry.blocks):
                self._dev(blk).release(blk)

    def free(self, seq: Sequence) -> None:
        entry = self._tables.pop(seq.seq_id, None)
        if entry is not None:
            self._drop_table(entry)

    def reset(self) -> None:
        for entry in self._tables.values():
            self._drop_table(entry)
        self._tables.clear()

    # ---- views -----------------------------------------------------------

    def get_block_table(self, seq: Sequence) -> List[int]:
        return list(self._tables[seq.seq_id].blocks)

    def get_num_free_gpu_blocks(self) -> int:
        if self.sp_size > 1:
            return sum(p.available() for p in self.device_pools)
        return self.device_pool.available()

    def get_num_free_cpu_blocks(self) -> int:
        return self.host_pool.available()
