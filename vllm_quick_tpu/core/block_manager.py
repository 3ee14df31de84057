"""Logical->physical KV block mapping.

Reference parity: vllm/core/block_manager.py:10-330 — ref-counted
allocators per device, watermark admission, copy-on-write on append,
fork sharing, swap in/out maps, sliding-window block ring, prefix-cache
block sharing. Physical block 0 on the TPU side is reserved as the
null/pad block (see ops/cache_ops.py), so allocators start at id 1.
"""
import enum
from typing import Dict, List, Optional, Set, Tuple

from vllm_quick_tpu.block import BlockTable, PhysicalTokenBlock
from vllm_quick_tpu.prefix import Prefix
from vllm_quick_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from vllm_quick_tpu.utils import Device


class BlockAllocator:
    """Free-list allocator of ref-counted physical blocks."""

    def __init__(self, device: Device, block_size: int, num_blocks: int,
                 first_block_id: int = 0) -> None:
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.free_blocks: List[PhysicalTokenBlock] = [
            PhysicalTokenBlock(device, first_block_id + i, block_size)
            for i in range(num_blocks)
        ]

    def allocate(self) -> PhysicalTokenBlock:
        if not self.free_blocks:
            raise ValueError("Out of memory! No free blocks available.")
        block = self.free_blocks.pop()
        block.ref_count = 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            self.free_blocks.append(block)

    def get_num_free_blocks(self) -> int:
        return len(self.free_blocks)


class AllocStatus(enum.Enum):
    OK = enum.auto()       # can allocate now
    LATER = enum.auto()    # not now, retry when blocks free up
    NEVER = enum.auto()    # prompt can never fit; reject the request


class BlockSpaceManager:
    """Maps sequences' logical blocks to device/host physical blocks."""

    def __init__(
        self,
        block_size: int,
        num_gpu_blocks: int,      # usable TPU HBM blocks (null excluded)
        num_cpu_blocks: int,
        watermark: float = 0.01,
        sliding_window: Optional[int] = None,
    ) -> None:
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        self.block_sliding_window: Optional[int] = None
        if sliding_window is not None:
            assert sliding_window % block_size == 0, (sliding_window,
                                                      block_size)
            self.block_sliding_window = sliding_window // block_size
        self.watermark = watermark
        assert watermark >= 0.0
        self.watermark_blocks = int(watermark * num_gpu_blocks)
        # TPU block ids start at 1: block 0 is the null/pad block.
        self.gpu_allocator = BlockAllocator(Device.TPU, block_size,
                                            num_gpu_blocks,
                                            first_block_id=1)
        self.cpu_allocator = BlockAllocator(Device.CPU, block_size,
                                            num_cpu_blocks)
        self.block_tables: Dict[int, BlockTable] = {}

    # -- admission ---------------------------------------------------------

    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_required = len(seq.logical_token_blocks)
        if seq_group.prefix is not None and seq_group.prefix.allocated:
            num_required -= seq_group.prefix.get_num_blocks()
        if self.block_sliding_window is not None:
            num_required = min(num_required, self.block_sliding_window)
        num_free = self.gpu_allocator.get_num_free_blocks()
        if self.num_total_gpu_blocks - num_required < self.watermark_blocks:
            return AllocStatus.NEVER
        if num_free - num_required >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_prompt_blocks = len(seq.logical_token_blocks)

        block_table: BlockTable = []
        prefix_block_table: BlockTable = []
        num_prefix_blocks = 0

        prefix = seq_group.prefix
        if prefix is not None and prefix.allocated:
            # Reuse the prefix's blocks (shared, read-only).
            num_prefix_blocks = prefix.get_num_blocks()
            for block in prefix.block_table:
                block.ref_count += seq_group.num_seqs()
                block_table.append(block)

        for logical_idx in range(num_prefix_blocks, num_prompt_blocks):
            if (self.block_sliding_window is not None
                    and logical_idx >= self.block_sliding_window):
                block = block_table[logical_idx % self.block_sliding_window]
            else:
                block = self.gpu_allocator.allocate()
            # All candidate sequences share the prompt blocks.
            block.ref_count = seq_group.num_seqs()
            block_table.append(block)

        if prefix is not None and not prefix.allocated:
            # First group computing this prefix: pin its blocks.
            num_prefix_blocks = prefix.get_num_blocks()
            prefix_block_table = block_table[:num_prefix_blocks]
            for block in prefix_block_table:
                block.ref_count += 1
            prefix.set_block_table(prefix_block_table)

        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            self.block_tables[seq.seq_id] = block_table.copy()

    # -- decode growth -----------------------------------------------------

    def can_append_slot(self, seq_group: SequenceGroup) -> bool:
        # Worst case: every running sequence needs one new block.
        num_free = self.gpu_allocator.get_num_free_blocks()
        num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return num_seqs <= num_free

    def append_slot(self, seq: Sequence) -> Optional[Tuple[int, int]]:
        """Allocate/share a slot for the sequence's new token. Returns a
        (src, dst) block copy for COW, if one is required."""
        logical_blocks = seq.logical_token_blocks
        block_table = self.block_tables[seq.seq_id]

        if len(block_table) < len(logical_blocks):
            if (self.block_sliding_window
                    and len(block_table) >= self.block_sliding_window):
                # ring reuse
                block_table.append(
                    block_table[len(block_table) %
                                self.block_sliding_window])
            else:
                block_table.append(self.gpu_allocator.allocate())
            return None

        last_block = block_table[-1]
        assert last_block.device == Device.TPU
        if last_block.ref_count == 1:
            return None
        # Shared block: copy-on-write (block_manager.py:173-203).
        new_block = self.gpu_allocator.allocate()
        block_table[-1] = new_block
        self.gpu_allocator.free(last_block)
        return last_block.block_number, new_block.block_number

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        src_block_table = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = src_block_table.copy()
        for block in set(src_block_table):
            block.ref_count += 1

    # -- swapping ----------------------------------------------------------

    def _get_physical_blocks(
            self, seq_group: SequenceGroup) -> List[PhysicalTokenBlock]:
        blocks: Set[PhysicalTokenBlock] = set()
        for seq in seq_group.get_seqs():
            if seq.is_finished():
                continue
            blocks.update(self.block_tables[seq.seq_id])
        if seq_group.prefix is not None and seq_group.prefix.allocated:
            blocks.difference_update(seq_group.prefix.block_table)
        return list(blocks)

    def can_swap_in(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        num_swapped = seq_group.num_seqs(status=SequenceStatus.SWAPPED)
        num_free = self.gpu_allocator.get_num_free_blocks()
        # One extra block per sequence for the next appended token.
        num_required = len(blocks) + num_swapped
        return num_free - num_required >= self.watermark_blocks

    def swap_in(self, seq_group: SequenceGroup) -> Dict[int, int]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        prefix_blocks = set()
        if seq_group.prefix is not None and seq_group.prefix.allocated:
            prefix_blocks = set(seq_group.prefix.block_table)
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            new_block_table: BlockTable = []
            for cpu_block in self.block_tables[seq.seq_id]:
                if cpu_block in prefix_blocks:
                    # Prefix blocks never left the device.
                    cpu_block.ref_count += 1
                    new_block_table.append(cpu_block)
                    continue
                if cpu_block in mapping:
                    gpu_block = mapping[cpu_block]
                    gpu_block.ref_count += 1
                else:
                    gpu_block = self.gpu_allocator.allocate()
                    mapping[cpu_block] = gpu_block
                new_block_table.append(gpu_block)
            for cpu_block in set(self.block_tables[seq.seq_id]):
                if cpu_block not in prefix_blocks:
                    self.cpu_allocator.free(cpu_block)
            self.block_tables[seq.seq_id] = new_block_table
        return {
            cpu.block_number: gpu.block_number
            for cpu, gpu in mapping.items()
        }

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = self._get_physical_blocks(seq_group)
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> Dict[int, int]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        prefix_blocks = set()
        if seq_group.prefix is not None and seq_group.prefix.allocated:
            prefix_blocks = set(seq_group.prefix.block_table)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            new_block_table: BlockTable = []
            for gpu_block in self.block_tables[seq.seq_id]:
                if gpu_block in prefix_blocks:
                    # Keep shared prefix blocks resident on device.
                    gpu_block.ref_count += 1
                    new_block_table.append(gpu_block)
                    continue
                if gpu_block in mapping:
                    cpu_block = mapping[gpu_block]
                    cpu_block.ref_count += 1
                else:
                    cpu_block = self.cpu_allocator.allocate()
                    mapping[gpu_block] = cpu_block
                new_block_table.append(cpu_block)
            for gpu_block in set(self.block_tables[seq.seq_id]):
                self.gpu_allocator.free(gpu_block)
            self.block_tables[seq.seq_id] = new_block_table
        return {
            gpu.block_number: cpu.block_number
            for gpu, cpu in mapping.items()
        }

    # -- release -----------------------------------------------------------

    def _free_block_table(self, block_table: BlockTable) -> None:
        for block in set(block_table):
            if block.device == Device.TPU:
                self.gpu_allocator.free(block)
            else:
                self.cpu_allocator.free(block)

    def free(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return  # already freed / never allocated
        self._free_block_table(self.block_tables[seq.seq_id])
        del self.block_tables[seq.seq_id]

    def reset(self) -> None:
        for block_table in self.block_tables.values():
            self._free_block_table(block_table)
        self.block_tables.clear()

    def get_block_table(self, seq: Sequence) -> List[int]:
        return [b.block_number for b in self.block_tables[seq.seq_id]]

    def get_num_free_gpu_blocks(self) -> int:
        return self.gpu_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()
