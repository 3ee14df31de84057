"""Block manager unit tests (reference strategy: tests/core)."""
import pytest

from vllm_quick_tpu.core.block_manager import (AllocStatus, BlockPool,
                                               BlockSpaceManager)
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import Sequence, SequenceGroup, SequenceStatus


def make_group(prompt_len=8, block_size=4, n=1, seq_start=0,
               request_id="r0"):
    seqs = [
        Sequence(seq_start + i, "x", list(range(prompt_len)), block_size)
        for i in range(1)
    ]
    sp = SamplingParams(n=n, best_of=n,
                        temperature=1.0 if n > 1 else 0.0)
    return SequenceGroup(request_id, seqs, sp, arrival_time=0.0)


def test_pool_refcounts():
    pool = BlockPool(4, base=1)
    ids = [pool.acquire() for _ in range(4)]
    assert sorted(ids) == [1, 2, 3, 4]
    with pytest.raises(ValueError):
        pool.acquire()
    pool.retain(ids[0])
    pool.release(ids[0])
    assert pool.available() == 0
    pool.release(ids[0])
    assert pool.available() == 1
    with pytest.raises(ValueError):
        pool.release(ids[0])


def test_allocate_and_free():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=4,
                           watermark=0.0)
    g = make_group(prompt_len=8, block_size=4)
    assert bm.can_allocate(g) == AllocStatus.OK
    bm.allocate(g)
    seq = g.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    assert len(bm.get_block_table(seq)) == 2
    assert bm.get_num_free_gpu_blocks() == 6
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == 8


def test_never_fits():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=2, num_cpu_blocks=2,
                           watermark=0.0)
    g = make_group(prompt_len=100, block_size=4)
    assert bm.can_allocate(g) == AllocStatus.NEVER


def test_append_slot_and_cow():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=4,
                           watermark=0.0)
    g = make_group(prompt_len=4, block_size=4, n=2)
    bm.allocate(g)
    parent = g.get_seqs()[0]
    parent.status = SequenceStatus.RUNNING
    # Fork a child (beam/parallel sampling path).
    child = parent.fork(99)
    g.add(child)
    bm.fork(parent, child)
    # Parent appends into a shared block -> COW.
    parent.append_token_id(7, {7: 0.0})
    copy = bm.append_slot(parent)
    assert copy is None  # new token starts a fresh block (prompt was 4=bs)
    child.append_token_id(8, {8: 0.0})
    copy2 = bm.append_slot(child)
    assert copy2 is None
    # Next append lands inside block owned solely -> no COW
    parent.append_token_id(9, {9: 0.0})
    assert bm.append_slot(parent) is None


def test_cow_on_shared_last_block():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=4,
                           watermark=0.0)
    # Prompt of 3 tokens: last block has a free slot and is shared.
    g = make_group(prompt_len=3, block_size=4, n=2)
    bm.allocate(g)
    parent = g.get_seqs()[0]
    parent.status = SequenceStatus.RUNNING
    child = parent.fork(99)
    g.add(child)
    bm.fork(parent, child)
    parent.append_token_id(7, {7: 0.0})
    ret = bm.append_slot(parent)
    assert ret is not None  # shared block -> copy-on-write
    src, dst = ret
    assert src != dst


def test_swap_roundtrip():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=4, num_cpu_blocks=4,
                           watermark=0.0)
    g = make_group(prompt_len=8, block_size=4, n=2)
    bm.allocate(g)
    seq = g.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    assert bm.can_swap_out(g)
    mapping = bm.swap_out(g)
    assert len(mapping) == 2
    assert seq.status == SequenceStatus.RUNNING  # scheduler flips status
    seq.status = SequenceStatus.SWAPPED
    assert bm.get_num_free_gpu_blocks() == 4
    assert bm.can_swap_in(g)
    mapping_in = bm.swap_in(g)
    assert len(mapping_in) == 2
    assert bm.get_num_free_cpu_blocks() == 4


def test_sliding_window_ring():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=4,
                           watermark=0.0, sliding_window=8)
    g = make_group(prompt_len=20, block_size=4)
    bm.allocate(g)
    seq = g.get_seqs()[0]
    seq.status = SequenceStatus.RUNNING
    table = bm.get_block_table(seq)
    assert len(table) == 5
    # Ring: only 2 distinct physical blocks are used beyond the window.
    assert len(set(table)) == 2
