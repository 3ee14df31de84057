"""Chunked prefill scheduling (no reference counterpart: the reference
rejects prompts longer than one batch, core/scheduler.py:193-202)."""
import time

from vllm_quick_tpu.config import CacheConfig, SchedulerConfig
from vllm_quick_tpu.core.scheduler import Scheduler
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import Sequence, SequenceGroup


BLOCK = 16


def _make_scheduler(max_batched=32, max_seqs=8, max_model_len=512):
    sc = SchedulerConfig(max_num_batched_tokens=max_batched,
                         max_num_seqs=max_seqs,
                         max_model_len=max_model_len,
                         enable_chunked_prefill=True)
    cc = CacheConfig(block_size=BLOCK, gpu_memory_utilization=0.9,
                     swap_space=1, cache_dtype="auto")
    cc.num_gpu_blocks = 64
    cc.num_cpu_blocks = 16
    return Scheduler(sc, cc)


def _add_prompt(sched, rid, n_tokens):
    seq = Sequence(seq_id=hash(rid) % 10**6, prompt="x" * n_tokens,
                   prompt_token_ids=list(range(3, 3 + n_tokens)),
                   block_size=BLOCK)
    group = SequenceGroup(request_id=rid, seqs=[seq],
                          sampling_params=SamplingParams(max_tokens=4),
                          arrival_time=time.time())
    sched.add_seq_group(group)
    return group


def test_long_prompt_is_chunked_block_aligned():
    sched = _make_scheduler(max_batched=32)
    _add_prompt(sched, "r0", 100)

    seen = []
    for _ in range(8):
        metas, outs = sched.schedule()
        if not metas:
            break
        assert outs.prompt_run
        m = metas[0]
        seen.append(m.chunk)
        if m.chunk is None or m.chunk[1] == 100:
            break
    # 32-token budget, block 16: chunks 32/32/32 then the 4-token tail.
    assert seen == [(0, 32), (32, 64), (64, 96), (96, 100)]
    # Non-final chunks are flagged; the final one samples.
    assert not sched.prefilling
    assert len(sched.running) == 1


def test_chunks_interleave_with_decodes():
    sched = _make_scheduler(max_batched=32)
    # A short prompt first: becomes a running decoder.
    _add_prompt(sched, "short", 8)
    metas, outs = sched.schedule()
    assert outs.prompt_run and metas[0].chunk is None
    # Simulate its sampled token so decode steps have work.
    seq = sched.running[0].get_seqs()[0]
    seq.append_token_id(7, {7: 0.0})

    _add_prompt(sched, "long", 96)
    kinds = []
    for _ in range(10):
        metas, outs = sched.schedule()
        if not metas:
            break
        kinds.append("chunk" if (outs.prompt_run and outs.chunked_ids)
                     else ("prompt" if outs.prompt_run else "decode"))
        if outs.prompt_run:
            for g in outs.scheduled_seq_groups:
                if (g.request_id == "long"
                        and g.request_id not in outs.chunked_ids):
                    g.get_seqs()[0].append_token_id(7, {7: 0.0})
        else:
            for g in outs.scheduled_seq_groups:
                g.get_seqs()[0].append_token_id(7, {7: 0.0})
        if kinds.count("decode") >= 4:
            break
    # Decode steps run between chunk steps — no starvation.
    first_decode = kinds.index("decode")
    assert "chunk" in kinds
    assert first_decode < len(kinds) - 1
    assert any(k == "decode" for k in kinds[kinds.index("chunk"):]), kinds


def test_prompt_beyond_batch_budget_not_rejected():
    sched = _make_scheduler(max_batched=32, max_model_len=256)
    group = _add_prompt(sched, "big", 200)   # > max_batched, < model len
    metas, outs = sched.schedule()
    assert outs.prompt_run and not outs.ignored_seq_groups
    assert metas[0].chunk == (0, 32)
    assert group in sched.prefilling


def test_echo_prompt_beyond_budget_rejected_not_stuck():
    """prompt_logprobs requests can't be chunked; when their prompt
    exceeds max_num_batched_tokens they must be REJECTED (the relaxed
    prompt_limit would otherwise head-of-line-block the queue forever)."""
    sched = _make_scheduler(max_batched=32, max_model_len=256)
    seq = Sequence(seq_id=1, prompt="x" * 100,
                   prompt_token_ids=list(range(3, 103)),
                   block_size=BLOCK)
    group = SequenceGroup(
        request_id="echo", seqs=[seq],
        sampling_params=SamplingParams(max_tokens=4, prompt_logprobs=1),
        arrival_time=time.time())
    sched.add_seq_group(group)
    _add_prompt(sched, "next", 8)    # must not starve behind it

    metas, outs = sched.schedule()
    assert group in outs.ignored_seq_groups
    assert [m.request_id for m in metas] == ["next"]
