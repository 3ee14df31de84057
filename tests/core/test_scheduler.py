"""Scheduler unit tests — pure Python, no device needed."""
from vllm_quick_tpu.config import CacheConfig, SchedulerConfig
from vllm_quick_tpu.core.scheduler import Scheduler
from vllm_quick_tpu.sampling_params import SamplingParams
from vllm_quick_tpu.sequence import (Sequence, SequenceGroup,
                                     SequenceStatus)


def make_scheduler(max_num_seqs=8, max_tokens=256, num_blocks=64,
                   block_size=4, max_model_len=64):
    sc = SchedulerConfig(max_num_batched_tokens=max_tokens,
                         max_num_seqs=max_num_seqs,
                         max_model_len=max_model_len)
    cc = CacheConfig(block_size=block_size, gpu_memory_utilization=0.9,
                     swap_space=1)
    cc.num_gpu_blocks = num_blocks
    cc.num_cpu_blocks = 16
    return Scheduler(sc, cc)


_next_id = [0]


def add_request(sched, prompt_len=8, block_size=4, max_tokens=16,
                greedy=True):
    i = _next_id[0]
    _next_id[0] += 1
    seq = Sequence(i, "p", list(range(prompt_len)), block_size)
    sp = SamplingParams(temperature=0.0 if greedy else 1.0,
                        max_tokens=max_tokens)
    group = SequenceGroup(f"req-{i}", [seq], sp, arrival_time=float(i))
    sched.add_seq_group(group)
    return group


def step_decode(sched, outputs):
    """Simulate the engine appending one token per running seq."""
    for g in outputs.scheduled_seq_groups:
        for seq in g.get_seqs(status=SequenceStatus.RUNNING):
            seq.append_token_id(0, {0: 0.0})


def test_prompt_first_admission():
    sched = make_scheduler()
    g1 = add_request(sched)
    g2 = add_request(sched)
    metas, out = sched.schedule()
    assert out.prompt_run
    assert len(metas) == 2
    assert all(m.is_prompt for m in metas)
    assert g1.get_seqs()[0].status == SequenceStatus.RUNNING
    # Next schedule: decode phase.
    step_decode(sched, out)
    metas, out = sched.schedule()
    assert not out.prompt_run
    assert len(metas) == 2
    assert out.num_batched_tokens == 2


def test_prompt_too_long_is_ignored():
    sched = make_scheduler(max_model_len=16, max_tokens=256)
    g = add_request(sched, prompt_len=200)
    metas, out = sched.schedule()
    assert g.get_seqs()[0].status == SequenceStatus.FINISHED_IGNORED
    assert out.ignored_seq_groups == [g]
    assert metas == []


def test_token_budget_limits_admission():
    sched = make_scheduler(max_tokens=64, max_model_len=32)
    for _ in range(10):
        add_request(sched, prompt_len=16)
    metas, out = sched.schedule()
    # 64 token budget / 16-token prompts = 4 admitted
    assert len(metas) == 4
    assert len(sched.waiting) == 6


def test_token_budget_counts_bucket_padded_shape():
    """Admission must count the runner's BUCKET-padded batch shape, not
    len*max: 5 x 100-token prompts are 500 < 512 raw but bucket-pad to
    (8, 128) = 1024 > 512 — exactly the shape that compiles (a raw
    count OOM'd a 7B engine mid-serving in round 4)."""
    sched = make_scheduler(max_tokens=512, max_model_len=512,
                           num_blocks=512)
    for _ in range(8):
        add_request(sched, prompt_len=100)
    metas, out = sched.schedule()
    # (4, 128) = 512 fits; adding a 5th pads the batch bucket to 8
    # -> (8, 128) = 1024 > 512.
    assert len(metas) == 4
    assert len(sched.waiting) == 4
    # A single max-budget-length prompt must stay admissible.
    sched2 = make_scheduler(max_tokens=512, max_model_len=512,
                            num_blocks=512)
    g = add_request(sched2, prompt_len=512)
    metas2, _ = sched2.schedule()
    assert len(metas2) == 1


def test_max_num_seqs_budget():
    sched = make_scheduler(max_num_seqs=3)
    for _ in range(5):
        add_request(sched)
    metas, out = sched.schedule()
    assert len(metas) == 3


def test_preemption_by_recompute():
    # 8 blocks of 4 tokens; two 12-token prompts fill 6 blocks.
    sched = make_scheduler(num_blocks=8, max_tokens=256, block_size=4,
                           max_model_len=32)
    g1 = add_request(sched, prompt_len=12)
    g2 = add_request(sched, prompt_len=12)
    metas, out = sched.schedule()
    assert len(metas) == 2
    # Decode: each needs a new block soon; append tokens until block
    # exhaustion forces preemption of the lower-priority group (g2).
    for _ in range(8):
        step_decode(sched, out)
        metas, out = sched.schedule()
        if sched.waiting:
            break
    assert g2 in sched.waiting  # recompute preemption (single seq)
    assert g2.get_seqs()[0].status == SequenceStatus.WAITING
    # g1 still running
    assert g1 in sched.running


def test_abort_frees_blocks():
    sched = make_scheduler()
    g = add_request(sched)
    sched.schedule()
    free_before = sched.block_manager.get_num_free_gpu_blocks()
    sched.abort_seq_group(g.request_id)
    assert sched.block_manager.get_num_free_gpu_blocks() > free_before
    assert not sched.has_unfinished_seqs()


def test_lora_budget_skips_not_blocks():
    """A group whose adapter exceeds the per-batch LoRA budget must be
    SKIPPED, letting later groups (same or base adapter) through —
    no head-of-line blocking (reference scheduler.py:219-227)."""
    from vllm_quick_tpu.config import LoRAConfig
    from vllm_quick_tpu.lora.request import LoRARequest

    sc = SchedulerConfig(max_num_batched_tokens=256, max_num_seqs=8,
                         max_model_len=64)
    cc = CacheConfig(block_size=4, gpu_memory_utilization=0.9,
                     swap_space=1)
    cc.num_gpu_blocks = 64
    cc.num_cpu_blocks = 16
    lc = LoRAConfig(max_lora_rank=8, max_loras=1)
    sched = Scheduler(sc, cc, lora_config=lc)

    def lora_req(sched_, lora_id):
        i = _next_id[0]
        _next_id[0] += 1
        seq = Sequence(i, "p", list(range(8)), 4)
        req = LoRARequest(f"a{lora_id}", lora_id, f"/tmp/a{lora_id}")
        g = SequenceGroup(f"req-{i}", [seq],
                          SamplingParams(temperature=0.0, max_tokens=4),
                          arrival_time=float(i), lora_request=req)
        sched_.add_seq_group(g)
        return g

    g_a = lora_req(sched, 1)     # adapter 1 — fits (budget 1)
    g_b = lora_req(sched, 2)     # adapter 2 — over budget, must skip
    g_c = lora_req(sched, 1)     # adapter 1 again — must still admit
    g_d = add_request(sched)     # base model — must still admit

    metas, out = sched.schedule()
    scheduled = {g.request_id for g in out.scheduled_seq_groups}
    assert g_a.request_id in scheduled
    assert g_b.request_id not in scheduled
    assert g_c.request_id in scheduled
    assert g_d.request_id in scheduled
    # The skipped group keeps its place in the waiting queue.
    assert list(sched.waiting) == [g_b]
    assert g_b.get_seqs()[0].status == SequenceStatus.WAITING


def test_finished_groups_are_freed():
    sched = make_scheduler()
    g = add_request(sched, max_tokens=1)
    metas, out = sched.schedule()
    seq = g.get_seqs()[0]
    seq.append_token_id(0, {0: 0.0})
    seq.status = SequenceStatus.FINISHED_LENGTH_CAPPED
    sched.free_seq(seq)
    sched.free_finished_seq_groups()
    assert not sched.running
