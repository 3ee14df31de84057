"""End-to-end engine tests on CPU with a tiny local Llama."""
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu import LLM, SamplingParams


@pytest.fixture(scope="module")
def llm():
    d = make_tiny_llama_dir()
    return LLM(model=d, dtype="float32", enforce_eager=True,
               num_tpu_blocks_override=128, max_model_len=256,
               max_num_batched_tokens=2048, disable_log_stats=True)


def test_greedy_generate(llm):
    outs = llm.generate(["Hello world", "The quick brown fox"],
                        SamplingParams(temperature=0.0, max_tokens=8),
                        use_tqdm=False)
    assert len(outs) == 2
    for o in outs:
        assert o.finished
        assert len(o.outputs[0].token_ids) == 8 or \
            o.outputs[0].finish_reason == "stop"
        assert o.outputs[0].finish_reason in ("stop", "length")


def test_greedy_is_deterministic(llm):
    p = SamplingParams(temperature=0.0, max_tokens=8)
    a = llm.generate(["determinism test"], p, use_tqdm=False)
    b = llm.generate(["determinism test"], p, use_tqdm=False)
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids


def test_batch_matches_single(llm):
    """Continuous batching must not change greedy results."""
    p = SamplingParams(temperature=0.0, max_tokens=6)
    prompts = ["alpha beta", "gamma delta epsilon", "zeta"]
    batched = llm.generate(prompts, p, use_tqdm=False)
    singles = [llm.generate([x], p, use_tqdm=False)[0] for x in prompts]
    for b, s in zip(batched, singles):
        assert b.outputs[0].token_ids == s.outputs[0].token_ids


def test_sampling_with_seed(llm):
    p = SamplingParams(temperature=1.0, top_p=0.9, max_tokens=8, seed=42)
    a = llm.generate(["random stuff"], p, use_tqdm=False)
    b = llm.generate(["random stuff"], p, use_tqdm=False)
    assert a[0].outputs[0].token_ids == b[0].outputs[0].token_ids


def test_n_parallel_sampling(llm):
    p = SamplingParams(n=3, temperature=0.8, max_tokens=5)
    outs = llm.generate(["multi sample"], p, use_tqdm=False)
    assert len(outs[0].outputs) == 3
    for c in outs[0].outputs:
        assert len(c.token_ids) <= 5


def test_beam_search(llm):
    p = SamplingParams(use_beam_search=True, best_of=2, n=2,
                       temperature=0.0, max_tokens=5)
    outs = llm.generate(["beam me up"], p, use_tqdm=False)
    assert len(outs[0].outputs) == 2
    # Beams should be distinct sequences (almost surely).
    toks = [tuple(c.token_ids) for c in outs[0].outputs]
    assert len(toks) == 2


def test_max_tokens_finish_reason(llm):
    p = SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True)
    outs = llm.generate(["finish reason"], p, use_tqdm=False)
    assert outs[0].outputs[0].finish_reason == "length"
    assert len(outs[0].outputs[0].token_ids) == 3


def test_stop_string(llm):
    # Find what greedy generates, then use a piece of it as stop string.
    p = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    base = llm.generate(["stop test"], p, use_tqdm=False)[0].outputs[0]
    if len(base.text) > 2:
        stop = base.text[1:3]
        p2 = SamplingParams(temperature=0.0, max_tokens=8, stop=[stop],
                            ignore_eos=True)
        out = llm.generate(["stop test"], p2, use_tqdm=False)[0].outputs[0]
        assert stop not in out.text
        assert out.finish_reason == "stop"


def test_logprobs_returned(llm):
    p = SamplingParams(temperature=0.0, max_tokens=4, logprobs=3)
    outs = llm.generate(["logprob test"], p, use_tqdm=False)
    lp = outs[0].outputs[0].logprobs
    assert lp is not None and len(lp) == len(outs[0].outputs[0].token_ids)
    for d in lp:
        assert len(d) >= 3


def test_swap_preemption_roundtrip():
    """Multi-sequence groups under a starved block pool must be
    preempted by SWAP (core/scheduler.py _preempt: RECOMPUTE is only
    for single-sequence groups) and later swapped back in, producing
    complete generations — exercises CacheEngine.swap_out/swap_in and
    the scheduler's swapped queue end-to-end."""
    d = make_tiny_llama_dir()
    llm = LLM(model=d, dtype="float32", enforce_eager=True,
              num_tpu_blocks_override=20, max_model_len=128,
              max_num_batched_tokens=512, disable_log_stats=True)
    engine = llm.llm_engine
    cache_engine = engine.worker.cache_engine
    swaps = {"out": 0, "in": 0}
    orig_out, orig_in = cache_engine.swap_out, cache_engine.swap_in

    def counting_out(m):
        swaps["out"] += 1
        return orig_out(m)

    def counting_in(m):
        swaps["in"] += 1
        return orig_in(m)

    cache_engine.swap_out = counting_out
    cache_engine.swap_in = counting_in

    # 4 groups x best_of=2 sequences, long enough generations that the
    # 19-usable-block pool (block 0 is the null block) cannot hold all
    # 8 sequences at once.
    params = SamplingParams(n=2, best_of=2, temperature=0.7, seed=0,
                            max_tokens=45, ignore_eos=True)
    outputs = llm.generate(["a b c"] * 4, params)
    assert len(outputs) == 4
    for out in outputs:
        assert len(out.outputs) == 2
        for seq in out.outputs:
            assert len(seq.token_ids) == 45
    assert swaps["out"] > 0, "expected swap-out preemption"
    assert swaps["in"] > 0, "expected swap-in resumption"
