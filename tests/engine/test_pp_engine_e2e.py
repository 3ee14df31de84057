"""Engine-level pipeline parallelism: --pipeline-parallel-size serving.

The pp engine (stage-stacked params + KV pools over the pp mesh axis,
GPipe microbatch schedule, parallel/pipeline.py) must emit exactly the
tokens the plain engine emits. The reference rejects pp at config time
(config.py:388-390).
"""
import numpy as np
import pytest

from tests.utils import make_tiny_llama_dir
from vllm_quick_tpu.entrypoints.llm import LLM
from vllm_quick_tpu.sampling_params import SamplingParams


@pytest.fixture(scope="module")
def model_dir():
    return make_tiny_llama_dir()


@pytest.mark.parametrize("pp,tp", [(2, 1), (2, 2)])
def test_pp_engine_matches_plain_greedy(model_dir, pp, tp):
    rng = np.random.default_rng(0)
    # Lengths straddling block (16) and microbatch boundaries.
    prompts = [rng.integers(3, 500, size=n).tolist()
               for n in (70, 16, 33)]
    params = SamplingParams(max_tokens=12, temperature=0.0,
                            ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=256, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=params, use_tqdm=False)
    ref_tokens = [o.outputs[0].token_ids for o in ref]
    del plain

    pp_llm = LLM(model=model_dir, max_model_len=256, block_size=16,
                 dtype="float32", pipeline_parallel_size=pp,
                 tensor_parallel_size=tp)
    out = pp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=params, use_tqdm=False)
    out_tokens = [o.outputs[0].token_ids for o in out]

    assert out_tokens == ref_tokens


def test_pp_engine_swap_preemption_roundtrip(model_dir):
    """Multi-sequence groups under a starved pool are preempted by
    SWAP; under pp the swap gathers/inserts run on the stacked
    [pp, NB, ...] pools and the host mirror. Generations must complete
    and match the plain engine exactly (seeded sampling is a pure
    function of the logits, which pp reproduces bit-for-bit up to
    epsilon)."""

    def run(**extra):
        llm = LLM(model=model_dir, dtype="float32", enforce_eager=True,
                  num_tpu_blocks_override=20, max_model_len=128,
                  max_num_batched_tokens=512, disable_log_stats=True,
                  **extra)
        engine = llm.llm_engine
        ce = engine.worker.cache_engine
        swaps = {"out": 0, "in": 0}
        orig_out, orig_in = ce.swap_out, ce.swap_in
        ce.swap_out = lambda m: (swaps.__setitem__("out", swaps["out"] + 1),
                                 orig_out(m))[1]
        ce.swap_in = lambda m: (swaps.__setitem__("in", swaps["in"] + 1),
                                orig_in(m))[1]
        params = SamplingParams(n=2, best_of=2, temperature=0.7, seed=0,
                                max_tokens=45, ignore_eos=True)
        outputs = llm.generate(["a b c"] * 4, params, use_tqdm=False)
        toks = [sorted(tuple(s.token_ids) for s in o.outputs)
                for o in outputs]
        return toks, swaps

    ref, ref_swaps = run()
    got, pp_swaps = run(pipeline_parallel_size=2)
    assert ref_swaps["out"] > 0 and pp_swaps["out"] > 0
    assert ref_swaps["in"] > 0 and pp_swaps["in"] > 0
    for o in got:
        for seq in o:
            assert len(seq) == 45
    assert got == ref


def test_pp_engine_beam_search_matches_plain(model_dir):
    """Beam search forks candidates post-prefill and triggers
    copy-on-write on the shared tail block — under pp the COW copy
    runs on the stacked [pp, NB, ...] pool (axis-1 dus). Outputs must
    match the plain engine exactly."""
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 500, size=40).tolist()]
    params = SamplingParams(max_tokens=8, temperature=0.0,
                            use_beam_search=True, best_of=2,
                            ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=256, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=params, use_tqdm=False)
    ref_tokens = sorted(tuple(o.token_ids) for o in ref[0].outputs)
    del plain

    pp_llm = LLM(model=model_dir, max_model_len=256, block_size=16,
                 dtype="float32", pipeline_parallel_size=2)
    out = pp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=params, use_tqdm=False)
    out_tokens = sorted(tuple(o.token_ids) for o in out[0].outputs)

    assert out_tokens == ref_tokens


def test_pp_engine_chunked_prefill_matches_plain(model_dir):
    """Chunked prefill composes with pp: chunk steps ride the pp
    prefill program's prefix path (block_tables/context_lens are
    microbatch-sliced like any other metadata). Long prompts beyond
    the per-step budget must match the plain engine exactly."""
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 500, size=n).tolist()
               for n in (50, 23, 70)]     # 50/70 exceed the 32 budget
    params = SamplingParams(max_tokens=8, temperature=0.0,
                            ignore_eos=True)

    plain = LLM(model=model_dir, max_model_len=128, block_size=16,
                dtype="float32")
    ref = plain.generate(prompt_token_ids=prompts,
                         sampling_params=params, use_tqdm=False)
    ref_tokens = [o.outputs[0].token_ids for o in ref]
    del plain

    pp_llm = LLM(model=model_dir, max_model_len=128, block_size=16,
                 dtype="float32", pipeline_parallel_size=2,
                 max_num_batched_tokens=32, max_num_seqs=8,
                 enable_chunked_prefill=True)
    out = pp_llm.generate(prompt_token_ids=prompts,
                          sampling_params=params, use_tqdm=False)
    out_tokens = [o.outputs[0].token_ids for o in out]

    assert out_tokens == ref_tokens


def test_pp_engine_prefix_caching_matches_plain(model_dir):
    """Prefix caching under pp: the cached-prefix prompt rides the
    same prefix-attention path chunked prefill proved out. Cached runs
    must match the uncached baseline exactly."""
    pp_llm = LLM(model=model_dir, dtype="float32", max_model_len=256,
                 disable_log_stats=True, pipeline_parallel_size=2)
    rng = np.random.default_rng(3)
    prefix = rng.integers(3, 500, size=37).tolist()
    prompts = [prefix + rng.integers(3, 500, size=9).tolist()
               for _ in range(2)]
    params = SamplingParams(temperature=0.0, max_tokens=8,
                            ignore_eos=True)

    baseline = pp_llm.generate(prompt_token_ids=prompts,
                               sampling_params=params, use_tqdm=False)
    # First prefixed run computes + marks the prefix; the second hits
    # the cached path.
    _ = pp_llm.generate(prompt_token_ids=prompts,
                        sampling_params=params,
                        prefix_pos=[len(prefix)] * 2, use_tqdm=False)
    cached = pp_llm.generate(prompt_token_ids=prompts,
                             sampling_params=params,
                             prefix_pos=[len(prefix)] * 2,
                             use_tqdm=False)
    for b, c in zip(baseline, cached):
        assert b.outputs[0].token_ids == c.outputs[0].token_ids


def test_pp_engine_prompt_logprobs_match_plain(model_dir):
    """Echo (prompt_logprobs) under pp: the last stage emits full
    hidden states and the echo logprob pass runs after the pp psum.
    Entries must match the plain engine's to numerical epsilon."""
    import pytest as _pytest

    def run(**extra):
        llm = LLM(model=model_dir, dtype="float32", max_model_len=128,
                  disable_log_stats=True, **extra)
        out = llm.generate(
            prompt_token_ids=[[5, 17, 101, 32, 250, 7, 88]],
            sampling_params=SamplingParams(temperature=0.0,
                                           max_tokens=1,
                                           prompt_logprobs=2),
            use_tqdm=False)[0]
        return out.prompt_logprobs

    ref = run()
    got = run(pipeline_parallel_size=2)
    assert got is not None and len(got) == len(ref)
    assert got[0] is None and ref[0] is None
    for r, g in zip(ref[1:], got[1:]):
        assert set(g) == set(r)
        for tok in r:
            assert g[tok] == _pytest.approx(r[tok], abs=2e-3)


def test_pp_engine_lora_matches_plain(model_dir):
    """Multi-LoRA under pp: adapter A/B stacks ride the stage-stacked
    params (re-synced by the runner whenever the manager writes a
    slot), and per-token adapter indices are microbatch-sliced like
    any other metadata. Adapter and base outputs must match the plain
    LoRA engine exactly, including after an adapter switch (slot
    rewrite -> stack re-sync)."""
    from tests.lora.test_lora import _make_adapter
    from vllm_quick_tpu.lora.request import LoRARequest

    base_dir = make_tiny_llama_dir(key="pp_lora_base")
    ad1, _ = _make_adapter(base_dir, seed=21)
    ad2, _ = _make_adapter(base_dir, seed=22)
    prompts = ["the quick brown fox", "hello world says"]
    params = SamplingParams(temperature=0.0, max_tokens=6)

    def run(**extra):
        llm = LLM(model=base_dir, dtype="float32", max_model_len=256,
                  enable_lora=True, max_loras=2, max_lora_rank=8,
                  disable_log_stats=True, **extra)
        outs = []
        for req in (LoRARequest("a1", 1, ad1), None,
                    LoRARequest("a2", 2, ad2),
                    LoRARequest("a1", 1, ad1)):
            outs.append([o.outputs[0].token_ids
                         for o in llm.generate(prompts, params,
                                               lora_request=req,
                                               use_tqdm=False)])
        return outs

    ref = run()
    got = run(pipeline_parallel_size=2)
    assert got == ref
    # Sanity: the adapter actually changes the output.
    assert ref[0] != ref[1]


def test_pp_engine_spec_decode_matches_plain(model_dir):
    """Speculative decoding under pp: the draft model runs its own pp
    schedule, the target scores drafts with the pp score variant
    (all-position logits, flat per-token slots), and rejection
    sampling guarantees target-exact output — so greedy spec+pp must
    match the plain engine token for token."""
    draft_dir = make_tiny_llama_dir(seed=123, key="pp_spec_draft")
    prompts = ["the quick brown fox jumps", "hello world and good"]
    params = SamplingParams(temperature=0.0, max_tokens=12,
                            ignore_eos=True)

    def run(**extra):
        llm = LLM(model=model_dir, dtype="float32", enforce_eager=True,
                  num_tpu_blocks_override=256, max_model_len=128,
                  max_num_batched_tokens=512, disable_log_stats=True,
                  **extra)
        outs = llm.generate(prompts, params, use_tqdm=False)
        toks = [o.outputs[0].token_ids for o in outs]
        worker = llm.llm_engine.worker
        return toks, worker

    ref, _ = run()
    got, worker = run(pipeline_parallel_size=2,
                      speculative_model=draft_dir,
                      num_speculative_tokens=3)
    assert got == ref
    assert worker.spec_steps > 0
