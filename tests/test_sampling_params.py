"""SamplingParams validation (reference: tests/test_sampling_params.py
+ the _verify_args grid)."""
import pytest

from vllm_quick_tpu.sampling_params import SamplingParams


def test_defaults():
    p = SamplingParams()
    assert p.n == 1 and p.best_of == 1
    assert p.temperature == 1.0 and p.top_p == 1.0 and p.top_k == -1


def test_greedy_normalizes_knobs():
    p = SamplingParams(temperature=0.0, top_p=0.5, top_k=3, min_p=0.2)
    assert p.top_p == 1.0 and p.top_k == -1 and p.min_p == 0.0


@pytest.mark.parametrize("kwargs", [
    dict(n=0),
    dict(n=2, best_of=1),
    dict(presence_penalty=3.0),
    dict(frequency_penalty=-2.5),
    dict(repetition_penalty=0.0),
    dict(temperature=-0.1),
    dict(top_p=0.0),
    dict(top_k=0),
    dict(min_p=1.5),
    dict(max_tokens=0),
    dict(logprobs=-1),
    dict(use_beam_search=True, best_of=1),
    dict(use_beam_search=True, best_of=2, temperature=0.7),
    dict(use_beam_search=True, best_of=2, top_p=0.5),
    dict(use_beam_search=False, early_stopping=True),
])
def test_invalid_params_raise(kwargs):
    with pytest.raises(ValueError):
        SamplingParams(**kwargs)


def test_stop_normalization():
    assert SamplingParams(stop="x").stop == ["x"]
    assert SamplingParams(stop=["a", "b"]).stop == ["a", "b"]
    assert SamplingParams().stop == []
