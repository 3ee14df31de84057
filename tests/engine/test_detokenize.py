"""Incremental detokenization (reference: tests/engine/test_detokenize.py):
token-by-token decoding must reproduce the full decode exactly,
including multi-byte characters that straddle token boundaries."""
import pytest

from tests.utils import make_tiny_llama_dir, make_tiny_tokenizer
from vllm_quick_tpu.transformers_utils.tokenizer import (
    detokenize_incrementally)

TEXTS = [
    "Hello there, how are you?",
    "unicode snowman ☃ and accents café naïve",
    "mixed  spaces\tand\nnewlines",
    "emoji \U0001F600\U0001F680 end",
]


@pytest.fixture(scope="module")
def tokenizer():
    import tempfile
    d = tempfile.mkdtemp(prefix="detok_")
    return make_tiny_tokenizer(d)


@pytest.mark.parametrize("text", TEXTS)
@pytest.mark.parametrize("skip_special_tokens", [True, False])
def test_incremental_matches_full(tokenizer, text, skip_special_tokens):
    all_ids = tokenizer(text).input_ids
    full = tokenizer.decode(all_ids,
                            skip_special_tokens=skip_special_tokens)

    prev_tokens = None
    prefix_offset = 0
    read_offset = 0
    out = ""
    for i in range(1, len(all_ids) + 1):
        new_tokens, new_text, prefix_offset, read_offset = \
            detokenize_incrementally(
                tokenizer, all_ids[:i], prev_tokens, prefix_offset,
                read_offset, skip_special_tokens=skip_special_tokens)
        if prev_tokens is None:
            prev_tokens = new_tokens
        else:
            prev_tokens.extend(new_tokens)
        out += new_text
    assert out == full
