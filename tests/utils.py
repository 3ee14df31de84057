"""Shared test helpers: tiny local models + tokenizers (no network)."""
import os
import tempfile

_TINY_DIR_CACHE = {}


def make_tiny_tokenizer(save_dir: str):
    """Byte-level tokenizer (vocab 259) wrapped as a fast HF tokenizer."""
    from tokenizers import Tokenizer
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from transformers import PreTrainedTokenizerFast

    alphabet = sorted(ByteLevel.alphabet())
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for i, ch in enumerate(alphabet):
        vocab[ch] = i + 3
    tok = Tokenizer(BPE(vocab=vocab, merges=[], unk_token="<unk>"))
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False)
    tok.decoder = ByteLevelDecoder()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
        pad_token="</s>",
        model_max_length=2048,
    )
    fast.save_pretrained(save_dir)
    return fast


def make_tiny_llama_dir(
    vocab_size: int = 512,
    hidden_size: int = 128,
    num_layers: int = 2,
    num_heads: int = 4,
    num_kv_heads: int = 2,
    intermediate_size: int = 256,
    max_position: int = 512,
    seed: int = 0,
    key: str = "default",
) -> str:
    """Tiny random-weight Llama checkpoint + tokenizer on local disk."""
    if key in _TINY_DIR_CACHE:
        return _TINY_DIR_CACHE[key]
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        intermediate_size=intermediate_size,
        num_hidden_layers=num_layers,
        num_attention_heads=num_heads,
        num_key_value_heads=num_kv_heads,
        max_position_embeddings=max_position,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(seed)
    model = LlamaForCausalLM(cfg).to(torch.float32).eval()
    d = tempfile.mkdtemp(prefix=f"tiny_llama_{key}_")
    model.save_pretrained(d, safe_serialization=True)
    make_tiny_tokenizer(d)
    _TINY_DIR_CACHE[key] = d
    return d
