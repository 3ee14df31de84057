"""Offline batched inference (reference: examples/offline_inference.py).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python examples/offline_inference.py \
        [--model <hf-dir>] [--tiny] [--max-tokens 16]

--tiny builds a random-weight local checkpoint (no network) — the smoke
drive for engine changes.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--tiny", action="store_true",
                        help="use a locally generated tiny llama")
    parser.add_argument("--max-tokens", type=int, default=16)
    parser.add_argument("--temperature", type=float, default=0.0)
    parser.add_argument("--tp", type=int, default=1)
    args = parser.parse_args()

    model = args.model
    if model is None or args.tiny:
        from tests.utils import make_tiny_llama_dir
        model = make_tiny_llama_dir()

    from vllm_quick_tpu import LLM, SamplingParams

    prompts = [
        "Hello, my name is",
        "The president of the United States is",
        "The capital of France is",
        "The future of AI is",
    ]
    sampling_params = SamplingParams(temperature=args.temperature,
                                     top_p=0.95,
                                     max_tokens=args.max_tokens)

    llm = LLM(model=model, tensor_parallel_size=args.tp)
    outputs = llm.generate(prompts, sampling_params)
    for output in outputs:
        print(f"Prompt: {output.prompt!r}, "
              f"Generated: {output.outputs[0].text!r}")


if __name__ == "__main__":
    main()
