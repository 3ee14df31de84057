"""Prefix-caching demo (reference:
examples/offline_inference_with_prefix.py): a long shared system prompt
is computed once and its KV blocks are reused by every request."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from vllm_quick_tpu import LLM, SamplingParams

prefix = (
    "You are an expert school principal, skilled in effectively managing "
    "faculty and staff. Draft 10-15 questions for a potential first grade "
    "Head Teacher for my K-12, all-girls', independent school that "
    "emphasizes community, joyful discovery, and life-long learning. The "
    "candidate is coming in for a first-round panel interview for a 8th "
    "grade Math teaching role. They have 5 years of previous teaching "
    "experience as an assistant teacher at a co-ed, public school with "
    "experience in middle school math teaching. ")

prompts = [
    prefix + "Based on these information, fulfill the following "
    "paragraph: Hello, my name is",
    prefix + "The president of the United States is",
]


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    args = parser.parse_args()
    model = args.model
    if model is None:
        from tests.utils import make_tiny_llama_dir
        model = make_tiny_llama_dir()

    llm = LLM(model=model)
    sampling_params = SamplingParams(temperature=0.0, max_tokens=16)
    prefix_pos = len(llm.get_tokenizer()(prefix).input_ids)

    # First run computes + caches the prefix KV blocks.
    outputs = llm.generate(prompts, sampling_params,
                           prefix_pos=[prefix_pos] * len(prompts))
    # Second run reuses them (prefill cost drops to the suffix only).
    outputs = llm.generate(prompts, sampling_params,
                           prefix_pos=[prefix_pos] * len(prompts))
    for output in outputs:
        print(f"Generated: {output.outputs[0].text!r}")


if __name__ == "__main__":
    main()
