"""Direct LLMEngine usage (reference: examples/llm_engine_example.py):
drive the engine step loop by hand with per-request sampling params."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from vllm_quick_tpu.engine.arg_utils import EngineArgs
from vllm_quick_tpu.engine.llm_engine import LLMEngine
from vllm_quick_tpu.sampling_params import SamplingParams


def main(args):
    engine_args = EngineArgs.from_cli_args(args)
    if engine_args.model == "__tiny__":
        from tests.utils import make_tiny_llama_dir
        engine_args.model = make_tiny_llama_dir()
        engine_args.tokenizer = engine_args.model
    engine = LLMEngine.from_engine_args(engine_args)

    test_prompts = [
        ("A robot may not injure a human being",
         SamplingParams(temperature=0.0, logprobs=1,
                        prompt_logprobs=None, max_tokens=16)),
        ("To be or not to be,",
         SamplingParams(temperature=0.8, top_k=5, presence_penalty=0.2,
                        max_tokens=16)),
        ("What is the meaning of life?",
         SamplingParams(n=2, best_of=5, temperature=0.8, top_p=0.95,
                        max_tokens=16)),
        ("It is only with the heart that one can see rightly",
         SamplingParams(n=3, best_of=3, use_beam_search=True,
                        temperature=0.0, max_tokens=16)),
    ]

    request_id = 0
    while test_prompts or engine.has_unfinished_requests():
        if test_prompts:
            prompt, sampling_params = test_prompts.pop(0)
            engine.add_request(str(request_id), prompt, sampling_params)
            request_id += 1
        for request_output in engine.step():
            if request_output.finished:
                print(request_output)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser = EngineArgs.add_cli_args(parser)
    parser.set_defaults(model="__tiny__")
    main(parser.parse_args())
