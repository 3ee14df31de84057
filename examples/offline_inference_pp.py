"""Pipeline-parallel offline inference (--pipeline-parallel-size).

Layers split into stages over the pp mesh axis; one jitted GPipe
microbatch schedule drives all stages (docs/distributed.md "Pipeline
parallelism"). The reference rejects pp > 1 at config time
(config.py:388-390). Runs on any mesh — real TPU chips or the virtual
CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/offline_inference_pp.py

Usage:
    python examples/offline_inference_pp.py [--model <hf-dir>] \
        [--pp 2] [--tp 1] [--max-tokens 16]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.insert(0, "/root/.axon_site")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--pp", type=int, default=2)
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--max-tokens", type=int, default=16)
    args = parser.parse_args()

    model = args.model
    if model is None:
        from tests.utils import make_tiny_llama_dir
        model = make_tiny_llama_dir()

    from vllm_quick_tpu import LLM, SamplingParams

    prompts = [
        "Hello, my name is",
        "The president of the United States is",
        "The capital of France is",
        "The future of AI is",
    ]
    sampling_params = SamplingParams(temperature=0.0,
                                     max_tokens=args.max_tokens)
    llm = LLM(model=model, pipeline_parallel_size=args.pp,
              tensor_parallel_size=args.tp)
    outputs = llm.generate(prompts, sampling_params)
    for output in outputs:
        print(f"Prompt: {output.prompt!r}, "
              f"Generated: {output.outputs[0].text!r}")


if __name__ == "__main__":
    main()
