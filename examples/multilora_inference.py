"""Multi-LoRA serving demo (reference:
examples/multilora_inference.py): several adapters multiplexed over one
base model in a single continuous batch."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

from vllm_quick_tpu import LLM, SamplingParams
from vllm_quick_tpu.lora.request import LoRARequest


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--lora-path", type=str, action="append",
                        default=[], help="adapter dir (repeatable)")
    args = parser.parse_args()

    model = args.model
    lora_paths = args.lora_path
    if model is None:
        # Demo mode: fabricate a tiny base model + two adapters.
        from tests.utils import make_tiny_llama_dir
        from tests.lora.test_lora import _make_adapter
        model = make_tiny_llama_dir(key="multilora_demo")
        ad1, _ = _make_adapter(model, seed=1)
        ad2, _ = _make_adapter(model, seed=2)
        lora_paths = [ad1, ad2]

    llm = LLM(model=model, enable_lora=True, max_loras=2,
              max_lora_rank=8)
    params = SamplingParams(temperature=0.0, max_tokens=12)

    prompts = ["Tell me about machine learning.",
               "Write a haiku about autumn."]
    print("== base model ==")
    for out in llm.generate(prompts, params):
        print(repr(out.outputs[0].text))
    for i, path in enumerate(lora_paths, start=1):
        req = LoRARequest(f"adapter-{i}", i, path)
        print(f"== adapter {i} ({path}) ==")
        for out in llm.generate(prompts, params, lora_request=req):
            print(repr(out.outputs[0].text))


if __name__ == "__main__":
    main()
