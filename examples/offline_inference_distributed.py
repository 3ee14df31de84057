"""Distributed offline batch inference.

TPU-native counterpart of the reference's Ray-Data example
(examples/offline_inference_distributed.py): instead of a Ray actor
pool, each host in a multi-host TPU slice runs this same script under
`jax.distributed` — process 0 drives the engine (the follower hosts
execute the broadcast step payloads, parallel/multihost.py), and the
prompt file is processed as one continuous batch on the whole slice.

Single-host multi-chip works the same way with ``--tp`` alone.

Run on every host of the slice (e.g. with `gcloud compute tpus
tpu-vm ssh --worker=all`):
    python examples/offline_inference_distributed.py \
        --model <model> --tp 4 --prompts prompts.txt \
        --coordinator <host0-ip>:8476 --num-hosts 2 --host-id $WORKER_ID
"""
import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--prompts", default=None,
                        help="text file, one prompt per line")
    parser.add_argument("--tp", type=int, default=1)
    parser.add_argument("--coordinator", default=None,
                        help="host0 address for jax.distributed")
    parser.add_argument("--num-hosts", type=int, default=1)
    parser.add_argument("--host-id", type=int, default=0)
    parser.add_argument("--max-tokens", type=int, default=128)
    parser.add_argument("--temperature", type=float, default=0.8)
    parser.add_argument("--top-p", type=float, default=0.95)
    args = parser.parse_args()

    if args.num_hosts > 1:
        from vllm_quick_tpu.parallel.multihost import initialize_multihost
        initialize_multihost(coordinator_address=args.coordinator,
                             num_processes=args.num_hosts,
                             process_id=args.host_id)

    from vllm_quick_tpu.entrypoints.llm import LLM
    from vllm_quick_tpu.sampling_params import SamplingParams

    if args.prompts:
        with open(args.prompts) as f:
            prompts = [ln.strip() for ln in f if ln.strip()]
    else:
        prompts = [
            "Hello, my name is",
            "The president of the United States is",
            "The capital of France is",
            "The future of AI is",
        ]

    sampling = SamplingParams(temperature=args.temperature,
                              top_p=args.top_p,
                              max_tokens=args.max_tokens)
    llm = LLM(model=args.model, tensor_parallel_size=args.tp)
    # Follower hosts never return from engine construction: they sit in
    # the step-payload loop until the driver shuts down.
    outputs = llm.generate(prompts, sampling)
    for out in outputs:
        print(f"Prompt: {out.prompt!r}")
        print(f"Generated: {out.outputs[0].text!r}")
        print("-" * 60)


if __name__ == "__main__":
    main()
