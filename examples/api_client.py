"""Client for the plain REST server (entrypoints/api_server.py).

Reference capability: examples/api_client.py. Start the server with

    python -m vllm_quick_tpu.entrypoints.api_server --model <dir>

then run, e.g.:

    python examples/api_client.py --prompt "The capital of France is" \
        --n 2 --stream
"""
import argparse
import json

import requests


def post_request(host: str, port: int, prompt: str, n: int,
                 max_tokens: int, stream: bool):
    return requests.post(
        f"http://{host}:{port}/generate",
        json={
            "prompt": prompt,
            "n": n,
            "max_tokens": max_tokens,
            "temperature": 0.0,
            "stream": stream,
        },
        stream=stream,
    )


def consume_stream(response):
    """The server streams whole-so-far text snapshots, one JSON object
    per chunk delimited by NUL bytes."""
    for chunk in response.iter_lines(chunk_size=8192, delimiter=b"\0"):
        if chunk:
            yield json.loads(chunk.decode())["text"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="localhost")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--prompt", type=str,
                        default="The capital of France is")
    parser.add_argument("--n", type=int, default=1)
    parser.add_argument("--max-tokens", type=int, default=64)
    parser.add_argument("--stream", action="store_true")
    args = parser.parse_args()

    print(f"Prompt: {args.prompt!r}")
    response = post_request(args.host, args.port, args.prompt, args.n,
                            args.max_tokens, args.stream)
    if args.stream:
        printed = [0] * args.n
        for texts in consume_stream(response):
            for i, text in enumerate(texts):
                print(text[printed[i]:], end="", flush=True)
                printed[i] = len(text)
        print()
    else:
        for i, text in enumerate(response.json()["text"]):
            print(f"Candidate {i}: {text!r}")


if __name__ == "__main__":
    main()
