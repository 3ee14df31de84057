"""Minimal gradio front-end over the plain REST server
(reference capability: examples/gradio_webserver.py).

    python -m vllm_quick_tpu.entrypoints.api_server --model <dir> &
    python examples/gradio_webserver.py
"""
import argparse
import json

import requests

try:
    import gradio as gr
except ImportError as e:  # gradio is an optional extra
    raise SystemExit(
        "gradio is not installed; `pip install gradio` to run this "
        "example") from e


def build_demo(api_url: str):
    def generate(prompt, max_tokens, temperature):
        response = requests.post(
            api_url,
            json={
                "prompt": prompt,
                "max_tokens": int(max_tokens),
                "temperature": float(temperature),
                "stream": True,
            },
            stream=True)
        for chunk in response.iter_lines(chunk_size=8192,
                                         delimiter=b"\0"):
            if chunk:
                yield json.loads(chunk.decode())["text"][0]

    with gr.Blocks() as demo:
        gr.Markdown("## vllm-quick-tpu playground")
        prompt = gr.Textbox(label="Prompt", lines=4)
        with gr.Row():
            max_tokens = gr.Slider(1, 1024, value=128, step=1,
                                   label="max_tokens")
            temperature = gr.Slider(0.0, 2.0, value=0.7, step=0.05,
                                    label="temperature")
        output = gr.Textbox(label="Output", lines=8)
        gr.Button("Generate").click(
            generate, [prompt, max_tokens, temperature], output)
    return demo


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8001)
    parser.add_argument("--api-url", type=str,
                        default="http://localhost:8000/generate")
    args = parser.parse_args()
    build_demo(args.api_url).queue().launch(server_name=args.host,
                                            server_port=args.port)


if __name__ == "__main__":
    main()
