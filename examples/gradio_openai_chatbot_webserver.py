"""Gradio chat UI backed by the OpenAI-compatible server.

Launch the server first:
    python -m vllm_quick_tpu.entrypoints.openai.api_server \
        --model <model> --chat-template examples/template_chatml.jinja
then:
    python examples/gradio_openai_chatbot_webserver.py -m <model>

(Reference parity: examples/gradio_openai_chatbot_webserver.py.)
"""
import argparse


def build_predictor(args):
    from openai import OpenAI

    client = OpenAI(api_key=args.api_key, base_url=args.model_url)
    stop_ids = [int(t) for t in args.stop_token_ids.split(",") if t]

    def predict(message, history):
        msgs = [{"role": "system", "content": args.system_prompt}]
        for user, bot in history:
            msgs.append({"role": "user", "content": user})
            msgs.append({"role": "assistant", "content": bot})
        msgs.append({"role": "user", "content": message})
        stream = client.chat.completions.create(
            model=args.model,
            messages=msgs,
            temperature=args.temp,
            stream=True,
            extra_body={
                "repetition_penalty": 1.0,
                "stop_token_ids": stop_ids or None,
            })
        text = ""
        for chunk in stream:
            delta = chunk.choices[0].delta.content or ""
            text += delta
            yield text

    return predict


def main():
    parser = argparse.ArgumentParser(
        description="Gradio chatbot over the OpenAI-compatible server")
    parser.add_argument("--model-url", default="http://localhost:8000/v1")
    parser.add_argument("-m", "--model", required=True)
    parser.add_argument("--temp", type=float, default=0.8)
    parser.add_argument("--api-key", default="EMPTY")
    parser.add_argument("--stop-token-ids", default="")
    parser.add_argument("--system-prompt",
                        default="You are a helpful assistant.")
    parser.add_argument("--host", default=None)
    parser.add_argument("--port", type=int, default=8001)
    args = parser.parse_args()

    import gradio as gr
    gr.ChatInterface(build_predictor(args)).queue().launch(
        server_name=args.host, server_port=args.port, share=True)


if __name__ == "__main__":
    main()
