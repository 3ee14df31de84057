"""Completions against the OpenAI-compatible server
(reference capability: examples/openai_completion_client.py).

Start the server:

    python -m vllm_quick_tpu.entrypoints.openai.api_server --model <dir>
"""
from openai import OpenAI

client = OpenAI(
    api_key="EMPTY",                       # or your VLLM_API_KEY
    base_url="http://localhost:8000/v1",
)

model = client.models.list().data[0].id
print(f"Serving model: {model}")

# Plain completion.
completion = client.completions.create(
    model=model,
    prompt="The three primary colors are",
    max_tokens=48,
    temperature=0.0,
)
print("Completion:", completion.choices[0].text)

# Echo + logprobs (exercises prompt logprobs).
completion = client.completions.create(
    model=model,
    prompt="Silicon is a",
    max_tokens=8,
    echo=True,
    logprobs=2,
)
print("Echoed with logprobs:", completion.choices[0].text)

# Streaming.
print("Streaming: ", end="", flush=True)
for chunk in client.completions.create(
        model=model,
        prompt="Count to five:",
        max_tokens=24,
        stream=True):
    print(chunk.choices[0].text, end="", flush=True)
print()
