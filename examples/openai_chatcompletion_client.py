"""Chat completions against the OpenAI-compatible server
(reference capability: examples/openai_chatcompletion_client.py).
"""
from openai import OpenAI

client = OpenAI(
    api_key="EMPTY",
    base_url="http://localhost:8000/v1",
)

model = client.models.list().data[0].id
print(f"Serving model: {model}")

chat = client.chat.completions.create(
    model=model,
    messages=[
        {"role": "system", "content": "You are a terse assistant."},
        {"role": "user", "content": "Name two TPU-friendly dtypes."},
    ],
    max_tokens=64,
    temperature=0.0,
)
print("Assistant:", chat.choices[0].message.content)

print("Streaming: ", end="", flush=True)
for chunk in client.chat.completions.create(
        model=model,
        messages=[{"role": "user", "content": "Say hi in 3 words."}],
        max_tokens=16,
        stream=True):
    delta = chunk.choices[0].delta.content
    if delta:
        print(delta, end="", flush=True)
print()
