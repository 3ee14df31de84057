# Serving image for vllm-quick-tpu (TPU VM hosts).
#
# Build:  docker build -t vllm-quick-tpu .
# Run  :  docker run --privileged --net=host \
#             -v /path/to/model:/model vllm-quick-tpu \
#             --model /model --port 8000
#
# --privileged + host networking are the standard requirements for
# libtpu device access on Cloud TPU VMs.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /workspace

# TPU-enabled jax first (its release cadence dominates rebuild cost).
RUN pip install --no-cache-dir "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html

COPY pyproject.toml ./
COPY vllm_quick_tpu ./vllm_quick_tpu
COPY csrc ./csrc
RUN pip install --no-cache-dir -e .

EXPOSE 8000
ENTRYPOINT ["python", "-m", "vllm_quick_tpu.entrypoints.openai.api_server", \
            "--host", "0.0.0.0"]
