"""Activations (reference: vllm/model_executor/layers/activation.py:17-67
and csrc/activation_kernels.cu — XLA fuses these on TPU)."""
import math

import jax
import jax.numpy as jnp


def silu_and_mul(x: jax.Array) -> jax.Array:
    """SwiGLU gate: x = [gate | up] on the last dim."""
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * up


def gelu_and_mul(x: jax.Array) -> jax.Array:
    gate, up = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(gate.astype(jnp.float32), approximate=False).astype(
        x.dtype) * up


def gelu_new(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    c = math.sqrt(2.0 / math.pi)
    return (0.5 * xf * (1.0 + jnp.tanh(c * (xf + 0.044715 * xf**3)))
            ).astype(x.dtype)


def gelu_fast(x: jax.Array) -> jax.Array:
    xf = x.astype(jnp.float32)
    return (0.5 * xf * (1.0 + jnp.tanh(0.7978845608 * xf *
                                       (1.0 + 0.044715 * xf * xf)))
            ).astype(x.dtype)


_ACTIVATIONS = {
    "silu": lambda x: jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype),
    "gelu": lambda x: jax.nn.gelu(x.astype(jnp.float32),
                                  approximate=False).astype(x.dtype),
    "gelu_new": gelu_new,
    "gelu_fast": gelu_fast,
    "gelu_pytorch_tanh": gelu_new,
    "relu": jax.nn.relu,
}


def get_act_fn(name: str):
    name = name.lower()
    if name not in _ACTIVATIONS:
        raise ValueError(f"Activation {name!r} is not supported.")
    return _ACTIVATIONS[name]
