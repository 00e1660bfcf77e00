"""Activation functions matching the reference stack's numerics.

- quick_gelu: CLIP's x * sigmoid(1.702 x).
- gelu: exact erf-based GELU (BERT/resampler default, torch F.gelu).
- silu: x * sigmoid(x) (LLaMA MLP).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=False)


def gelu_tanh(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(x)


ACT2FN = {
    "quick_gelu": quick_gelu,
    "gelu": gelu_exact,
    "gelu_new": gelu_tanh,
    "gelu_pytorch_tanh": gelu_tanh,
    "silu": silu,
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}
