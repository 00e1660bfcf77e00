"""Normalization ops (XLA path; Pallas fused variants live in ops/pallas/).

Numerics match the reference stack exactly:
- RMSNorm: HF LlamaRMSNorm — accumulate in fp32, scale in input dtype.
- LayerNorm: torch.nn.LayerNorm semantics (fp32 stats, biased variance).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _acc_dtype(dtype):
    """Accumulation dtype: at least fp32; stays f64 under x64 (exact-parity tests)."""
    return jnp.promote_types(dtype, jnp.float32)


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """LLaMA RMSNorm.  x: (..., H), weight: (H,).

    HF's LlamaRMSNorm hard-codes ``.to(torch.float32)`` for the statistics at any
    model precision, so fp32 here reproduces it bit-for-bit.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    # HF casts the normalized activations back to the input dtype *before*
    # multiplying by the (possibly higher-precision) weight.
    return (weight * xf.astype(dtype)).astype(dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """torch.nn.LayerNorm over the last axis.

    torch computes LayerNorm in the input dtype; we promote to at least fp32
    (identical for f32/f64 inputs, strictly better for bf16 runtime).
    """
    dtype = x.dtype
    xf = x.astype(_acc_dtype(dtype))
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(xf.dtype) + bias.astype(xf.dtype)
    return y.astype(dtype)
