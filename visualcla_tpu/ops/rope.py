"""Rotary position embeddings, HF-Llama convention (split-half rotate).

(The reference delegates RoPE to HF LlamaForCausalLM — used at
modeling_visualcla.py:151-156; this module is the numerics-defining
replacement.)

cos/sin are computed in fp32 and cast to the activation dtype before the
elementwise multiply, matching HF ``LlamaRotaryEmbedding`` +
``apply_rotary_pos_emb`` so greedy decode stays token-identical.
"""
from __future__ import annotations

import jax.numpy as jnp


def rope_table(positions: jnp.ndarray, head_dim: int, theta: float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin tables for given positions.

    positions: (..., S) int array. Returns cos,sin of shape (..., S, head_dim), fp32.
    """
    # fp32 always — HF's LlamaRotaryEmbedding upcasts to .float() explicitly even
    # for double models, so fp32 tables reproduce it bit-for-bit at any precision.
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # (hd/2,)
    freqs = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., S, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # (..., S, hd)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding.

    q: (B, S, n_heads, hd), k: (B, S, n_kv_heads, hd), cos/sin: (B, S, hd) or (S, hd).
    """
    cos = cos.astype(q.dtype)[..., None, :]  # (..., S, 1, hd)
    sin = sin.astype(q.dtype)[..., None, :]
    q_out = q * cos + _rotate_half(q) * sin
    k_out = k * cos.astype(k.dtype) + _rotate_half(k) * sin.astype(k.dtype)
    return q_out, k_out
