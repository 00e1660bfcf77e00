"""Linear-application dispatch: dense | int8-quantized | LoRA-augmented.

Covers the reference's three weight regimes in one leaf type: dense merged
weights, bitsandbytes-style int8 (reference modeling_visualcla.py:155), and
PEFT LoRA adapters (reference scripts/inference/inference.py:66-74).

A "weight" leaf in a param tree can be:
- a plain array W (in, out) — dense matmul;
- {"q", "scale"} — int8 weight-only quantization (ops/quantization.py);
- {"w", "lora_A", "lora_B", "lora_scale"} — LoRA adapter over a frozen base
  (itself dense or quantized): x @ W + (x @ A) @ B * scale.  The low-rank path
  stays separate so only A/B receive gradients (QLoRA when the base is int8).
"""
from __future__ import annotations

import jax.numpy as jnp

from .quantization import is_quantized, q_matmul


def is_lora(w) -> bool:
    return isinstance(w, dict) and "lora_A" in w


def linear(x: jnp.ndarray, w) -> jnp.ndarray:
    """x @ W for any supported weight representation."""
    if is_lora(w):
        base = q_matmul(x, w["w"])
        down = x @ w["lora_A"].astype(x.dtype)  # (..., r)
        up = down @ w["lora_B"].astype(x.dtype)  # (..., out)
        return base + up * jnp.asarray(w["lora_scale"], x.dtype)
    return q_matmul(x, w)
