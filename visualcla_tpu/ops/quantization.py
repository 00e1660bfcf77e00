"""Weight-only int8 quantization — the TPU replacement for bitsandbytes
``load_in_8bit`` (reference modeling_visualcla.py:138,155; inference.py:24-25).

Symmetric per-output-channel int8: W ≈ q * scale, q int8, scale = absmax/127
per channel.  Weights live in HBM at 1 byte/param (halving the 7B decode's
bandwidth bill vs bf16); the dequant happens in-register as part of the matmul
(XLA fuses the convert+scale into the dot's operand).  Matches the reference's
scope: only the **text tower** quantizes (vision/resampler stay dense).

A quantized weight is a dict {"q": int8 (..., in, out), "scale": f32 (..., 1, out)}
— model code dispatches through ``q_matmul``/``q_embed`` below.
"""
from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np


def quantize_np(w: np.ndarray, axis: int = -2) -> dict:
    """Host-side (numpy) per-channel symmetric int8 — used while streaming a
    checkpoint so the bf16 original never occupies device HBM."""
    wf = np.asarray(w, np.float32)
    absmax = np.max(np.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 127.0
    scale[scale == 0] = 1.0
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {"q": q, "scale": scale.astype(np.float32)}


# text-tower leaves that quantize, keyed by flat path suffix -> contraction axis
INT8_TEXT_LEAVES = {
    "text/layers/q_proj": -2, "text/layers/k_proj": -2, "text/layers/v_proj": -2,
    "text/layers/o_proj": -2, "text/layers/gate_proj": -2,
    "text/layers/up_proj": -2, "text/layers/down_proj": -2,
    "text/embed_tokens": -1, "text/lm_head": -2,
}


def quantize(w, axis: int = -2):
    """Per-channel symmetric int8 along ``axis`` (the contraction dim is
    ``axis``; scales broadcast over it)."""
    w = jnp.asarray(w)
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = absmax / 127.0
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "scale": scale.astype(jnp.float32)}


def quantize_kv(x: jnp.ndarray):
    """Per-token-per-head int8 for KV caches: x (..., Nkv, hd) ->
    (int8 same shape, scales (..., Nkv) f32).  Shared by the paged pool and
    the contiguous engine cache."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.where(absmax == 0, 1.0, absmax / 127.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def dequantize(wq: dict, dtype=jnp.float32):
    return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def q_matmul(x, w: Union[dict, jnp.ndarray]):
    """x @ W with optional int8 W: dequant fused into the dot.

    The scale is per-OUTPUT-channel, so it commutes with the contraction:
    ``x @ (q * scale) == (x @ q) * scale``.  Scaling AFTER the dot keeps the
    dot's RHS the raw int8 array (XLA fuses the int8->bf16 convert into the
    dot's operand read); pre-scaling made XLA materialize a full bf16
    dequantized weight as an HLO temp in decode programs — a 32 MB
    write+read per 4096x4096 matmul per step, measured via a device trace
    of the 7B B=8 paged step (bitcast_multiply_fusion in the HLO)."""
    if not is_quantized(w):
        return x @ w
    y = x @ w["q"].astype(x.dtype)
    return y * w["scale"][..., 0, :].astype(x.dtype)


def q_take(w: Union[dict, jnp.ndarray], ids, axis: int = 0):
    """Row gather (embedding lookup) with optional int8 table quantized
    per-row (scale shape (V, 1))."""
    if not is_quantized(w):
        return jnp.take(w, ids, axis=axis)
    rows = jnp.take(w["q"], ids, axis=axis).astype(jnp.float32)
    scales = jnp.take(w["scale"], ids, axis=axis)
    return rows * scales


def quantize_llama_tree(text_params: dict) -> dict:
    """Quantize the LLaMA tower's matmul weights (norms stay fp)."""
    lyr = text_params["layers"]
    qlayers = dict(lyr)
    for k in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"):
        qlayers[k] = quantize(lyr[k], axis=-2)  # (L, in, out): channel=out
    out = dict(text_params)
    out["layers"] = qlayers
    out["embed_tokens"] = quantize(text_params["embed_tokens"], axis=-1)  # per-row
    out["lm_head"] = quantize(text_params["lm_head"], axis=-2)
    return out


def quantize_tree(params: dict) -> dict:
    """Composite tree: int8 text tower, everything else untouched (the
    reference's load_in_8bit scope)."""
    out = dict(params)
    if "text" in params:
        out["text"] = quantize_llama_tree(params["text"])
    elif "embed_tokens" in params:
        out = quantize_llama_tree(params)
    return out
