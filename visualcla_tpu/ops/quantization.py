"""Weight-only int8/int4 quantization — the TPU replacement for bitsandbytes
``load_in_8bit`` (reference modeling_visualcla.py:138,155; inference.py:24-25),
plus an int4 tier the reference doesn't have (decode is weight-bandwidth-bound
on TPU, so each halving of weight bytes is ~2x single-stream tokens/s).

Symmetric per-output-channel int8: W ≈ q * scale, q int8, scale = absmax/127
per channel.  Weights live in HBM at 1 byte/param (halving the 7B decode's
bandwidth bill vs bf16); the dequant happens in-register as part of the matmul
(XLA fuses the convert+scale into the dot's operand).  Matches the reference's
scope: only the **text tower** quantizes (vision/resampler stay dense).

int4 uses XLA's s4 dtype (bit-packed 2/byte in TPU HBM) with **group-wise**
scales along the contraction dim (default group 128, the GPTQ/AWQ
convention) to keep quantization error acceptable at 4 bits:
W[(g), out] ≈ q[(g), out] * scale[g, out].  The matmul is one dot_general
batched over groups with the scale applied to the per-group partials — the
dot still consumes raw s4 (no dequantized weight temp in HBM; see q_matmul's
post-dot-scale note).

**s4 never crosses a program boundary.**  The axon TPU runtime cannot accept
s4 arrays as jit arguments or transfers (UNIMPLEMENTED at the PJRT layer;
jax's eager fallback recurses — measured on the v5e tunnel, DEVNOTES round 2
seventh window).  int4 weights are therefore STORED as int8 CARRIERS with two
s4 nibbles per byte, packed along the last (output-channel) dim — element 2j
in the low nibble, 2j+1 high, matching ``lax.bitcast_convert_type``'s
little-endian split — and ``unpack_s4`` bitcasts them to s4 INSIDE the
program (bit-identical layout to a native s4 array, so the bitcast+reshape
is free).  HBM traffic stays 0.5 byte/param either way.

A quantized weight is a dict {"q": int8 (..., in, out), "scale": f32 (..., 1, out)}
(per-channel) or {"q": packed int8 (..., G, gs, out/2), "scale": f32 (..., G, out)}
(group-wise s4; detected structurally by ``is_grouped``/``is_packed_grouped``
so the dict survives ``lax.scan`` slicing) — model code dispatches through
``q_matmul``/``q_take``.
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


def pack_s4(q):
    """Pack s4 values (int8 in [-8, 7], last dim even) into an int8 carrier,
    two per byte: element 2j -> low nibble, 2j+1 -> high (the order
    ``lax.bitcast_convert_type(int8, int4)`` unpacks).  Works on numpy and
    jax arrays; the result's bit layout equals a native s4 array's HBM
    layout, so the in-program unpack is a free bitcast."""
    if q.shape[-1] % 2:
        raise ValueError(f"pack_s4 needs an even last dim, got {q.shape}")
    if isinstance(q, np.ndarray):
        lo = (q[..., 0::2] & 0xF).astype(np.uint8)
        hi = (q[..., 1::2] & 0xF).astype(np.uint8)
        return (lo | (hi << 4)).view(np.int8)
    import jax

    lo = (q[..., 0::2] & 0xF).astype(jnp.uint8)
    hi = (q[..., 1::2] & 0xF).astype(jnp.uint8)
    return jax.lax.bitcast_convert_type(lo | (hi << 4), jnp.int8)


def unpack_s4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 carrier (..., P) -> s4 (..., 2P), inverse of :func:`pack_s4`.
    Trace-time only (s4 cannot cross a program boundary on the axon runtime);
    the bitcast's (..., P, 2) -> (..., 2P) reshape is bit-identical to the
    s4 packed layout, so XLA lowers it without a relayout."""
    import jax

    u = jax.lax.bitcast_convert_type(packed, jnp.int4)  # (..., P, 2)
    return u.reshape(*packed.shape[:-1], 2 * packed.shape[-1])


def effective_group(in_dim: int, group: int = 128):
    """Largest usable group size for a contraction dim: the requested group
    when it divides, else the largest power-of-two divisor of ``in_dim`` that
    is <= group (grouping needs in_dim % group == 0).  Returns None when no
    divisor >= 8 exists — callers fall back to per-channel int8 for that leaf
    (a <8-wide group would mean more scale bytes than a useful win)."""
    if in_dim % group == 0:
        return group
    g = group
    while g >= 8:
        if in_dim % g == 0:
            return g
        g //= 2
    return None


def quantize_grouped(w, group: int = 128, bits: int = 4):
    """Group-wise symmetric quantization along the contraction (second-to-last)
    dim: W (..., in, out) -> {"q": packed-s4 int8 (..., G, gs, out/2), "scale":
    f32 (..., G, out)} with G = in/group groups (bits=8 keeps an unpacked int8
    q (..., G, gs, out)).  The group axis is materialized in storage (no
    in-graph reshape of the weight at each decode step).  bits=4 uses the
    symmetric range ±7 and stores the nibbles packed (see module docstring)."""
    assert bits in (4, 8)
    w = jnp.asarray(w)
    in_dim = w.shape[-2]
    if in_dim % group:
        raise ValueError(f"contraction dim {in_dim} not divisible by group {group}")
    if bits == 4 and w.shape[-1] % 2:
        raise ValueError(f"int4 needs an even output dim, got {w.shape}")
    g = in_dim // group
    lead = w.shape[:-2]
    wg = w.astype(jnp.float32).reshape(*lead, g, group, w.shape[-1])
    lim = 7 if bits == 4 else 127
    absmax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = absmax / lim
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wg / scale), -lim, lim).astype(jnp.int8)
    if bits == 4:
        q = pack_s4(q)
    # NOTE no static "group" leaf: grouped-ness is detected structurally
    # (q.ndim == scale.ndim + 1) so the dict survives lax.scan slicing over a
    # stacked layer axis, where every leaf must be an array.
    return {"q": q, "scale": scale[..., 0, :].astype(jnp.float32)}


def quantize_grouped_np(w: np.ndarray, group: int = 128, bits: int = 4) -> dict:
    """Host-side (numpy) group-wise quantization — same packed-int8-carrier
    layout as :func:`quantize_grouped` (bits=4), so the result transfers to
    device as plain int8 bytes (s4 cannot cross the axon program boundary).
    The "bits" marker records the tier for save/load tooling."""
    assert bits in (4, 8)
    wf = np.asarray(w, np.float32)
    in_dim = wf.shape[-2]
    if in_dim % group:
        raise ValueError(f"contraction dim {in_dim} not divisible by group {group}")
    if bits == 4 and wf.shape[-1] % 2:
        raise ValueError(f"int4 needs an even output dim, got {wf.shape}")
    g = in_dim // group
    lead = wf.shape[:-2]
    wg = wf.reshape(*lead, g, group, wf.shape[-1])
    lim = 7 if bits == 4 else 127
    absmax = np.max(np.abs(wg), axis=-2, keepdims=True)
    scale = absmax / lim
    scale[scale == 0] = 1.0
    q = np.clip(np.round(wg / scale), -lim, lim).astype(np.int8)
    if bits == 4:
        q = pack_s4(q)
    return {"q": q, "scale": scale[..., 0, :].astype(np.float32), "bits": bits}


def device_put_quantized(wq: dict):
    """Move a host-side grouped dict to device (the packed int8 carrier
    transfers as-is — never narrow to s4 outside a program)."""
    return {"q": jnp.asarray(wq["q"]), "scale": jnp.asarray(wq["scale"])}


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
    if is_grouped(wq):
        q = unpack_s4(wq["q"]) if is_packed_grouped(wq) else wq["q"]
        w = q.astype(jnp.float32) * wq["scale"][..., None, :]
        lead = w.shape[:-3]
        return w.reshape(*lead, w.shape[-3] * w.shape[-2], w.shape[-1]).astype(dtype)
    return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def is_grouped(w) -> bool:
    """Group-wise layout: q (..., G, gs, out) has one more dim than scale
    (..., G, out).  Per-channel layouts have equal ndim (scale keeps a
    broadcast dim)."""
    return is_quantized(w) and w["q"].ndim == w["scale"].ndim + 1


def is_packed_grouped(w) -> bool:
    """Grouped-s4 layout with the packed int8 carrier: q (..., G, gs, out/2)
    holds two nibbles per byte, scale (..., G, out) names the full output dim."""
    return (
        is_grouped(w)
        and w["q"].dtype in (jnp.int8, np.int8)
        and 2 * w["q"].shape[-1] == w["scale"].shape[-1]
    )


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
    if is_grouped(w):
        return _q_matmul_grouped(x, w)
    y = x @ w["q"].astype(x.dtype)
    return y * w["scale"][..., 0, :].astype(x.dtype)


def _q_matmul_grouped(x, w: dict, out_dtype=None):
    """x (..., in) @ grouped weight {q (G, gs, out), scale (G, out)}.

    DECODE (few tokens): ONE dot_general batched over groups, scales applied
    to the fp32 per-group partials, summed.  The dot's RHS stays raw s4/s8
    (XLA fuses the narrow convert into the operand read — no dequantized
    weight temp in HBM), and the scale never touches a weight-sized tensor.

    PREFILL (many tokens): the grouped form's (G, T, out) fp32 partials
    tensor scales with token count T — at T=2048, out=11008, G=32 that is
    ~2.9 GB written+read per matmul (the sum over G cannot fuse into the
    dot).  Past the crossover (partials bytes > dequantized-weight bytes,
    i.e. T*4 > gs*2) we dequantize to ONE (in, out) x.dtype weight temp and
    run a plain dot instead — prefill is MXU-bound, the extra HBM temp is
    bounded by the weight size, and decode programs (T = batch <= gs/2)
    never take this branch."""
    import jax

    q, s = w["q"], w["scale"]  # (G, gs, out) s4/s8 — or (G, gs, out/2) packed
    if q.ndim != 3:
        raise ValueError(
            f"grouped q_matmul expects an unstacked (G, gs, out) weight, got "
            f"shape {q.shape} — slice the layer dim before dispatch")
    tokens = 1
    for d in x.shape[:-1]:
        tokens *= d
    if tokens * 4 > q.shape[1] * 2:  # fp32 partials vs x.dtype weight temp
        return (x @ dequantize(w, x.dtype)).astype(out_dtype or x.dtype)
    g, gs = q.shape[0], q.shape[1]
    xg = x.reshape(*x.shape[:-1], g, gs)  # (..., G, gs)
    packed = is_packed_grouped(w)
    if packed:
        # NEVER reshape the weight: bitcast the carrier to s4 and keep the
        # nibble pair as a trailing FREE dim of the dot.  An interleaving
        # (G, gs, P, 2) -> (G, gs, 2P) reshape on the weight breaks XLA's
        # operand fusion — it materialized a dequantized weight temp per
        # matmul and cost 3.4x the int8 step time on the v5e (DEVNOTES
        # round 2 seventh window).  The pair dim is instead folded out of
        # the token-sized OUTPUT (..., P, 2) -> (..., 2P), which is B*out
        # elements, not weight-sized.
        q = jax.lax.bitcast_convert_type(q, jnp.int4)  # (G, gs, P, 2)
    y = jax.lax.dot_general(
        xg, q.astype(x.dtype),
        (((xg.ndim - 1,), (1,)), ((xg.ndim - 2,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (G, ..., out) — packed: (G, ..., P, 2)
    if packed:
        y = y * s.reshape(g, *(1,) * (y.ndim - 3), s.shape[-1] // 2, 2)
        y = jnp.sum(y, axis=0)  # (..., P, 2)
        y = y.reshape(*y.shape[:-2], s.shape[-1])  # channel 2p+k = (p, k)
        return y.astype(out_dtype or x.dtype)
    y = y * s.reshape(g, *(1,) * (y.ndim - 2), s.shape[-1])
    return jnp.sum(y, axis=0).astype(out_dtype or x.dtype)


def q_take(w: Union[dict, jnp.ndarray], ids, axis: int = 0):
    """Row gather (embedding lookup) with optional int8 table quantized
    per-row (scale shape (V, 1))."""
    if not is_quantized(w):
        return jnp.take(w, ids, axis=axis)
    rows = jnp.take(w["q"], ids, axis=axis).astype(jnp.float32)
    scales = jnp.take(w["scale"], ids, axis=axis)
    return rows * scales


def quantize_llama_tree(text_params: dict, bits: int = 8, group: int = 128) -> dict:
    """Quantize the LLaMA tower's matmul weights (norms stay fp).

    bits=8: per-output-channel int8 everywhere (the reference's load_in_8bit
    scope).  bits=4: group-wise s4 for the layer matmuls and lm_head; the
    embedding table stays per-row int8 (gathers don't benefit from grouping
    and the table is read once per prompt token, not per step)."""
    lyr = text_params["layers"]
    qlayers = dict(lyr)
    def q4_or_int8(w):
        eff = effective_group(w.shape[-2], group)
        if bits == 4 and eff is not None:
            return quantize_grouped(w, group=eff, bits=4)
        return quantize(w, axis=-2)  # (L, in, out): channel=out

    for k in ("q_proj", "k_proj", "v_proj", "o_proj", "gate_proj", "up_proj", "down_proj"):
        qlayers[k] = q4_or_int8(lyr[k]) if bits == 4 else quantize(lyr[k], axis=-2)
    out = dict(text_params)
    out["layers"] = qlayers
    out["embed_tokens"] = quantize(text_params["embed_tokens"], axis=-1)  # per-row
    if bits == 4:
        out["lm_head"] = q4_or_int8(text_params["lm_head"])
    else:
        out["lm_head"] = quantize(text_params["lm_head"], axis=-2)
    return out


def quantize_tree(params: dict, bits: int = 8, group: int = 128) -> dict:
    """Composite tree: quantized text tower, everything else untouched (the
    reference's load_in_8bit scope; bits=4 is the beyond-reference tier)."""
    out = dict(params)
    if "text" in params:
        out["text"] = quantize_llama_tree(params["text"], bits=bits, group=group)
    elif "embed_tokens" in params:
        out = quantize_llama_tree(params, bits=bits, group=group)
    return out
