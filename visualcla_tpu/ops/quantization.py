"""Weight-only int8/int4 quantization — the TPU replacement for bitsandbytes
``load_in_8bit`` (reference modeling_visualcla.py:138,155; inference.py:24-25),
plus an int4 tier the reference doesn't have (decode is weight-bandwidth-bound
on TPU, so each halving of weight bytes is ~2x single-stream tokens/s).

Symmetric per-output-channel int8: W ≈ q * scale, q int8, scale = absmax/127
per channel.  Weights live in HBM at 1 byte/param (halving the 7B decode's
bandwidth bill vs bf16); the dequant happens in-register as part of the matmul
(XLA fuses the convert+scale into the dot's operand read).  Matches the
reference's scope: only the **text tower** quantizes (vision/resampler dense).

int4 uses **group-wise** scales along the contraction dim (default group 128,
the GPTQ/AWQ convention) to keep quantization error acceptable at 4 bits:
W[(g), out] ≈ q[(g), out] * scale[g, out].

**int4 storage format (v2, contraction-packed deinterleaved halves).**
A grouped-int4 weight is a dict
    {"q": uint8 (..., G, gs/2, out), "scale": f32 (..., G, out)}
where byte[g, r, o] packs TWO signed 4-bit values of group g's column o:
    low nibble  = W4[g, r,        o]
    high nibble = W4[g, r + gs/2, o]
i.e. the two CONTRACTION-dim halves of the group share a byte.  Why this
layout (measured on the v5e, round 3):
- XLA cannot consume s4 efficiently at all on this chip — a plain dot with an
  s4 RHS measured SLOWER than the same dot with int8 despite half the HBM
  bytes (probe_int4.py), and the round-2 column-packed bitcast format
  measured 47.6 tok/s vs int8's 101.0 at 7B.  The decode matmul is therefore
  a Pallas kernel (ops/pallas/int4_matmul.py) that unpacks nibbles in
  VMEM/VREGs with integer shifts and feeds the MXU bf16 — HBM traffic stays
  0.5 byte/param.
- Packing along the CONTRACTION dim keeps the full ``out`` dim on the lane
  axis: the scale (G, out) applies directly to the dot's (B, out) partials
  (no channel interleave to undo), sharding rules put 'model' on the last
  dim of q and scale alike, and the only requirement is an even group size
  (the round-2 format needed an even OUTPUT dim, which the 49958-wide
  lm_head only met by luck).
- Deinterleaved halves (r and r+gs/2, not 2r and 2r+1) make the activation
  split two CONTIGUOUS lane slices of x's (B, gs) group block.
- The uint8 carrier dtype doubles as the structural marker distinguishing
  packed int4 from unpacked grouped int8 (both would otherwise be int8
  arrays of indistinguishable shape).  s4 never crosses a program boundary:
  the axon runtime rejects s4 jit arguments/transfers (DEVNOTES round 2).

Inside a decode loop the per-layer weight slice is DEFERRED: the loops pass
the full stacked (L, G, gs/2, out) carrier plus the layer index as a
``{"q", "scale", "layer"}`` dict (see ``split_stacked_grouped``), and the
Pallas kernel selects the layer's blocks via its index map — an up-front
``dynamic_index_in_dim`` would materialize a per-layer copy of the weight in
HBM (0.5 B/param extra traffic per matmul per step, erasing the int4 win).

A per-channel int8 weight stays {"q": int8 (..., in, out), "scale": f32
(..., 1, out)}; detection is structural (``is_grouped``/``is_packed_grouped``)
so dicts survive ``lax.scan`` leaf slicing — model code dispatches through
``q_matmul``/``q_take``.
"""
from __future__ import annotations

from typing import Union

import jax.numpy as jnp
import numpy as np


def quantize_np(w: np.ndarray, axis: int = -2) -> dict:
    """Host-side (numpy) per-channel symmetric int8 — used while streaming a
    checkpoint so the bf16 original never occupies device HBM.

    Stacked (>=3-d) leaves quantize one leading-axis slice at a time with
    in-place f32 ops: the naive whole-leaf form allocates ~4 leaf-sized f32
    temporaries (copy/abs/div/round/clip), which pushed the weights-day
    int8 load to 35.6 GB RSS at 7B (stress_weights_day.py, round 4).
    Requires a negative ``axis`` so it is stable under slicing."""
    w = np.asarray(w)
    if axis >= 0:
        axis -= w.ndim
    if w.ndim >= 3:
        parts = [quantize_np(w[i], axis=axis) for i in range(w.shape[0])]
        return {"q": np.stack([p["q"] for p in parts]),
                "scale": np.stack([p["scale"] for p in parts])}
    wf = w.astype(np.float32)  # the one required copy
    absmax = np.max(np.abs(wf), axis=axis, keepdims=True)
    scale = absmax / 127.0
    scale[scale == 0] = 1.0
    np.divide(wf, scale, out=wf)
    np.rint(wf, out=wf)
    np.clip(wf, -127, 127, out=wf)
    return {"q": wf.astype(np.int8), "scale": scale.astype(np.float32)}


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


def pack_s4_rows(q):
    """Pack grouped s4 values (int8 in [-8, 7], shape (..., G, gs, out), gs
    even) into the v2 uint8 carrier (..., G, gs/2, out): row r -> low nibble,
    row r + gs/2 -> high.  Works on numpy and jax arrays."""
    gs = q.shape[-2]
    if gs % 2:
        raise ValueError(f"pack_s4_rows needs an even group size, got {q.shape}")
    gsh = gs // 2
    lo = q[..., :gsh, :] & 0xF
    hi = q[..., gsh:, :] & 0xF
    if isinstance(q, np.ndarray):
        return (lo | (hi << 4)).astype(np.uint8)
    return (lo | (hi << 4)).astype(jnp.uint8)


def unpack_s4_rows(packed):
    """uint8 carrier (..., G, gs/2, out) -> signed int8 values (..., G, gs, out),
    inverse of :func:`pack_s4_rows`.  Shifts run in int32 (TPU vregs have no
    int8 shifts — same trick the Pallas kernel uses)."""
    if isinstance(packed, np.ndarray):
        b = packed.astype(np.int32)
        lo = (b << 28) >> 28
        hi = (b << 24) >> 28
        return np.concatenate([lo, hi], axis=-2).astype(np.int8)
    b = packed.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b, 28), 28)
    hi = jnp.right_shift(jnp.left_shift(b, 24), 28)
    return jnp.concatenate([lo, hi], axis=-2).astype(jnp.int8)


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
    dim: W (..., in, out) -> {"q": uint8 v2 carrier (..., G, gs/2, out),
    "scale": f32 (..., G, out)} with G = in/group groups (bits=8 keeps an
    unpacked int8 q (..., G, gs, out)).  The group axis is materialized in
    storage (no in-graph reshape of the weight at each decode step).  bits=4
    uses the symmetric range ±7; group size must be even."""
    assert bits in (4, 8)
    w = jnp.asarray(w)
    in_dim = w.shape[-2]
    if in_dim % group:
        raise ValueError(f"contraction dim {in_dim} not divisible by group {group}")
    if bits == 4 and group % 2:
        raise ValueError(f"int4 needs an even group size, got {group}")
    g = in_dim // group
    lead = w.shape[:-2]
    wg = w.astype(jnp.float32).reshape(*lead, g, group, w.shape[-1])
    lim = 7 if bits == 4 else 127
    absmax = jnp.max(jnp.abs(wg), axis=-2, keepdims=True)
    scale = absmax / lim
    scale = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(wg / scale), -lim, lim).astype(jnp.int8)
    if bits == 4:
        q = pack_s4_rows(q)
    # NOTE no static "group" leaf: grouped-ness is detected structurally
    # (q.ndim == scale.ndim + 1) so the dict survives lax.scan slicing over a
    # stacked layer axis, where every leaf must be an array.
    return {"q": q, "scale": scale[..., 0, :].astype(jnp.float32)}


def quantize_grouped_np(w: np.ndarray, group: int = 128, bits: int = 4) -> dict:
    """Host-side (numpy) group-wise quantization — same v2 uint8-carrier
    layout as :func:`quantize_grouped` (bits=4), so the result transfers to
    device as plain bytes (s4 cannot cross the axon program boundary).
    The "bits" marker records the tier for save/load tooling."""
    assert bits in (4, 8)
    w = np.asarray(w)
    in_dim = w.shape[-2]
    if in_dim % group:
        raise ValueError(f"contraction dim {in_dim} not divisible by group {group}")
    if bits == 4 and group % 2:
        raise ValueError(f"int4 needs an even group size, got {group}")
    if w.ndim >= 3:
        # one leading-axis slice at a time: whole-leaf f32 temporaries at 7B
        # cost ~4x the leaf (see quantize_np) — weights-day RSS measurement
        parts = [quantize_grouped_np(w[i], group=group, bits=bits)
                 for i in range(w.shape[0])]
        return {"q": np.stack([p["q"] for p in parts]),
                "scale": np.stack([p["scale"] for p in parts]),
                "bits": bits}
    wf = w.astype(np.float32)
    g = in_dim // group
    lead = wf.shape[:-2]
    wg = wf.reshape(*lead, g, group, wf.shape[-1])
    lim = 7 if bits == 4 else 127
    absmax = np.max(np.abs(wg), axis=-2, keepdims=True)
    scale = absmax / lim
    scale[scale == 0] = 1.0
    np.divide(wg, scale, out=wg)
    np.rint(wg, out=wg)
    np.clip(wg, -lim, lim, out=wg)
    q = wg.astype(np.int8)
    if bits == 4:
        q = pack_s4_rows(q)
    return {"q": q, "scale": scale[..., 0, :].astype(np.float32), "bits": bits}


def device_put_quantized(wq: dict):
    """Move a host-side grouped dict to device (the packed uint8 carrier
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
        q = unpack_s4_rows(wq["q"]) if is_packed_grouped(wq) else wq["q"]
        w = q.astype(jnp.float32) * wq["scale"][..., None, :]
        lead = w.shape[:-3]
        return w.reshape(*lead, w.shape[-3] * w.shape[-2], w.shape[-1]).astype(dtype)
    return (wq["q"].astype(jnp.float32) * wq["scale"]).astype(dtype)


def is_quantized(w) -> bool:
    return isinstance(w, dict) and "q" in w and "scale" in w


def is_grouped(w) -> bool:
    """Group-wise layout: q (..., G, gs[, /2], out) has one more dim than
    scale (..., G, out).  Per-channel layouts have equal ndim (scale keeps a
    broadcast dim)."""
    return is_quantized(w) and w["q"].ndim == w["scale"].ndim + 1


def is_packed_grouped(w) -> bool:
    """Grouped-s4 v2 layout: the uint8 carrier dtype IS the marker (unpacked
    grouped int8 keeps int8; shapes alone cannot distinguish them)."""
    return is_grouped(w) and w["q"].dtype in (jnp.uint8, np.uint8)


def is_stacked_lazy(w) -> bool:
    """A stacked grouped weight whose per-layer slice is deferred to the
    matmul: {"q": (L, G, gs/2, out), "scale": (L, G, out), "layer": ()}."""
    return is_quantized(w) and "layer" in w


def split_stacked_grouped(layers: dict):
    """Partition a stacked layer-param dict into (rest, packed): ``packed``
    holds the packed-int4 leaves, which must NOT be sliced per layer (a
    dynamic_index_in_dim before a Pallas call materializes a per-layer HBM
    copy of the weight — 0.5 B/param of extra traffic per matmul per decode
    step).  Loops scan/index ``rest`` as before and rebuild the full
    per-layer tree with :func:`attach_layer`."""
    rest, packed = {}, {}
    for k, v in layers.items():
        if is_packed_grouped(v):
            packed[k] = v
        else:
            rest[k] = v
    return rest, packed


def attach_layer(packed: dict, layer) -> dict:
    """name -> lazy stacked dict carrying the (traced) layer index."""
    return {
        k: {"q": v["q"], "scale": v["scale"],
            "layer": jnp.asarray(layer, jnp.int32)}
        for k, v in packed.items()
    }


def q_matmul(x, w: Union[dict, jnp.ndarray]):
    """x @ W with optional int8/int4 W: dequant fused into the dot.

    The scale is per-OUTPUT-channel, so it commutes with the contraction:
    ``x @ (q * scale) == (x @ q) * scale``.  Scaling AFTER the dot keeps the
    dot's RHS the raw int8 array (XLA fuses the int8->bf16 convert into the
    dot's operand read); pre-scaling made XLA materialize a full bf16
    dequantized weight as an HLO temp in decode programs — a 32 MB
    write+read per 4096x4096 matmul per step, measured via a device trace
    of the 7B B=8 paged step (bitcast_multiply_fusion in the HLO)."""
    if not is_quantized(w):
        return x @ w
    if is_stacked_lazy(w):
        return _q_matmul_stacked(x, w)
    if is_grouped(w):
        return _q_matmul_grouped(x, w)
    y = x @ w["q"].astype(x.dtype)
    return y * w["scale"][..., 0, :].astype(x.dtype)


def _tiled_prefill_wins(tokens: int, gs: int, in_dim: int, out: int) -> bool:
    """Per-shape cost model: token-tiled kernel vs XLA dequant-dense for
    long prefill (tokens > MAX_TOKENS).

    The tiled kernel keeps weight traffic at 0.5 B/param but re-reads the
    x block once per OUTPUT tile (the weight scratch persists across token
    tiles; x cannot): refetch = ceil(out/to) * T * 2 * in bytes.  The
    dequant-dense path writes+reads one bf16 weight temp: 4 * in * out
    bytes.  Shapes whose VMEM plan forces narrow output tiles (the 7B
    down_proj: in=11008, G=86 -> to=128, 32 output tiles) drown in x
    refetch at T=2048 while qkv/gate-up (to=384) stay cheap — routing all
    shapes one way measured 302.3 ms (all-tiled) vs 282.8 (all-dequant) at
    S=2048 but 167.3 vs 184.1 at S=1024 (tools/probe_prefill.py round 5).
    C calibrated end-to-end on those runs; override via
    VISUALCLA_INT4_TILED_C for A/B probing."""
    import os

    from .pallas.int4_matmul import _pick_tiles_tiled

    G = in_dim // gs
    _, to = _pick_tiles_tiled(G, gs // 2, out)
    refetch = -(-out // to) * tokens * 2 * in_dim
    temp = 4 * in_dim * out
    c = float(os.environ.get("VISUALCLA_INT4_TILED_C", "3.0"))
    return refetch <= c * temp


def _use_int4_kernel(tokens: int, gs: int, in_dim: int = 0,
                     out: int = 0) -> bool:
    """The Pallas int4 kernel serves decode AND prefill on a real TPU with
    unsharded weights (decode: per-group form; short prefill: whole-x
    scratch form; long/batched prefill: token-tiled scratch form — subject
    to the per-shape cost model :func:`_tiled_prefill_wins`); CPU tests and
    TP-sharded weights under a mesh take the XLA paths.  Serving prefill
    from the kernel is what cut the int4 TTFT: the dequant-dense path
    writes+reads a full bf16 weight temp (2x 13.4 GB at 7B), the kernel
    streams the packed carrier once (3.4 GB)."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    import os

    # probing/A-B override: route prefill-sized token counts (decode stays
    # on the kernel) to the XLA dequant-dense path instead of the kernel
    if (tokens > 8
            and os.environ.get("VISUALCLA_INT4_PREFILL") == "dequant"):
        return False
    from .pallas.int4_matmul import MAX_TOKENS

    if (tokens > MAX_TOKENS and in_dim and out
            and not _tiled_prefill_wins(tokens, gs, in_dim, out)):
        return False
    from .attention import current_attention_mesh
    from ..parallel.sharding import MODEL

    mesh = current_attention_mesh()
    return mesh is None or mesh.shape.get(MODEL, 1) == 1


def _q_matmul_stacked(x, w: dict, out_dtype=None):
    """Stacked lazy grouped weight: dispatch the Pallas kernel with the FULL
    (L, G, gs/2, out) carrier + layer index (its BlockSpec index map reads
    layer ``l``'s blocks straight from HBM), or slice-then-fallback on the
    XLA paths."""
    q, s, layer = w["q"], w["scale"], w["layer"]
    tokens = 1
    for d in x.shape[:-1]:
        tokens *= d
    gs = 2 * q.shape[-2]
    if _use_int4_kernel(tokens, gs, x.shape[-1], q.shape[-1]):
        from .pallas.int4_matmul import int4_matmul

        y = int4_matmul(x.reshape(-1, x.shape[-1]), q, s, layer)
        y = y.reshape(*x.shape[:-1], y.shape[-1])
        return y.astype(out_dtype or x.dtype)
    import jax

    sliced = {
        "q": jax.lax.dynamic_index_in_dim(q, layer, 0, keepdims=False),
        "scale": jax.lax.dynamic_index_in_dim(s, layer, 0, keepdims=False),
    }
    return _q_matmul_grouped(x, sliced, out_dtype=out_dtype)


def _q_matmul_grouped(x, w: dict, out_dtype=None):
    """x (..., in) @ grouped weight {q (G, gs[, /2], out), scale (G, out)}.

    DECODE (few tokens): on TPU the packed-int4 case goes through the Pallas
    kernel (``_use_int4_kernel``); otherwise ONE dot_general batched over
    groups (two for the packed carrier's halves), scales applied to the fp32
    per-group partials, summed.  The unpacked dot's RHS stays raw int8 (XLA
    fuses the narrow convert into the operand read — no dequantized weight
    temp in HBM), and the scale never touches a weight-sized tensor.

    PREFILL (many tokens): the grouped form's (G, T, out) fp32 partials
    tensor scales with token count T — at T=2048, out=11008, G=32 that is
    ~2.9 GB written+read per matmul (the sum over G cannot fuse into the
    dot).  Past the crossover (partials bytes > dequantized-weight bytes,
    i.e. T*4 > gs*2) we dequantize to ONE (in, out) x.dtype weight temp and
    run a plain dot instead — prefill is MXU-bound, the extra HBM temp is
    bounded by the weight size, and decode programs (T = batch <= gs/2)
    never take this branch."""
    import jax

    q, s = w["q"], w["scale"]  # (G, gs, out) int8 — or (G, gs/2, out) uint8
    if q.ndim != 3:
        raise ValueError(
            f"grouped q_matmul expects an unstacked (G, gs, out) weight, got "
            f"shape {q.shape} — slice the layer dim before dispatch")
    packed = is_packed_grouped(w)
    g = q.shape[0]
    gs = (2 if packed else 1) * q.shape[1]
    tokens = 1
    for d in x.shape[:-1]:
        tokens *= d
    if packed and _use_int4_kernel(tokens, gs, x.shape[-1], q.shape[-1]):
        from .pallas.int4_matmul import int4_matmul

        y = int4_matmul(x.reshape(-1, x.shape[-1]), q, s, None)
        y = y.reshape(*x.shape[:-1], y.shape[-1])
        return y.astype(out_dtype or x.dtype)
    if tokens * 4 > gs * 2:  # fp32 partials vs x.dtype weight temp
        return (x @ dequantize(w, x.dtype)).astype(out_dtype or x.dtype)
    xg = x.reshape(*x.shape[:-1], g, gs)  # (..., G, gs)
    nd = xg.ndim
    if packed:
        # XLA fallback for the v2 carrier (CPU tests, TP-sharded weights):
        # unpack with int32 shifts into the two int8 halves and run TWO
        # group-batched dots — the unpacked halves total 1 B/param of HBM
        # temps (int8-tier traffic), which is why the TPU decode path is a
        # Pallas kernel instead.
        gsh = q.shape[1]
        lo, hi = _unpack_halves(q)
        dn = (((nd - 1,), (1,)), ((nd - 2,), (0,)))
        y = jax.lax.dot_general(
            xg[..., :gsh], lo.astype(x.dtype), dn,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xg[..., gsh:], hi.astype(x.dtype), dn,
            preferred_element_type=jnp.float32,
        )  # (G, ..., out)
    else:
        y = jax.lax.dot_general(
            xg, q.astype(x.dtype),
            (((nd - 1,), (1,)), ((nd - 2,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (G, ..., out)
    y = y * s.reshape(g, *(1,) * (y.ndim - 2), s.shape[-1])
    return jnp.sum(y, axis=0).astype(out_dtype or x.dtype)


def _unpack_halves(q):
    """v2 uint8 carrier (G, gs/2, out) -> (lo, hi) int8 halves (G, gs/2, out)."""
    b = q.astype(jnp.int32)
    lo = jnp.right_shift(jnp.left_shift(b, 28), 28).astype(jnp.int8)
    hi = jnp.right_shift(jnp.left_shift(b, 24), 28).astype(jnp.int8)
    return lo, hi


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
