"""Pallas flash attention — the TPU replacement for the reference's CUDA/ATen
attention hot loop (SURVEY.md §2.b).

One kernel serves prefill and decode:
- blockwise online-softmax over KV tiles (fp32 running max / denominator),
  so the (Sq, Skv) score matrix never materializes in HBM;
- causality uses cache-slot order: query i sits at slot ``write_slot + i`` and
  sees kv slots <= its own; slot validity (left padding, unwritten cache tail)
  comes in as a per-slot mask — matching ``ops.attention.causal_bias`` exactly;
- bf16 QKV in, fp32 accumulation, bf16 out — MXU-shaped tiles (128 lanes).

Decode (Sq=1) pads the query tile to the sublane minimum and rides the same
code path: the dominant cost is streaming the KV cache, which tiles the same.
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    slot_ref,  # (B, 1) int32 in SMEM — per-row cache slot of the first query
    kvok_ref,  # (B, Skv) int32 in VMEM — kv slot validity (full array)
    q_ref,  # (1, 1, BQ, H)
    k_ref,  # (1, 1, Skv, H) — this program's kv head (GQA: blockspec maps
    v_ref,  # (1, 1, Skv, H)    q head n -> kv head n // qk_rep; no HBM repeat)
    *refs,  # [ks_ref (1, Nkv, Skv), vs_ref (1, Nkv, Skv) f32 if kv_int8], o_ref
    scale: float,
    block_kv: int,
    causal: bool,
    kv_int8: bool = False,
    qk_rep: int = 1,  # query heads per kv head (scale-row selector)
    stacked: bool = False,  # k/v blocks carry a leading layer dim (1,1,1,S,H)
):
    if kv_int8:
        ks_ref, vs_ref, o_ref = refs
    else:
        (o_ref,) = refs
    BQ, H = q_ref.shape[2], q_ref.shape[3]
    Skv = k_ref.shape[3] if stacked else k_ref.shape[2]
    b = pl.program_id(0)
    n = pl.program_id(1)
    qblk = pl.program_id(2)
    q = q_ref[0, 0].astype(jnp.float32) * scale
    # query cache slots: write_slot + global query index
    qpos = (
        slot_ref[b, 0]
        + qblk * BQ
        + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
    )  # (BQ, 1)

    m = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((BQ, 1), jnp.float32)
    acc = jnp.zeros((BQ, H), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        if stacked:
            k = k_ref[0, 0, 0, pl.ds(i * block_kv, block_kv), :]
            v = v_ref[0, 0, 0, pl.ds(i * block_kv, block_kv), :]
        else:
            k = k_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
            v = v_ref[0, 0, pl.ds(i * block_kv, block_kv), :]
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, block_kv)
        if kv_int8:
            # per-kv-row scales fold in AFTER the matmuls (lane-aligned (1, bkv)
            # slices; k dequant: s_j *= ks_j, v dequant: weight p_j by vs_j).
            # Scale blocks are (1, Nkv, Skv) — one batch row, all kv heads —
            # so VMEM cost is Nkv*Skv*4B regardless of batch/query-head count;
            # this program's row is kv head n // qk_rep.
            kvh = n // qk_rep
            head_ix = ((pl.ds(0, 1), pl.ds(0, 1), pl.ds(kvh, 1)) if stacked
                       else (pl.ds(0, 1), pl.ds(kvh, 1)))
            ks = ks_ref[head_ix + (pl.ds(i * block_kv, block_kv),)
                        ].reshape(1, block_kv)
            vs = vs_ref[head_ix + (pl.ds(i * block_kv, block_kv),)
                        ].reshape(1, block_kv)
            s = s * ks
        ok = jnp.broadcast_to(
            kvok_ref[pl.ds(b, 1), pl.ds(i * block_kv, block_kv)] > 0,
            (BQ, block_kv),
        )
        if causal:
            kv_idx = i * block_kv + jax.lax.broadcasted_iota(
                jnp.int32, (BQ, block_kv), 1
            )
            ok = ok & (kv_idx <= qpos)
        s = jnp.where(ok, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # mask p with ok so a FULLY-masked query row (all s at NEG_INF, so
        # m_new = NEG_INF and exp(s - m_new) = 1) contributes nothing and
        # emits zeros via safe_l below — the contract a consumer expects
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = p * vs if kv_int8 else p
        acc = acc * alpha + jax.lax.dot_general(
            pv, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, Skv // block_kv, body, (m, l, acc))
    # fully-masked query rows have l == 0 (p is ok-masked) -> emit zeros
    safe_l = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, 0] = (acc / safe_l).astype(o_ref.dtype)


def _decode_kernel(
    lidx_ref,  # (1,) int32 scalar prefetch — layer into the stacked cache
    slot_ref,  # (B,) int32 scalar prefetch — per-row cache slot of the query
    kvok_ref,  # (B, Skv) int32 VMEM — kv slot validity (full array)
    q_ref,  # (1, N, H)
    k_ref,  # (1, 1, Nkv, bkv, H) — ALL kv heads, one kv block
    v_ref,
    *refs,  # [ks (1, 1, Nkv, bkv), vs (...) if kv_int8], o, m, l, acc scratch
    scale: float,
    block_kv: int,
    qk_rep: int,
    kv_int8: bool = False,
):
    """Sq == 1 decode: ONE program per (row, kv block) covering every head.

    The generic kernel launches B*N programs each doing a (BQ=16, bkv) tile
    of work — at 7B B=8 decode that is 256 near-empty programs per layer and
    measured 118 us/layer vs the ~42 us cache-read roofline (device trace).
    Here the grid is (B, Skv/bkv): per program, a static unrolled loop over
    kv heads runs one (rep, bkv) score dot per kv head, and the online
    softmax update is vectorized over all N rows.  Beyond-context blocks are
    clamped in the index map (repeat-fetches are free) and skipped."""
    if kv_int8:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    N, H = q_ref.shape[1], q_ref.shape[2]
    Nkv = k_ref.shape[2]
    bkv = block_kv

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    slot = slot_ref[b]
    n_blocks = (slot + bkv) // bkv  # ceil((slot+1)/bkv): j <= slot visible

    @pl.when(i < n_blocks)
    def _step():
        q = q_ref[0].astype(jnp.float32) * scale  # (N, H)
        # per-kv-head score dots (static unroll; each (rep, bkv) on the MXU);
        # int8-KV scales fold in per head group as (1, bkv) row slices — no
        # (N, bkv) jnp.repeat materialization in VREGs (VERDICT r2 item 8)
        ks_all = ks_ref[0, 0].astype(jnp.float32) if kv_int8 else None
        rows = []
        for kvh in range(Nkv):
            kh = k_ref[0, 0, kvh].astype(jnp.float32)  # (bkv, H)
            qs = q[kvh * qk_rep:(kvh + 1) * qk_rep]  # (rep, H)
            r = jax.lax.dot_general(
                qs, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            if kv_int8:
                r = r * ks_all[kvh:kvh + 1]  # (1, bkv) broadcasts over rep
            rows.append(r)
        s = rows[0] if Nkv == 1 else jnp.concatenate(rows, axis=0)  # (N, bkv)
        kv_idx = i * bkv + jax.lax.broadcasted_iota(jnp.int32, (N, bkv), 1)
        ok = jnp.broadcast_to(
            kvok_ref[pl.ds(b, 1), pl.ds(i * bkv, bkv)] > 0, (N, bkv)
        ) & (kv_idx <= slot)
        s = jnp.where(ok, s, NEG_INF)
        m_prev, l_prev, acc_prev = m_ref[:], l_ref[:], acc_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(ok, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:] = m_new
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vs_all = vs_ref[0, 0].astype(jnp.float32) if kv_int8 else None
        outs = []
        for kvh in range(Nkv):
            vh = v_ref[0, 0, kvh].astype(jnp.float32)  # (bkv, H)
            ph = p[kvh * qk_rep:(kvh + 1) * qk_rep]  # (rep, bkv)
            if kv_int8:
                ph = ph * vs_all[kvh:kvh + 1]
            outs.append(jax.lax.dot_general(
                ph, vh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        pv = outs[0] if Nkv == 1 else jnp.concatenate(outs, axis=0)  # (N, H)
        acc_ref[:] = acc_prev * alpha + pv

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)


def _flash_decode_stacked(q, k, v, kv_valid, write_slot, k_scale, v_scale,
                          layer_index, *, scale, block_kv, interpret):
    """Decode (Sq == 1) over the stacked (L, B, Nkv, Skv, H) cache — or a
    single-layer (B, Nkv, Skv, H) cache viewed as L == 1 with layer 0."""
    B, Sq, N, H = q.shape
    assert Sq == 1
    if k.ndim == 4:  # single-layer 'bnsh' caller: add a unit layer dim (view)
        k, v = k[None], v[None]
        if k_scale is not None:
            k_scale, v_scale = k_scale[None], v_scale[None]
        layer_index = jnp.int32(0)
    L, _, Nkv, Skv, _ = k.shape
    kv_int8 = k_scale is not None
    if N % Nkv:
        raise ValueError(f"query heads {N} not a multiple of kv heads {Nkv}")
    rep = N // Nkv
    if scale is None:
        scale = 1.0 / math.sqrt(H)
    bkv = min(block_kv, _ceil_mult(Skv, 128))
    Skv_p = _ceil_mult(Skv, bkv)
    # engine caches are 256-multiples: these pads are no-ops in production
    kt = _pad_to(k, Skv_p, 3)
    vt = _pad_to(v, Skv_p, 3)
    kvok = _pad_to(kv_valid.astype(jnp.int32), Skv_p, 1)
    qt = q.reshape(B, N, H)
    slot = jnp.broadcast_to(
        jnp.asarray(write_slot, jnp.int32).reshape(-1), (B,))
    lidx = jnp.asarray(layer_index, jnp.int32).reshape(1)

    def kv_index(b, i, lidx, slot):
        last = (slot[b] + bkv) // bkv - 1  # clamp: repeat-fetches are free
        return (lidx[0], b, 0, jnp.minimum(i, last), 0)

    in_specs = [
        pl.BlockSpec((B, Skv_p), lambda b, i, lidx, slot: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, N, H), lambda b, i, lidx, slot: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Nkv, bkv, H), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Nkv, bkv, H), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [kvok, qt, kt, vt]
    if kv_int8:
        kst = _pad_to(k_scale, Skv_p, 3)
        vst = _pad_to(v_scale, Skv_p, 3)

        def scale_index(b, i, lidx, slot):
            l, b_, _, i_, _ = kv_index(b, i, lidx, slot)
            return (l, b_, 0, i_)

        in_specs += [
            pl.BlockSpec((1, 1, Nkv, bkv), scale_index,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nkv, bkv), scale_index,
                         memory_space=pltpu.VMEM),
        ]
        operands += [kst, vst]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # layer index, per-row slots
        grid=(B, Skv_p // bkv),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, H), lambda b, i, lidx, slot: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, H), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, scale=scale, block_kv=bkv,
                          qk_rep=rep, kv_int8=kv_int8),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, H), q.dtype),
        interpret=interpret,
    )(lidx, slot, *operands)
    return out[:, None]  # (B, 1, N, H)


def _pad_to(x, size, axis, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _ceil_mult(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_kv", "interpret",
                     "kv_layout"),
)
def _flash_attention_jit(
    q: jnp.ndarray,  # (B, Sq, N, H)
    k: jnp.ndarray,  # (B, Skv, Nkv, H), or (B, Nkv, Skv, H) with kv_layout=bnsh,
    v: jnp.ndarray,  # or the FULL stacked cache (L, B, Nkv, Skv, H) with layer_index
    kv_valid: jnp.ndarray,  # (B, Skv) bool/int — slot validity
    write_slot: jnp.ndarray,  # () or (B,) int32 — cache slot of the first query
    k_scale: Optional[jnp.ndarray] = None,  # (B, Skv, Nkv) f32 (int8 KV cache),
    v_scale: Optional[jnp.ndarray] = None,  # (B, Nkv, Skv) bnsh / (L, B, Nkv, Skv) stacked
    layer_index: Optional[jnp.ndarray] = None,  # () int32 — layer into stacked k/v
    *,
    scale: Optional[float] = None,
    causal: bool = True,
    block_q: int = 256,
    block_kv: int = 256,
    interpret: bool = False,
    kv_layout: str = "bsnh",
) -> jnp.ndarray:
    """Returns (B, Sq, N, H) in q.dtype.  kv slot j is visible to query i iff
    kv_valid[b, j] and (not causal or j <= write_slot + i).  int8 K/V stream
    from HBM as int8 (half bandwidth); per-token-per-head scales fold into the
    score/probability rows after the matmuls.

    ``kv_layout='bnsh'`` takes K/V (and scales) already in the kernel's operand
    order — the layout the KV cache is STORED in (models/llama.init_kv_cache),
    so decode streams the cache with zero relayout copies.  The 'bsnh' form
    transposes on entry (ViT/one-shot callers).
    (Implementation body; call ``flash_attention`` which resolves interpret.)"""
    B, Sq, N, H = q.shape
    if Sq == 1 and causal and (layer_index is not None or kv_layout == "bnsh"):
        # decode fast path: one program per (row, kv block), all heads —
        # B*N tiny programs measured 3x the cache-read roofline (see
        # _decode_kernel); covers the stacked cache and single-layer bnsh
        return _flash_decode_stacked(
            q, k, v, kv_valid, write_slot, k_scale, v_scale, layer_index,
            scale=scale, block_kv=block_kv, interpret=interpret,
        )
    if layer_index is not None:
        return _flash_stacked(
            q, k, v, kv_valid, write_slot, k_scale, v_scale, layer_index,
            scale=scale, causal=causal, block_q=block_q, block_kv=block_kv,
            interpret=interpret,
        )
    if kv_layout == "bnsh":
        Nkv, Skv = k.shape[1], k.shape[2]
    else:
        Skv, Nkv = k.shape[1], k.shape[2]
    kv_int8 = k_scale is not None
    if N % Nkv:
        raise ValueError(f"query heads {N} not a multiple of kv heads {Nkv}")
    rep = N // Nkv  # GQA: kv stays at Nkv heads in HBM; the k/v BlockSpec
    # index maps route query-head program n to kv head n // rep, so grouped
    # configs read each kv head once per group — no N/Nkv× bandwidth blowup
    if scale is None:
        scale = 1.0 / math.sqrt(H)

    min_q = 16 if q.dtype == jnp.bfloat16 else 8
    bq = min(block_q, _ceil_mult(Sq, min_q))
    Sq_p = _ceil_mult(Sq, bq)
    bkv = min(block_kv, _ceil_mult(Skv, 128))
    Skv_p = _ceil_mult(Skv, bkv)

    qt = _pad_to(q.transpose(0, 2, 1, 3), Sq_p, 2)  # (B, N, Sq_p, H)
    if kv_layout == "bnsh":  # already kernel-order: pad only, no copies
        kt = _pad_to(k, Skv_p, 2)
        vt = _pad_to(v, Skv_p, 2)
    else:
        kt = _pad_to(k.transpose(0, 2, 1, 3), Skv_p, 2)
        vt = _pad_to(v.transpose(0, 2, 1, 3), Skv_p, 2)
    kvok = _pad_to(kv_valid.astype(jnp.int32), Skv_p, 1)
    slot = jnp.broadcast_to(
        jnp.asarray(write_slot, jnp.int32).reshape(-1, 1), (B, 1)
    )

    grid = (B, N, Sq_p // bq)
    in_specs = [
        # full (B,1)/(B,Skv) arrays: per-row blocks of height 1 violate the
        # TPU (8,128) tiling rule when B>1; rows index by program_id inside
        pl.BlockSpec((B, 1), lambda b, n, i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((B, Skv_p), lambda b, n, i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, H), lambda b, n, i: (b, n, i, 0),
                     memory_space=pltpu.VMEM),
        # GQA: query-head program n reads kv head n // rep (rep == 1 for MHA)
        pl.BlockSpec((1, 1, Skv_p, H), lambda b, n, i: (b, n // rep, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, Skv_p, H), lambda b, n, i: (b, n // rep, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [slot, kvok, qt, kt, vt]
    if kv_int8:
        # scales travel as (1, Nkv, Skv_p) blocks — one batch row, all kv
        # heads (full trailing dims keep the (8,128) tiling rule happy);
        # VMEM cost is Nkv*Skv*4B per operand, independent of B and N
        if kv_layout == "bnsh":
            kst = _pad_to(k_scale, Skv_p, 2)
            vst = _pad_to(v_scale, Skv_p, 2)
        else:
            kst = _pad_to(k_scale.transpose(0, 2, 1), Skv_p, 2)
            vst = _pad_to(v_scale.transpose(0, 2, 1), Skv_p, 2)
        in_specs += [
            pl.BlockSpec((1, Nkv, Skv_p), lambda b, n, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Nkv, Skv_p), lambda b, n, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [kst, vst]
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_kv=bkv,
                          causal=causal, kv_int8=kv_int8, qk_rep=rep),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, H), lambda b, n, i: (b, n, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, Sq_p, H), q.dtype),
        interpret=interpret,
    )(*operands)
    return out.transpose(0, 2, 1, 3)[:, :Sq]


def _flash_stacked(q, k, v, kv_valid, write_slot, k_scale, v_scale,
                   layer_index, *, scale, causal, block_q, block_kv,
                   interpret):
    """Flash attention reading ONE layer of the FULL stacked KV cache
    (L, B, Nkv, Skv, H) in place: the layer index rides scalar prefetch and
    selects the kv block in the BlockSpec index maps, so no per-layer
    (B, Nkv, Skv, H) slice is ever materialized in HBM.  Eliminates ~2 cache
    slices per layer per decode step (~7% of batched-decode HBM traffic)."""
    B, Sq, N, H = q.shape
    L, _, Nkv, Skv, _ = k.shape
    kv_int8 = k_scale is not None
    if N % Nkv:
        raise ValueError(f"query heads {N} not a multiple of kv heads {Nkv}")
    rep = N // Nkv
    if scale is None:
        scale = 1.0 / math.sqrt(H)

    min_q = 16 if q.dtype == jnp.bfloat16 else 8
    bq = min(block_q, _ceil_mult(Sq, min_q))
    Sq_p = _ceil_mult(Sq, bq)
    bkv = min(block_kv, _ceil_mult(Skv, 128))
    Skv_p = _ceil_mult(Skv, bkv)

    qt = _pad_to(q.transpose(0, 2, 1, 3), Sq_p, 2)  # (B, N, Sq_p, H)
    # engine caches are 256-multiples, so these pads are no-ops in production
    # (a pad here would copy the whole stacked cache — only tiny tests hit it)
    kt = _pad_to(k, Skv_p, 3)
    vt = _pad_to(v, Skv_p, 3)
    kvok = _pad_to(kv_valid.astype(jnp.int32), Skv_p, 1)
    slot = jnp.broadcast_to(
        jnp.asarray(write_slot, jnp.int32).reshape(-1, 1), (B, 1)
    )
    lidx = jnp.asarray(layer_index, jnp.int32).reshape(1)

    grid = (B, N, Sq_p // bq)
    in_specs = [
        pl.BlockSpec((B, 1), lambda b, n, i, l: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((B, Skv_p), lambda b, n, i, l: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, bq, H), lambda b, n, i, l: (b, n, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Skv_p, H),
                     lambda b, n, i, l: (l[0], b, n // rep, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, Skv_p, H),
                     lambda b, n, i, l: (l[0], b, n // rep, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [slot, kvok, qt, kt, vt]
    if kv_int8:
        kst = _pad_to(k_scale, Skv_p, 3)
        vst = _pad_to(v_scale, Skv_p, 3)
        in_specs += [
            pl.BlockSpec((1, 1, Nkv, Skv_p), lambda b, n, i, l: (l[0], b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Nkv, Skv_p), lambda b, n, i, l: (l[0], b, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [kst, vst]

    kern = functools.partial(_flash_kernel, scale=scale, block_kv=bkv,
                             causal=causal, kv_int8=kv_int8, qk_rep=rep,
                             stacked=True)

    def kernel(l_ref, *refs):  # the scalar is consumed by the index maps only
        return kern(*refs)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, H), lambda b, n, i, l: (b, n, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, Sq_p, H), q.dtype),
        interpret=interpret,
    )(lidx, *operands)
    return out.transpose(0, 2, 1, 3)[:, :Sq]


def flash_attention(q, k, v, kv_valid, write_slot, *, scale=None, causal=True,
                    block_q=256, block_kv=256, interpret=None,
                    k_scale=None, v_scale=None, kv_layout="bsnh",
                    layer_index=None):
    """Public entry: ``interpret=None`` auto-selects the Pallas interpreter on
    non-TPU backends (CPU tests / virtual meshes run the same kernel code).
    Pass ``k_scale``/``v_scale`` (B, Skv, Nkv) with int8 k/v buffers;
    ``kv_layout='bnsh'`` for K/V + scales already in kernel operand order;
    ``layer_index`` with stacked (L, B, Nkv, Skv, H) caches (zero-slice reads)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _flash_attention_jit(
        q, k, v, kv_valid, write_slot, k_scale, v_scale, layer_index,
        scale=scale, causal=causal, block_q=block_q, block_kv=block_kv,
        interpret=interpret, kv_layout=kv_layout,
    )
