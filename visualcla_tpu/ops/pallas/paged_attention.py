"""Paged decode attention — flash-decoding over a block-paged KV pool.

Replaces the per-step KV handling of HF generate (the reference's decode hot
loop, modeling_visualcla.py:382-391) for the serving configuration
(BASELINE.json north star: "paged KV cache").

The serving engine stores KV in fixed-size blocks drawn from a global pool
(``(num_blocks, block_size, Nkv, hd)`` per layer) with a per-row block table,
so a row's context costs ceil(len/block_size) blocks instead of a full
max_seq_len stripe — the difference between 2 and 8+ concurrent 2048-token
rows next to 14 GB of weights on a 16 GB chip.

Kernel: grid (B, max_blocks) — ONE program per (row, block), ALL heads at
once.  TPU grids run sequentially (~0.5 us/step through this deployment), so
the round-1 (B, N, max_blocks) per-head grid paid 32x more iteration overhead
than compute at decode shapes: 2048 grid steps x 16 KB DMAs per layer came to
~34 ms of a 42 ms B=8 decode step.  This version DMAs the whole
(BS, Nkv*hd) slab once per block and contracts every head in a single MXU
dot against a block-diagonal-masked query matrix (wasted MACs are free —
decode is bandwidth-bound, the MXU is ~99% idle).  GQA needs no K/V repeat:
the mask pairs each query row with its kv head's lane slice.  int8 KV scales
never touch the K/V slabs either — they fold into the score matrix (k) and
the prob matrix (v) as (N, BS) factors built by one tiny selection matmul.

The block table rides scalar prefetch, so each step's KV block index is
known before the body runs and the pipeline can DMA ahead; the index map
clamps past-the-end blocks to the row's last real block, which Pallas
recognises as a revisit (no copy issued).  Online-softmax state (m, l, acc)
lives in VMEM scratch and carries across the innermost grid dimension;
block 0 initializes, the last block writes the output.

``paged_append_attention`` additionally APPENDS the step's new K/V token
into the pool inside the same kernel via ``input_output_aliases``: the
kernel already DMAs the row's last block for attention, so substituting one
row of that block in VMEM and flushing it back costs one block write per
row.  Doing the append in XLA instead (scatter / dynamic_update on the
(L, NB, BS, Nkv, hd) pool carried through the layer scan) measured ~16 ms
of the 29.7 ms B=8 decode step at 7B — XLA materializes per-layer pool
slices and re-inserts them every layer, ~17 GB of pure copy traffic.  The
multi-layer pool is passed whole with the layer index riding scalar
prefetch, so the layer scan's body never slices the pool at all.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _paged_kernel(
    tables_ref,  # (B, max_blocks) int32 — scalar prefetch
    lens_ref,  # (B, 1) int32 — post-append context length per row
    q_ref,  # (1, N, hd) — the row's queries, every head
    k_ref,  # (1, BS, Nkv*hd) slab (selected via the table in the index_map)
    v_ref,  # (1, BS, Nkv*hd)
    *refs,  # [k_scale (1, BS, Nkv), v_scale (1, BS, Nkv)] when int8 | then:
    #         o_ref (1, N, hd), m/l/acc scratch
    scale: float,
    block_size: int,
    heads_per_kv: int,
    kv_int8: bool = False,
):
    if kv_int8:
        ks_ref, vs_ref, o_ref, m_ref, l_ref, acc_ref = refs
    else:
        o_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    N, hd = q_ref.shape[1], q_ref.shape[2]
    KVL = k_ref.shape[2]  # Nkv * hd lanes
    Nkv = KVL // hd
    BS = block_size

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = lens_ref[b, 0]
    n_blocks = (length + BS - 1) // BS

    # row n reads kv head n // heads_per_kv; lane j belongs to kv head j // hd
    rowkv = jax.lax.broadcasted_iota(jnp.int32, (N, KVL), 0) // heads_per_kv
    colkv = jax.lax.broadcasted_iota(jnp.int32, (N, KVL), 1) // hd
    hmask = rowkv == colkv

    def scale_rows(sc):  # (BS, Nkv) -> (N, BS): row n gets its kv head's col
        sel_r = jax.lax.broadcasted_iota(jnp.int32, (N, Nkv), 0) // heads_per_kv
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (N, Nkv), 1)
        sel = (sel_r == sel_c).astype(jnp.float32)
        return jax.lax.dot_general(
            sel, sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i < n_blocks)
    def _step():
        q = q_ref[0].astype(jnp.float32) * scale  # (N, hd)
        qt = jnp.concatenate([q] * Nkv, axis=1) if Nkv > 1 else q  # (N, KVL)
        qb = jnp.where(hmask, qt, 0.0)  # block-diagonal queries
        k = k_ref[0].astype(jnp.float32)  # (BS, KVL)
        v = v_ref[0].astype(jnp.float32)
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, BS) — every head in one dot
        if kv_int8:  # k = int8 * per-(token, kv-head) scale, folded into s
            s = s * scale_rows(ks_ref[0].astype(jnp.float32))
        slot = i * BS + jax.lax.broadcasted_iota(jnp.int32, (N, BS), 1)
        s = jnp.where(slot < length, s, NEG_INF)
        m_prev, l_prev, acc_prev = m_ref[:], l_ref[:], acc_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:] = m_new
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if kv_int8:  # v's dequant scale rides the prob matrix
            p = p * scale_rows(vs_ref[0].astype(jnp.float32))
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, KVL) — each row only needs its kv head's slice
        acc_ref[:] = acc_prev * alpha + jnp.where(hmask, pv, 0.0)

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        acc = acc_ref[:]
        # fold the masked (N, Nkv*hd) accumulator down to (N, hd): only each
        # row's own kv-head slice is nonzero, so a sum over slices extracts it
        o = acc[:, :hd]
        for kvh in range(1, Nkv):
            o = o + acc[:, kvh * hd:(kvh + 1) * hd]
        o_ref[0] = (o / safe_l).astype(o_ref.dtype)


def _min_sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _dense_reference(q, k_pool, v_pool, tables, lens, k_scales, v_scales,
                     scale):
    """XLA fallback for kernel-unsafe shapes (the kernel's lane-sliced
    head extraction wants hd % 128 == 0 — true for the 7B flagship, not for
    tiny test models on a real TPU)."""
    B, N, H = q.shape
    _, BS, Nkv, hd = k_pool.shape
    rep = N // Nkv

    def row(qb, tb, ln):
        k = k_pool[tb].reshape(-1, Nkv, hd).astype(jnp.float32)
        v = v_pool[tb].reshape(-1, Nkv, hd).astype(jnp.float32)
        if k_scales is not None:
            k = k * k_scales[tb].reshape(-1, Nkv)[..., None].astype(jnp.float32)
            v = v * v_scales[tb].reshape(-1, Nkv)[..., None].astype(jnp.float32)
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("nh,snh->ns", qb.astype(jnp.float32) * scale, k)
        valid = jnp.arange(k.shape[0]) < ln
        s = jnp.where(valid[None, :], s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("ns,snh->nh", p, v).astype(q.dtype)

    return jax.vmap(row)(q, tables.astype(jnp.int32), lens.astype(jnp.int32))


@functools.partial(
    jax.jit, static_argnames=("scale", "interpret"),
)
def paged_decode_attention(
    q: jnp.ndarray,  # (B, N, H) — the new token's queries
    k_pool: jnp.ndarray,  # (num_blocks, BS, Nkv, hd) — bf16/f32 or int8
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # (B, max_blocks) int32 (pool indices; unused
    #                             entries must point at a valid block, e.g. 0)
    context_lens: jnp.ndarray,  # (B,) int32 — valid tokens per row (incl. new)
    k_scales: jnp.ndarray | None = None,  # (num_blocks, BS, Nkv) f32 (int8 KV)
    v_scales: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns (B, N, H) in q.dtype.  With int8 pools pass per-token-per-head
    scales: k = int8 * scale (kv-cache quantization halves the pool bytes)."""
    B, N, H = q.shape
    num_blocks, BS, Nkv, hd = k_pool.shape
    assert hd == H
    heads_per_kv = N // Nkv
    kv_int8 = k_pool.dtype == jnp.int8
    if scale is None:
        scale = 1.0 / math.sqrt(H)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic tiling: the finalize step extracts each head via static lane
    # slices at hd boundaries, and the slab DMA wants a sublane-aligned BS
    # for the POOL dtype (16 for bf16, 32 for int8) — small shapes fall back
    bs_min = 32 if kv_int8 else _min_sublane(k_pool.dtype)
    kernel_safe = BS % bs_min == 0 and (hd % 128 == 0 or Nkv == 1)
    if not interpret and not kernel_safe:
        return _dense_reference(q, k_pool, v_pool, block_tables, context_lens,
                                k_scales, v_scales, scale)
    max_blocks = block_tables.shape[1]

    kp = k_pool.reshape(num_blocks, BS, Nkv * hd)
    vp = v_pool.reshape(num_blocks, BS, Nkv * hd)
    lens = context_lens.reshape(B, 1).astype(jnp.int32)

    # the kv block index comes from the prefetched table; past-the-end blocks
    # clamp to the row's last real block = a revisit, so no DMA is issued
    # (the body skips them via i < n_blocks anyway)
    def kv_index(b, i, tables, lens):
        last = jnp.maximum(lens[b, 0] - 1, 0) // BS
        return (tables[b, jnp.minimum(i, last)], 0, 0)

    def q_index(b, i, tables, lens):
        return (b, 0, 0)

    in_specs = [
        pl.BlockSpec((1, N, H), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BS, Nkv * hd), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BS, Nkv * hd), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [q, kp, vp]
    if kv_int8:
        ks = k_scales.reshape(num_blocks, BS, Nkv)
        vs = v_scales.reshape(num_blocks, BS, Nkv)
        in_specs += [
            pl.BlockSpec((1, BS, Nkv), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BS, Nkv), kv_index, memory_space=pltpu.VMEM),
        ]
        operands += [ks, vs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tables, lens
        grid=(B, max_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, N, H), q_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, 1), jnp.float32),
            pltpu.VMEM((N, Nkv * hd), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _paged_kernel, scale=scale, block_size=BS,
            heads_per_kv=heads_per_kv, kv_int8=kv_int8,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, H), q.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), lens, *operands)


def _append_kernel(
    tables_ref,  # (B, max_blocks) int32 — scalar prefetch
    lens_ref,  # (B, 1) int32 — context length INCLUDING the new token
    layer_ref,  # (1,) int32 — which pool layer this call serves
    app_ref,  # (B, 2) int32 — [pool block id, in-block offset] for the append
    q_ref,  # (1, N, hd)
    kn_ref,  # (B, Nkv*hd) — the new token's K, pool dtype, every row
    vn_ref,  # (B, Nkv*hd)
    k_ref,  # (1, 1, BS, Nkv*hd) pool block (layer via prefetched layer_ref)
    v_ref,
    *refs,  # int8: [ksn (B, Nkv), vsn (B, Nkv), ks (1,1,BS,Nkv), vs (...)]
    #         then outputs: o (1, N, hd), ko, vo [, kso, vso],
    #         scratch: qb, m, l, acc
    scale: float,
    block_size: int,
    heads_per_kv: int,
    kv_int8: bool = False,
):
    """VPU-lean layout: this kernel's first version did slab-wide f32 casts,
    a substitute-row select, and an (N, Nkv*hd) accumulator mask on EVERY
    grid step — 8.9 ms of a 21 ms 7B B=8 decode step.  Now: dots consume
    the pool dtype directly (bf16 MXU; int8 upcast once), the new token is
    an analytic online-softmax term added once per row in _finish (the
    block substitution happens only in the once-per-row append write-back),
    the block-diagonal query matrix is built once per row into scratch, and
    the accumulator lives folded at (N, hd)."""
    if kv_int8:
        (ksn_ref, vsn_ref, ks_ref, vs_ref,
         o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
         qb_ref, m_ref, l_ref, acc_ref) = refs
    else:
        o_ref, ko_ref, vo_ref, qb_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    N, hd = q_ref.shape[1], q_ref.shape[2]
    KVL = k_ref.shape[3]
    Nkv = KVL // hd
    BS = block_size
    cdt = qb_ref.dtype  # compute dtype: pool dtype for float pools, bf16 int8

    length = lens_ref[b, 0]  # INCLUDING the new token
    ctx = length - 1  # pool blocks hold only the OLD context
    n_blocks = (length + BS - 1) // BS
    last = n_blocks - 1
    off = app_ref[b, 1]

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        # block-diagonal queries, built ONCE per row (the (N, KVL) iota
        # chain outside pl.when would execute on every grid step)
        rowkv = jax.lax.broadcasted_iota(
            jnp.int32, (N, KVL), 0) // heads_per_kv
        colkv = jax.lax.broadcasted_iota(jnp.int32, (N, KVL), 1) // hd
        q = q_ref[0].astype(jnp.float32) * scale  # (N, hd)
        qt = jnp.concatenate([q] * Nkv, axis=1) if Nkv > 1 else q
        qb_ref[:] = jnp.where(rowkv == colkv, qt, 0.0).astype(cdt)

    def pick_row(ref, dtype=None):  # (B, C) -> (1, C): row b.  Mosaic can't
        # prove a dynamic sublane index 8-aligned, so mask+sum the tiny operand
        x = ref[...]
        if x.dtype == jnp.int8:  # no VPU int8 sum
            x = x.astype(jnp.int32)
        rows = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
        out = jnp.sum(jnp.where(rows == b, x, jnp.zeros_like(x)), axis=0,
                      keepdims=True)
        return out.astype(dtype) if dtype is not None else out

    def scale_rows(sc):  # (BS, Nkv) -> (N, BS): row n gets its kv head's col
        sel_r = jax.lax.broadcasted_iota(jnp.int32, (N, Nkv), 0) // heads_per_kv
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (N, Nkv), 1)
        sel = (sel_r == sel_c).astype(jnp.float32)
        return jax.lax.dot_general(
            sel, sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def scale_col(sc):  # (1, Nkv) -> (N, 1): elementwise (a 1-column
        # dot_general trips a Mosaic verifier bug — see _finish's sn)
        sel_r = jax.lax.broadcasted_iota(jnp.int32, (N, Nkv), 0) // heads_per_kv
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (N, Nkv), 1)
        pick = (sel_r == sel_c).astype(jnp.float32)
        return jnp.sum(pick * sc.astype(jnp.float32), axis=1, keepdims=True)

    def fold(x):  # (N, KVL) -> (N, hd): keep each row's own kv-head slice
        grp = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0) // heads_per_kv
        o = jnp.where(grp == 0, x[:, :hd], 0.0)
        for kvh in range(1, Nkv):
            sl = slice(kvh * hd, (kvh + 1) * hd)
            o = o + jnp.where(grp == kvh, x[:, sl], 0.0)
        return o

    @pl.when(i == last)
    def _append():  # write-back of the append block, once per row
        rowsel = jax.lax.broadcasted_iota(jnp.int32, (BS, KVL), 0) == off
        ko_ref[0, 0] = jnp.where(rowsel, pick_row(kn_ref, k_ref.dtype),
                                 k_ref[0, 0])
        vo_ref[0, 0] = jnp.where(rowsel, pick_row(vn_ref, v_ref.dtype),
                                 v_ref[0, 0])
        if kv_int8:
            srowsel = jax.lax.broadcasted_iota(
                jnp.int32, (BS, Nkv), 0) == off
            kso_ref[0, 0] = jnp.where(srowsel, pick_row(ksn_ref), ks_ref[0, 0])
            vso_ref[0, 0] = jnp.where(srowsel, pick_row(vsn_ref), vs_ref[0, 0])

    @pl.when((i < n_blocks) & (ctx > i * BS))
    def _step():  # old-context blocks only (the new token is analytic)
        qb = qb_ref[...]
        k = k_ref[0, 0].astype(cdt)  # bf16/f32 slab straight into the MXU
        v = v_ref[0, 0].astype(cdt)
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (N, BS) — every head in one dot
        if kv_int8:  # k = int8 * per-(token, kv-head) scale, folded into s
            s = s * scale_rows(ks_ref[0, 0].astype(jnp.float32))
        slot = i * BS + jax.lax.broadcasted_iota(jnp.int32, (N, BS), 1)
        s = jnp.where(slot < ctx, s, NEG_INF)
        m_prev, l_prev, acc_prev = m_ref[:], l_ref[:], acc_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:] = m_new
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if kv_int8:  # v's dequant scale rides the prob matrix
            p = p * scale_rows(vs_ref[0, 0].astype(jnp.float32))
        pv = jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, KVL)
        acc_ref[:] = acc_prev * alpha + fold(pv)

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        # the new token's analytic online-softmax term (always in-context)
        qb = qb_ref[...]
        kn = pick_row(kn_ref, cdt)  # (1, KVL)
        vn = pick_row(vn_ref, cdt)
        # (N, 1) matvec: Mosaic mis-verifies a 1-column dot_general here, so
        # reduce elementwise (once per row — off the per-block hot path)
        sn = jnp.sum((qb * kn).astype(jnp.float32), axis=1, keepdims=True)
        if kv_int8:
            sn = sn * scale_col(pick_row(ksn_ref))
        m_prev, l_prev, acc_prev = m_ref[:], l_ref[:], acc_ref[:]
        m_new = jnp.maximum(m_prev, sn)
        pn = jnp.exp(sn - m_new)  # (N, 1)
        alpha = jnp.exp(m_prev - m_new)
        l = l_prev * alpha + pn
        if kv_int8:
            pn = pn * scale_col(pick_row(vsn_ref))
        acc = acc_prev * alpha + pn * fold(
            jnp.broadcast_to(vn.astype(jnp.float32), (N, KVL)))
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc / safe_l).astype(o_ref.dtype)


def _dense_append(q, k_new, v_new, k_pool, v_pool, tables, lens, blk, off,
                  layer, k_new_scales, v_new_scales, k_scales, v_scales,
                  scale):
    """XLA fallback: scatter the new token, then dense attention on the
    layer's pool slice.  Used for kernel-unsafe shapes (tiny test models)."""
    B, Nkv, hd = k_new.shape
    L, NB, BS, KVL = k_pool.shape
    k_pool = k_pool.at[layer, blk, off].set(k_new.reshape(B, KVL))
    v_pool = v_pool.at[layer, blk, off].set(v_new.reshape(B, KVL))
    kp_l = jax.lax.dynamic_index_in_dim(k_pool, layer, 0, keepdims=False)
    vp_l = jax.lax.dynamic_index_in_dim(v_pool, layer, 0, keepdims=False)
    if k_scales is not None:
        k_scales = k_scales.at[layer, blk, off].set(k_new_scales)
        v_scales = v_scales.at[layer, blk, off].set(v_new_scales)
        ks_l = jax.lax.dynamic_index_in_dim(k_scales, layer, 0, keepdims=False)
        vs_l = jax.lax.dynamic_index_in_dim(v_scales, layer, 0, keepdims=False)
    else:
        ks_l = vs_l = None
    o = _dense_reference(q, kp_l.reshape(NB, BS, Nkv, hd),
                         vp_l.reshape(NB, BS, Nkv, hd), tables, lens,
                         ks_l, vs_l, scale)
    return o, k_pool, v_pool, k_scales, v_scales


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_append_attention(
    q: jnp.ndarray,  # (B, N, hd) — the new token's queries (rope applied)
    k_new: jnp.ndarray,  # (B, Nkv, hd) — POOL dtype (int8 pre-quantized)
    v_new: jnp.ndarray,
    k_pool: jnp.ndarray,  # (L, num_blocks, BS, Nkv*hd) — KERNEL OPERAND ORDER
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # (B, max_blocks) int32
    context_lens: jnp.ndarray,  # (B,) int32 INCLUDING the new token
    append_blk: jnp.ndarray,  # (B,) int32 pool block for the new token
    append_off: jnp.ndarray,  # (B,) int32 offset inside that block
    layer: jnp.ndarray,  # () int32
    k_new_scales: jnp.ndarray | None = None,  # (B, Nkv) f32 when int8
    v_new_scales: jnp.ndarray | None = None,
    k_scales: jnp.ndarray | None = None,  # (L, num_blocks, BS, Nkv) f32
    v_scales: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Fused KV append + flash-decoding over the multi-layer block pool.

    Returns ``(o, k_pool, v_pool, k_scales, v_scales)`` where the pools are
    the SAME buffers updated in place (``input_output_aliases``) — the
    caller's layer scan carries them with zero copy traffic.  The pools are
    stored in kernel operand order ``(L, NB, BS, Nkv*hd)``: reshaping a
    ``(..., Nkv, hd)`` pool at this boundary is a physical relayout under
    TPU tiling (two 1 GB HLO temps at 7B that broke the in-place alias —
    same lesson as the contiguous cache's (L, B, Nkv, S, hd) fix).  Parked
    rows must pass ``context_lens == 1`` and ``append_blk == 0``."""
    B, N, H = q.shape
    _, Nkv, hd = k_new.shape
    L, num_blocks, BS, KVL = k_pool.shape
    assert hd == H and KVL == Nkv * hd
    heads_per_kv = N // Nkv
    kv_int8 = k_pool.dtype == jnp.int8
    if scale is None:
        scale = 1.0 / math.sqrt(H)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bs_min = 32 if kv_int8 else _min_sublane(k_pool.dtype)
    kernel_safe = BS % bs_min == 0 and (hd % 128 == 0 or Nkv == 1)
    if not interpret and not kernel_safe:
        return _dense_append(q, k_new, v_new, k_pool, v_pool, block_tables,
                             context_lens, append_blk, append_off, layer,
                             k_new_scales, v_new_scales, k_scales, v_scales,
                             scale)
    max_blocks = block_tables.shape[1]

    kp = k_pool
    vp = v_pool
    kn = k_new.reshape(B, KVL)
    vn = v_new.reshape(B, KVL)
    lens = context_lens.reshape(B, 1).astype(jnp.int32)
    lay = jnp.reshape(layer, (1,)).astype(jnp.int32)
    app = jnp.stack(
        [append_blk.astype(jnp.int32), append_off.astype(jnp.int32)], axis=1)

    def kv_index(b, i, tables, lens, lay, app):
        last = jnp.maximum(lens[b, 0] - 1, 0) // BS
        return (lay[0], tables[b, jnp.minimum(i, last)], 0, 0)

    def app_index(b, i, tables, lens, lay, app):
        return (lay[0], app[b, 0], 0, 0)

    def q_index(b, i, tables, lens, lay, app):
        return (b, 0, 0)

    def full_index(b, i, tables, lens, lay, app):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((1, N, H), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, KVL), full_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((B, KVL), full_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [q, kn, vn, kp, vp]
    out_specs = [
        pl.BlockSpec((1, N, H), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), app_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), app_index, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, N, H), q.dtype),
        jax.ShapeDtypeStruct(kp.shape, kp.dtype),
        jax.ShapeDtypeStruct(vp.shape, vp.dtype),
    ]
    # flattened input order (scalar prefetch first): tables=0 lens=1 lay=2
    # app=3 q=4 kn=5 vn=6 kp=7 vp=8 [ksn=9 vsn=10 ks=11 vs=12]
    aliases = {7: 1, 8: 2}
    if kv_int8:
        ksp = k_scales
        vsp = v_scales
        in_specs += [
            pl.BlockSpec((B, Nkv), full_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, Nkv), full_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, Nkv), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, Nkv), kv_index, memory_space=pltpu.VMEM),
        ]
        operands += [k_new_scales.astype(jnp.float32),
                     v_new_scales.astype(jnp.float32), ksp, vsp]
        out_specs += [
            pl.BlockSpec((1, 1, BS, Nkv), app_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, Nkv), app_index, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(ksp.shape, jnp.float32),
            jax.ShapeDtypeStruct(vsp.shape, jnp.float32),
        ]
        aliases = {7: 1, 8: 2, 11: 3, 12: 4}

    cdt = k_pool.dtype if k_pool.dtype != jnp.int8 else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tables, lens, layer, app
        grid=(B, max_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((N, KVL), cdt),  # qb: block-diagonal queries
            pltpu.VMEM((N, 1), jnp.float32),  # m
            pltpu.VMEM((N, 1), jnp.float32),  # l
            pltpu.VMEM((N, hd), jnp.float32),  # acc (folded per step)
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _append_kernel, scale=scale, block_size=BS,
            heads_per_kv=heads_per_kv, kv_int8=kv_int8,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(block_tables.astype(jnp.int32), lens, lay, app, *operands)
    if kv_int8:
        o, kp2, vp2, ks2, vs2 = outs
        return o, kp2, vp2, ks2, vs2
    o, kp2, vp2 = outs
    return o, kp2, vp2, None, None


# ---------------------------------------------------------------------------
# Sq>1 verify: fused multi-token append + causal attention (speculative
# decoding's batched verify step, engine/paged_spec.py)
# ---------------------------------------------------------------------------

def _verify_kernel(
    tables_ref,  # (B, max_blocks) int32 — scalar prefetch
    lens_ref,  # (B, 1) int32 — context length INCLUDING the Sq new tokens
    layer_ref,  # (1,) int32
    app_ref,  # (B, 2) int32 — pool block ids [blkA, blkB] receiving the
    #           new tokens (blkB == blkA when they fit one block; 0=dummy)
    q_ref,  # (1, N*Sq, hd) — row-major n, minor j: row = n*Sq + j
    kn_ref,  # (B*Sq, Nkv*hd) — new-token K, pool dtype
    vn_ref,
    k_ref,  # (1, 1, BS, Nkv*hd) pool block (layer via prefetch)
    v_ref,
    *refs,
    scale: float,
    block_size: int,
    heads_per_kv: int,  # ALREADY scaled by Sq (= (N // Nkv) * Sq)
    sq: int,
    kv_int8: bool = False,
):
    """Generalizes ``_append_kernel`` to Sq new tokens per row.

    Unlike the decode kernel's analytic new-token term, the new rows are
    SUBSTITUTED into the (at most two) append blocks' VMEM content before
    the score dot, and a per-query causal mask (slot <= base + j) makes
    old-context and new-token attention one uniform path — the
    substitution select runs only on the append blocks (``pl.when``), so
    the per-block hot path stays as lean as the decode kernel's.  The
    substituted content doubles as the append write-back: the ko/vo output
    index map walks blkA then blkB, so each flush carries the already-
    built block."""
    if kv_int8:
        (ksn_ref, vsn_ref, ks_ref, vs_ref,
         o_ref, ko_ref, vo_ref, kso_ref, vso_ref,
         qb_ref, m_ref, l_ref, acc_ref) = refs
    else:
        o_ref, ko_ref, vo_ref, qb_ref, m_ref, l_ref, acc_ref = refs
    b = pl.program_id(0)
    i = pl.program_id(1)
    NSq, hd = q_ref.shape[1], q_ref.shape[2]
    KVL = k_ref.shape[3]
    Nkv = KVL // hd
    BS = block_size
    Sq = sq
    cdt = qb_ref.dtype

    length = lens_ref[b, 0]  # INCLUDING the Sq new tokens
    base = length - Sq  # pool slot of new token 0
    n_blocks = (length + BS - 1) // BS
    last = n_blocks - 1
    iA = base // BS
    iB = (base + Sq - 1) // BS

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        rowkv = jax.lax.broadcasted_iota(
            jnp.int32, (NSq, KVL), 0) // heads_per_kv
        colkv = jax.lax.broadcasted_iota(jnp.int32, (NSq, KVL), 1) // hd
        q = q_ref[0].astype(jnp.float32) * scale  # (NSq, hd)
        qt = jnp.concatenate([q] * Nkv, axis=1) if Nkv > 1 else q
        qb_ref[:] = jnp.where(rowkv == colkv, qt, 0.0).astype(cdt)

    def pick_rows(ref, dtype=None):
        """(B*Sq, C) -> (Sq, C): rows [b*Sq, (b+1)*Sq) via a selection
        matmul (Mosaic cannot prove a dynamic sublane slice aligned)."""
        x = ref[...]
        if x.dtype == jnp.int8:
            x = x.astype(jnp.int32)
        sel_r = jax.lax.broadcasted_iota(jnp.int32, (Sq, x.shape[0]), 0)
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (Sq, x.shape[0]), 1)
        sel = (sel_c == b * Sq + sel_r).astype(jnp.float32)
        out = jax.lax.dot_general(
            sel, x.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return out.astype(dtype) if dtype is not None else out

    def substituted(block, new, start):
        """Blend new rows [start, start+Sq) of ``block`` (BS, C) from
        ``new`` (Sq, C) — rows outside [base, base+Sq) keep ``block``.
        ``start`` = base - i*BS may be negative for block iB."""
        r = jax.lax.broadcasted_iota(jnp.int32, (BS, block.shape[1]), 0)
        idx = r - start  # which new row lands here
        inside = (idx >= 0) & (idx < Sq)
        sel_r = jax.lax.broadcasted_iota(jnp.int32, (BS, Sq), 0) - start
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (BS, Sq), 1)
        sel = (sel_r == sel_c).astype(jnp.float32)
        placed = jax.lax.dot_general(
            sel, new.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.where(inside, placed.astype(block.dtype), block)

    def scale_rows(sc):  # (BS, Nkv) -> (NSq, BS)
        sel_r = jax.lax.broadcasted_iota(
            jnp.int32, (NSq, Nkv), 0) // heads_per_kv
        sel_c = jax.lax.broadcasted_iota(jnp.int32, (NSq, Nkv), 1)
        sel = (sel_r == sel_c).astype(jnp.float32)
        return jax.lax.dot_general(
            sel, sc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    def fold(x):  # (NSq, KVL) -> (NSq, hd)
        grp = jax.lax.broadcasted_iota(jnp.int32, (NSq, 1), 0) // heads_per_kv
        o = jnp.where(grp == 0, x[:, :hd], 0.0)
        for kvh in range(1, Nkv):
            sl = slice(kvh * hd, (kvh + 1) * hd)
            o = o + jnp.where(grp == kvh, x[:, sl], 0.0)
        return o

    is_app = (i == iA) | ((i == iB) & (iB != iA))
    start = base - i * BS

    def content(ref, new_ref):
        cur = ref[0, 0].astype(cdt)
        return jnp.where(
            is_app,
            substituted(cur, pick_rows(new_ref, cdt), start), cur)

    @pl.when(i < n_blocks)
    def _step():
        qb = qb_ref[...]
        k = content(k_ref, kn_ref)  # (BS, KVL), new rows substituted
        v = content(v_ref, vn_ref)
        s = jax.lax.dot_general(
            qb, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (NSq, BS)
        if kv_int8:
            ksc = jnp.where(
                is_app,
                substituted(ks_ref[0, 0], pick_rows(ksn_ref), start),
                ks_ref[0, 0]).astype(jnp.float32)
            s = s * scale_rows(ksc)
        slot = i * BS + jax.lax.broadcasted_iota(jnp.int32, (NSq, BS), 1)
        j = jax.lax.broadcasted_iota(jnp.int32, (NSq, BS), 0) % Sq
        s = jnp.where(slot <= base + j, s, NEG_INF)
        m_prev, l_prev, acc_prev = m_ref[:], l_ref[:], acc_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:] = m_new
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        if kv_int8:
            vsc = jnp.where(
                is_app,
                substituted(vs_ref[0, 0], pick_rows(vsn_ref), start),
                vs_ref[0, 0]).astype(jnp.float32)
            p = p * scale_rows(vsc)
        pv = jax.lax.dot_general(
            p.astype(cdt), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[:] = acc_prev * alpha + fold(pv)

    @pl.when(is_app)
    def _append():  # the attended content IS the write-back content
        ko_ref[0, 0] = content(k_ref, kn_ref).astype(ko_ref.dtype)
        vo_ref[0, 0] = content(v_ref, vn_ref).astype(vo_ref.dtype)
        if kv_int8:
            kso_ref[0, 0] = jnp.where(
                is_app, substituted(ks_ref[0, 0], pick_rows(ksn_ref), start),
                ks_ref[0, 0])
            vso_ref[0, 0] = jnp.where(
                is_app, substituted(vs_ref[0, 0], pick_rows(vsn_ref), start),
                vs_ref[0, 0])

    @pl.when(i == pl.num_programs(1) - 1)
    def _finish():
        l = l_ref[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)


def _dense_verify(q, k_new, v_new, k_pool, v_pool, tables, lens, layer,
                  k_new_scales, v_new_scales, k_scales, v_scales, scale):
    """XLA fallback: scatter the Sq new tokens, then causal dense attention
    over the gathered row blocks.  The correctness-defining reference for
    the verify kernel and the kernel-unsafe-shape / CPU-test path."""
    B, Sq, Nkv, hd = k_new.shape
    L, NB, BS, KVL = k_pool.shape
    max_blocks = tables.shape[1]
    base = (lens - Sq).astype(jnp.int32)  # (B,) slot of new token 0
    slots = base[:, None] + jnp.arange(Sq, dtype=jnp.int32)[None, :]
    blk_idx = jnp.clip(slots // BS, 0, max_blocks - 1)
    blk = jnp.take_along_axis(tables.astype(jnp.int32), blk_idx, axis=1)
    valid = (slots >= 0) & (slots // BS < max_blocks)
    blk = jnp.where(valid, blk, 0)
    off = jnp.where(valid, slots % BS, 0)
    lidx = jnp.broadcast_to(jnp.asarray(layer, jnp.int32), blk.shape)
    k_pool = k_pool.at[lidx, blk, off].set(k_new.reshape(B, Sq, KVL))
    v_pool = v_pool.at[lidx, blk, off].set(v_new.reshape(B, Sq, KVL))
    kp_l = jax.lax.dynamic_index_in_dim(k_pool, layer, 0, keepdims=False)
    vp_l = jax.lax.dynamic_index_in_dim(v_pool, layer, 0, keepdims=False)
    if k_scales is not None:
        k_scales = k_scales.at[lidx, blk, off].set(k_new_scales)
        v_scales = v_scales.at[lidx, blk, off].set(v_new_scales)
        ks_l = jax.lax.dynamic_index_in_dim(k_scales, layer, 0, keepdims=False)
        vs_l = jax.lax.dynamic_index_in_dim(v_scales, layer, 0, keepdims=False)
    else:
        ks_l = vs_l = None
    N = q.shape[2]
    rep = N // Nkv

    def row(qb, tb, bs):
        k = kp_l[tb].reshape(-1, Nkv, hd).astype(jnp.float32)
        v = vp_l[tb].reshape(-1, Nkv, hd).astype(jnp.float32)
        if ks_l is not None:
            k = k * ks_l[tb].reshape(-1, Nkv)[..., None].astype(jnp.float32)
            v = v * vs_l[tb].reshape(-1, Nkv)[..., None].astype(jnp.float32)
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("jnh,snh->njs", qb.astype(jnp.float32) * scale, k)
        slot = jnp.arange(k.shape[0])[None, None, :]
        lim = (bs + jnp.arange(Sq))[None, :, None]
        s = jnp.where(slot <= lim, s, NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("njs,snh->jnh", p, v).astype(qb.dtype)

    o = jax.vmap(row)(q, tables.astype(jnp.int32), base)
    return o, k_pool, v_pool, k_scales, v_scales


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def paged_verify_attention(
    q: jnp.ndarray,  # (B, Sq, N, hd) — rope'd queries for the Sq new tokens
    k_new: jnp.ndarray,  # (B, Sq, Nkv, hd) — POOL dtype (int8 pre-quantized)
    v_new: jnp.ndarray,
    k_pool: jnp.ndarray,  # (L, num_blocks, BS, Nkv*hd)
    v_pool: jnp.ndarray,
    block_tables: jnp.ndarray,  # (B, max_blocks) int32
    context_lens: jnp.ndarray,  # (B,) int32 INCLUDING the Sq new tokens
    layer: jnp.ndarray,  # () int32
    k_new_scales: jnp.ndarray | None = None,  # (B, Sq, Nkv) f32 when int8
    v_new_scales: jnp.ndarray | None = None,
    k_scales: jnp.ndarray | None = None,
    v_scales: jnp.ndarray | None = None,
    *,
    scale: float | None = None,
    interpret: bool | None = None,
):
    """Fused Sq-token KV append + causal paged attention (the speculative
    verify step).  Returns ``(o (B, Sq, N, hd), pools...)`` with the pools
    updated in place (``input_output_aliases``).  Token j appends at pool
    slot ``lens - Sq + j`` and attends slots ``<= lens - Sq + j``.  Parked
    rows pass ``context_lens == Sq`` with an all-dummy table."""
    B, Sq, N, hd = q.shape
    _, _, Nkv, _ = k_new.shape
    L, num_blocks, BS, KVL = k_pool.shape
    assert KVL == Nkv * hd and Sq <= BS
    heads_per_kv = N // Nkv
    kv_int8 = k_pool.dtype == jnp.int8
    if scale is None:
        scale = 1.0 / math.sqrt(hd)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    bs_min = 32 if kv_int8 else _min_sublane(k_pool.dtype)
    kernel_safe = BS % bs_min == 0 and (hd % 128 == 0 or Nkv == 1)
    if not interpret and not kernel_safe:
        return _dense_verify(q, k_new, v_new, k_pool, v_pool, block_tables,
                             context_lens, layer, k_new_scales, v_new_scales,
                             k_scales, v_scales, scale)
    max_blocks = block_tables.shape[1]
    NSq = N * Sq

    # row layout n-major (row = n*Sq + j): the block-diagonal mask's
    # row -> kv-head map stays a single integer divide (heads_per_kv * Sq)
    qr = q.transpose(0, 2, 1, 3).reshape(B, NSq, hd)
    kn = k_new.reshape(B * Sq, KVL)
    vn = v_new.reshape(B * Sq, KVL)
    lens = context_lens.reshape(B, 1).astype(jnp.int32)
    lay = jnp.reshape(layer, (1,)).astype(jnp.int32)
    # append block ids, validity-masked to dummy 0 (slots past the table)
    base = (context_lens - Sq).astype(jnp.int32)
    iA = jnp.clip(base // BS, 0, max_blocks - 1)
    iB = jnp.clip((base + Sq - 1) // BS, 0, max_blocks - 1)
    rows = jnp.arange(B)
    blkA = jnp.where((base >= 0) & (base // BS < max_blocks),
                     block_tables[rows, iA].astype(jnp.int32), 0)
    blkB = jnp.where((base + Sq - 1) // BS < max_blocks,
                     block_tables[rows, iB].astype(jnp.int32), 0)
    app = jnp.stack([blkA, blkB], axis=1)

    def kv_index(b, i, tables, lens, lay, app):
        last = jnp.maximum((lens[b, 0] + BS - 1) // BS - 1, 0)
        return (lay[0], tables[b, jnp.minimum(i, last)], 0, 0)

    def app_index(b, i, tables, lens, lay, app):
        ia = jnp.maximum(lens[b, 0] - Sq, 0) // BS
        return (lay[0], jnp.where(i <= ia, app[b, 0], app[b, 1]), 0, 0)

    def q_index(b, i, tables, lens, lay, app):
        return (b, 0, 0)

    def full_index(b, i, tables, lens, lay, app):
        return (0, 0)

    in_specs = [
        pl.BlockSpec((1, NSq, hd), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((B * Sq, KVL), full_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((B * Sq, KVL), full_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qr, kn, vn, k_pool, v_pool]
    out_specs = [
        pl.BlockSpec((1, NSq, hd), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), app_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, BS, KVL), app_index, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((B, NSq, hd), q.dtype),
        jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
        jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
    ]
    # flattened inputs (scalar prefetch first): tables=0 lens=1 lay=2 app=3
    # q=4 kn=5 vn=6 kp=7 vp=8 [ksn=9 vsn=10 ks=11 vs=12]
    aliases = {7: 1, 8: 2}
    if kv_int8:
        in_specs += [
            pl.BlockSpec((B * Sq, Nkv), full_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((B * Sq, Nkv), full_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, Nkv), kv_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, Nkv), kv_index, memory_space=pltpu.VMEM),
        ]
        operands += [
            k_new_scales.reshape(B * Sq, Nkv).astype(jnp.float32),
            v_new_scales.reshape(B * Sq, Nkv).astype(jnp.float32),
            k_scales, v_scales]
        out_specs += [
            pl.BlockSpec((1, 1, BS, Nkv), app_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BS, Nkv), app_index, memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(k_scales.shape, jnp.float32),
            jax.ShapeDtypeStruct(v_scales.shape, jnp.float32),
        ]
        aliases = {7: 1, 8: 2, 11: 3, 12: 4}

    cdt = k_pool.dtype if k_pool.dtype != jnp.int8 else jnp.bfloat16
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B, max_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((NSq, KVL), cdt),  # qb block-diagonal queries
            pltpu.VMEM((NSq, 1), jnp.float32),  # m
            pltpu.VMEM((NSq, 1), jnp.float32),  # l
            pltpu.VMEM((NSq, hd), jnp.float32),  # acc
        ],
    )
    outs = pl.pallas_call(
        functools.partial(
            _verify_kernel, scale=scale, block_size=BS,
            heads_per_kv=heads_per_kv * Sq, sq=Sq, kv_int8=kv_int8,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        interpret=interpret,
    )(block_tables.astype(jnp.int32), lens, lay, app, *operands)
    if kv_int8:
        o, kp2, vp2, ks2, vs2 = outs
    else:
        o, kp2, vp2 = outs
        ks2 = vs2 = None
    o = o.reshape(B, N, Sq, hd).transpose(0, 2, 1, 3)
    return o, kp2, vp2, ks2, vs2
