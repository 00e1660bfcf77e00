"""Paged decode attention — flash-decoding over a block-paged KV pool.

Replaces the per-step KV handling of HF generate (the reference's decode hot
loop, modeling_visualcla.py:382-391) for the serving configuration
(BASELINE.json north star: "paged KV cache").

The serving engine stores KV in fixed-size blocks drawn from a global pool
(``(num_blocks, block_size, Nkv, hd)`` per layer) with a per-row block table,
so a row's context costs ceil(len/block_size) blocks instead of a full
max_seq_len stripe — the difference between 2 and 8+ concurrent 2048-token
rows next to 14 GB of weights on a 16 GB chip.

Kernel: grid (B, N, max_blocks); the block table rides scalar prefetch, so
each step's KV block index is known before the body runs and the pipeline
can DMA ahead.  Online-softmax state (m, l, acc) lives in VMEM scratch and
carries across the innermost grid dimension (TPU grids run sequentially);
block 0 initializes, the last block writes the output.  Queries are the
newest token (Sq=1) per row, padded to the sublane minimum.
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
    q_ref,  # (1, 1, QP, H) — row's query, padded to QP rows
    k_ref,  # (1, BS, hd) block (selected via the table in the index_map)
    v_ref,  # (1, BS, hd)
    *refs,  # [k_scale (1, BS, 1), v_scale (1, BS, 1)] when int8  | then:
    #         o_ref, m/l/acc scratch
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
    n = pl.program_id(1)
    i = pl.program_id(2)
    QP, H = q_ref.shape[2], q_ref.shape[3]

    @pl.when(i == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = lens_ref[b, 0]
    n_blocks = (length + block_size - 1) // block_size

    @pl.when(i < n_blocks)
    def _step():
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (QP, H)
        k = k_ref[0].astype(jnp.float32)  # (BS, H) — this (b,n)'s kv head
        v = v_ref[0].astype(jnp.float32)
        if kv_int8:  # per-token-per-head scales: slice this program's kv head
            kv_head = n // heads_per_kv
            k = k * ks_ref[0, :, pl.ds(kv_head, 1)].astype(jnp.float32)
            v = v * vs_ref[0, :, pl.ds(kv_head, 1)].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (QP, BS)
        slot = i * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (QP, block_size), 1
        )
        s = jnp.where(slot < length, s, NEG_INF)
        m_prev, l_prev, acc_prev = m_ref[:], l_ref[:], acc_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_ref[:] = m_new
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_prev * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(i == pl.num_programs(2) - 1)
    def _finish():
        l = l_ref[:]
        safe_l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / safe_l).astype(o_ref.dtype)


def _min_sublane(dtype) -> int:
    return 16 if dtype == jnp.bfloat16 else 8


def _dense_reference(q, k_pool, v_pool, tables, lens, k_scales, v_scales,
                     scale):
    """XLA fallback for kernel-unsafe shapes (the kernel's per-head KV block
    is a slice of the trailing Nkv*hd dim, so Mosaic needs hd % 128 == 0 —
    true for the 7B flagship, not for tiny test models on a real TPU)."""
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
    # Mosaic tiling: the per-head KV block slices the trailing Nkv*hd dim;
    # the (1, BS, hd) KV tile also needs BS to be a sublane multiple for the
    # POOL dtype (16 for bf16, 32 for int8) — small block sizes fall back
    bs_min = 32 if kv_int8 else _min_sublane(k_pool.dtype)
    kernel_safe = BS % bs_min == 0 and (hd % 128 == 0 or Nkv == 1)
    if not interpret and not kernel_safe:
        return _dense_reference(q, k_pool, v_pool, block_tables, context_lens,
                                k_scales, v_scales, scale)
    max_blocks = block_tables.shape[1]

    QP = _min_sublane(q.dtype)
    # one padded query tile per (row, head); only sublane 0 is a real query
    qt = jnp.zeros((B, N, QP, H), q.dtype).at[:, :, 0, :].set(q)

    kp = k_pool.reshape(num_blocks, BS, Nkv * hd)
    vp = v_pool.reshape(num_blocks, BS, Nkv * hd)
    lens = context_lens.reshape(B, 1).astype(jnp.int32)

    # kv block index comes from the prefetched table; the head offset selects
    # this program's kv head (GQA: n // heads_per_kv)
    def kv_index(b, n, i, tables, lens):
        return (tables[b, i], 0, n // heads_per_kv)

    in_specs = [
        pl.BlockSpec((1, 1, QP, H), lambda b, n, i, tables, lens: (b, n, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BS, hd), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, BS, hd), kv_index, memory_space=pltpu.VMEM),
    ]
    operands = [qt, kp, vp]
    if kv_int8:
        # full scale rows per block ((BS, Nkv) satisfies the tiling rule);
        # the kernel slices out its kv head
        def scale_index(b, n, i, tables, lens):
            return (tables[b, i], 0, 0)

        ks = k_scales.reshape(num_blocks, BS, Nkv)
        vs = v_scales.reshape(num_blocks, BS, Nkv)
        in_specs += [
            pl.BlockSpec((1, BS, Nkv), scale_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BS, Nkv), scale_index, memory_space=pltpu.VMEM),
        ]
        operands += [ks, vs]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # tables, lens
        grid=(B, N, max_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, QP, H), lambda b, n, i, tables, lens: (b, n, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((QP, 1), jnp.float32),
            pltpu.VMEM((QP, 1), jnp.float32),
            pltpu.VMEM((QP, H), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_kernel, scale=scale, block_size=BS,
            heads_per_kv=heads_per_kv, kv_int8=kv_int8,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, N, QP, H), q.dtype),
        interpret=interpret,
    )(block_tables.astype(jnp.int32), lens, *operands)
    return out[:, :, 0, :]
