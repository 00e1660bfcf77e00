"""Ring attention — context parallelism (CP) over a sequence-sharded mesh axis.

Beyond-reference capability (SURVEY.md §5 "long-context / sequence
parallelism": the reference caps context at 2048 and has none —
settings-visualcla.yaml:21).  This is the TPU-native long-context scaling
mechanism: shard the sequence over a ``seq`` mesh axis, keep queries resident,
and rotate K/V shards around the ICI ring with ``lax.ppermute`` while
accumulating attention with an online (flash-style) softmax.  Compute on the
current block overlaps the permute of the next one (XLA schedules the
collective-permute concurrently with the einsums), so the ring adds no
bandwidth stalls at scale.

Math: exact attention — the blockwise online-softmax accumulation is the same
as the Pallas flash kernel's (ops/pallas/flash_attention.py), just with the
"blocks" living on different devices.  Verified bit-close against the dense
XLA reference in tests/test_ring_attention.py on the virtual 8-device mesh.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30  # finite "-inf": keeps the online-softmax recurrence NaN-free


def ring_attention(
    q: jnp.ndarray,  # (B, Sq_local, N, H) — this shard's queries
    k: jnp.ndarray,  # (B, Sk_local, Nkv, H) — this shard's keys
    v: jnp.ndarray,  # (B, Sk_local, Nkv, H)
    q_positions: jnp.ndarray,  # (B, Sq_local) int32 absolute positions
    kv_positions: jnp.ndarray,  # (B, Sk_local) int32 absolute positions
    kv_valid: jnp.ndarray,  # (B, Sk_local) bool
    axis_name: str,
    *,
    causal: bool = True,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention over a sequence sharded on ``axis_name``.

    Must be called inside ``shard_map`` (or any SPMD context) where
    ``axis_name`` is a mesh axis of size P; K/V (+ their position/validity
    metadata) make P-1 hops around the ring.  Masking is by ABSOLUTE position
    (``kv_positions <= q_positions``), so any contiguous or strided sequence
    layout works — each shard just carries its own position ids.
    Returns (B, Sq_local, N, H) in q.dtype.
    """
    n_dev = lax.axis_size(axis_name)
    B, Sq, N, H = q.shape
    Nkv = k.shape[2]
    G = N // Nkv  # grouped-query: G query heads share each K/V head.  K/V stay
    # at Nkv heads on the ring — ICI bytes/hop scale with Nkv, not N; the
    # grouping lives in the einsum instead of a materialized repeat.
    if scale is None:
        scale = H ** -0.5
    qf = (q.astype(jnp.float32) * scale).reshape(B, Sq, Nkv, G, H)

    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    def block_update(m, l, acc, k_c, v_c, kv_pos_c, kv_ok_c):
        """Fold one K/V block into the online-softmax accumulators.

        m, l: (B, Nkv, G, Sq);  acc: (B, Sq, Nkv, G, H)."""
        logits = jnp.einsum(
            "bqngh,bknh->bngqk", qf, k_c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )  # (B, Nkv, G, Sq, Sk)
        ok = kv_ok_c[:, None, None, None, :]
        if causal:
            ok = ok & (
                kv_pos_c[:, None, None, None, :]
                <= q_positions[:, None, None, :, None]
            )
        logits = jnp.where(ok, logits, _NEG)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None]) * ok  # masked lanes contribute 0
        corr = jnp.exp(m - m_new)  # (B, Nkv, G, Sq)
        l_new = l * corr + p.sum(axis=-1)
        pv = jnp.einsum(
            "bngqk,bknh->bqngh", p, v_c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr.transpose(0, 3, 1, 2)[..., None] + pv
        return m_new, l_new, acc_new

    def block(carry, _):
        m, l, acc, k_c, v_c, kv_pos_c, kv_ok_c = carry
        # rotate first (P-1 hops total: the local block was folded before the
        # scan), then fold the arriving block; XLA overlaps the
        # collective-permute with the previous block's einsums
        k_c, v_c, kv_pos_c, kv_ok_c = (
            lax.ppermute(x, axis_name, perm)
            for x in (k_c, v_c, kv_pos_c, kv_ok_c)
        )
        m, l, acc = block_update(m, l, acc, k_c, v_c, kv_pos_c, kv_ok_c)
        return (m, l, acc, k_c, v_c, kv_pos_c, kv_ok_c), None

    # derive the accumulators from qf so they carry q's varying-axes (vma)
    # annotation — plain constants would mismatch the ppermute'd carries
    # under shard_map's type check
    m0 = qf[..., 0].transpose(0, 2, 3, 1) * 0.0 + _NEG  # (B, Nkv, G, Sq)
    l0 = m0 * 0.0
    acc0 = qf * 0.0  # (B, Sq, Nkv, G, H) fp32
    kv_ok = kv_valid.astype(bool)
    m0, l0, acc0 = block_update(m0, l0, acc0, k, v, kv_positions, kv_ok)
    (m, l, acc, *_), _ = lax.scan(
        block, (m0, l0, acc0, k, v, kv_positions, kv_ok),
        None, length=n_dev - 1,
    )
    l = jnp.maximum(l, 1e-30)  # fully-masked queries (padding) emit zeros
    out = acc / l.transpose(0, 3, 1, 2)[..., None]
    return out.reshape(B, Sq, N, H).astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,  # (B, S, N, H) — global arrays (GSPMD shards them)
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    *,
    seq_axis: str = "seq",
    kv_valid: Optional[jnp.ndarray] = None,  # (B, S) bool
    causal: bool = True,
) -> jnp.ndarray:
    """Convenience wrapper: shard_map ``ring_attention`` over ``mesh``.

    Sequence is split contiguously on ``seq_axis``; if the mesh also has
    ``data``/``model`` axes, batch and heads shard there too (ring hops are
    per-(batch, head) independent, so CP composes freely with DP and TP).
    """
    B, S, N, H = q.shape
    n_seq = mesh.shape[seq_axis]
    if S % n_seq:
        raise ValueError(f"sequence {S} not divisible by {seq_axis}={n_seq}")
    data = "data" if "data" in mesh.axis_names and B % mesh.shape["data"] == 0 else None
    model = (
        "model"
        if "model" in mesh.axis_names
        and N % mesh.shape["model"] == 0
        and k.shape[2] % mesh.shape["model"] == 0
        else None
    )
    qs = P(data, seq_axis, model, None)
    ms = P(data, seq_axis)

    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    if kv_valid is None:
        kv_valid = jnp.ones((B, S), bool)

    fn = jax.shard_map(
        partial(ring_attention, axis_name=seq_axis, causal=causal),
        mesh=mesh,
        in_specs=(qs, qs, qs, ms, ms, ms),
        out_specs=qs,
    )
    return fn(q, k, v, positions, positions, kv_valid)
