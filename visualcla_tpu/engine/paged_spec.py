"""Speculative decoding INSIDE the paged serving pool (vLLM-grade serving).

Round-4 verdict item 4: the measured 1.6x single-stream speculative win
(`engine/speculative.py`, BENCHMARKS round 4) never reached the production
serving path — the paged pool stepped every row one token per dispatch.
This module adds per-row prompt-lookup drafts and ONE batched Sq=K+1
verify forward for the whole pool:

  draft    per-row n-gram match over the row's FULL token history
           (prompt + generated — ``PagedState.all_ids``; the single-stream
           version drafted from generated tokens only, which starves
           prompt-copy workloads like summarization/multi-turn replay)
  verify   one forward of (B, K+1) tokens through the text tower; query j
           sits at rope position positions+j and appends KV at pool slot
           lens-1+j.  Rejected-slot KV needs NO rollback: every later step
           rewrites slots from its own base before attention can see them
           (attention for query j covers slots <= lens-1+j only).
  accept   greedy rows accept the longest draft prefix matching the
           model's own argmax chain and always gain >= 1 token (the
           standard prompt-lookup contract, exact for greedy); rows with
           live sampling/processor knobs (do_sample, rep-pen, ngram-block,
           mirostat, top-k) fall back to committing exactly one token from
           the verify step's j=0 logits via the SAME rowwise sampler as
           the plain step — per-row, inside one program, no pool split.

The verify attention is the XLA dense-gather formulation (scatter the K+1
new tokens, gather the row's blocks, causal-masked attention) — the
correctness-defining reference and the CPU test path.  The Sq>1 fused
append+attend Pallas kernel is a measured follow-up; the dispatch-level
win (tokens/dispatch = 1 + E[accepted]) dominates at low pool occupancy
where decode is weight-bandwidth-bound.

Replaces: nothing in the reference (HF generate has no speculative path);
the north-star decode tokens/s/chip role of BASELINE.md.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.llama import rms_norm
from ..ops.linear import linear as _linear
from ..ops.quantization import quantize_kv
from ..ops.rope import apply_rope, rope_table
from .speculative import ngram_draft


def draft_all_rows(all_ids: jnp.ndarray, total_len: jnp.ndarray, k: int,
                   max_ngram: int) -> jnp.ndarray:
    """(B, C) token history + (B,) valid lengths -> (B, k) drafts."""
    return jax.vmap(
        lambda ctx, end: ngram_draft(ctx, jnp.int32(0), end, k, max_ngram)
    )(all_ids, total_len.astype(jnp.int32))


def _dense_verify_attention(q, kp_l, vp_l, tables, base, run, ks_l, vs_l,
                            scale, block_size):
    """Causal paged attention for Sq queries per row, XLA dense gather.

    q: (B, Sq, N, hd) rope'd queries; kp_l/vp_l: (NB, BS, Nkv*hd) the
    layer's pool (new tokens already scattered); base: (B,) pool slot of
    query 0 (== lens-1).  Query j attends slots <= base+j.  Parked rows
    (run=False) attend slot 0 only (output unused)."""
    B, Sq, N, hd = q.shape
    NB, BS, KVL = kp_l.shape
    Nkv = KVL // hd
    rep = N // Nkv

    def row(qb, tb, bs, rn):
        k = kp_l[tb].reshape(-1, Nkv, hd).astype(jnp.float32)  # (S, Nkv, hd)
        v = vp_l[tb].reshape(-1, Nkv, hd).astype(jnp.float32)
        if ks_l is not None:
            k = k * ks_l[tb].reshape(-1, Nkv)[..., None].astype(jnp.float32)
            v = v * vs_l[tb].reshape(-1, Nkv)[..., None].astype(jnp.float32)
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        s = jnp.einsum("jnh,snh->njs", qb.astype(jnp.float32) * scale, k)
        slot = jnp.arange(k.shape[0])[None, None, :]
        lim = jnp.where(rn, bs + jnp.arange(Sq), 0)[None, :, None]
        s = jnp.where(slot <= lim, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("njs,snh->jnh", p, v).astype(qb.dtype)

    return jax.vmap(row)(q, tables.astype(jnp.int32), base.astype(jnp.int32),
                         run)


def paged_verify_forward(params, cfg, embeds, positions, k_pool, v_pool,
                         k_scales, v_scales, tables, base, run,
                         block_size: int, act):
    """Forward (B, Sq) speculative tokens over the paged pool.

    embeds (B, Sq, H); positions (B, Sq) rope positions; base (B,) pool
    slot of token 0 (token j -> slot base+j).  Returns (hidden, pools...).
    Slots landing past the row's table (or on parked rows) write dummy
    block 0 — never attended, overwritten by later admissions."""
    B, Sq, H = embeds.shape
    hd = cfg.head_dim
    N, Nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    BS = block_size
    NB = k_pool.shape[1]
    max_blocks = tables.shape[1]
    scale = 1.0 / (hd ** 0.5)
    cos, sin = rope_table(positions, hd, cfg.rope_theta)

    # per-(row, j) append targets; invalid slots -> dummy block 0
    slots = base[:, None] + jnp.arange(Sq, dtype=jnp.int32)[None, :]  # (B,Sq)
    blk_idx = jnp.clip(slots // BS, 0, max_blocks - 1)
    blk = jnp.take_along_axis(tables.astype(jnp.int32), blk_idx, axis=1)
    valid = run[:, None] & (slots // BS < max_blocks) & (slots >= 0)
    blk = jnp.where(valid, blk, 0)
    off = jnp.where(valid, slots % BS, 0)

    from ..ops import quantization as qz

    rest_leaves, packed_leaves = qz.split_stacked_grouped(params["layers"])
    int8_kv = k_scales is not None

    def layer(carry, xs):
        h, kp, vp, ks, vs = carry
        p, l = xs
        p = {**p, **qz.attach_layer(packed_leaves, l)}
        x = rms_norm(h, p["input_norm"], cfg.rms_norm_eps)
        q = _linear(x, p["q_proj"]).reshape(B, Sq, N, hd)
        k = _linear(x, p["k_proj"]).reshape(B, Sq, Nkv, hd)
        v = _linear(x, p["v_proj"]).reshape(B, Sq, Nkv, hd)
        q, k = apply_rope(q, k, cos, sin)
        KVL = Nkv * hd
        lidx = jnp.broadcast_to(l, blk.shape)
        if int8_kv:
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            kp = kp.at[lidx, blk, off].set(kq.reshape(B, Sq, KVL))
            vp = vp.at[lidx, blk, off].set(vq.reshape(B, Sq, KVL))
            ks = ks.at[lidx, blk, off].set(ksc)
            vs = vs.at[lidx, blk, off].set(vsc)
        else:
            kp = kp.at[lidx, blk, off].set(
                k.reshape(B, Sq, KVL).astype(kp.dtype))
            vp = vp.at[lidx, blk, off].set(
                v.reshape(B, Sq, KVL).astype(vp.dtype))
        kp_l = jax.lax.dynamic_index_in_dim(kp, l, 0, keepdims=False)
        vp_l = jax.lax.dynamic_index_in_dim(vp, l, 0, keepdims=False)
        ks_l = (jax.lax.dynamic_index_in_dim(ks, l, 0, keepdims=False)
                if int8_kv else None)
        vs_l = (jax.lax.dynamic_index_in_dim(vs, l, 0, keepdims=False)
                if int8_kv else None)
        attn = _dense_verify_attention(
            q, kp_l, vp_l, tables, base, run, ks_l, vs_l, scale, BS)
        h = h + _linear(attn.reshape(B, Sq, N * hd), p["o_proj"])
        x2 = rms_norm(h, p["post_norm"], cfg.rms_norm_eps)
        gate = act(_linear(x2, p["gate_proj"])) * _linear(x2, p["up_proj"])
        h = h + _linear(gate, p["down_proj"])
        return (h, kp, vp, ks, vs), None

    L = cfg.num_hidden_layers
    (h, k_pool, v_pool, k_scales, v_scales), _ = jax.lax.scan(
        layer, (embeds, k_pool, v_pool, k_scales, v_scales),
        (rest_leaves, jnp.arange(L, dtype=jnp.int32)),
    )
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, k_pool, v_pool, k_scales, v_scales


def spec_eligible(state) -> jnp.ndarray:
    """(B,) rows whose committed tokens are a pure argmax chain — the rows
    speculative acceptance is EXACT for.  Any live sampling/processor knob
    (sampling, rep-pen, ngram block, mirostat, per-row top-k) drops the row
    to the 1-token-per-iteration fallback inside the same program."""
    return (~state.do_sample
            & (state.rep_pen == 1.0)
            & (state.ngram == 0)
            & ~state.miro
            & (state.top_k == 0))
