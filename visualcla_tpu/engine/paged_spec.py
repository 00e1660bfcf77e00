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


def paged_verify_forward(params, cfg, embeds, positions, k_pool, v_pool,
                         k_scales, v_scales, tables, base, run,
                         block_size: int, act):
    """Forward (B, Sq) speculative tokens over the paged pool.

    embeds (B, Sq, H); positions (B, Sq) rope positions; base (B,) pool
    slot of token 0 (token j -> slot base+j).  Returns (hidden, pools...).
    The per-layer append+attend is the fused Sq-token Pallas kernel
    (ops/pallas/paged_attention.py:paged_verify_attention) — the pools ride
    the layer scan aliased in place, no XLA pool scatter ever materializes
    (the same ~16 ms/step-at-7B-B=8 lesson as the decode kernel).  Slots
    landing past the row's table (or on parked rows) write dummy block 0 —
    never attended, overwritten by later admissions."""
    from ..ops.pallas.paged_attention import paged_verify_attention

    B, Sq, H = embeds.shape
    hd = cfg.head_dim
    N, Nkv = cfg.num_attention_heads, cfg.num_key_value_heads
    cos, sin = rope_table(positions, hd, cfg.rope_theta)
    # context length INCLUDING the Sq new tokens.  Parked rows must touch
    # only dummy block 0 — and a parked row's table may be NON-empty (a
    # mid-chunked-admission row has its blocks reserved and its prompt KV
    # half-written), so the mask must zero the TABLE, not just the length.
    lens_total = jnp.where(run, base + Sq, Sq).astype(jnp.int32)
    tables = jnp.where(run[:, None], tables.astype(jnp.int32), 0)

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
        if int8_kv:
            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            attn, kp, vp, ks, vs = paged_verify_attention(
                q, kq, vq, kp, vp, tables, lens_total, l, ksc, vsc, ks, vs)
        else:
            attn, kp, vp, _, _ = paged_verify_attention(
                q, k.astype(kp.dtype), v.astype(vp.dtype), kp, vp, tables,
                lens_total, l)
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
