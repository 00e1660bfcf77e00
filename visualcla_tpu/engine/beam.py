"""Beam search — HF-semantics ``num_beams > 1`` greedy decoding.

The reference's generation surface carries ``num_beams`` (HF GenerationConfig,
default 1 in DEFAULT_GENERATION_CONFIG).  This implements HF beam search for
the ``inputs_embeds`` path (returned ids are generated-only):

- device: one jitted step = forward(last beam tokens) -> log-softmax ->
  top-2*nb candidates over (beams × vocab); plus a jitted cache-reorder+append;
- host: HF ``BeamSearchScorer`` bookkeeping re-implemented (candidate order,
  EOS hypotheses with ``score / len**length_penalty`` normalization at add
  time, worst-hypothesis eviction, ``is_done`` early-stopping rule).

Host-driving the loop keeps every device program small (the per-step programs
also sidestep the tunnel's large-program compile limits — see DEVNOTES.md).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama, visualcla


def _reorder_tail(cache: dict, beam_idx, prompt_len: int,
                  end: int | None = None) -> dict:
    """Beam-reorder only the LIVE generated KV tail.

    Every beam descends from one shared prefill, so cache slots
    ``[0, prompt_len)`` are identical across the beam axis and slots at or
    beyond the current write slot hold identical zeros — gathering the whole
    ``(L, nb, Nkv, Smax, hd)`` buffer per step (the naive ``v[:, beam_idx]``)
    pays whole-cache HBM traffic to move bytes that cannot differ.  Gather
    the ``[prompt_len, end)`` window only and write it back in place:
    ``end`` is the static decode cap (Scap), NOT the kernel-block-rounded
    allocation Smax — the rounding slack (up to 256 slots) is zeros forever
    and gathering it measured +~4 ms/token of the fused beam's 5.8 ms/token
    reorder cost at nb=4 S=512 (tools/probe_beam_attrib.py round 5).
    Both bounds are static, so the slice shapes are static and XLA updates
    the carry buffer in place.
    """
    def r(v):
        # slot axis is 3 for every cache leaf: k/v are (L, B, Nkv, S, hd),
        # int8-KV scales are (L, B, Nkv, S)  (models/llama.py:init_kv_cache)
        hi = v.shape[3] if end is None else min(end, v.shape[3])
        tail = jax.lax.slice_in_dim(v, prompt_len, hi, axis=3)
        tail = tail[:, beam_idx]
        idx = (slice(None), slice(None), slice(None),
               slice(prompt_len, hi))
        return v.at[idx].set(tail)

    return {k: r(v) for k, v in cache.items()}


@dataclasses.dataclass
class _Hyp:
    ids: np.ndarray
    score: float  # length-normalized


class BeamHypotheses:
    """HF BeamHypotheses: keep the best ``num_beams`` finished candidates."""

    def __init__(self, num_beams: int, length_penalty: float,
                 early_stopping: bool):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.early_stopping = early_stopping
        self.hyps: List[_Hyp] = []
        self.worst_score = 1e9

    def add(self, ids: np.ndarray, sum_logprob: float) -> None:
        score = sum_logprob / (len(ids) ** self.length_penalty)
        if len(self.hyps) < self.num_beams or score > self.worst_score:
            self.hyps.append(_Hyp(ids=ids, score=score))
            if len(self.hyps) > self.num_beams:
                worst = min(range(len(self.hyps)), key=lambda i: self.hyps[i].score)
                del self.hyps[worst]
            self.worst_score = min(h.score for h in self.hyps)

    def is_done(self, best_sum_logprob: float, cur_len: int) -> bool:
        if len(self.hyps) < self.num_beams:
            return False
        if self.early_stopping:
            return True
        return self.worst_score >= best_sum_logprob / (
            cur_len ** self.length_penalty
        )

    def best(self) -> np.ndarray:
        return max(self.hyps, key=lambda h: h.score).ids

    def best_n(self, n: int) -> List[np.ndarray]:
        """Top-n finished hypotheses, best first (HF finalize with
        num_return_sequences=n: sorted-by-score selection)."""
        return [h.ids for h in
                sorted(self.hyps, key=lambda h: -h.score)[:n]]


def beam_generate(
    params,
    cfg,
    input_ids: np.ndarray,  # (1, S)
    pixel_values: Optional[np.ndarray],
    img_start_pos: Optional[np.ndarray],
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    max_seq_len: Optional[int] = None,
    dtype=jnp.float32,
    num_return_sequences: int = 1,
) -> np.ndarray:
    """HF-equivalent beam search over the composite model.  Returns the best
    hypothesis' generated-only ids (EOS included when it terminated one).
    With ``num_return_sequences`` n > 1 (HF GenerationConfig surface, the
    reference's DEFAULT_GENERATION_CONFIG carries it at modeling_utils.py:44),
    returns a list of the top-n hypotheses, best first."""
    if input_ids.shape[0] != 1:
        raise ValueError(
            f"beam search supports batch size 1, got {input_ids.shape[0]} "
            "(prefill builds a single-row cache that fans out to num_beams)"
        )
    nb = num_beams
    S = input_ids.shape[1]
    Smax = max_seq_len or (S + max_new_tokens)
    text_cfg = cfg.text_config

    @jax.jit
    def prefill(params, ids, img_pos, pix):
        embeds = visualcla.multimodal_embeds(
            params, cfg, ids, img_pos, pix
        )
        cache = llama.init_kv_cache(text_cfg, 1, Smax, dtype)
        mask = jnp.ones((1, S), jnp.int32)
        kv_valid = jnp.concatenate(
            [jnp.ones((1, S), bool), jnp.zeros((1, Smax - S), bool)], -1
        )
        positions = jnp.arange(S, dtype=jnp.int32)[None]
        hidden, cache = llama.forward(
            params["text"], text_cfg, embeds, positions, cache, kv_valid,
            jnp.int32(0),
        )
        logits = llama.logits(params["text"], hidden[:, -1:, :])[:, 0]
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), cache

    @jax.jit
    def step(params, cache, kv_valid, tokens, beam_scores, slot, pos):
        """Forward the nb beams one token; return top-2nb candidates + cache."""
        kv_valid = kv_valid.at[:, slot].set(True)
        embeds = llama.embed(params["text"], tokens[:, None])
        hidden, cache = llama.forward(
            params["text"], text_cfg, embeds,
            jnp.full((nb, 1), pos, jnp.int32), cache, kv_valid, slot,
        )
        logits = llama.logits(params["text"], hidden)[:, 0]
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        flat = (beam_scores[:, None] + logprobs).reshape(-1)
        top_scores, top_idx = jax.lax.top_k(flat, 2 * nb)
        V = logprobs.shape[-1]
        return top_scores, top_idx // V, top_idx % V, cache, kv_valid

    @jax.jit
    def reorder(cache, beam_idx):
        return _reorder_tail(cache, beam_idx, S)

    img_pos = (jnp.asarray(img_start_pos, jnp.int32)
               if img_start_pos is not None else jnp.full((1,), -1, jnp.int32))
    pix = jnp.asarray(pixel_values, dtype) if pixel_values is not None else None
    logprobs0, cache1 = prefill(
        params, jnp.asarray(input_ids, jnp.int32), img_pos, pix
    )

    # expand to nb beams; HF seeds beam 0 at score 0, others at -1e9 so the
    # first step picks the top-nb distinct tokens of the shared distribution
    cache = {k: jnp.repeat(v, nb, axis=1) for k, v in cache1.items()}
    kv_valid = jnp.concatenate(
        [jnp.ones((nb, S), bool), jnp.zeros((nb, Smax - S), bool)], -1
    )
    beam_scores = np.full((nb,), -1e9, np.float32)
    beam_scores[0] = 0.0
    flat0 = (beam_scores[:, None] + np.asarray(logprobs0)[0][None, :]).reshape(-1)
    top_idx = np.argsort(-flat0)[: 2 * nb]
    top_scores = flat0[top_idx]
    V = logprobs0.shape[-1]
    cand = [(float(s), int(i) // V, int(i) % V) for s, i in zip(top_scores, top_idx)]

    hyp = BeamHypotheses(nb, length_penalty, early_stopping)
    gen = [np.zeros((0,), np.int64) for _ in range(nb)]
    next_beams: List[Tuple[float, int, int]] = []
    slot, pos = S, S

    gen_synced = False
    for step_i in range(max_new_tokens):
        # host bookkeeping: pick nb continuations, route EOS into hypotheses
        next_beams: List[Tuple[float, int, int]] = []
        gen_synced = False
        for score, b, tok in cand:
            if tok == eos_token_id:
                hyp.add(np.append(gen[b], eos_token_id), score)
            else:
                next_beams.append((score, b, tok))
            if len(next_beams) == nb:
                break
        while len(next_beams) < nb:  # degenerate: pad with worst candidate
            next_beams.append((-1e9, 0, pad_token_id))
        cur_len = step_i + 1
        if hyp.is_done(max(s for s, _, _ in cand), cur_len) or slot >= Smax:
            break
        scores = np.asarray([s for s, _, _ in next_beams], np.float32)
        beam_idx = np.asarray([b for _, b, _ in next_beams], np.int32)
        tokens = np.asarray([t for _, _, t in next_beams], np.int32)
        gen = [np.append(gen[b], t) for b, t in zip(beam_idx, tokens)]
        gen_synced = True  # gen[j] now matches next_beams[j] (incl. its token)
        cache = reorder(cache, jnp.asarray(beam_idx))
        if step_i == max_new_tokens - 1:
            break
        ts, bi, tk, cache, kv_valid = step(
            params, cache, kv_valid, jnp.asarray(tokens),
            jnp.asarray(scores), jnp.int32(slot), jnp.int32(pos),
        )
        slot += 1
        pos += 1
        cand = list(zip(np.asarray(ts).tolist(), np.asarray(bi).tolist(),
                        np.asarray(tk).tolist()))

    # finalize: open beams become hypotheses (HF finalize when not done early)
    if len(hyp.hyps) < nb and next_beams:
        order = np.argsort(-np.asarray([s for s, _, _ in next_beams]))
        for j in order:
            s, b, t = next_beams[int(j)]
            # when the loop broke before the gen update (is_done / cache-full
            # break), next_beams[j] continues OLD beam b with token t — pair
            # the score with those ids, not with gen[j]
            ids = gen[int(j)] if gen_synced else np.append(gen[b], t)
            hyp.add(ids, s)
            if len(hyp.hyps) >= nb:
                break
    if num_return_sequences > 1:
        return hyp.best_n(num_return_sequences)
    return hyp.best()


def beam_sample_generate(
    params,
    cfg,
    input_ids: np.ndarray,  # (1, S)
    pixel_values: Optional[np.ndarray],
    img_start_pos: Optional[np.ndarray],
    sampling,  # SamplingConfig (num_beams, temperature/top_k/top_p, penalties)
    *,
    eos_token_id: int,
    pad_token_id: int = 0,
    seed: int = 0,
    max_seq_len: Optional[int] = None,
    dtype=jnp.float32,
) -> np.ndarray:
    """HF ``beam_sample`` (num_beams > 1 AND do_sample=True), transformers 4.30
    semantics: per-beam log-softmax -> logits processors -> + beam scores ->
    warpers -> flatten over (nb, V) -> softmax -> multinomial WITHOUT
    replacement of 2*nb candidates (Gumbel-top-k here — the exact equivalent)
    -> sort by score -> BeamSearchScorer bookkeeping (shared with beam search).
    RNG differs from torch, so parity is distributional, not bit-level."""
    from .sampling import (
        apply_no_repeat_ngram, apply_repetition_penalty, warp_temperature,
        warp_top_k, warp_top_p,
    )

    if input_ids.shape[0] != 1:
        raise ValueError(
            f"beam sampling supports batch size 1, got {input_ids.shape[0]} "
            "(prefill builds a single-row cache that fans out to num_beams)"
        )
    nb = sampling.num_beams
    max_new_tokens = sampling.max_new_tokens
    S = input_ids.shape[1]
    Smax = max_seq_len or (S + max_new_tokens)
    text_cfg = cfg.text_config

    def candidates(logits, beam_scores, gen_ids, gen_len, key):
        """(nb, V) raw logits -> 2*nb sampled (score, beam, token)."""
        logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        T = gen_ids.shape[1]
        gen_valid = jnp.arange(T)[None, :] < gen_len[:, None]
        if sampling.repetition_penalty != 1.0:
            logprobs = apply_repetition_penalty(
                logprobs, gen_ids, gen_valid, sampling.repetition_penalty)
        if sampling.no_repeat_ngram_size > 0:
            logprobs = apply_no_repeat_ngram(
                logprobs, gen_ids, gen_len, sampling.no_repeat_ngram_size)
        scores = logprobs + beam_scores[:, None]
        # HF beam_sample applies the warpers AFTER adding beam scores, with
        # min_tokens_to_keep=2 when num_beams > 1 (transformers
        # _get_logits_warper) so the 2*nb draw always has real candidates
        if sampling.temperature != 1.0:
            scores = warp_temperature(scores, sampling.temperature)
        if sampling.top_k > 0:
            scores = warp_top_k(scores, max(sampling.top_k, 2))
        if sampling.top_p < 1.0:
            scores = warp_top_p(scores, sampling.top_p, min_tokens_to_keep=2)
        flat = scores.reshape(1, -1)
        # multinomial without replacement == top-k of logits + Gumbel noise
        g = jax.random.gumbel(key, flat.shape, jnp.float32)
        noisy = jax.nn.log_softmax(flat, -1) + g
        _, top_idx = jax.lax.top_k(noisy, 2 * nb)
        top_scores = jnp.take_along_axis(flat, top_idx, axis=-1)
        order = jnp.argsort(-top_scores, axis=-1)
        top_scores = jnp.take_along_axis(top_scores, order, -1)[0]
        top_idx = jnp.take_along_axis(top_idx, order, -1)[0]
        V = logits.shape[-1]
        return top_scores, top_idx // V, top_idx % V

    @jax.jit
    def prefill(params, ids, img_pos, pix, key):
        embeds = visualcla.multimodal_embeds(params, cfg, ids, img_pos, pix)
        cache = llama.init_kv_cache(text_cfg, 1, Smax, dtype)
        kv_valid = jnp.concatenate(
            [jnp.ones((1, S), bool), jnp.zeros((1, Smax - S), bool)], -1
        )
        positions = jnp.arange(S, dtype=jnp.int32)[None]
        hidden, cache = llama.forward(
            params["text"], text_cfg, embeds, positions, cache, kv_valid,
            jnp.int32(0),
        )
        logits = llama.logits(params["text"], hidden[:, -1:, :])[:, 0]
        beam_scores = jnp.full((nb,), -1e9, jnp.float32).at[0].set(0.0)
        gen_ids = jnp.zeros((nb, max_new_tokens), jnp.int32)
        ts, bi, tk = candidates(
            jnp.repeat(logits, nb, axis=0), beam_scores, gen_ids,
            jnp.zeros((nb,), jnp.int32), key,
        )
        return ts, bi, tk, cache

    @jax.jit
    def step(params, cache, kv_valid, tokens, beam_scores, gen_ids, gen_len,
             slot, pos, key):
        kv_valid = kv_valid.at[:, slot].set(True)
        embeds = llama.embed(params["text"], tokens[:, None])
        hidden, cache = llama.forward(
            params["text"], text_cfg, embeds,
            jnp.full((nb, 1), pos, jnp.int32), cache, kv_valid, slot,
        )
        logits = llama.logits(params["text"], hidden)[:, 0]
        ts, bi, tk = candidates(logits, beam_scores, gen_ids, gen_len, key)
        return ts, bi, tk, cache, kv_valid

    @jax.jit
    def reorder(cache, beam_idx):
        return _reorder_tail(cache, beam_idx, S)

    img_pos = (jnp.asarray(img_start_pos, jnp.int32)
               if img_start_pos is not None else jnp.full((1,), -1, jnp.int32))
    pix = jnp.asarray(pixel_values, dtype) if pixel_values is not None else None
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    ts, bi, tk, cache1 = prefill(
        params, jnp.asarray(input_ids, jnp.int32), img_pos, pix, sub
    )
    cache = {k: jnp.repeat(v, nb, axis=1) for k, v in cache1.items()}
    kv_valid = jnp.concatenate(
        [jnp.ones((nb, S), bool), jnp.zeros((nb, Smax - S), bool)], -1
    )
    cand = list(zip(np.asarray(ts).tolist(), np.asarray(bi).tolist(),
                    np.asarray(tk).tolist()))

    hyp = BeamHypotheses(nb, sampling.length_penalty, sampling.early_stopping)
    gen = [np.zeros((0,), np.int64) for _ in range(nb)]
    next_beams: List[Tuple[float, int, int]] = []
    slot, pos = S, S

    gen_synced = False
    for step_i in range(max_new_tokens):
        next_beams = []
        gen_synced = False
        for score, b, tok in cand:
            if tok == eos_token_id:
                hyp.add(np.append(gen[b], eos_token_id), score)
            else:
                next_beams.append((score, b, tok))
            if len(next_beams) == nb:
                break
        while len(next_beams) < nb:
            next_beams.append((-1e9, 0, pad_token_id))
        cur_len = step_i + 1
        if hyp.is_done(max(s for s, _, _ in cand), cur_len) or slot >= Smax:
            break
        scores = np.asarray([s for s, _, _ in next_beams], np.float32)
        beam_idx = np.asarray([b for _, b, _ in next_beams], np.int32)
        tokens = np.asarray([t for _, _, t in next_beams], np.int32)
        gen = [np.append(gen[b], t) for b, t in zip(beam_idx, tokens)]
        gen_synced = True  # gen[j] now matches next_beams[j] (incl. its token)
        cache = reorder(cache, jnp.asarray(beam_idx))
        if step_i == max_new_tokens - 1:
            break
        gen_buf = np.zeros((nb, max_new_tokens), np.int32)
        for j, g in enumerate(gen):
            gen_buf[j, : len(g)] = g
        key, sub = jax.random.split(key)
        ts, bi, tk, cache, kv_valid = step(
            params, cache, kv_valid, jnp.asarray(tokens), jnp.asarray(scores),
            jnp.asarray(gen_buf), jnp.full((nb,), cur_len, jnp.int32),
            jnp.int32(slot), jnp.int32(pos), sub,
        )
        slot += 1
        pos += 1
        cand = list(zip(np.asarray(ts).tolist(), np.asarray(bi).tolist(),
                        np.asarray(tk).tolist()))

    if len(hyp.hyps) < nb and next_beams:
        order = np.argsort(-np.asarray([s for s, _, _ in next_beams]))
        for j in order:
            s, b, t = next_beams[int(j)]
            # when the loop broke before the gen update (is_done / cache-full
            # break), next_beams[j] continues OLD beam b with token t — pair
            # the score with those ids, not with gen[j]
            ids = gen[int(j)] if gen_synced else np.append(gen[b], t)
            hyp.add(ids, s)
            if len(hyp.hyps) >= nb:
                break
    nrs = getattr(sampling, "num_return_sequences", 1)
    if nrs > 1:
        return hyp.best_n(nrs)
    return hyp.best()


def beam_generate_fused(
    params,
    cfg,
    input_ids: np.ndarray,  # (1, S)
    pixel_values: Optional[np.ndarray],
    img_start_pos: Optional[np.ndarray],
    *,
    num_beams: int,
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    early_stopping: bool = False,
    max_seq_len: Optional[int] = None,
    dtype=jnp.float32,
    structure: str = "auto",  # "nested" | "flat" | "auto" (HBM-fit pick)
) -> np.ndarray:
    """Device-side beam search: ONE fused jitted program runs the whole
    candidate-selection / hypothesis / reorder / forward loop on device.

    Exact same semantics as ``beam_generate`` (the host-driven HF
    BeamSearchScorer re-implementation above, which is HF-parity tested) —
    but with zero per-step host round trips, which matters under the axon
    tunnel where every dispatch costs ~10ms.  The scorer state (hypothesis
    ids/lengths/scores, worst-score eviction, is_done early stopping) lives
    in fixed-shape arrays inside the ``lax.while_loop`` carry.

    ``structure``: like Engine._decode_loop, the per-step forward either
    scans the layers ("nested" — faster, but XLA pins ~3/16 of the stacked
    weight bytes as relayouted q/k/v copies at batch>=4) or runs one FLAT
    while over step x layer ("flat" — fits 7B bf16 on a 16GB chip).
    "auto" picks nested when the relayout copies fit HBM."""
    if input_ids.shape[0] != 1:
        raise ValueError(
            f"beam search supports batch size 1, got {input_ids.shape[0]}"
        )
    nb = num_beams
    T = max_new_tokens
    S = input_ids.shape[1]
    # Scap is the CALLER's decode cap (HF cache-limit semantics — the host
    # beam_generate stops at it); Smax is the cache ALLOCATION, aligned to
    # the flash kernel's kv block so the stacked-cache read never pads (a
    # pad would copy the whole cache in-loop).  Stop conditions must use
    # Scap, not the rounded Smax, to stay bit-identical to beam_generate.
    Scap = max_seq_len or (S + max_new_tokens)
    Smax = -(-Scap // 128) * 128
    if Smax > 256:
        Smax = -(-Smax // 256) * 256
    text_cfg = cfg.text_config
    lp = float(length_penalty)
    NEG = jnp.float32(-1e9)
    if structure == "auto":
        import os

        from .generate import hbm_limit

        structure = os.environ.get("VISUALCLA_BEAM_LOOP", "auto")
        if structure not in ("flat", "nested"):
            params_b = sum(
                int(np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree.leaves(params)
            )
            structure = ("nested"
                         if params_b * (1 + 3 / 16) + 1.5e9 < hbm_limit()
                         else "flat")

    def hyp_add(hyp, ids_row, length, sum_logprob, enabled):
        """HF BeamHypotheses.add, vectorized: insert while count < nb, else
        evict the worst when the new score beats it."""
        hyp_ids, hyp_len, hyp_score, count = hyp
        score = sum_logprob / (jnp.asarray(length, jnp.float32) ** lp)
        worst = jnp.where(
            jnp.arange(nb) < count, hyp_score, jnp.inf
        ).min()
        can = enabled & ((count < nb) | (score > worst))
        write = jnp.where(
            count < nb, count,
            jnp.argmin(jnp.where(jnp.arange(nb) < count, hyp_score, jnp.inf)),
        )
        hyp_ids = jnp.where(can, hyp_ids.at[write].set(ids_row), hyp_ids)
        hyp_len = jnp.where(can, hyp_len.at[write].set(length), hyp_len)
        hyp_score = jnp.where(can, hyp_score.at[write].set(score), hyp_score)
        count = count + jnp.where(can & (count < nb), 1, 0)
        return (hyp_ids, hyp_len, hyp_score, count)

    def hyp_worst(hyp):
        _, _, hyp_score, count = hyp
        return jnp.where(jnp.arange(nb) < count, hyp_score, jnp.inf).min()

    def process_candidates(cand_s, cand_b, cand_t, gen, i, hyp):
        """The host loop 'route EOS into hypotheses, collect nb non-EOS
        continuations, stop once full'.

        COMMON step (no EOS among the 2nb candidates — every step of a
        sequence except its last): the continuations are simply the top nb
        candidates and the hypothesis state is untouched, so a vectorized
        fast path returns them directly.  The sequential fori (whose
        hyp-eviction order is the exactness contract vs HF) runs only under
        ``lax.cond`` when an EOS candidate exists — the fori's 2nb serial
        iterations measured ~8 ms/token of the fused beam's step cost at
        nb=4 (tools/probe_beam_attrib.py round 5), paid now only on the
        rare EOS steps.  The cond's operands are nb-sized arrays + the
        (nb, T) hypothesis buffers — no cache rides through it (the
        round-2 cond-wrapped-forward relayout trap does not apply)."""

        def fast(cand_s, cand_b, cand_t, gen, i, hyp):
            return cand_s[:nb], cand_b[:nb], cand_t[:nb], hyp

        def slow(cand_s, cand_b, cand_t, gen, i, hyp):
            next_s = jnp.full((nb,), NEG, jnp.float32)
            next_b = jnp.zeros((nb,), jnp.int32)
            next_t = jnp.full((nb,), jnp.int32(pad_token_id))
            next_count = jnp.int32(0)

            def one(c, carry):
                next_s, next_b, next_t, next_count, hyp = carry
                active = next_count < nb  # host breaks once nb set
                tok = cand_t[c]
                is_eos = tok == eos_token_id
                eos_ids = gen[cand_b[c]].at[i].set(eos_token_id)
                hyp = hyp_add(hyp, eos_ids, i + 1, cand_s[c], active & is_eos)
                take = active & ~is_eos
                w = jnp.minimum(next_count, nb - 1)
                next_s = jnp.where(take, next_s.at[w].set(cand_s[c]), next_s)
                next_b = jnp.where(take, next_b.at[w].set(cand_b[c]), next_b)
                next_t = jnp.where(take, next_t.at[w].set(tok), next_t)
                next_count = next_count + jnp.where(take, 1, 0)
                return next_s, next_b, next_t, next_count, hyp

            next_s, next_b, next_t, _, hyp = jax.lax.fori_loop(
                0, 2 * nb, one, (next_s, next_b, next_t, next_count, hyp)
            )
            return next_s, next_b, next_t, hyp

        return jax.lax.cond(
            jnp.any(cand_t == eos_token_id), slow, fast,
            cand_s, cand_b, cand_t, gen, i, hyp)

    def forward_step(params_, cache, kv_valid, tokens, beam_scores, slot, pos):
        kv_valid = kv_valid.at[:, slot].set(True)
        embeds = llama.embed(params_["text"], tokens[:, None])
        hidden, cache = llama.forward(
            params_["text"], text_cfg, embeds,
            jnp.full((nb, 1), pos, jnp.int32), cache, kv_valid, slot,
        )
        lg = llama.logits(params_["text"], hidden)[:, 0]
        logprobs = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        flat = (beam_scores[:, None] + logprobs).reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, 2 * nb)
        V = logprobs.shape[-1]
        return top_s, top_i // V, top_i % V, cache, kv_valid

    def is_done(hyp, best_cand, cur_len):
        count = hyp[3]
        return (count >= nb) & (
            jnp.bool_(early_stopping)
            | (hyp_worst(hyp) >= best_cand
               / (jnp.asarray(cur_len, jnp.float32) ** lp))
        )

    def _flat_beam_while(params_, carry0):
        """One while over (step x layer) — the Engine-flat-loop structure,
        which avoids the scan-at-batch>=4 q/k/v relayout copies so 7B bf16
        beams fit a 16GB chip.  Step-boundary work (reorder, embed, logits,
        top-k, candidate routing) runs under lax.cond at layer 0 / L-1."""
        text = params_["text"]
        L = jax.tree.leaves(text["layers"])[0].shape[0]
        H = text_cfg.hidden_size
        from ..ops.norms import rms_norm
        from ..ops.rope import rope_table

        carry0 = dict(carry0, li=jnp.int32(0),
                      h=jnp.zeros((nb, 1, H), dtype))

        def cond(c):
            return ~c["stop"]  # stop only flips at step boundaries (li wraps)

        def body(c):
            li = c["li"]

            def start(c):
                cache = _reorder_tail(c["cache"], c["beams"], S, end=Scap)
                return dict(
                    c, cache=cache,
                    kv_valid=c["kv_valid"].at[:, c["slot"]].set(True),
                    h=llama.embed(text, c["tokens"][:, None]).astype(dtype),
                )

            c = jax.lax.cond(li == 0, start, lambda c: c, c)
            cos, sin = rope_table(
                jnp.full((nb, 1), c["pos"], jnp.int32), text_cfg.head_dim,
                text_cfg.rope_theta)
            from ..ops import quantization as qz

            rest_leaves, packed_leaves = qz.split_stacked_grouped(
                text["layers"])
            # packed-int4 leaves stay stacked (lazy layer index) — see
            # qz.split_stacked_grouped
            p_l = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0,
                                                       keepdims=False),
                rest_leaves,
            )
            p_l = {**p_l, **qz.attach_layer(packed_leaves, li)}
            h, cache = llama.layer_forward(
                p_l, text_cfg, c["h"], cos, sin, c["cache"], c["kv_valid"],
                c["slot"], li)
            c = dict(c, h=h, cache=cache)

            def finish(c):
                i = c["i"]
                hidden = rms_norm(c["h"], text["final_norm"],
                                  text_cfg.rms_norm_eps)
                lg = llama.logits(text, hidden)[:, 0]
                logprobs = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
                flat = (c["scores"][:, None] + logprobs).reshape(-1)
                cand_s, top_i = jax.lax.top_k(flat, 2 * nb)
                V = logprobs.shape[-1]
                cand_b, cand_t = top_i // V, top_i % V
                next_s, next_b, next_t, hyp = process_candidates(
                    cand_s, cand_b, cand_t, c["gen"], i, c["hyp"])
                next_gen = c["gen"][next_b].at[:, i].set(next_t)
                stop = (is_done(hyp, cand_s.max(), i + 1)
                        | (c["slot"] + 1 >= Scap) | (i + 1 >= T))
                return dict(
                    c, gen=next_gen, scores=next_s, beams=next_b,
                    tokens=next_t, slot=c["slot"] + 1, pos=c["pos"] + 1,
                    i=i + 1, hyp=hyp, stop=stop,
                    last_next=(next_s, next_gen, i + 1),
                )

            c = jax.lax.cond(li == L - 1, finish, lambda c: c, c)
            return dict(c, li=(li + 1) % L)

        c = jax.lax.while_loop(cond, body, carry0)
        c.pop("li"), c.pop("h")
        return c

    @functools.partial(jax.jit, donate_argnames=("cache",))
    def fused_loop(params_, cache, cand_s, cand_b, cand_t):
        # PURE-DATAFLOW loop: all stop conditions live in the while COND, and
        # the body is straight-line (reorder -> forward -> process -> update).
        # Wrapping the forward in lax.cond branches made XLA materialize
        # whole-weight relayout copies (3x 1GB q/k/v_proj) + pre-update cache
        # copies — an OOM'ing 4.5GB of transient at 7B (see the round-2 OOM
        # dump in DEVNOTES).  Iteration i of this loop runs host-loop step
        # i's forward at the TOP, so "stop before the next forward" becomes
        # the loop condition instead of an in-body branch.
        kv_valid = jnp.concatenate(
            [jnp.ones((nb, S), bool), jnp.zeros((nb, Smax - S), bool)], -1
        )
        gen0 = jnp.zeros((nb, T), jnp.int32)
        hyp0 = (jnp.zeros((nb, T), jnp.int32), jnp.zeros((nb,), jnp.int32),
                jnp.full((nb,), NEG, jnp.float32), jnp.int32(0))
        # host-loop step 0: process the prefill candidates
        next_s, next_b, next_t, hyp = process_candidates(
            cand_s, cand_b, cand_t, gen0, 0, hyp0)
        next_gen = gen0[next_b].at[:, 0].set(next_t)
        stop0 = is_done(hyp, cand_s.max(), 1) | (S >= Scap) | (T <= 1)
        carry0 = dict(
            gen=next_gen, scores=next_s, beams=next_b, tokens=next_t,
            cache=cache, kv_valid=kv_valid, slot=jnp.int32(S),
            pos=jnp.int32(S), i=jnp.int32(1), hyp=hyp, stop=stop0,
            last_next=(next_s, next_gen, jnp.int32(1)),
        )

        def cond(c):
            return ~c["stop"]

        def body(c):
            i = c["i"]
            cache = _reorder_tail(c["cache"], c["beams"], S, end=Scap)
            cand_s, cand_b, cand_t, cache, kv_valid = forward_step(
                params_, cache, c["kv_valid"], c["tokens"], c["scores"],
                c["slot"], c["pos"])
            next_s, next_b, next_t, hyp = process_candidates(
                cand_s, cand_b, cand_t, c["gen"], i, c["hyp"])
            next_gen = c["gen"][next_b].at[:, i].set(next_t)
            stop = (is_done(hyp, cand_s.max(), i + 1)
                    | (c["slot"] + 1 >= Scap) | (i + 1 >= T))
            return dict(
                gen=next_gen, scores=next_s, beams=next_b, tokens=next_t,
                cache=cache, kv_valid=kv_valid, slot=c["slot"] + 1,
                pos=c["pos"] + 1, i=i + 1, hyp=hyp, stop=stop,
                last_next=(next_s, next_gen, i + 1),
            )

        if structure == "flat":
            c = _flat_beam_while(params_, carry0)
        else:
            c = jax.lax.while_loop(cond, body, carry0)

        # finalize: open beams become hypotheses in score order while room
        hyp = c["hyp"]
        last_s, last_gen, last_len = c["last_next"]
        order = jnp.argsort(-last_s)

        def fin(j, hyp):
            k = order[j]
            return hyp_add(hyp, last_gen[k], last_len, last_s[k],
                           hyp[3] < nb)

        hyp = jax.lax.fori_loop(0, nb, fin, hyp)
        hyp_ids, hyp_len, hyp_score, count = hyp
        best = jnp.argmax(
            jnp.where(jnp.arange(nb) < count, hyp_score, -jnp.inf))
        # the final cache is returned (and dropped by the caller) so the
        # donated input has an output to alias: without it the donation is
        # unusable (JAX donation is strictly input->output aliasing) and the
        # whole prefill cache stays live for the call — the round-3 "Some
        # donated buffers were not usable" warning.
        return hyp_ids[best], hyp_len[best], c["cache"]

    @jax.jit
    def prefill(params_, ids, img_pos, pix):
        embeds = visualcla.multimodal_embeds(params_, cfg, ids, img_pos, pix)
        cache = llama.init_kv_cache(text_cfg, 1, Smax, dtype)
        kv_valid = jnp.concatenate(
            [jnp.ones((1, S), bool), jnp.zeros((1, Smax - S), bool)], -1
        )
        positions = jnp.arange(S, dtype=jnp.int32)[None]
        hidden, cache = llama.forward(
            params_["text"], text_cfg, embeds, positions, cache, kv_valid,
            jnp.int32(0),
        )
        lg = llama.logits(params_["text"], hidden[:, -1:, :])[:, 0]
        logprobs = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
        beam_scores = jnp.full((nb,), -1e9, jnp.float32).at[0].set(0.0)
        flat = (beam_scores[:, None] + logprobs[0][None, :]).reshape(-1)
        top_s, top_i = jax.lax.top_k(flat, 2 * nb)
        V = logprobs.shape[-1]
        cache = {k: jnp.repeat(v, nb, axis=1) for k, v in cache.items()}
        return top_s, top_i // V, top_i % V, cache

    img_pos = (jnp.asarray(img_start_pos, jnp.int32)
               if img_start_pos is not None else jnp.full((1,), -1, jnp.int32))
    pix = jnp.asarray(pixel_values, dtype) if pixel_values is not None else None
    ts, bi, tk, cache = prefill(
        params, jnp.asarray(input_ids, jnp.int32), img_pos, pix
    )
    ids, n, final_cache = fused_loop(params, cache, ts, bi, tk)
    del final_cache  # output exists only to alias the donated input cache
    return np.asarray(ids)[: int(n)]
