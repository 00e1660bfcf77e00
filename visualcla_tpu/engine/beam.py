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
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama, visualcla


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
) -> np.ndarray:
    """HF-equivalent beam search over the composite model.  Returns the best
    hypothesis' generated-only ids (EOS included when it terminated one)."""
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
        return {k: v[:, beam_idx] for k, v in cache.items()}

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
        return {k: v[:, beam_idx] for k, v in cache.items()}

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
    return hyp.best()
