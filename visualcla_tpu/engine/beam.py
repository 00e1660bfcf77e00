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

    for step_i in range(max_new_tokens):
        # host bookkeeping: pick nb continuations, route EOS into hypotheses
        next_beams: List[Tuple[float, int, int]] = []
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
            s, _, _ = next_beams[int(j)]
            hyp.add(gen[int(j)], s)
            if len(hyp.hyps) >= nb:
                break
    return hyp.best()
