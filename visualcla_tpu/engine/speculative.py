"""Prompt-lookup speculative decoding — greedy-exact in exact arithmetic.

The reference has no speculative decoding (HF ``generate`` at
/root/reference/models/visualcla/modeling_visualcla.py:382-391 is strictly
one-token-per-step); this is a TPU-native performance feature on top of the
same contract: outputs are **token-identical** to ``Engine.generate`` for any
deterministic config (``do_sample=False``, processors allowed) **in exact
arithmetic** — proven bit-identical in the CPU f32/f64 tests.

PRECISION SCOPE (measured round 3, ``tools/bench_speculative.py``): on TPU
bf16 the Sq=K+1 verify forward and the Sq=1 plain decode forward are
*different XLA programs* (different attention kernel shapes, different
reduction orders), so an argmax near-tie can resolve differently — observed
once in 192 tokens at 134M (first flip @ token 139; the repetitive-prompt
run had none).  This is the same numerics class as batched-vs-single decode
(``Engine.generate`` at B=8 vs B=1 also reorders reductions, see
tests/test_serving.py's f64 note) — NOT an approximation: every emitted
token is the verify program's own greedy choice, and within the speculative
stream the function is deterministic.  Treat "greedy-exact" as exact per
numeric program, not bit-exact across program shapes on bf16 hardware.

Why it is nearly free on TPU: decode is HBM-bandwidth-bound — each step streams
all weights once.  A (K+1)-token verify chunk streams the weights once too, so
a chunk costs about one plain step but can emit up to K+1 tokens.  Drafts come
from *prompt lookup* (n-gram continuation reuse, arXiv-style "prompt lookup
decoding"): find the most recent earlier occurrence of the last n-gram in
[prompt ; generated] and copy the K tokens that followed it.  No draft model,
no extra weights, and wrong drafts cannot corrupt output — acceptance compares
drafts against the model's own greedy choice, so any accepted token is by
definition the token normal decode would have produced.

Everything (draft, verify, accept, cache rollback) runs inside one
``lax.while_loop`` — zero host round-trips until generation finishes, which
matters doubly under the axon tunnel.

KV-cache rollback uses the validity mask: rejected draft tokens' cache slots
are simply re-marked invalid (the next chunk overwrites them), so rollback is
O(1) bookkeeping, not a copy.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import llama
from .generate import DecodeState, Engine
from .sampling import SamplingConfig, sample_step, warped_logits


@dataclasses.dataclass
class SpecState:
    """Per-row decode state (rows advance unevenly under speculation)."""

    cache: dict
    kv_valid: jnp.ndarray  # (B, Smax) bool
    cur_slot: jnp.ndarray  # (B,) int32 — next cache slot per row
    positions: jnp.ndarray  # (B,) int32 — next rope position per row
    gen_ids: jnp.ndarray  # (B, T + K + 1) int32
    gen_len: jnp.ndarray  # (B,) int32
    last_token: jnp.ndarray  # (B,) int32
    finished: jnp.ndarray  # (B,) bool
    mu: jnp.ndarray  # (B,) fp32 (mirostat state pass-through, unused for greedy)
    key: jax.Array  # PRNG state (speculative SAMPLING accept/resample draws)
    chunks: jnp.ndarray  # () int32 — number of verify chunks run
    emitted: jnp.ndarray  # () int32 — total tokens emitted (all rows)
    row_chunks: jnp.ndarray  # () int32 — sum over chunks of ACTIVE rows (rows
    # that emitted >=1 token that chunk) — denominator for acceptance stats


jax.tree_util.register_dataclass(
    SpecState,
    data_fields=[
        "cache", "kv_valid", "cur_slot", "positions", "gen_ids", "gen_len",
        "last_token", "finished", "mu", "key", "chunks", "emitted",
        "row_chunks",
    ],
    meta_fields=[],
)


# ---------------------------------------------------------------------------
# drafting: prompt-lookup (n-gram continuation)
# ---------------------------------------------------------------------------

def ngram_draft(
    ctx: jnp.ndarray,  # (C,) int32 — [prompt ; generated] token buffer
    start: jnp.ndarray,  # () int32 — first valid index (left-padded prompts)
    end: jnp.ndarray,  # () int32 — one past the last valid token
    k: int,
    max_ngram: int,
) -> jnp.ndarray:
    """Draft ``k`` tokens for one row.

    For n = max_ngram..1, find the most recent position i < end-n whose window
    ctx[i:i+n] equals the context's last n tokens ctx[end-n:end]; the draft is
    the k tokens following that window.  Larger n wins.  With no match the
    draft repeats the last token — harmless, the verifier rejects bad drafts.
    """
    C = ctx.shape[0]
    ctx_pad = jnp.concatenate([ctx, jnp.zeros((k,), ctx.dtype)])
    pos = jnp.arange(C, dtype=jnp.int32)

    best_pos = jnp.int32(-1)
    best_n = jnp.int32(0)
    for n in range(1, max_ngram + 1):  # ascending: later (larger-n) wins ties
        if n >= C:
            break
        tgt_start = jnp.maximum(end - n, 0)
        target = jax.lax.dynamic_slice(ctx, (tgt_start,), (n,))
        # window at i covers ctx[i:i+n]; build the n shifted comparisons
        m = jnp.ones((C,), bool)
        for j in range(n):
            shifted = jnp.roll(ctx, -j)  # shifted[i] = ctx[i+j] (wraps; masked below)
            m = m & (shifted == target[j])
        ok = (
            m
            & (pos >= start)
            & (pos + n < end)  # strictly earlier occurrence
            & (end - n >= start)  # enough context for the target itself
        )
        cand = jnp.max(jnp.where(ok, pos, -1))
        hit = cand >= 0
        best_pos = jnp.where(hit, cand + n, best_pos)  # continuation start
        best_n = jnp.where(hit, jnp.int32(n), best_n)

    fallback = jnp.full((k,), 0, jnp.int32)
    last = ctx_pad[jnp.maximum(end - 1, 0)]
    fallback = fallback + last
    drafted = jax.lax.dynamic_slice(ctx_pad, (jnp.maximum(best_pos, 0),), (k,))
    return jnp.where(best_pos >= 0, drafted, fallback).astype(jnp.int32)


# ---------------------------------------------------------------------------
# the fused speculative loop
# ---------------------------------------------------------------------------

def _has_processors(cfg: SamplingConfig) -> bool:
    return (
        cfg.repetition_penalty != 1.0
        or cfg.no_repeat_ngram_size > 0
        or cfg.min_new_tokens > 0
    )


def _verify_parallel(logits: jnp.ndarray) -> jnp.ndarray:
    """Pure-greedy verify: argmax at every chunk position at once. (B,K+1)->ids."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def _verify_with_processors(
    logits: jnp.ndarray,  # (B, K+1, V) fp32
    gen_ids: jnp.ndarray,  # (B, T) generated buffer (drafts NOT yet written)
    gen_len: jnp.ndarray,  # (B,)
    drafts: jnp.ndarray,  # (B, K)
    mu: jnp.ndarray,
    cfg: SamplingConfig,
) -> jnp.ndarray:
    """Greedy verify under context-dependent processors (rep-penalty /
    no-repeat-ngram / min-new-tokens).

    Position j's processor context is the real generated prefix plus drafts
    d_1..d_j *hypothetically accepted*.  For every position up to and including
    the first mismatch the hypothesis equals reality, so accepted tokens are
    exactly what sequential decode would emit."""
    B, K1, _ = logits.shape
    K = K1 - 1

    # hypothetical gen buffer: drafts written at gen_len (per-row)
    def put(row, d, s):
        return jax.lax.dynamic_update_slice(row, d, (s,))

    hyp_ids = jax.vmap(put)(gen_ids, drafts, gen_len)
    dummy_key = jax.random.PRNGKey(0)

    def step(j, preds):
        tok, _ = sample_step(
            logits[:, j], hyp_ids, gen_len + j, dummy_key, mu, cfg
        )
        return preds.at[:, j].set(tok)

    preds = jnp.zeros((B, K1), jnp.int32)
    return jax.lax.fori_loop(0, K1, step, preds)


def _verify_sampled(
    logits: jnp.ndarray,  # (B, K+1, V) fp32
    gen_ids: jnp.ndarray,
    gen_len: jnp.ndarray,
    drafts: jnp.ndarray,  # (B, K)
    key: jax.Array,
    cfg: SamplingConfig,
) -> jnp.ndarray:
    """Speculative SAMPLING verify — exact in distribution.

    The prompt-lookup draft is deterministic (q = delta at d), so the
    standard speculative-sampling rule reduces to: accept d with probability
    p(d); on rejection draw from p restricted to tokens != d (renormalized);
    the bonus position (all drafts accepted) draws from the full p.  The
    marginal at every position is exactly p — the same distribution plain
    sampled decode uses — though the realized tokens differ from plain decode
    under the same seed (different RNG consumption)."""
    B, K1, V = logits.shape
    K = K1 - 1

    def put(row, d, s):
        return jax.lax.dynamic_update_slice(row, d, (s,))

    hyp_ids = jax.vmap(put)(gen_ids, drafts, gen_len)
    keys = jax.random.split(key, K1)

    def step(j, preds):
        w = warped_logits(logits[:, j], hyp_ids, gen_len + j, cfg)  # (B, V)
        k_acc, k_res = jax.random.split(keys[j])
        is_last = j == K
        d = drafts[:, jnp.minimum(j, K - 1)]
        p_d = jnp.take_along_axis(
            jax.nn.softmax(w, axis=-1), d[:, None], axis=1
        )[:, 0]
        u = jax.random.uniform(k_acc, (B,))
        accept = (u < p_d) & ~is_last
        w_masked = jnp.where(
            jnp.arange(V)[None, :] == d[:, None], float(jnp.finfo(jnp.float32).min), w
        )
        # degenerate guard: if ALL mass sat on d, rejection is measure-zero but
        # fp rounding could still land here — resample from the full dist then
        empty = jnp.max(w_masked, axis=-1) <= jnp.finfo(jnp.float32).min / 2
        full_src = empty | is_last  # (B,) — bonus position or degenerate mask
        resample_src = jnp.where(full_src[:, None], w, w_masked)
        resample = jax.random.categorical(k_res, resample_src, axis=-1)
        pred_j = jnp.where(accept, d, resample).astype(jnp.int32)
        return preds.at[:, j].set(pred_j)

    preds = jnp.zeros((B, K1), jnp.int32)
    return jax.lax.fori_loop(0, K1, step, preds)


def spec_chunk(
    params,
    cfg_text,
    state: SpecState,
    prompt_ids: jnp.ndarray,  # (B, L) left-padded prompt (engine bucket layout)
    prompt_start: jnp.ndarray,  # (B,) int32 — index of first real prompt token
    sampling: SamplingConfig,
    *,
    eos_token_id: int,
    pad_token_id: int,
    spec_k: int,
    max_ngram: int,
) -> SpecState:
    """One draft→verify→accept step.  Emits 1..K+1 tokens per active row."""
    B, L = prompt_ids.shape
    K = spec_k
    Smax = state.cache["k"].shape[3]
    Tbuf = state.gen_ids.shape[1]

    # ---- draft ----
    ctx = jnp.concatenate([prompt_ids, state.gen_ids], axis=1)  # (B, L+Tbuf)
    drafts = jax.vmap(
        lambda c, s, e: ngram_draft(c, s, e, K, max_ngram)
    )(ctx, prompt_start, jnp.int32(L) + state.gen_len)  # (B, K)

    chunk = jnp.concatenate([state.last_token[:, None], drafts], axis=1)  # (B, K+1)

    # ---- forward the chunk at per-row slots ----
    ar = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    written = (ar >= state.cur_slot[:, None]) & (ar < (state.cur_slot + K + 1)[:, None])
    kv_valid_fwd = state.kv_valid | written
    chunk_pos = state.positions[:, None] + jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    embeds = llama.embed(params["text"], chunk)
    hidden, cache = llama.forward(
        params["text"], cfg_text, embeds, chunk_pos,
        state.cache, kv_valid_fwd, state.cur_slot,
    )
    logits = llama.logits(params["text"], hidden)  # (B, K+1, V) fp32

    # ---- verify ----
    key = state.key
    if sampling.do_sample:  # speculative sampling (exact in distribution)
        key, sub = jax.random.split(key)
        preds = _verify_sampled(
            logits, state.gen_ids, state.gen_len, drafts, sub, sampling
        )
    elif _has_processors(sampling):
        preds = _verify_with_processors(
            logits, state.gen_ids, state.gen_len, drafts, state.mu, sampling
        )
    else:
        preds = _verify_parallel(logits)

    match = chunk[:, 1:] == preds[:, :-1]  # (B, K) draft_i vs model's choice
    acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # (B,)
    n_emit = acc + 1

    j_idx = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    emit_mask = j_idx <= acc[:, None]
    is_eos = (preds == eos_token_id) & emit_mask
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
    n_emit = jnp.where(any_eos, jnp.minimum(n_emit, first_eos + 1), n_emit)

    remaining = jnp.maximum(sampling.max_new_tokens - state.gen_len, 0)
    n_emit = jnp.minimum(n_emit, remaining)
    n_emit = jnp.where(state.finished, 0, n_emit).astype(jnp.int32)

    # ---- write emitted tokens ----
    out_tokens = jnp.where(j_idx < n_emit[:, None], preds, pad_token_id)

    def put(row, toks, s):
        return jax.lax.dynamic_update_slice(row, toks, (s,))

    gen_ids = jax.vmap(put)(state.gen_ids, out_tokens.astype(jnp.int32), state.gen_len)

    new_last = jnp.take_along_axis(
        preds, jnp.maximum(n_emit - 1, 0)[:, None], axis=1
    )[:, 0]
    new_last = jnp.where(n_emit > 0, new_last, state.last_token)

    # ---- cache rollback: keep kv for [cur_slot, cur_slot + n_emit) only ----
    keep = ar < (state.cur_slot + n_emit)[:, None]
    kv_valid = jnp.where(written, written & keep, state.kv_valid)

    eos_emitted = any_eos & (first_eos < n_emit)
    gen_len = state.gen_len + n_emit
    finished = state.finished | eos_emitted | (gen_len >= sampling.max_new_tokens)

    return SpecState(
        cache=cache,
        kv_valid=kv_valid,
        cur_slot=state.cur_slot + n_emit,
        positions=state.positions + n_emit,
        gen_ids=gen_ids,
        gen_len=gen_len,
        last_token=new_last,
        finished=finished,
        mu=state.mu,
        key=key,
        chunks=(state.chunks + 1).astype(jnp.int32),
        emitted=(state.emitted + jnp.sum(n_emit)).astype(jnp.int32),
        row_chunks=(state.row_chunks + jnp.sum(n_emit > 0)).astype(jnp.int32),
    )


def _spec_loop(
    params, cfg_text, state: SpecState, prompt_ids, prompt_start,
    sampling: SamplingConfig, *, eos_token_id: int, pad_token_id: int,
    spec_k: int, max_ngram: int,
):
    Smax = state.cache["k"].shape[3]

    def cond(s: SpecState):
        room = jnp.min(
            jnp.where(s.finished, jnp.int32(Smax), Smax - (s.cur_slot + spec_k + 1))
        )
        return ~jnp.all(s.finished) & (room >= 0)

    def body(s: SpecState):
        return spec_chunk(
            params, cfg_text, s, prompt_ids, prompt_start, sampling,
            eos_token_id=eos_token_id, pad_token_id=pad_token_id,
            spec_k=spec_k, max_ngram=max_ngram,
        )

    return jax.lax.while_loop(cond, body, state)


# ---------------------------------------------------------------------------
# engine integration
# ---------------------------------------------------------------------------

class SpeculativeDecoder:
    """Wraps an :class:`Engine` with prompt-lookup speculative generation.

    ``generate`` is token-identical to ``Engine.generate`` for deterministic
    sampling configs.  Caches its own jitted loop per (spec_k, max_ngram)."""

    def __init__(self, engine: Engine, spec_k: int = 8, max_ngram: int = 3):
        if spec_k < 1:
            raise ValueError("spec_k must be >= 1")
        self.engine = engine
        self.spec_k = spec_k
        self.max_ngram = max_ngram
        self.last_stats: dict = {}
        # scope trace time to the engine's mesh (like Engine._scoped): under
        # TP the attention dispatch must see the mesh or the flash kernel
        # runs unsharded over GSPMD-sharded operands
        self._loop = engine._scoped(jax.jit(
            _spec_loop,
            static_argnums=(1, 5),  # cfg_text, sampling (hashable dataclasses)
            static_argnames=(
                "eos_token_id", "pad_token_id", "spec_k", "max_ngram",
            ),
            donate_argnums=(2,),
        ))
        self._chunk = engine._scoped(jax.jit(
            spec_chunk,
            static_argnums=(1, 5),
            static_argnames=(
                "eos_token_id", "pad_token_id", "spec_k", "max_ngram",
            ),
            donate_argnums=(2,),
        ))

    def _to_spec_state(self, st: DecodeState, B: int, max_new: int) -> SpecState:
        K = self.spec_k
        Tbuf = max_new + K + 1
        gen_ids = jnp.zeros((B, Tbuf), jnp.int32)
        gen_ids = jax.lax.dynamic_update_slice(
            gen_ids, st.gen_ids[:, :1], (0, 0)
        )  # prefill emitted exactly one token per row
        return SpecState(
            cache=st.cache,
            kv_valid=st.kv_valid,
            cur_slot=jnp.broadcast_to(st.cur_slot, (B,)).astype(jnp.int32),
            positions=st.positions,
            gen_ids=gen_ids,
            gen_len=jnp.ones((B,), jnp.int32),
            last_token=st.last_token,
            finished=st.finished,
            mu=st.mu,
            key=st.key,
            chunks=jnp.int32(0),
            emitted=jnp.int32(B),
            row_chunks=jnp.int32(0),
        )

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        img_start_pos: Optional[np.ndarray] = None,
        sampling: Optional[SamplingConfig] = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Blocking speculative generate; same output contract as Engine.generate
        (per-row pads after EOS, truncated at the longest row)."""
        eng = self.engine
        sampling = sampling or SamplingConfig.greedy()
        if sampling.do_sample and sampling.mirostat_mode == 2:
            raise ValueError(
                "speculative decoding does not support mirostat (stateful "
                "truncation); use Engine.generate"
            )
        input_ids = np.asarray(input_ids, np.int32)
        B, S = input_ids.shape
        with eng.timer.phase("prefill") as p:
            # extra_slots: the last verify chunk may write K+1 cache entries
            st = eng.start(
                input_ids, pixel_values, img_start_pos, sampling, seed,
                extra_slots=self.spec_k + 1,
            )
            p["sync_on"] = st.last_token
        padded, mask = eng.pad_prompt(input_ids)
        prompt_start = (padded.shape[1] - mask.sum(axis=1)).astype(np.int32)

        spec = self._to_spec_state(st, B, sampling.max_new_tokens)
        with eng.timer.phase("decode"):
            spec = self._loop(
                eng.params, eng.cfg.text_config, spec,
                jnp.asarray(padded), jnp.asarray(prompt_start), sampling,
                eos_token_id=eng.eos_token_id, pad_token_id=eng.pad_token_id,
                spec_k=self.spec_k, max_ngram=self.max_ngram,
            )
            gen_len = np.asarray(spec.gen_len)
        chunks = int(spec.chunks)
        emitted = int(spec.emitted)
        row_chunks = int(spec.row_chunks)  # active row-chunks only — rows
        # that finish early stop contributing to the denominator
        self.last_stats = {
            "chunks": chunks,
            "emitted": emitted,
            # prefill emitted B tokens outside any chunk; each active
            # row-chunk emits 1 bonus + 0..K accepted draft tokens
            "tokens_per_chunk": (emitted - B) / max(chunks, 1),
            "acceptance": (emitted - B - row_chunks)
                          / max(row_chunks * self.spec_k, 1),
        }
        from ..utils.profiling import GLOBAL_COUNTERS

        GLOBAL_COUNTERS.add("generated_tokens", int(gen_len.sum()))
        GLOBAL_COUNTERS.add("requests", B)
        GLOBAL_COUNTERS.add("spec_chunks", chunks)
        out = np.asarray(spec.gen_ids)
        max_len = int(gen_len.max()) if B else 0
        out = out[:, :max_len].copy()
        # pad each row beyond its own length (chunk writes may leave draft echos)
        for b in range(B):
            out[b, gen_len[b]:] = eng.pad_token_id
        return out

    def stream(
        self,
        input_ids: np.ndarray,  # (1, S) — streaming is single-request
        pixel_values: Optional[np.ndarray] = None,
        img_start_pos: Optional[np.ndarray] = None,
        sampling: Optional[SamplingConfig] = None,
        seed: int = 0,
    ):
        """Yield (1,) token arrays like ``Engine.stream``, one device dispatch
        per verify chunk — each dispatch can emit up to K+1 tokens, so host
        round trips amortize by the acceptance rate while preserving the
        per-token streaming surface."""
        eng = self.engine
        sampling = sampling or SamplingConfig.greedy()
        if sampling.do_sample and sampling.mirostat_mode == 2:
            raise ValueError("speculative streaming does not support mirostat")
        input_ids = np.asarray(input_ids, np.int32)
        B = input_ids.shape[0]
        if B != 1:
            raise ValueError("speculative streaming supports batch size 1")
        st = eng.start(input_ids, pixel_values, img_start_pos, sampling, seed,
                       extra_slots=self.spec_k + 1)
        padded, mask = eng.pad_prompt(input_ids)
        prompt_start = jnp.asarray(
            (padded.shape[1] - mask.sum(axis=1)).astype(np.int32))
        prompt_ids = jnp.asarray(padded)
        spec = self._to_spec_state(st, B, sampling.max_new_tokens)
        yield np.asarray(spec.last_token)
        emitted = 1
        while (
            not bool(np.all(np.asarray(spec.finished)))
            and emitted < sampling.max_new_tokens
        ):
            spec = self._chunk(
                eng.params, eng.cfg.text_config, spec, prompt_ids,
                prompt_start, sampling,
                eos_token_id=eng.eos_token_id, pad_token_id=eng.pad_token_id,
                spec_k=self.spec_k, max_ngram=self.max_ngram,
            )
            new_len = int(spec.gen_len[0])
            if new_len == emitted:  # finished row emitted nothing
                break
            chunk = np.asarray(spec.gen_ids[0, emitted:new_len])
            for t in chunk:
                yield np.asarray([t])
            emitted = new_len
