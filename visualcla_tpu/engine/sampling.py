"""On-device sampling stack, semantics-compatible with the reference.

Replicates HF's logits processors/warpers in the exact order HF applies them for
the reference's DEFAULT_GENERATION_CONFIG (modeling_utils.py:36-47):
repetition penalty -> no-repeat-ngram -> temperature -> top-k -> top-p,
plus the reference's extra samplers installed by ``hijack_samplers``
(modeling_utils.py:250-400): tail-free sampling, top-a, and mirostat-2 (which
replaces every warper except temperature and carries a per-sequence ``mu`` state).

Everything is pure-functional jnp so the whole sampler runs inside the jitted
decode step.  Note HF semantics when generating from ``inputs_embeds`` (the
VisualCLA path, modeling_visualcla.py:382): the penalty/ngram context is the
*generated* tokens only, not the prompt — hence ``gen_ids``/``gen_len`` below.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    """Mirror of the reference's GenerationConfig surface (hashable: jit-static)."""

    max_new_tokens: int = 512
    min_new_tokens: int = 0  # reference min_length=0 (modeling_utils.py:38);
    # counts generated tokens (the inputs_embeds path has no prompt in ids)
    eos_token_id: int = 2
    num_beams: int = 1  # >1 routes VisualCLA.generate through engine/beam.py
    # HF num_return_sequences (reference DEFAULT_GENERATION_CONFIG carries it,
    # modeling_utils.py:44).  Sampled: each input row is expanded n times and
    # sampled independently; beam: top-n hypotheses; greedy without beams
    # requires n == 1 (HF raises the same way).
    num_return_sequences: int = 1
    length_penalty: float = 1.0
    early_stopping: bool = False
    do_sample: bool = True
    temperature: float = 0.5
    top_k: int = 40
    top_p: float = 0.9
    repetition_penalty: float = 1.1
    no_repeat_ngram_size: int = 15
    # extras installed by hijack_samplers (reference modeling_utils.py:386-400)
    tfs: float = 1.0
    top_a: float = 0.0
    mirostat_mode: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1

    @classmethod
    def greedy(cls, max_new_tokens: int = 512) -> "SamplingConfig":
        """Pure greedy decoding (HF do_sample=False with default processors:
        no penalties, no warpers)."""
        return cls(
            max_new_tokens=max_new_tokens,
            do_sample=False,
            temperature=1.0,
            top_k=0,
            top_p=1.0,
            repetition_penalty=1.0,
            no_repeat_ngram_size=0,
        )


def default_sampling_config() -> SamplingConfig:
    """The reference's DEFAULT_GENERATION_CONFIG (modeling_utils.py:36-47)."""
    return SamplingConfig()


# ---------------------------------------------------------------------------
# processors (context-dependent)
# ---------------------------------------------------------------------------

def apply_repetition_penalty(
    logits: jnp.ndarray,  # (B, V) fp32
    gen_ids: jnp.ndarray,  # (B, T) previously generated ids
    gen_valid: jnp.ndarray,  # (B, T) bool
    penalty: float,
) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor: score<0 -> *p, score>=0 -> /p at seen ids."""
    B, V = logits.shape
    seen = jnp.zeros((B, V), bool)
    one = jnp.ones_like(gen_ids, dtype=bool) & gen_valid
    seen = seen.at[jnp.arange(B)[:, None], gen_ids].max(one)
    penalized = jnp.where(logits < 0, logits * penalty, logits / penalty)
    return jnp.where(seen, penalized, logits)


def apply_no_repeat_ngram(
    logits: jnp.ndarray,  # (B, V)
    gen_ids: jnp.ndarray,  # (B, T)
    gen_len: jnp.ndarray,  # (B,) int32 — number of valid generated tokens
    ngram_size: int,
) -> jnp.ndarray:
    """HF NoRepeatNGramLogitsProcessor over the generated-token context.

    Bans token x if [last (n-1) tokens, x] already occurs in the context.
    Vectorized over all windows of the fixed-size gen buffer with validity masks.
    """
    if ngram_size <= 0:
        return logits
    B, T = gen_ids.shape
    n = ngram_size
    if T < n:
        return logits
    # window w (0-indexed): prefix gen_ids[w : w+n-1], banned token gen_ids[w+n-1]
    num_w = T - n + 1
    idx = jnp.arange(num_w)[:, None] + jnp.arange(n - 1)[None, :]  # (num_w, n-1)
    prefixes = gen_ids[:, idx]  # (B, num_w, n-1)
    banned = gen_ids[:, jnp.arange(num_w) + n - 1]  # (B, num_w)
    # current prefix: the last n-1 generated tokens = gen_ids[gen_len-(n-1) : gen_len]
    start = gen_len[:, None] - (n - 1) + jnp.arange(n - 1)[None, :]  # (B, n-1)
    cur = jnp.take_along_axis(gen_ids, jnp.clip(start, 0, T - 1), axis=1)
    match = jnp.all(prefixes == cur[:, None, :], axis=-1)  # (B, num_w)
    # window valid only if fully inside the generated region AND banned token is a
    # *past* token (window end < gen_len) AND we have n-1 tokens of context
    w_ok = (jnp.arange(num_w)[None, :] + n - 1) < gen_len[:, None]
    have_ctx = gen_len[:, None] >= (n - 1)
    match = match & w_ok & have_ctx
    ban_mask = jnp.zeros_like(logits, bool)
    ban_mask = ban_mask.at[jnp.arange(B)[:, None], banned].max(match)
    return jnp.where(ban_mask, NEG_INF, logits)


def apply_no_repeat_ngram_rowwise(
    logits: jnp.ndarray,  # (B, V)
    gen_ids: jnp.ndarray,  # (B, T)
    gen_len: jnp.ndarray,  # (B,) int32
    n: jnp.ndarray,  # (B,) int32 per-row ngram size; n<=0 rows pass through
) -> jnp.ndarray:
    """Per-row :func:`apply_no_repeat_ngram` — the serving pool mixes requests
    with different ``no_repeat_ngram_size`` (HF GenerationConfig surface; the
    reference serves it per generate() call, modeling_utils.py:45), so the
    ngram size is a traced (B,) vector here instead of a static int.

    Same window construction as the static version, with the per-row prefix
    length ``n-1`` masked into a fixed (B, T, T) comparison.  ``n==1``
    degenerates to "ban every previously generated token" (HF semantics:
    empty prefix matches every window)."""
    B, T = gen_ids.shape
    nm1 = jnp.clip(n - 1, 0, T)  # (B,) prefix length
    # current prefix: the last n-1 generated tokens, right-aligned into (B, T)
    start = gen_len[:, None] - nm1[:, None] + jnp.arange(T)[None, :]
    cur = jnp.take_along_axis(gen_ids, jnp.clip(start, 0, T - 1), axis=1)
    # window w's prefix position j is gen_ids[w + j]; only j < n-1 counts
    wj = jnp.arange(T)[:, None] + jnp.arange(T)[None, :]  # (T_w, T_j)
    pref = gen_ids[:, jnp.clip(wj, 0, T - 1)]  # (B, T, T)
    jmask = jnp.arange(T)[None, None, :] < nm1[:, None, None]
    match = jnp.all((pref == cur[:, None, :]) | ~jmask, axis=-1)  # (B, T)
    # banned token = gen_ids[w + n - 1]; window valid only if that token is
    # strictly in the past and the row has n-1 tokens of context
    bpos = jnp.arange(T)[None, :] + nm1[:, None]  # (B, T)
    banned = jnp.take_along_axis(gen_ids, jnp.clip(bpos, 0, T - 1), axis=1)
    match = (match & (bpos < gen_len[:, None])
             & (gen_len[:, None] >= nm1[:, None]) & (n > 0)[:, None])
    ban_mask = jnp.zeros_like(logits, bool)
    ban_mask = ban_mask.at[jnp.arange(B)[:, None], banned].max(match)
    return jnp.where(ban_mask, NEG_INF, logits)


# ---------------------------------------------------------------------------
# warpers (distribution shaping)
# ---------------------------------------------------------------------------

def warp_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    return logits / temperature


def warp_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0:
        return logits
    V = logits.shape[-1]
    k = min(k, V)
    # lax.top_k finds the k-th value without a full-vocab sort (HF keeps ties)
    kth = jax.lax.top_k(logits, k)[0][..., -1][..., None]
    return jnp.where(logits < kth, NEG_INF, logits)


def warp_top_p(logits: jnp.ndarray, p: float, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """HF TopPLogitsWarper: sort ASCENDING, remove tokens whose cumulative prob
    (from the low end) is <= 1-p, always keeping the top ``min_tokens_to_keep``."""
    if p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits, axis=-1)  # ascending
    sorted_idx = jnp.argsort(logits, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - p)
    if min_tokens_to_keep > 0:
        remove_sorted = remove_sorted.at[..., -min_tokens_to_keep:].set(False)
    # scatter back to vocab order
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, sorted_idx, remove_sorted, axis=-1, inplace=False)
    return jnp.where(remove, NEG_INF, logits)


def warp_top_k_top_p_fused(
    logits: jnp.ndarray, k: int, p: float
) -> jnp.ndarray:
    """Fusion of ``warp_top_p(warp_top_k(logits, k), p)`` without full-vocab
    sorts.

    The sequential warpers cost three ~50k-element sorts per decode step
    (top-k's sort, top-p's sort + argsort).  After top-k only ~k logits are
    finite, so top-p's cumulative only needs the top slice: take the top
    M >= k values with ``lax.top_k`` (O(V·log M)), do all masking on that
    (B, M) slice, and scatter the keep-mask back.  Values are never modified —
    both warpers only mask — so the kept set matches the sequential path.

    Degenerate-case handling: a value tie spanning the M boundary (HF's top-k
    keeps every token equal to the k-th value) or a value tie straddling the
    nucleus cutoff (where keep/remove among equal values depends on sort
    order) falls back to the sequential warpers inside ``lax.cond``.  The one
    remaining (sub-ulp) divergence: the cumulative mass here is computed as
    total-minus-exclusive-prefix over the descending slice, whose fp rounding
    can differ from the sequential ascending cumsum exactly at the 1-p
    boundary — never observed in the bit-identity fuzz tests, but not
    mathematically excluded.
    """
    B, V = logits.shape
    if k <= 0 or k >= V:  # top-k inactive; semantics differ — caller guards
        return warp_top_p(warp_top_k(logits, k), p)
    M = min(max(2 * k, 128), V)

    vals, idx = jax.lax.top_k(logits, M)  # (B, M) descending
    kth = vals[:, k - 1 : k]  # threshold value (ties kept, like HF)
    keep_k = vals >= kth
    # tie across the M boundary: tokens beyond M might equal kth → fallback
    tie_risk = (M < V) & jnp.any(vals[:, -1:] >= kth)

    probs = jax.nn.softmax(jnp.where(keep_k, vals, NEG_INF), axis=-1)
    # HF removes ascending-cum <= 1-p ⇔ keep iff inclusive descending
    # suffix mass > 1-p; suffix_inc = total - exclusive prefix
    prefix_exc = jnp.cumsum(probs, axis=-1) - probs
    suffix_inc = jnp.sum(probs, axis=-1, keepdims=True) - prefix_exc
    keep_p = suffix_inc > (1.0 - p)
    # equal values straddling the nucleus cutoff: the sequential path's
    # ascending stable sort may keep a DIFFERENT member of the tied set →
    # fall back (distribution-identical either way, but we promise identity)
    cutoff_tie = jnp.any(
        (vals[:, :-1] == vals[:, 1:]) & (keep_p[:, :-1] != keep_p[:, 1:])
    )
    tie_risk = tie_risk | cutoff_tie

    def fused(_):
        keep = keep_k & keep_p
        keep = keep.at[:, 0].set(True)  # min_tokens_to_keep=1
        out = jnp.full_like(logits, NEG_INF)
        rows = jnp.arange(B)[:, None]
        return out.at[rows, idx].set(jnp.where(keep, vals, NEG_INF))

    def sequential(_):
        return warp_top_p(warp_top_k(logits, k), p)

    return jax.lax.cond(tie_risk, sequential, fused, operand=None)


def warp_tfs(logits: jnp.ndarray, tfs: float, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Tail-free sampling, matching the reference's TailFreeLogitsWarper
    (modeling_utils.py:250-287) including its off-by-the-same boundary handling."""
    if tfs >= 1.0:
        return logits
    V = logits.shape[-1]
    order = jnp.argsort(-logits, axis=-1)  # descending
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))  # (B, V-2)
    norm_d2 = d2 / jnp.sum(d2, axis=-1, keepdims=True)
    cdf = jnp.cumsum(norm_d2, axis=-1)
    remove_mid = cdf > tfs  # (B, V-2)
    B = logits.shape[0]
    remove_sorted = jnp.concatenate(
        [jnp.zeros((B, 1), bool), remove_mid, jnp.ones((B, 1), bool)], axis=-1
    )
    if min_tokens_to_keep > 1:
        remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, order, remove_sorted, axis=-1, inplace=False)
    return jnp.where(remove, NEG_INF, logits)


def warp_top_a(logits: jnp.ndarray, top_a: float, min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Top-A (reference TopALogitsWarper modeling_utils.py:290-313):
    remove tokens with prob < max_prob^2 * top_a."""
    if top_a <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    remove = probs < pmax * pmax * top_a
    if min_tokens_to_keep > 0:
        # keep at least the argmax (always survives the threshold anyway)
        pass
    return jnp.where(remove, NEG_INF, logits)


# ---------------------------------------------------------------------------
# mirostat-2 (stateful)
# ---------------------------------------------------------------------------

def mirostat_step(
    logits: jnp.ndarray,  # (B, V) — already temperature-warped
    mu: jnp.ndarray,  # (B,) fp32
    key: jax.Array,
    tau,  # float or (B,) fp32 — per-row in the serving path
    eta,  # float or (B,) fp32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mirostat v2 (reference MirostatLogitsWarper modeling_utils.py:316-358):
    truncate tokens with surprise (-log2 p) > mu, renormalize, sample, update mu.
    Returns (token (B,), new_mu (B,)).  tau/eta broadcast, so per-row arrays
    work unchanged (sample_step_rowwise passes (B,) knobs)."""
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    surprise = -jnp.log2(jnp.maximum(probs, 1e-30))
    keep = surprise <= mu[:, None]
    keep = keep.at[:, 0].set(True)  # always keep the top token
    trunc = jnp.where(keep, sorted_logits, NEG_INF)
    pick = jax.random.categorical(key, trunc, axis=-1)  # index into sorted order
    token = jnp.take_along_axis(order, pick[:, None], axis=-1)[:, 0]
    token = token.astype(jnp.int32)  # argsort yields int64 under x64 tests
    p_pick = jnp.take_along_axis(
        jax.nn.softmax(trunc, axis=-1), pick[:, None], axis=-1
    )[:, 0]
    observed = -jnp.log2(jnp.maximum(p_pick, 1e-30))
    new_mu = mu - eta * (observed - tau)
    return token, new_mu


# ---------------------------------------------------------------------------
# per-row dynamic warpers (serving: every pool row may carry its own knobs)
# ---------------------------------------------------------------------------

def warp_temperature_rowwise(logits: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """t (B,) fp32; t=1 rows pass through."""
    return logits / jnp.maximum(t, 1e-6)[:, None]


def warp_top_p_rowwise(logits: jnp.ndarray, p: jnp.ndarray,
                       min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """p (B,); p=1 rows pass through (HF semantics otherwise)."""
    sorted_logits = jnp.sort(logits, axis=-1)
    sorted_idx = jnp.argsort(logits, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - p)[:, None]
    if min_tokens_to_keep > 0:
        remove_sorted = remove_sorted.at[..., -min_tokens_to_keep:].set(False)
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, sorted_idx, remove_sorted, axis=-1,
                                inplace=False)
    return jnp.where(remove, NEG_INF, logits)


def apply_repetition_penalty_rowwise(
    logits: jnp.ndarray, gen_ids: jnp.ndarray, gen_valid: jnp.ndarray,
    penalty: jnp.ndarray,  # (B,)
) -> jnp.ndarray:
    B, V = logits.shape
    seen = jnp.zeros((B, V), bool)
    one = jnp.ones_like(gen_ids, dtype=bool) & gen_valid
    seen = seen.at[jnp.arange(B)[:, None], gen_ids].max(one)
    p = penalty[:, None]
    penalized = jnp.where(logits < 0, logits * p, logits / p)
    return jnp.where(seen, penalized, logits)


def warp_tfs_rowwise(logits: jnp.ndarray, tfs: jnp.ndarray,
                     min_tokens_to_keep: int = 1) -> jnp.ndarray:
    """Per-row tail-free sampling (same math as :func:`warp_tfs`, reference
    TailFreeLogitsWarper modeling_utils.py:250-287); rows with tfs >= 1 pass
    through untouched."""
    B, V = logits.shape
    order = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    d2 = jnp.abs(jnp.diff(jnp.diff(probs, axis=-1), axis=-1))
    norm_d2 = d2 / jnp.sum(d2, axis=-1, keepdims=True)
    cdf = jnp.cumsum(norm_d2, axis=-1)
    remove_mid = cdf > tfs[:, None]
    remove_sorted = jnp.concatenate(
        [jnp.zeros((B, 1), bool), remove_mid, jnp.ones((B, 1), bool)], axis=-1
    )
    if min_tokens_to_keep > 1:
        remove_sorted = remove_sorted.at[..., :min_tokens_to_keep].set(False)
    remove = jnp.zeros_like(remove_sorted)
    remove = jnp.put_along_axis(remove, order, remove_sorted, axis=-1,
                                inplace=False)
    remove = remove & (tfs < 1.0)[:, None]
    return jnp.where(remove, NEG_INF, logits)


def warp_top_k_rowwise(logits: jnp.ndarray, k: jnp.ndarray,
                       k_cap: int = 256) -> jnp.ndarray:
    """Per-row top-k; ``k`` (B,) int32, ``k<=0`` rows pass through.

    The common case (every row's k <= ``k_cap``) uses one partial
    ``lax.top_k(logits, k_cap)`` — O(V·log k_cap), same cost class as the
    static warper — and reads each row's k-th value from the (B, k_cap)
    slice.  Rows requesting k > k_cap fall back to a full descending sort
    under ``lax.cond`` (compiled once, executed only when such a request is
    actually in the pool)."""
    V = logits.shape[-1]
    cap = min(k_cap, V)

    def partial(w):
        topv = jax.lax.top_k(w, cap)[0]  # (B, cap)
        kth = jnp.take_along_axis(topv, (jnp.clip(k, 1, cap) - 1)[:, None],
                                  axis=-1)
        return jnp.where(w < kth, NEG_INF, w)

    def full(w):
        sorted_desc = jnp.flip(jnp.sort(w, axis=-1), axis=-1)
        kth = jnp.take_along_axis(sorted_desc,
                                  (jnp.clip(k, 1, V) - 1)[:, None], axis=-1)
        return jnp.where(w < kth, NEG_INF, w)

    out = jax.lax.cond(jnp.all(k <= cap), partial, full, logits)
    return jnp.where((k > 0)[:, None], out, logits)


def warp_top_a_rowwise(logits: jnp.ndarray, top_a: jnp.ndarray) -> jnp.ndarray:
    """Per-row top-A (reference TopALogitsWarper modeling_utils.py:290-313);
    rows with top_a <= 0 pass through (probs < 0 is never true)."""
    probs = jax.nn.softmax(logits, axis=-1)
    pmax = jnp.max(probs, axis=-1, keepdims=True)
    remove = probs < pmax * pmax * top_a[:, None]
    return jnp.where(remove, NEG_INF, logits)


def sample_step_rowwise(
    logits: jnp.ndarray,  # (B, V)
    gen_ids: jnp.ndarray,
    gen_len: jnp.ndarray,
    key: jax.Array,
    cfg: SamplingConfig,  # static engine-wide config (top_k/ngram come from it)
    *,
    temperature: jnp.ndarray,  # (B,)
    top_p: jnp.ndarray,  # (B,)
    repetition_penalty: jnp.ndarray,  # (B,)
    do_sample: jnp.ndarray,  # (B,) bool
    tfs: jnp.ndarray = None,  # (B,) fp32; None/1.0 = off
    top_a: jnp.ndarray = None,  # (B,) fp32; None/0.0 = off
    mirostat: jnp.ndarray = None,  # (B,) bool; mirostat-2 rows
    miro_tau: jnp.ndarray = None,  # (B,) fp32
    miro_eta: jnp.ndarray = None,  # (B,) fp32
    mu: jnp.ndarray = None,  # (B,) fp32 mirostat state
    top_k: jnp.ndarray = None,  # (B,) int32; None = engine-wide cfg.top_k
    ngram: jnp.ndarray = None,  # (B,) int32; None = cfg.no_repeat_ngram_size
):
    """Serving sampler: per-row dynamic knobs over the engine's static
    processor set — the FULL hijacked-sampler surface of the reference
    (modeling_utils.py:250-400): temperature/top-p/repetition-penalty plus
    tail-free, top-a, and mirostat-2 (per-row mu carried in the pool state),
    plus per-row top-k / no-repeat-ngram (HF GenerationConfig knobs the
    reference honors per generate() call, modeling_utils.py:41,45).
    Returns ``(token (B,) int32, new_mu (B,))``.

    The expensive branches — the (B, V) seen-token scatter of the repetition
    penalty, the full-vocab sorts of top-p/tfs/mirostat — run under
    ``lax.cond`` so a step whose rows don't use them skips them entirely
    (measured ~3.5 ms of a 21 ms 7B B=8 paged step when unconditional)."""
    logits = logits.astype(jnp.float32)
    T = gen_ids.shape[1]
    B = logits.shape[0]
    if mu is None:
        mu = jnp.full((B,), 2.0 * cfg.mirostat_tau, jnp.float32)

    def penalized(logits):
        gen_valid = jnp.arange(T)[None, :] < gen_len[:, None]
        return apply_repetition_penalty_rowwise(
            logits, gen_ids, gen_valid, repetition_penalty
        )

    logits = jax.lax.cond(jnp.any(repetition_penalty != 1.0), penalized,
                          lambda l: l, logits)
    if ngram is not None:
        logits = jax.lax.cond(
            jnp.any(ngram > 0),
            lambda l: apply_no_repeat_ngram_rowwise(l, gen_ids, gen_len,
                                                    ngram),
            lambda l: l, logits)
    elif cfg.no_repeat_ngram_size > 0:
        logits = apply_no_repeat_ngram(logits, gen_ids, gen_len,
                                       cfg.no_repeat_ngram_size)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def sampled(logits):
        warped = warp_temperature_rowwise(logits, temperature)
        if top_k is not None:
            warped = jax.lax.cond(
                jnp.any(top_k > 0),
                lambda w: warp_top_k_rowwise(w, top_k), lambda w: w, warped)
        elif cfg.top_k > 0:
            warped = warp_top_k(warped, cfg.top_k)
        warped = warp_top_p_rowwise(warped, top_p)
        if tfs is not None:
            warped = jax.lax.cond(
                jnp.any(tfs < 1.0), lambda w: warp_tfs_rowwise(w, tfs),
                lambda w: w, warped)
        if top_a is not None:
            warped = jax.lax.cond(
                jnp.any(top_a > 0.0), lambda w: warp_top_a_rowwise(w, top_a),
                lambda w: w, warped)
        return jax.random.categorical(key, warped, axis=-1).astype(jnp.int32)

    sampled_tok = jax.lax.cond(jnp.any(do_sample), sampled,
                               lambda l: greedy_tok, logits)
    token = jnp.where(do_sample, sampled_tok, greedy_tok)
    if mirostat is None:
        return token, mu

    miro_rows = mirostat & do_sample

    def miro(args):
        logits_, mu_ = args
        # reference semantics: temperature applies, mirostat replaces every
        # other warper (get_logits_warper_patch, modeling_utils.py:361-383)
        warped = warp_temperature_rowwise(logits_, temperature)
        tok_m, mu2 = mirostat_step(warped, mu_, key, miro_tau, miro_eta)
        return tok_m, mu2

    tok_m, mu2 = jax.lax.cond(
        jnp.any(miro_rows), miro, lambda a: (greedy_tok, a[1]), (logits, mu))
    token = jnp.where(miro_rows, tok_m, token)
    new_mu = jnp.where(miro_rows, mu2, mu)
    return token, new_mu


# ---------------------------------------------------------------------------
# full sampler step
# ---------------------------------------------------------------------------

def processed_logits(
    logits: jnp.ndarray,  # (B, V) fp32
    gen_ids: jnp.ndarray,
    gen_len: jnp.ndarray,
    cfg: SamplingConfig,
) -> jnp.ndarray:
    """Context-dependent processors only (min-new-tokens EOS ban, repetition
    penalty, no-repeat-ngram) — the part shared by greedy and sampling."""
    logits = logits.astype(jnp.float32)
    T = gen_ids.shape[1]
    gen_valid = jnp.arange(T)[None, :] < gen_len[:, None]

    if cfg.min_new_tokens > 0:
        # HF MinNewTokensLengthLogitsProcessor: ban EOS below the minimum
        ban = (gen_len < cfg.min_new_tokens)[:, None]
        eos_col = jnp.arange(logits.shape[-1])[None, :] == cfg.eos_token_id
        logits = jnp.where(ban & eos_col, NEG_INF, logits)

    if cfg.repetition_penalty != 1.0:
        logits = apply_repetition_penalty(logits, gen_ids, gen_valid, cfg.repetition_penalty)
    if cfg.no_repeat_ngram_size > 0:
        logits = apply_no_repeat_ngram(logits, gen_ids, gen_len, cfg.no_repeat_ngram_size)
    return logits


def warped_logits(
    logits: jnp.ndarray,  # (B, V) fp32 next-token logits
    gen_ids: jnp.ndarray,
    gen_len: jnp.ndarray,
    cfg: SamplingConfig,
) -> jnp.ndarray:
    """Full sampling pipeline up to (but excluding) the categorical draw:
    softmax of the result IS the sampling distribution.  Not valid for
    mirostat (its truncation is stateful — use sample_step)."""
    logits = processed_logits(logits, gen_ids, gen_len, cfg)

    if cfg.temperature != 1.0:
        logits = warp_temperature(logits, cfg.temperature)

    if (cfg.top_k > 0 and cfg.top_p < 1.0 and cfg.tfs >= 1.0
            and cfg.top_a <= 0.0):
        # the reference's default config (top_k=40, top_p=0.9): fused sortless
        # path, bit-identical to the sequential warpers
        logits = warp_top_k_top_p_fused(logits, cfg.top_k, cfg.top_p)
    else:
        if cfg.top_k > 0:
            logits = warp_top_k(logits, cfg.top_k)
        if cfg.top_p < 1.0:
            logits = warp_top_p(logits, cfg.top_p)
        if cfg.tfs < 1.0:
            logits = warp_tfs(logits, cfg.tfs)
        if cfg.top_a > 0.0:
            logits = warp_top_a(logits, cfg.top_a)
    return logits


def sample_step(
    logits: jnp.ndarray,  # (B, V) fp32 next-token logits
    gen_ids: jnp.ndarray,  # (B, T) generated-so-far buffer
    gen_len: jnp.ndarray,  # (B,) int32
    key: jax.Array,
    mu: jnp.ndarray,  # (B,) mirostat state
    cfg: SamplingConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sampling step.  Returns (token (B,) int32, new_mu).

    Order matches HF generate with the reference's hijack_samplers patch:
    processors (rep-penalty, no-repeat-ngram) then warpers
    (temperature, top-k, top-p, tfs, top-a) or mirostat (temperature only).
    """
    if not cfg.do_sample:
        logits = processed_logits(logits, gen_ids, gen_len, cfg)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32), mu

    if cfg.mirostat_mode == 2:
        logits = processed_logits(logits, gen_ids, gen_len, cfg)
        if cfg.temperature != 1.0:
            logits = warp_temperature(logits, cfg.temperature)
        token, mu = mirostat_step(logits, mu, key, cfg.mirostat_tau, cfg.mirostat_eta)
        return token.astype(jnp.int32), mu

    logits = warped_logits(logits, gen_ids, gen_len, cfg)
    token = jax.random.categorical(key, logits, axis=-1)
    return token.astype(jnp.int32), mu
