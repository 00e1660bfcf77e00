"""Differential tests: our sampler ops vs the actual transformers processors.

The reference's decode semantics ARE these HF classes (modeling_utils.py:36-47
drives HF generate); bit-matching them at the op level is the strongest cheap
evidence of behavioral parity.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from visualcla_tpu.engine import sampling as S


@pytest.fixture()
def batch():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((3, 50)).astype(np.float32) * 3
    gen = rng.integers(0, 50, size=(3, 20)).astype(np.int64)
    return logits, gen


def hf_scores(proc, input_ids, logits):
    out = proc(torch.from_numpy(input_ids), torch.from_numpy(logits.copy()))
    return out.numpy()


def _mask_equal(ours, theirs):
    """Compare finite values exactly-ish and -inf masks exactly."""
    ours = np.asarray(ours)
    ours_inf = ~np.isfinite(ours) | (ours <= S.NEG_INF / 2)
    theirs_inf = ~np.isfinite(theirs) | (theirs <= np.finfo(np.float32).min / 2)
    np.testing.assert_array_equal(ours_inf, theirs_inf)
    np.testing.assert_allclose(
        np.where(ours_inf, 0, ours), np.where(theirs_inf, 0, theirs), atol=1e-5
    )


def test_top_k_matches_hf(batch):
    from transformers.generation.logits_process import TopKLogitsWarper

    logits, gen = batch
    theirs = hf_scores(TopKLogitsWarper(top_k=7), gen, logits)
    ours = S.warp_top_k(jnp.asarray(logits), 7)
    _mask_equal(ours, theirs)


def test_top_p_matches_hf(batch):
    from transformers.generation.logits_process import TopPLogitsWarper

    logits, gen = batch
    for p in (0.3, 0.9, 0.99):
        theirs = hf_scores(TopPLogitsWarper(top_p=p), gen, logits)
        ours = S.warp_top_p(jnp.asarray(logits), p)
        _mask_equal(ours, theirs)


def test_temperature_matches_hf(batch):
    from transformers.generation.logits_process import TemperatureLogitsWarper

    logits, gen = batch
    theirs = hf_scores(TemperatureLogitsWarper(temperature=0.5), gen, logits)
    ours = S.warp_temperature(jnp.asarray(logits), 0.5)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-6)


def test_repetition_penalty_matches_hf(batch):
    from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor

    logits, gen = batch
    theirs = hf_scores(RepetitionPenaltyLogitsProcessor(penalty=1.1), gen, logits)
    gen_valid = jnp.ones(gen.shape, bool)
    ours = S.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(gen.astype(np.int32)), gen_valid, 1.1
    )
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


@pytest.mark.parametrize("n", [2, 3, 15])
def test_no_repeat_ngram_matches_hf(n):
    from transformers.generation.logits_process import NoRepeatNGramLogitsProcessor

    rng = np.random.default_rng(1)
    V, T = 12, 30
    logits = rng.standard_normal((2, V)).astype(np.float32)
    # force repeats so the processor actually bans something
    gen = rng.integers(0, 5, size=(2, T)).astype(np.int64)
    theirs = hf_scores(NoRepeatNGramLogitsProcessor(ngram_size=n), gen, logits)
    ours = S.apply_no_repeat_ngram(
        jnp.asarray(logits), jnp.asarray(gen.astype(np.int32)),
        jnp.full((2,), T, jnp.int32), n,
    )
    _mask_equal(ours, theirs)


def test_no_repeat_ngram_partial_buffer():
    """Fixed-size gen buffer with gen_len < T must only consider real tokens."""
    from transformers.generation.logits_process import NoRepeatNGramLogitsProcessor

    rng = np.random.default_rng(2)
    V, T, real = 10, 16, 9
    logits = rng.standard_normal((1, V)).astype(np.float32)
    gen_real = rng.integers(0, 4, size=(1, real)).astype(np.int64)
    theirs = hf_scores(NoRepeatNGramLogitsProcessor(ngram_size=3), gen_real, logits)
    buf = np.zeros((1, T), np.int32)
    buf[0, :real] = gen_real[0]
    buf[0, real:] = 7  # garbage past gen_len — must be ignored
    ours = S.apply_no_repeat_ngram(
        jnp.asarray(logits), jnp.asarray(buf), jnp.asarray([real], jnp.int32), 3
    )
    _mask_equal(ours, theirs)


def test_full_stack_order_matches_hf(batch):
    """Processor+warper chain in HF's order vs our sample_step's internal order
    (compare the shaped distributions, not samples)."""
    from transformers.generation.logits_process import (
        LogitsProcessorList,
        NoRepeatNGramLogitsProcessor,
        RepetitionPenaltyLogitsProcessor,
        TemperatureLogitsWarper,
        TopKLogitsWarper,
        TopPLogitsWarper,
    )

    logits, gen = batch
    chain = LogitsProcessorList([
        RepetitionPenaltyLogitsProcessor(penalty=1.1),
        NoRepeatNGramLogitsProcessor(ngram_size=4),
        TemperatureLogitsWarper(temperature=0.5),
        TopKLogitsWarper(top_k=40),
        TopPLogitsWarper(top_p=0.9),
    ])
    theirs = hf_scores(chain, gen, logits)

    x = jnp.asarray(logits)
    gen_j = jnp.asarray(gen.astype(np.int32))
    gen_len = jnp.full((3,), gen.shape[1], jnp.int32)
    x = S.apply_repetition_penalty(x, gen_j, jnp.ones(gen.shape, bool), 1.1)
    x = S.apply_no_repeat_ngram(x, gen_j, gen_len, 4)
    x = S.warp_temperature(x, 0.5)
    x = S.warp_top_k(x, 40)
    x = S.warp_top_p(x, 0.9)
    _mask_equal(x, theirs)
