"""The serving sampler's per-row tfs / top-a / mirostat-2 must match the
Engine's static warpers (reference hijack_samplers surface,
modeling_utils.py:250-400) — VERDICT r2 item 6."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from visualcla_tpu.engine.sampling import (
    SamplingConfig,
    mirostat_step,
    sample_step_rowwise,
    warp_temperature,
    warp_tfs,
    warp_tfs_rowwise,
    warp_top_a,
    warp_top_a_rowwise,
    warp_top_k,
    warp_top_p_rowwise,
)

V = 97


def _logits(rng, B):
    return jnp.asarray(rng.standard_normal((B, V)) * 3.0, jnp.float32)


def test_tfs_rowwise_matches_static(rng):
    logits = _logits(rng, 4)
    for t in (0.5, 0.9, 0.99):
        want = np.asarray(warp_tfs(logits, t))
        got = np.asarray(warp_tfs_rowwise(logits, jnp.full((4,), t)))
        np.testing.assert_allclose(got, want)
    # per-row mix: row 0 active, row 1 passthrough
    mix = np.asarray(warp_tfs_rowwise(logits[:2], jnp.asarray([0.8, 1.0])))
    np.testing.assert_allclose(mix[0], np.asarray(warp_tfs(logits[:1], 0.8))[0])
    np.testing.assert_allclose(mix[1], np.asarray(logits[1]))


def test_top_a_rowwise_matches_static(rng):
    logits = _logits(rng, 4)
    for a in (0.1, 0.5, 0.9):
        want = np.asarray(warp_top_a(logits, a))
        got = np.asarray(warp_top_a_rowwise(logits, jnp.full((4,), a)))
        np.testing.assert_allclose(got, want)
    mix = np.asarray(warp_top_a_rowwise(logits[:2], jnp.asarray([0.4, 0.0])))
    np.testing.assert_allclose(mix[0], np.asarray(warp_top_a(logits[:1], 0.4))[0])
    np.testing.assert_allclose(mix[1], np.asarray(logits[1]))


def _rowwise(logits, key, cfg, **kw):
    B = logits.shape[0]
    f32 = jnp.float32
    defaults = dict(
        temperature=jnp.ones((B,), f32), top_p=jnp.ones((B,), f32),
        repetition_penalty=jnp.ones((B,), f32),
        do_sample=jnp.ones((B,), bool),
        tfs=jnp.ones((B,), f32), top_a=jnp.zeros((B,), f32),
        mirostat=jnp.zeros((B,), bool), miro_tau=jnp.full((B,), 5.0, f32),
        miro_eta=jnp.full((B,), 0.1, f32), mu=jnp.full((B,), 10.0, f32),
    )
    defaults.update({k: (v if v.dtype == bool else v.astype(f32))
                     for k, v in kw.items()})
    return sample_step_rowwise(
        logits, jnp.zeros((B, 8), jnp.int32), jnp.zeros((B,), jnp.int32),
        key, cfg, **defaults)


def test_rowwise_tfs_topa_token_identity(rng):
    """Same key -> the serving path must pick the exact token the static
    warper chain picks (both paths call categorical on identically warped
    logits)."""
    logits = _logits(rng, 3)
    key = jax.random.PRNGKey(7)
    cfg = dataclasses.replace(SamplingConfig(), top_k=13,
                              no_repeat_ngram_size=0)
    tok, _ = _rowwise(
        logits, key, cfg,
        temperature=jnp.full((3,), 0.7),
        top_p=jnp.full((3,), 0.85),
        tfs=jnp.full((3,), 0.9),
        top_a=jnp.full((3,), 0.2),
    )
    warped = warp_temperature(logits, 0.7)
    warped = warp_top_k(warped, 13)
    warped = warp_top_p_rowwise(warped, jnp.full((3,), 0.85))
    warped = warp_tfs(warped, 0.9)
    warped = warp_top_a(warped, 0.2)
    want = jax.random.categorical(key, warped, axis=-1)
    np.testing.assert_array_equal(np.asarray(tok), np.asarray(want))


def test_rowwise_mirostat_matches_stateful_step(rng):
    """Mirostat rows reproduce mirostat_step exactly (token AND mu update),
    and non-mirostat rows are untouched by it."""
    logits = _logits(rng, 2)
    key = jax.random.PRNGKey(3)
    cfg = dataclasses.replace(SamplingConfig(), top_k=0,
                              no_repeat_ngram_size=0)
    mu0 = jnp.asarray([9.0, 11.0])
    tau = jnp.asarray([5.0, 4.0])
    eta = jnp.asarray([0.1, 0.2])
    tok, mu1 = _rowwise(
        logits, key, cfg,
        temperature=jnp.full((2,), 0.5),
        mirostat=jnp.asarray([True, False]),
        miro_tau=tau, miro_eta=eta, mu=mu0,
    )
    want_tok, want_mu = mirostat_step(
        warp_temperature(logits, 0.5), mu0, key, tau, eta)
    assert int(tok[0]) == int(want_tok[0])
    assert float(mu1[0]) == pytest.approx(float(want_mu[0]))
    assert float(mu1[1]) == pytest.approx(float(mu0[1]))  # untouched row


def test_serving_engine_accepts_full_hijacked_surface(rng):
    """End-to-end: the paged serving engine admits and decodes requests with
    tfs / top-a / mirostat overrides (previously a loud ValueError), and the
    same request is reproducible across identical engines (seeded)."""
    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.models import visualcla as vmod

    cfg = tiny_visualcla_config(vocab_size=96)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    prompt = rng.integers(4, 90, size=(12,)).astype(np.int32)

    def run():
        eng = PagedServingEngine(
            params, cfg, eos_token_id=2, pad_token_id=0,
            pool_size=2, block_size=8, num_blocks=24,
            max_seq_len=64, max_new_tokens_cap=8, prompt_buckets=(16,),
            sampling=SamplingConfig(max_new_tokens=8), dtype=jnp.float32,
        )
        eng.prefill_row(0, prompt, None, None, 6,
                        overrides={"tfs": 0.9, "top_a": 0.1})
        eng.prefill_row(1, prompt, None, None, 6,
                        overrides={"mirostat_mode": 2, "mirostat_tau": 4.0})
        for _ in range(6):
            eng.step()
        return [list(eng.collect_row(r)) for r in range(2)]

    a, b = run(), run()
    assert a == b
    assert all(len(r) > 0 for r in a)


def test_unknown_mirostat_mode_rejected():
    from visualcla_tpu.engine.server import sampling_knobs

    with pytest.raises(ValueError, match="mirostat_mode"):
        sampling_knobs(SamplingConfig(), {"mirostat_mode": 1})


def test_top_k_rowwise_matches_static(rng):
    from visualcla_tpu.engine.sampling import warp_top_k_rowwise

    logits = _logits(rng, 4)
    for k in (1, 5, 40, V):
        want = np.asarray(warp_top_k(logits, k))
        got = np.asarray(warp_top_k_rowwise(logits, jnp.full((4,), k, jnp.int32)))
        np.testing.assert_allclose(got, want, err_msg=f"k={k}")
    # per-row mix incl. k=0 passthrough
    mix = np.asarray(warp_top_k_rowwise(
        logits[:3], jnp.asarray([3, 0, 7], jnp.int32)))
    np.testing.assert_allclose(mix[0], np.asarray(warp_top_k(logits[:1], 3))[0])
    np.testing.assert_allclose(mix[1], np.asarray(logits[1]))
    np.testing.assert_allclose(mix[2], np.asarray(warp_top_k(logits[2:3], 7))[0])
    # k above the partial cap takes the full-sort fallback branch
    got = np.asarray(warp_top_k_rowwise(
        logits, jnp.full((4,), 20, jnp.int32), k_cap=8))
    np.testing.assert_allclose(got, np.asarray(warp_top_k(logits, 20)))


def test_ngram_rowwise_matches_static(rng):
    from visualcla_tpu.engine.sampling import (
        apply_no_repeat_ngram, apply_no_repeat_ngram_rowwise)

    B, T = 3, 12
    # repetitive contexts so ngram bans actually fire
    gen = jnp.asarray(rng.integers(0, 6, size=(B, T)), jnp.int32)
    gen_len = jnp.asarray([11, 7, 4], jnp.int32)
    logits = _logits(rng, B)
    for n in (1, 2, 3):
        want = np.asarray(apply_no_repeat_ngram(logits, gen, gen_len, n))
        got = np.asarray(apply_no_repeat_ngram_rowwise(
            logits, gen, gen_len, jnp.full((B,), n, jnp.int32)))
        np.testing.assert_allclose(got, want, err_msg=f"n={n}")
    # n=0 rows pass through; mixed-n rows match their own static result
    mixed = np.asarray(apply_no_repeat_ngram_rowwise(
        logits, gen, gen_len, jnp.asarray([2, 0, 3], jnp.int32)))
    np.testing.assert_allclose(
        mixed[0], np.asarray(apply_no_repeat_ngram(logits, gen, gen_len, 2))[0])
    np.testing.assert_allclose(mixed[1], np.asarray(logits[1]))
    np.testing.assert_allclose(
        mixed[2], np.asarray(apply_no_repeat_ngram(logits, gen, gen_len, 3))[2])


def test_rowwise_top_k_token_identity(rng):
    """sample_step_rowwise with a per-row top_k vector must pick the exact
    token the static cfg.top_k path picks (same key, same warp order)."""
    from visualcla_tpu.engine.sampling import sample_step

    logits = _logits(rng, 3)
    key = jax.random.PRNGKey(3)
    cfg = dataclasses.replace(SamplingConfig(), top_k=7, top_p=1.0,
                              temperature=1.0, repetition_penalty=1.0,
                              no_repeat_ngram_size=0)
    B = 3
    mu = jnp.full((B,), 10.0, jnp.float32)
    want, _ = sample_step(
        logits, jnp.zeros((B, 8), jnp.int32), jnp.zeros((B,), jnp.int32),
        key, mu, cfg)
    f32 = jnp.float32
    got, _ = sample_step_rowwise(
        logits, jnp.zeros((B, 8), jnp.int32), jnp.zeros((B,), jnp.int32),
        key, dataclasses.replace(cfg, top_k=0),
        temperature=jnp.ones((B,), f32), top_p=jnp.ones((B,), f32),
        repetition_penalty=jnp.ones((B,), f32),
        do_sample=jnp.ones((B,), bool),
        top_k=jnp.full((B,), 7, jnp.int32),
        ngram=jnp.zeros((B,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
