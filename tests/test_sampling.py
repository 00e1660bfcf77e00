"""Sampler parity vs HF logits processors/warpers and the reference's extras."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from visualcla_tpu.engine import sampling as S


def _np(t):
    return t.detach().cpu().numpy()


@pytest.fixture
def logits_batch():
    rng = np.random.default_rng(42)
    return rng.normal(size=(3, 64)).astype(np.float32) * 3.0


class TestWarpersVsHF:
    def test_top_k(self, logits_batch):
        from transformers.generation.logits_process import TopKLogitsWarper

        ref = _np(TopKLogitsWarper(top_k=7)(None, torch.tensor(logits_batch)))
        ours = np.asarray(S.warp_top_k(jnp.asarray(logits_batch), 7))
        # compare keep/remove masks + surviving values
        np.testing.assert_array_equal(np.isinf(ours) | (ours < -1e30), ref < -1e30)
        keep = ref > -1e30
        np.testing.assert_allclose(ours[keep], ref[keep], rtol=1e-6)

    def test_top_p(self, logits_batch):
        from transformers.generation.logits_process import TopPLogitsWarper

        ref = _np(TopPLogitsWarper(top_p=0.9)(None, torch.tensor(logits_batch)))
        ours = np.asarray(S.warp_top_p(jnp.asarray(logits_batch), 0.9))
        np.testing.assert_array_equal(ours < -1e30, ref < -1e30)
        keep = ref > -1e30
        np.testing.assert_allclose(ours[keep], ref[keep], rtol=1e-6)

    def test_repetition_penalty(self, logits_batch):
        from transformers.generation.logits_process import RepetitionPenaltyLogitsProcessor

        gen = np.array([[1, 5, 5, 9], [0, 2, 3, 4], [10, 11, 12, 13]])
        ref = _np(
            RepetitionPenaltyLogitsProcessor(penalty=1.1)(
                torch.tensor(gen), torch.tensor(logits_batch)
            )
        )
        valid = np.ones_like(gen, bool)
        ours = np.asarray(
            S.apply_repetition_penalty(
                jnp.asarray(logits_batch), jnp.asarray(gen), jnp.asarray(valid), 1.1
            )
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_no_repeat_ngram(self):
        from transformers.generation.logits_process import NoRepeatNGramLogitsProcessor

        rng = np.random.default_rng(7)
        logits = rng.normal(size=(2, 32)).astype(np.float32)
        # context contains a repeated bigram prefix: ... 3 4 ... 3 -> next 4 banned
        gen = np.array([[1, 3, 4, 2, 3], [5, 6, 7, 8, 9]])
        ref = _np(
            NoRepeatNGramLogitsProcessor(ngram_size=2)(
                torch.tensor(gen), torch.tensor(logits)
            )
        )
        T = 8  # fixed-size buffer with padding, as in the decode loop
        buf = np.zeros((2, T), np.int64)
        buf[:, :5] = gen
        ours = np.asarray(
            S.apply_no_repeat_ngram(
                jnp.asarray(logits), jnp.asarray(buf), jnp.asarray([5, 5]), 2
            )
        )
        np.testing.assert_array_equal(ours < -1e30, np.isinf(ref) & (ref < 0))
        keep = ~(np.isinf(ref) & (ref < 0))
        np.testing.assert_allclose(ours[keep], logits[keep], rtol=1e-6)

    def test_tfs_vs_reference_impl(self, logits_batch):
        """Reference TailFreeLogitsWarper (modeling_utils.py:250-287) re-run here."""
        scores = torch.tensor(logits_batch)
        tfs = 0.8
        sorted_logits, sorted_indices = torch.sort(scores, descending=True)
        probs = sorted_logits.softmax(dim=-1)
        d2 = probs.diff().diff().abs()
        normalized_d2 = d2 / d2.sum(dim=-1, keepdim=True)
        normalized_d2_cdf = normalized_d2.cumsum(dim=-1)
        sorted_indices_to_remove = normalized_d2_cdf > tfs
        sorted_indices_to_remove = torch.cat(
            (
                torch.zeros(scores.shape[0], 1, dtype=torch.bool),
                sorted_indices_to_remove,
                torch.ones(scores.shape[0], 1, dtype=torch.bool),
            ),
            dim=-1,
        )
        indices_to_remove = sorted_indices_to_remove.scatter(
            1, sorted_indices, sorted_indices_to_remove
        )
        ref = _np(scores.masked_fill(indices_to_remove, -float("inf")))

        ours = np.asarray(S.warp_tfs(jnp.asarray(logits_batch), tfs))
        np.testing.assert_array_equal(ours < -1e30, np.isneginf(ref))
        keep = ~np.isneginf(ref)
        np.testing.assert_allclose(ours[keep], ref[keep], rtol=1e-6)

    def test_top_a_vs_reference_impl(self, logits_batch):
        """Reference TopALogitsWarper (modeling_utils.py:290-313) re-run here."""
        scores = torch.tensor(logits_batch)
        top_a = 0.5
        sorted_logits, sorted_indices = torch.sort(scores, descending=True)
        probs = sorted_logits.softmax(dim=-1)
        probs_max = probs[..., 0, None]
        sorted_indices_to_remove = probs < probs_max * probs_max * top_a
        indices_to_remove = sorted_indices_to_remove.scatter(
            1, sorted_indices, sorted_indices_to_remove
        )
        ref = _np(scores.masked_fill(indices_to_remove, -float("inf")))

        ours = np.asarray(S.warp_top_a(jnp.asarray(logits_batch), top_a))
        np.testing.assert_array_equal(ours < -1e30, np.isneginf(ref))

    def test_mirostat_state_updates(self):
        """Mirostat-2: mu decreases after a high-surprise pick, increases after
        low-surprise; truncation keeps at least the top token."""
        logits = jnp.asarray(np.array([[5.0, 4.0, 1.0, 0.0]], np.float32))
        mu = jnp.asarray([10.0], jnp.float32)
        key = jax.random.PRNGKey(0)
        token, new_mu = S.mirostat_step(logits, mu, key, tau=5.0, eta=0.1)
        assert token.shape == (1,)
        assert 0 <= int(token[0]) < 4
        assert float(new_mu[0]) != 10.0  # state moved

    def test_min_new_tokens_bans_eos(self):
        import jax

        from visualcla_tpu.engine.sampling import SamplingConfig, sample_step

        rng = np.random.default_rng(0)
        V, B, T = 12, 2, 8
        logits = np.zeros((B, V), np.float32)
        logits[:, 2] = 10.0  # EOS would win greedily
        logits[:, 5] = 5.0
        cfg = SamplingConfig.greedy()
        import dataclasses

        cfg = dataclasses.replace(cfg, min_new_tokens=4, eos_token_id=2)
        gen_ids = jnp.zeros((B, T), jnp.int32)
        key = jax.random.PRNGKey(0)
        mu = jnp.zeros((B,), jnp.float32)
        # below the minimum: EOS banned -> token 5
        tok, _ = sample_step(jnp.asarray(logits), gen_ids,
                             jnp.asarray([2, 2], jnp.int32), key, mu, cfg)
        assert tok.tolist() == [5, 5]
        # at/after the minimum: EOS allowed
        tok, _ = sample_step(jnp.asarray(logits), gen_ids,
                             jnp.asarray([4, 4], jnp.int32), key, mu, cfg)
        assert tok.tolist() == [2, 2]

    def test_sampled_marginals_match_warped_softmax(self):
        """20k draws from the full sampler track softmax(warped logits)."""
        import dataclasses

        import jax

        from visualcla_tpu.engine import sampling as S

        rng = np.random.default_rng(0)
        V = 16
        logits = jnp.asarray(rng.standard_normal((1, V)) * 2, jnp.float32)
        cfg = dataclasses.replace(
            S.SamplingConfig(), top_k=8, top_p=0.9, temperature=0.7,
            repetition_penalty=1.0, no_repeat_ngram_size=0,
        )
        # expected distribution: warp chain then softmax
        x = S.warp_temperature(logits, 0.7)
        x = S.warp_top_k(x, 8)
        x = S.warp_top_p(x, 0.9)
        expect = np.asarray(jax.nn.softmax(x, axis=-1))[0]

        N = 20000
        gen_ids = jnp.zeros((N, 4), jnp.int32)
        gen_len = jnp.zeros((N,), jnp.int32)
        mu = jnp.zeros((N,), jnp.float32)
        toks, _ = S.sample_step(
            jnp.broadcast_to(logits, (N, V)), gen_ids, gen_len,
            jax.random.PRNGKey(1), mu, cfg,
        )
        counts = np.bincount(np.asarray(toks), minlength=V) / N
        # masked-out tokens never sampled; surviving ones within 3 sigma
        assert np.all(counts[expect == 0] == 0)
        sigma = np.sqrt(expect * (1 - expect) / N)
        assert np.all(np.abs(counts - expect) < 5 * sigma + 1e-3)

    def test_greedy_ignores_warpers(self):
        cfg = S.SamplingConfig.greedy()
        logits = jnp.asarray(np.array([[0.1, 3.0, -1.0]], np.float32))
        token, _ = S.sample_step(
            logits, jnp.zeros((1, 4), jnp.int32), jnp.zeros((1,), jnp.int32),
            jax.random.PRNGKey(0), jnp.zeros((1,)), cfg,
        )
        assert int(token[0]) == 1


class TestFusedTopKTopP:
    """warp_top_k_top_p_fused must be bit-identical to the sequential warpers
    (it replaces three full-vocab sorts per sampled decode step)."""

    def _check(self, logits, k, p):
        from visualcla_tpu.engine.sampling import (
            warp_top_k, warp_top_k_top_p_fused, warp_top_p,
        )

        seq = np.asarray(warp_top_p(warp_top_k(jnp.asarray(logits), k), p))
        fused = np.asarray(warp_top_k_top_p_fused(jnp.asarray(logits), k, p))
        np.testing.assert_array_equal(seq, fused)

    def test_random_logits_many_configs(self):
        rng = np.random.default_rng(0)
        for k, p in [(40, 0.9), (5, 0.5), (1, 0.9), (100, 0.99), (40, 0.1)]:
            for _ in range(2):  # 2 draws per config: the shape space is what
                # matters; more draws only re-roll the same code paths
                logits = rng.standard_normal((3, 512)).astype(np.float32) * 4
                self._check(logits, k, p)

    def test_k_larger_than_subset_window(self):
        rng = np.random.default_rng(1)
        # M = max(2k,128) capped at V: force the M == V corner
        logits = rng.standard_normal((2, 200)).astype(np.float32)
        self._check(logits, 150, 0.8)

    def test_boundary_ties_fall_back_exactly(self):
        # a long run of identical values straddling the subset boundary must
        # trigger the sequential fallback and still match bit-for-bit
        rng = np.random.default_rng(2)
        logits = rng.standard_normal((1, 512)).astype(np.float32)
        logits[0, 10:300] = 1.5  # 290 tied values, k=40 -> ties beyond M=128
        self._check(logits, 40, 0.9)

    def test_sample_step_tokens_unchanged_default_config(self):
        """End-to-end: sample_step with the reference default config draws the
        same tokens as the explicit sequential warpers with the same key."""
        from visualcla_tpu.engine.sampling import (
            SamplingConfig, apply_no_repeat_ngram, apply_repetition_penalty,
            sample_step, warp_temperature, warp_top_k, warp_top_p,
        )

        rng = np.random.default_rng(3)
        cfg = SamplingConfig(max_new_tokens=4)  # default: T=.5 k=40 p=.9 rp=1.1
        B, V, T = 2, 300, 6
        logits = jnp.asarray(rng.standard_normal((B, V)).astype(np.float32) * 3)
        gen_ids = jnp.asarray(rng.integers(0, V, (B, T)).astype(np.int32))
        gen_len = jnp.asarray([3, 5], jnp.int32)
        key = jax.random.PRNGKey(7)
        mu = jnp.zeros((B,), jnp.float32)
        tok, _ = sample_step(logits, gen_ids, gen_len, key, mu, cfg)

        ref = logits.astype(jnp.float32)
        gen_valid = jnp.arange(T)[None, :] < gen_len[:, None]
        ref = apply_repetition_penalty(ref, gen_ids, gen_valid, cfg.repetition_penalty)
        ref = apply_no_repeat_ngram(ref, gen_ids, gen_len, cfg.no_repeat_ngram_size)
        ref = warp_temperature(ref, cfg.temperature)
        ref = warp_top_p(warp_top_k(ref, cfg.top_k), cfg.top_p)
        ref_tok = jax.random.categorical(key, ref, axis=-1).astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(ref_tok))
