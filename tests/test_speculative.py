"""Prompt-lookup speculative decoding: token-identity vs the plain Engine.

Speculation must never change outputs — every test asserts EXACT id equality
against ``Engine.generate`` for the same deterministic config (the same
guarantee the reference's one-token-per-step HF loop gives,
modeling_visualcla.py:382-391), while the stats prove drafts are accepted.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from visualcla_tpu.engine.generate import Engine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.engine.speculative import SpeculativeDecoder, ngram_draft

from .test_generate import EOS, build_composite, make_prompt


def tiny_engine(params, cfg, buckets=(32,)):
    return Engine(
        params, cfg, eos_token_id=EOS, pad_token_id=0,
        max_seq_len=64, prompt_buckets=buckets, dtype=jnp.float64,
    )


def assert_rows_equal(plain, spec, pad=0):
    """Same tokens per row, ignoring trailing pad (row lengths may differ
    because plain Engine pads to a global gen_len)."""
    assert plain.shape[0] == spec.shape[0]
    for b in range(plain.shape[0]):
        a = plain[b][plain[b] != pad] if pad is not None else plain[b]
        c = spec[b][spec[b] != pad] if pad is not None else spec[b]
        np.testing.assert_array_equal(a, c)


class TestNgramDraft:
    def test_copies_continuation_of_last_ngram(self):
        # context ...[7 8 9 4 5] with earlier [4 5] followed by [6 7 8]
        ctx = jnp.asarray([3, 4, 5, 6, 7, 8, 9, 4, 5, 0, 0, 0], jnp.int32)
        d = ngram_draft(ctx, jnp.int32(0), jnp.int32(9), k=3, max_ngram=3)
        np.testing.assert_array_equal(np.asarray(d), [6, 7, 8])

    def test_prefers_larger_ngram(self):
        # last trigram [1 2 3] occurs earlier (→ 9); last unigram [3] also at
        # pos 5 (→ 7).  Trigram match must win.
        ctx = jnp.asarray([1, 2, 3, 9, 8, 3, 7, 1, 2, 3, 0, 0, 0], jnp.int32)
        d = ngram_draft(ctx, jnp.int32(0), jnp.int32(10), k=1, max_ngram=3)
        np.testing.assert_array_equal(np.asarray(d), [9])

    def test_no_match_falls_back_to_last_token(self):
        ctx = jnp.asarray([1, 2, 3, 4, 5, 0, 0], jnp.int32)
        d = ngram_draft(ctx, jnp.int32(0), jnp.int32(5), k=2, max_ngram=3)
        np.testing.assert_array_equal(np.asarray(d), [5, 5])

    def test_respects_start_boundary(self):
        # the only earlier [4] continuation sits before start → fallback
        ctx = jnp.asarray([4, 9, 1, 2, 4, 0, 0], jnp.int32)
        d = ngram_draft(ctx, jnp.int32(2), jnp.int32(5), k=1, max_ngram=1)
        np.testing.assert_array_equal(np.asarray(d), [4])


class TestSpeculativeIdentity:
    def test_multimodal_matches_plain_greedy(self):
        models, cfg, params = build_composite()
        rng = np.random.default_rng(11)
        ids = make_prompt(rng)
        pixels = rng.normal(size=(1, 3, 28, 28))
        img_pos = np.asarray([3], np.int32)
        eng = tiny_engine(params, cfg)
        scfg = SamplingConfig.greedy(max_new_tokens=12)
        plain = eng.generate(ids, pixels, img_pos, scfg)
        spec = SpeculativeDecoder(eng, spec_k=4, max_ngram=3).generate(
            ids, pixels, img_pos, scfg
        )
        assert_rows_equal(plain, spec)

    def test_text_only_matches_plain_greedy(self):
        models, cfg, params = build_composite()
        rng = np.random.default_rng(13)
        ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
        ids[0, 0] = 1
        eng = tiny_engine(params, cfg, buckets=(16,))
        scfg = SamplingConfig.greedy(max_new_tokens=16)
        plain = eng.generate(ids, None, None, scfg)
        dec = SpeculativeDecoder(eng, spec_k=5, max_ngram=3)
        spec = dec.generate(ids, None, None, scfg)
        assert_rows_equal(plain, spec)
        assert dec.last_stats["chunks"] >= 1

    def test_batch_rows_advance_independently(self):
        models, cfg, params = build_composite()
        rng = np.random.default_rng(23)
        ids = rng.integers(3, 90, size=(3, 10)).astype(np.int64)
        ids[:, 0] = 1
        eng = tiny_engine(params, cfg, buckets=(16,))
        scfg = SamplingConfig.greedy(max_new_tokens=10)
        plain = eng.generate(ids, None, None, scfg)
        spec = SpeculativeDecoder(eng, spec_k=3).generate(ids, None, None, scfg)
        assert_rows_equal(plain, spec)

    def test_greedy_with_processors_matches(self):
        """Greedy + context-dependent processors (rep-penalty, no-repeat-ngram,
        min_new_tokens) goes through the sequential verifier and stays exact."""
        models, cfg, params = build_composite()
        rng = np.random.default_rng(29)
        ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
        ids[0, 0] = 1
        eng = tiny_engine(params, cfg, buckets=(16,))
        scfg = SamplingConfig(
            max_new_tokens=12, do_sample=False, temperature=1.0,
            top_k=0, top_p=1.0, repetition_penalty=1.3,
            no_repeat_ngram_size=3, min_new_tokens=4, eos_token_id=EOS,
        )
        plain = eng.generate(ids, None, None, scfg)
        spec = SpeculativeDecoder(eng, spec_k=4).generate(ids, None, None, scfg)
        assert_rows_equal(plain, spec)

    def test_repetitive_prompt_accepts_drafts(self):
        """A looping context must yield >1 emitted token per verify chunk —
        otherwise speculation is doing nothing."""
        models, cfg, params = build_composite()
        ids = np.asarray([[1] + [7, 8, 9, 10] * 3], np.int64)  # strong ngrams
        eng = tiny_engine(params, cfg, buckets=(16,))
        scfg = SamplingConfig.greedy(max_new_tokens=24)
        dec = SpeculativeDecoder(eng, spec_k=6, max_ngram=3)
        spec = dec.generate(ids, None, None, scfg)
        plain = eng.generate(ids, None, None, scfg)
        assert_rows_equal(plain, spec)
        # tiny random models are often repetitive; require measurable acceptance
        assert dec.last_stats["tokens_per_chunk"] > 1.0

    def test_eos_cut_is_exact(self):
        """When plain greedy hits EOS, speculative output ends at the same spot
        (no draft echo past EOS)."""
        models, cfg, params = build_composite()
        rng = np.random.default_rng(31)
        # scan seeds until plain decode emits EOS before max_new_tokens
        eng = tiny_engine(params, cfg, buckets=(16,))
        scfg = SamplingConfig.greedy(max_new_tokens=20)
        found = None
        for seed in range(40):
            ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
            ids[0, 0] = 1
            out = eng.generate(ids, None, None, scfg)
            if EOS in out[0]:
                found = (ids, out)
                break
        if found is None:
            pytest.skip("no EOS-terminating prompt found for the tiny model")
        ids, plain = found
        spec = SpeculativeDecoder(eng, spec_k=4).generate(ids, None, None, scfg)
        assert_rows_equal(plain, spec)
        assert EOS in spec[0]

    def test_rejects_mirostat_configs(self):
        models, cfg, params = build_composite()
        eng = tiny_engine(params, cfg)
        with pytest.raises(ValueError):
            SpeculativeDecoder(eng).generate(
                np.ones((1, 4), np.int64), None, None,
                SamplingConfig(do_sample=True, mirostat_mode=2),
            )


class TestSpeculativeSampling:
    """Speculative SAMPLING: accept draft w.p. p(d); reject -> resample from
    p \\ {d}.  The marginal at every position equals the plain sampling
    distribution exactly."""

    def test_verify_sampled_marginal_matches_distribution(self):
        """Analytic check: emitted-first-token frequencies equal softmax(w)."""
        import jax
        from visualcla_tpu.engine.speculative import _verify_sampled

        V = 4
        logits_row = np.log(np.asarray([0.45, 0.30, 0.15, 0.10], np.float32))
        logits = jnp.asarray(logits_row)[None, None, :].repeat(2, axis=1)  # K=1
        logits = jnp.broadcast_to(logits, (1, 2, V))
        gen_ids = jnp.zeros((1, 8), jnp.int32)
        gen_len = jnp.zeros((1,), jnp.int32)
        drafts = jnp.asarray([[1]], jnp.int32)  # draft token 1 (p=0.30)
        cfg = SamplingConfig(do_sample=True, temperature=1.0, top_k=0,
                             top_p=1.0, repetition_penalty=1.0,
                             no_repeat_ngram_size=0, max_new_tokens=4)

        run = jax.jit(lambda k: _verify_sampled(
            logits, gen_ids, gen_len, drafts, k, cfg))
        N = 4000
        keys = jax.random.split(jax.random.PRNGKey(0), N)
        preds = np.asarray(jax.vmap(run)(keys))[:, 0, 0]  # first position
        freq = np.bincount(preds, minlength=V) / N
        p = np.exp(logits_row) / np.exp(logits_row).sum()
        # 4-sigma binomial bounds
        for t in range(V):
            sigma = np.sqrt(p[t] * (1 - p[t]) / N)
            assert abs(freq[t] - p[t]) < 4 * sigma + 1e-3, (t, freq, p)

    def test_topk1_sampling_collapses_to_greedy(self):
        """With top_k=1 only one token has mass: sampled speculation must be
        deterministic and equal plain greedy."""
        models, cfg, params = build_composite()
        rng = np.random.default_rng(51)
        ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
        ids[0, 0] = 1
        eng = tiny_engine(params, cfg, buckets=(16,))
        greedy = eng.generate(ids, None, None,
                              SamplingConfig.greedy(max_new_tokens=10))
        scfg = SamplingConfig(
            do_sample=True, temperature=1.0, top_k=1, top_p=1.0,
            repetition_penalty=1.0, no_repeat_ngram_size=0, max_new_tokens=10,
        )
        spec = SpeculativeDecoder(eng, spec_k=3).generate(
            ids, None, None, scfg, seed=123)
        assert_rows_equal(greedy, spec)

    def test_sampled_spec_runs_default_config(self):
        """Reference default config (T=.5, k=40, p=.9, penalties) through the
        sampled speculative path end-to-end."""
        models, cfg, params = build_composite()
        rng = np.random.default_rng(53)
        ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
        ids[0, 0] = 1
        eng = tiny_engine(params, cfg, buckets=(16,))
        scfg = SamplingConfig(max_new_tokens=10)  # default: sampled
        dec = SpeculativeDecoder(eng, spec_k=4)
        out1 = dec.generate(ids, None, None, scfg, seed=3)
        out2 = dec.generate(ids, None, None, scfg, seed=3)
        out3 = dec.generate(ids, None, None, scfg, seed=4)
        np.testing.assert_array_equal(out1, out2)  # seed-deterministic
        assert out1.shape[1] >= 1
        assert not np.array_equal(out1, out3) or out1.shape[1] <= 2


class TestChatIntegration:
    def test_chat_speculative_matches_blocking(self, tmp_path_factory):
        """chat(speculative=True) is token-identical to plain greedy chat."""
        import jax.numpy as jnp

        import visualcla_tpu as v
        from visualcla_tpu.api import chat

        from .test_api import make_native_ckpt

        tmp = str(tmp_path_factory.mktemp("spec_api"))
        ckpt, cfg = make_native_ckpt(tmp)
        model, _, _ = v.get_model_and_tokenizer_and_processor(
            visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
        )
        pix = np.asarray(
            np.random.default_rng(5).standard_normal(
                (1, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
            ),
            np.float32,
        )
        gc = SamplingConfig.greedy(max_new_tokens=8)
        plain, _ = chat(model, pix, "ab", [], gc, verbose=False)
        spec, _ = chat(model, pix, "ab", [], gc, verbose=False, speculative=True)
        assert plain == spec


class TestSpeculativeStreaming:
    def test_stream_matches_generate(self):
        models, cfg, params = build_composite()
        rng = np.random.default_rng(41)
        ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
        ids[0, 0] = 1
        eng = Engine(params, cfg, eos_token_id=EOS, pad_token_id=0,
                     max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float64)
        scfg = SamplingConfig.greedy(max_new_tokens=12)
        dec = SpeculativeDecoder(eng, spec_k=4)
        blocking = dec.generate(ids, None, None, scfg)
        streamed = np.concatenate(list(dec.stream(ids, None, None, scfg)))
        a = blocking[0][blocking[0] != 0]
        np.testing.assert_array_equal(a, streamed[: len(a)])
        # streamed may include EOS; nothing beyond it
        assert len(streamed) <= blocking.shape[1] or streamed[len(a)] == EOS

    def test_stream_rejects_batch(self):
        models, cfg, params = build_composite()
        eng = Engine(params, cfg, eos_token_id=EOS, pad_token_id=0,
                     max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float64)
        with pytest.raises(ValueError):
            list(SpeculativeDecoder(eng).stream(
                np.ones((2, 4), np.int64), None, None,
                SamplingConfig.greedy(max_new_tokens=4)))

    def test_chat_in_stream_speculative(self, tmp_path_factory):
        import jax.numpy as jnp

        import visualcla_tpu as v
        from visualcla_tpu.api import chat, chat_in_stream

        from .test_api import make_native_ckpt

        tmp = str(tmp_path_factory.mktemp("spec_stream"))
        ckpt, cfg = make_native_ckpt(tmp)
        model, _, _ = v.get_model_and_tokenizer_and_processor(
            visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
        )
        pix = np.asarray(
            np.random.default_rng(9).standard_normal(
                (1, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
            ), np.float32,
        )
        gc = SamplingConfig.greedy(max_new_tokens=8)
        blocking, _ = chat(model, pix, "ab", [], gc, verbose=False)
        last = ""
        for partial, _ in chat_in_stream(model, pix, "ab", [], gc,
                                         verbose=False, speculative=True):
            last = partial
        assert last == blocking
