"""Beam search vs HF generate(num_beams=...) — differential tests."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests import hf_ref
from visualcla_tpu.core.config import LlamaConfig, VisualCLAConfig, ViTConfig, ResamplerConfig
from visualcla_tpu.engine.beam import beam_generate


@pytest.fixture(scope="module")
def models():
    hf, hf_cfg = hf_ref.tiny_hf_llama(vocab_size=64, hidden=32, layers=2,
                                      heads=4, seed=11)
    params = {"text": hf_ref.llama_params_from_hf(hf)}
    params = {k: {kk: jnp.asarray(vv) if not isinstance(vv, dict)
                  else {k3: jnp.asarray(v3) if not isinstance(v3, dict)
                        else {k4: jnp.asarray(v4) for k4, v4 in v3.items()}
                        for k3, v3 in vv.items()}
                  for kk, vv in v.items()} for k, v in params.items()}
    cfg = VisualCLAConfig(
        text_config=LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            max_position_embeddings=256,
        ),
        use_visual_resampler=False,
    )
    return hf, params, cfg


def hf_beam(hf, input_ids, num_beams, max_new_tokens, eos_id,
            length_penalty=1.0, early_stopping=False):
    with torch.no_grad():
        ids = torch.from_numpy(np.asarray(input_ids, np.int64))
        embeds = hf.get_input_embeddings()(ids)
        out = hf.generate(
            inputs_embeds=embeds,
            attention_mask=torch.ones(embeds.shape[:2], dtype=torch.long),
            num_beams=num_beams, do_sample=False,
            max_new_tokens=max_new_tokens, eos_token_id=eos_id,
            pad_token_id=0, length_penalty=length_penalty,
            early_stopping=early_stopping,
            temperature=None, top_p=None, top_k=None,
        )
    return np.asarray(out[0])


@pytest.mark.parametrize("num_beams,max_new", [(2, 8), (3, 10), (4, 6)])
def test_beam_matches_hf(models, num_beams, max_new):
    hf, params, cfg = models
    rng = np.random.default_rng(num_beams * 10 + max_new)
    ids = rng.integers(3, 60, size=(1, 9)).astype(np.int32)
    eos = hf.config.eos_token_id
    ours = beam_generate(
        params, cfg, ids, None, None,
        num_beams=num_beams, max_new_tokens=max_new,
        eos_token_id=eos, pad_token_id=0,
    )
    theirs = hf_beam(hf, ids, num_beams, max_new, eos)
    # strip HF's right padding after eos
    t = list(theirs)
    if eos in t:
        t = t[: t.index(eos) + 1]
    o = list(np.asarray(ours))
    if eos in o:
        o = o[: o.index(eos) + 1]
    assert o == t, (o, t)


def test_chat_with_beams(tmp_path):
    """chat() routes through beam search when num_beams>1 (greedy mode)."""
    import jax

    from tests.test_api import make_native_ckpt
    import visualcla_tpu as v
    from visualcla_tpu.engine.sampling import SamplingConfig

    ckpt, cfg = make_native_ckpt(str(tmp_path))
    model, tok, _ = v.get_model_and_tokenizer_and_processor(
        visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
    )
    import dataclasses

    gc = dataclasses.replace(SamplingConfig.greedy(max_new_tokens=6), num_beams=2)
    pix = np.random.default_rng(0).standard_normal(
        (1, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
    ).astype(np.float32)
    resp, hist = v.chat(model, pix, "ab", [], gc, verbose=False)
    assert isinstance(resp, str)
    assert hist[-1]["type"] == "response"


def test_beam_early_stopping(models):
    hf, params, cfg = models
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 60, size=(1, 7)).astype(np.int32)
    eos = hf.config.eos_token_id
    ours = beam_generate(
        params, cfg, ids, None, None,
        num_beams=3, max_new_tokens=8, eos_token_id=eos,
        early_stopping=True,
    )
    theirs = hf_beam(hf, ids, 3, 8, eos, early_stopping=True)
    t = list(theirs)
    if eos in t:
        t = t[: t.index(eos) + 1]
    o = list(np.asarray(ours))
    if eos in o:
        o = o[: o.index(eos) + 1]
    assert o == t, (o, t)


class TestBeamSample:
    """HF beam_sample semantics (num_beams>1 AND do_sample): candidate draws
    are multinomial-without-replacement over the warped flat distribution
    (Gumbel top-k); bookkeeping shared with beam search.  RNG differs from
    torch so tests check structure + determinism, not bit parity."""

    def _run(self, models, seed=0, **kw):
        from visualcla_tpu.engine.beam import beam_sample_generate
        from visualcla_tpu.engine.sampling import SamplingConfig

        hf, params, cfg = models
        rng = np.random.default_rng(3)
        ids = rng.integers(3, 60, size=(1, 8)).astype(np.int64)
        scfg = SamplingConfig(
            num_beams=3, do_sample=True, max_new_tokens=10,
            temperature=0.7, top_k=20, top_p=0.95,
            repetition_penalty=1.1, no_repeat_ngram_size=0, **kw,
        )
        return beam_sample_generate(
            params, cfg, ids, None, None, scfg,
            eos_token_id=2, pad_token_id=0, seed=seed, dtype=jnp.float32,
        )

    def test_runs_and_is_seed_deterministic(self, models):
        a = self._run(models, seed=5)
        b = self._run(models, seed=5)
        np.testing.assert_array_equal(a, b)
        assert 1 <= len(a) <= 10
        assert all(0 <= t < 64 for t in a)

    def test_different_seeds_diverge(self, models):
        outs = {tuple(self._run(models, seed=s).tolist()) for s in range(6)}
        assert len(outs) > 1  # sampling is actually happening

    def test_sampled_candidates_respect_warped_support(self, models):
        """With top_k=1 per beam, every sampled candidate token must be that
        beam's argmax — warped-out tokens can never be drawn."""
        from visualcla_tpu.engine.beam import beam_sample_generate
        from visualcla_tpu.engine.sampling import SamplingConfig

        hf, params, cfg = models
        rng = np.random.default_rng(4)
        ids = rng.integers(3, 60, size=(1, 8)).astype(np.int64)
        scfg = SamplingConfig(
            num_beams=2, do_sample=True, max_new_tokens=6,
            temperature=1.0, top_k=1, top_p=1.0,
            repetition_penalty=1.0, no_repeat_ngram_size=0,
        )
        out = beam_sample_generate(
            params, cfg, ids, None, None, scfg,
            eos_token_id=2, pad_token_id=0, seed=1, dtype=jnp.float32,
        )
        # top_k=1 collapses sampling to per-beam greedy: deterministic result
        out2 = beam_sample_generate(
            params, cfg, ids, None, None, scfg,
            eos_token_id=2, pad_token_id=0, seed=99, dtype=jnp.float32,
        )
        np.testing.assert_array_equal(out, out2)

    def test_api_routes_sampled_beams(self, models, tmp_path_factory):
        import jax
        import visualcla_tpu as v
        from visualcla_tpu.engine.sampling import SamplingConfig

        from .test_api import make_native_ckpt

        tmp = str(tmp_path_factory.mktemp("beam_sample_api"))
        ckpt, cfg = make_native_ckpt(tmp)
        model, _, _ = v.get_model_and_tokenizer_and_processor(
            visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
        )
        gc = SamplingConfig(num_beams=3, do_sample=True, max_new_tokens=6)
        resp, _ = v.chat(model, None, "ab", [], gc, verbose=False)
        assert isinstance(resp, str)


def test_beam_cache_cap_finalize_matches_hf(models):
    """Regression: when the loop exits via the cache-full (slot >= Smax) break,
    finalize must pair each candidate's score with ITS OWN continuation ids
    (old beam's gen + its token), not with the stale gen[] at the same rank.
    A cache capped at S + k - 1 slots emits exactly k tokens, so it must match
    HF with max_new_tokens=k."""
    hf, params, cfg = models
    eos = hf.config.eos_token_id
    for seed, nb, k in [(7, 3, 4), (8, 2, 5), (9, 4, 3)]:
        rng = np.random.default_rng(seed)
        ids = rng.integers(3, 60, size=(1, 9)).astype(np.int32)
        ours = beam_generate(
            params, cfg, ids, None, None,
            num_beams=nb, max_new_tokens=16, eos_token_id=eos,
            pad_token_id=0, max_seq_len=ids.shape[1] + k - 1,
        )
        theirs = hf_beam(hf, ids, nb, k, eos)
        t = list(theirs)
        if eos in t:
            t = t[: t.index(eos) + 1]
        o = list(np.asarray(ours))
        if eos in o:
            o = o[: o.index(eos) + 1]
        assert o == t, (seed, o, t)


def _fused_vs_host(cfg, params, ids, **kw):
    from visualcla_tpu.engine.beam import beam_generate, beam_generate_fused

    want = beam_generate(params, cfg, ids, None, None, **kw)
    got = beam_generate_fused(params, cfg, ids, None, None, **kw)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    return want


def test_fused_beam_matches_host(models):
    """Device-side fused beam loop == host-driven scorer, token for token."""
    _, params, cfg = models
    rng = np.random.default_rng(0)
    ids = rng.integers(4, 60, size=(1, 7)).astype(np.int32)
    for nb, lp, es in ((2, 1.0, False), (4, 2.0, False), (2, 1.0, True)):
        _fused_vs_host(
            cfg, params, ids,
            num_beams=nb, max_new_tokens=8, eos_token_id=2,
            pad_token_id=0, length_penalty=lp, early_stopping=es,
        )


def test_fused_beam_eos_heavy(models):
    """A vocab-tilted model that emits EOS often exercises the hypothesis
    buffer + eviction + finalize paths."""
    _, params, cfg = models
    import jax

    # tilt every logit toward EOS=2 by bumping the lm_head column
    import jax.numpy as jnp

    params = dict(params)
    params["text"] = dict(params["text"])
    lm = params["text"]["lm_head"]
    params["text"]["lm_head"] = lm.at[:, 2].add(jnp.float32(0.35))
    rng = np.random.default_rng(1)
    ids = rng.integers(4, 60, size=(1, 5)).astype(np.int32)
    out = _fused_vs_host(
        cfg, params, ids,
        num_beams=3, max_new_tokens=10, eos_token_id=2, pad_token_id=0,
        length_penalty=1.0, early_stopping=False,
    )
    assert out.shape[0] >= 1


def test_fused_beam_flat_structure_matches_host(models):
    """The flat (step x layer) fused-beam loop — the structure 7B bf16 needs
    on a 16GB chip — is token-identical to the host scorer too."""
    from visualcla_tpu.engine.beam import beam_generate, beam_generate_fused

    _, params, cfg = models
    rng = np.random.default_rng(4)
    ids = rng.integers(4, 60, size=(1, 6)).astype(np.int32)
    kw = dict(num_beams=3, max_new_tokens=7, eos_token_id=2, pad_token_id=0,
              length_penalty=1.3, early_stopping=False)
    want = beam_generate(params, cfg, ids, None, None, **kw)
    got = beam_generate_fused(params, cfg, ids, None, None,
                              structure="flat", **kw)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_fused_beam_cache_cap_matches_host(models):
    """Regression (code-review round 2): the fused loop's stop condition must
    bind at the CALLER's max_seq_len, not at the 128/256-aligned cache
    allocation — a non-multiple cap (S + k - 1) must emit exactly k tokens
    and match the host scorer token for token."""
    _, params, cfg = models
    for seed, nb, k in [(7, 3, 4), (8, 2, 5)]:
        rng = np.random.default_rng(seed)
        ids = rng.integers(3, 60, size=(1, 9)).astype(np.int32)
        _fused_vs_host(
            cfg, params, ids,
            num_beams=nb, max_new_tokens=16, eos_token_id=2,
            pad_token_id=0, max_seq_len=ids.shape[1] + k - 1,
        )


def test_api_batched_beam_matches_per_row(tmp_path):
    """VisualCLA.generate(num_beams>1) with a B>1 batch: HF semantics = each
    row an independent beam search; output right-padded to the longest."""
    import json
    import os

    import jax.numpy as jnp

    import visualcla_tpu as v
    from tests.test_checkpoint import build_merged_dir
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.processor import ImageProcessor
    from visualcla_tpu.text import build_test_model

    merged, _ = build_merged_dir(str(tmp_path))
    chars = sorted(set("abcdefgh 图片?"))
    sp = build_test_model(chars + ["ab"], [-100.0] * len(chars) + [-1.0],
                          byte_fallback=False)
    sp.save(os.path.join(merged, "tokenizer.model"))
    with open(os.path.join(merged, "added_tokens.json"), "w") as f:
        json.dump({"<pad>": sp.vocab_size, "<img>": sp.vocab_size + 1,
                   "</img>": sp.vocab_size + 2,
                   "<img_token>": sp.vocab_size + 3}, f)
    ImageProcessor(image_size=28, crop_size=28).save_pretrained(merged)
    model, tok, _ = v.get_model_and_tokenizer_and_processor(
        visualcla_model=merged, dtype=jnp.float32, max_seq_len=128)

    import dataclasses
    gc = dataclasses.replace(SamplingConfig.greedy(max_new_tokens=5),
                             num_beams=2)
    rng = np.random.default_rng(2)
    ids = rng.integers(4, 80, (2, 9)).astype(np.int32)

    batched = np.asarray(model.generate(ids, generation_config=gc))
    rows = [np.asarray(model.generate(ids[b:b + 1], generation_config=gc))[0]
            for b in range(2)]
    assert batched.shape[0] == 2
    pad = tok.pad_token_id
    for b in range(2):
        got = list(batched[b])
        want = list(rows[b]) + [pad] * (len(got) - len(rows[b]))
        assert got == want


def test_reorder_tail_matches_full_gather():
    """_reorder_tail's invariant: because all beams share one prefill (slots
    [0, prompt_len) identical across the beam axis) and slots past the write
    slot are zeros, gathering ONLY the generated tail must equal the naive
    whole-cache gather v[:, beam_idx]."""
    import jax
    from visualcla_tpu.engine.beam import _reorder_tail

    rng = np.random.default_rng(0)
    L, nb, Nkv, S, hd = 2, 3, 2, 10, 4
    P, W = 4, 8  # prompt_len, current write slot

    def leaf(shape):
        v = rng.standard_normal(shape).astype(np.float32)
        v[:, :] = v[:, :1]  # start beam-invariant everywhere...
        gen = rng.standard_normal(shape).astype(np.float32)
        v[:, :, :, P:W] = gen[:, :, :, P:W]  # ...then diverge the gen tail
        v[:, :, :, W:] = 0.0  # unwritten slots are zeros
        return jnp.asarray(v)

    cache = {
        "k": leaf((L, nb, Nkv, S, hd)),
        "v": leaf((L, nb, Nkv, S, hd)),
        "k_scale": leaf((L, nb, Nkv, S)),  # int8-KV scale rank (slot axis 3)
    }
    beam_idx = jnp.asarray([2, 0, 0], jnp.int32)

    got = jax.jit(lambda c, b: _reorder_tail(c, b, P))(cache, beam_idx)
    for name, v in cache.items():
        want = np.asarray(v)[:, np.asarray(beam_idx)]
        np.testing.assert_array_equal(np.asarray(got[name]), want,
                                      err_msg=name)
