"""Numerical parity of our JAX towers vs the HF/torch reference stack (tiny configs).

Both stacks run in DOUBLE precision (conftest enables x64): our ops reproduce HF's
hard-coded fp32 upcast points (RMSNorm stats, rope tables, attention softmax,
logits cast), so "the math is identical" shows up as ~1e-9 agreement instead of
being buried in fp32 accumulation noise.  A bf16/fp32 smoke test guards the
runtime dtype path separately.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from visualcla_tpu.core.config import LlamaConfig, ResamplerConfig, ViTConfig
from visualcla_tpu.models import clip_vit, llama, resampler

from . import hf_ref

# Both stacks softmax/normalize in fp32 at the same points but with different
# reduction orders, so ~1e-6 absolute noise is irreducible even in f64 — still
# ~1000x tighter than a full-fp32 comparison.
ATOL = 5e-6
RTOL = 5e-5


def f64(tree):
    if isinstance(tree, dict):
        return {k: f64(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float64)


class TestLlamaParity:
    def test_forward_logits_f64(self):
        hf_model, hf_cfg = hf_ref.tiny_hf_llama()
        hf_model = hf_model.double()
        cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
        params = f64(hf_ref.llama_params_from_hf(hf_model))

        torch.manual_seed(1)
        ids = torch.randint(0, hf_cfg.vocab_size, (2, 11))
        with torch.no_grad():
            ref = hf_model(ids).logits.numpy()

        ours = np.asarray(llama.forward_logits(params, cfg, jnp.asarray(ids.numpy())))
        np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)

    def test_forward_with_left_padding(self):
        """Left-padded rows must match HF's attention_mask + position_ids handling.

        Runs in fp32: HF's own f64 path NaNs out on fully-masked pad rows (its
        additive mask uses finfo.min), so double-precision comparison is
        impossible — fp32 tolerance + argmax identity instead.
        """
        hf_model, hf_cfg = hf_ref.tiny_hf_llama()
        cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
        params = jax.tree.map(
            lambda a: np.asarray(a, np.float32), hf_ref.llama_params_from_hf(hf_model)
        )

        torch.manual_seed(2)
        ids = torch.randint(0, hf_cfg.vocab_size, (1, 9))
        pad = torch.zeros((1, 3), dtype=torch.long)
        padded = torch.cat([pad, ids], dim=1)
        mask = torch.cat(
            [torch.zeros(1, 3, dtype=torch.long), torch.ones(1, 9, dtype=torch.long)], dim=1
        )
        position_ids = (mask.cumsum(-1) - 1).clamp(min=0)
        with torch.no_grad():
            ref = hf_model(padded, attention_mask=mask, position_ids=position_ids).logits.numpy()

        ours = np.asarray(
            llama.forward_logits(
                params, cfg, jnp.asarray(padded.numpy()), jnp.asarray(mask.numpy())
            )
        )
        np.testing.assert_allclose(ours[:, 3:], ref[:, 3:], atol=5e-3, rtol=5e-3)
        np.testing.assert_array_equal(
            ours[:, 3:].argmax(-1), ref[:, 3:].argmax(-1)
        )

    def test_incremental_decode_matches_full_forward(self):
        """Prefill + per-token decode through the KV cache == one-shot forward."""
        hf_model, hf_cfg = hf_ref.tiny_hf_llama()
        hf_model = hf_model.double()
        cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
        params = f64(hf_ref.llama_params_from_hf(hf_model))

        rng = np.random.default_rng(3)
        ids = rng.integers(0, hf_cfg.vocab_size, (2, 10))
        full = np.asarray(llama.forward_logits(params, cfg, jnp.asarray(ids)))

        S, Smax = 6, 10
        cache = llama.init_kv_cache(cfg, 2, Smax, jnp.float64)
        mask = np.zeros((2, Smax), bool)
        mask[:, :S] = True
        h, cache = llama.forward(
            params, cfg,
            llama.embed(params, jnp.asarray(ids[:, :S])),
            jnp.arange(S, dtype=jnp.int32)[None].repeat(2, 0),
            cache, jnp.asarray(mask), jnp.int32(0),
        )
        logits_steps = [np.asarray(llama.logits(params, h))[:, -1]]
        for t in range(S, Smax):
            mask[:, : t + 1] = True
            h, cache = llama.forward(
                params, cfg,
                llama.embed(params, jnp.asarray(ids[:, t : t + 1])),
                jnp.full((2, 1), t, jnp.int32),
                cache, jnp.asarray(mask), jnp.int32(t),
            )
            logits_steps.append(np.asarray(llama.logits(params, h))[:, -1])

        for i, step_logits in enumerate(logits_steps):
            np.testing.assert_allclose(
                step_logits, full[:, S - 1 + i], atol=ATOL, rtol=RTOL
            )

    def test_forward_fp32_smoke(self):
        """fp32 end-to-end stays within accumulation noise of HF fp32."""
        hf_model, hf_cfg = hf_ref.tiny_hf_llama()
        cfg = LlamaConfig.from_hf_dict(hf_cfg.to_dict())
        params = {
            k: jax.tree.map(lambda a: np.asarray(a, np.float32), v)
            for k, v in hf_ref.llama_params_from_hf(hf_model).items()
        }
        torch.manual_seed(1)
        ids = torch.randint(0, hf_cfg.vocab_size, (2, 11))
        with torch.no_grad():
            ref = hf_model(ids).logits.numpy()
        ours = np.asarray(llama.forward_logits(params, cfg, jnp.asarray(ids.numpy())))
        np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=5e-3)


class TestViTParity:
    def test_forward_full_post_layernorm_f64(self):
        hf_model, hf_cfg = hf_ref.tiny_hf_clip_vision()
        hf_model = hf_model.double()
        cfg = ViTConfig.from_hf_dict(hf_cfg.to_dict())
        params = f64(hf_ref.vit_params_from_hf(hf_model))

        torch.manual_seed(4)
        pixels = torch.randn(2, 3, hf_cfg.image_size, hf_cfg.image_size, dtype=torch.float64)
        with torch.no_grad():
            out = hf_model(pixel_values=pixels)
            # VisualCLA applies post_layernorm to the FULL sequence
            # (reference modeling_visualcla.py:284)
            ref = hf_model.vision_model.post_layernorm(out.last_hidden_state).numpy()

        ours = clip_vit.forward(params, cfg, jnp.asarray(pixels.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=RTOL)


class TestResamplerParity:
    def _make(self, layers=2):
        ref_mod = hf_ref.load_reference_resampler_module()
        if ref_mod is None:
            pytest.skip("reference resampler not importable in this environment")
        torch.manual_seed(5)
        ref_cfg = ref_mod.VisualResamplerConfig(
            hidden_size=8, num_hidden_layers=layers, num_attention_heads=2,
            intermediate_size=16, num_query_tokens=4,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        ref_model = ref_mod.VisualResamplerModel(ref_cfg).eval().double()
        # reference queries are zero-init; randomize so the test is non-trivial
        with torch.no_grad():
            ref_model.query_embeddding.normal_(0, 0.5)
        cfg = ResamplerConfig(
            hidden_size=8, num_hidden_layers=layers, num_attention_heads=2,
            intermediate_size=16, num_query_tokens=4,
        )
        params = f64(hf_ref.resampler_params_from_ref(ref_model))
        return ref_model, cfg, params

    def test_forward_vs_reference_f64(self):
        ref_model, cfg, params = self._make()
        image = torch.randn(2, 5, 8, dtype=torch.float64)
        with torch.no_grad():
            ref_out = ref_model(encoder_hidden_states=image).last_hidden_state.numpy()
        ours = resampler.forward(params, cfg, jnp.asarray(image.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=ATOL, rtol=RTOL)

    def test_pooler_f64(self):
        ref_model, cfg, params = self._make(layers=1)
        image = torch.randn(1, 5, 8, dtype=torch.float64)
        with torch.no_grad():
            ref_out = ref_model(encoder_hidden_states=image).pooler_output.numpy()
        hidden = resampler.forward(params, cfg, jnp.asarray(image.numpy()))
        ours = resampler.pool(params, hidden)
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=ATOL, rtol=RTOL)


class TestResamplerHeadPruning:
    """prune_heads mask vs the reference's physical prune_linear_layer slicing
    (modeling_visual_resampler.py:287-303): outputs must agree exactly."""

    def _make(self, layers=2, heads=4):
        ref_mod = hf_ref.load_reference_resampler_module()
        if ref_mod is None:
            pytest.skip("reference resampler not importable in this environment")
        torch.manual_seed(11)
        ref_cfg = ref_mod.VisualResamplerConfig(
            hidden_size=8, num_hidden_layers=layers, num_attention_heads=heads,
            intermediate_size=16, num_query_tokens=4,
            hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        )
        ref_model = ref_mod.VisualResamplerModel(ref_cfg).eval().double()
        with torch.no_grad():
            ref_model.query_embeddding.normal_(0, 0.5)
        cfg = ResamplerConfig(
            hidden_size=8, num_hidden_layers=layers, num_attention_heads=heads,
            intermediate_size=16, num_query_tokens=4,
        )
        params = f64(hf_ref.resampler_params_from_ref(ref_model))
        return ref_model, cfg, params

    def test_pruned_heads_match_reference(self):
        ref_model, cfg, params = self._make()
        to_prune = {0: [1], 1: [0, 3]}
        # NOTE: the reference's VisualResamplerModel._prune_heads (:595-601) is
        # itself broken — it dereferences `layer.attention` but the attribute
        # is `crossattention` (:367).  Call the working per-layer path.
        for l, heads in to_prune.items():
            ref_model.encoder.layer[l].crossattention.prune_heads(heads)
        ref_model.double()  # prune_linear_layer rebuilds Linears in float32
        image = torch.randn(2, 5, 8, dtype=torch.float64)
        with torch.no_grad():
            ref_out = ref_model(encoder_hidden_states=image).last_hidden_state.numpy()
        pruned = resampler.prune_heads(params, cfg, to_prune)
        ours = resampler.forward(pruned, cfg, jnp.asarray(image.numpy()))
        np.testing.assert_allclose(np.asarray(ours), ref_out, atol=ATOL, rtol=RTOL)

    def test_unpruned_unchanged_and_validation(self):
        _, cfg, params = self._make()
        image = jnp.asarray(np.random.default_rng(0).standard_normal((1, 5, 8)))
        base = resampler.forward(params, cfg, image)
        noop = resampler.forward(
            resampler.prune_heads(params, cfg, {}), cfg, image)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(noop))
        with pytest.raises(ValueError):
            resampler.prune_heads(params, cfg, {9: [0]})
        with pytest.raises(ValueError):
            resampler.prune_heads(params, cfg, {0: [99]})
