"""End-to-end greedy token-identity vs an HF/torch composite (tiny config).

This is the north-star behavioral test (SURVEY.md §4/§6): the torch side
reproduces the reference's VisualCLAModel.generate flow
(modeling_visualcla.py:333-392) — ViT -> full-sequence post_layernorm ->
resampler -> projection -> embedding splice -> HF greedy generate from
inputs_embeds — and our Engine must emit the identical token ids.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from visualcla_tpu.core.config import (
    LlamaConfig,
    ResamplerConfig,
    ViTConfig,
    VisualCLAConfig,
)
from visualcla_tpu.engine.generate import Engine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.models import visualcla

from . import hf_ref

IMG_START, IMG_END, IMG_TOKEN = 100, 101, 102  # marker ids inside tiny vocab
EOS = 2


def build_composite(seed=0, dtype=np.float64):
    """Tiny torch composite + matching JAX params/config."""
    torch.manual_seed(seed)
    llm, llm_cfg = hf_ref.tiny_hf_llama(vocab_size=128, hidden=16, layers=2, heads=4)
    vit, vit_cfg = hf_ref.tiny_hf_clip_vision(hidden=8, layers=2, heads=2)
    ref_mod = hf_ref.load_reference_resampler_module()
    if ref_mod is None:
        pytest.skip("reference resampler not importable")
    res_cfg_t = ref_mod.VisualResamplerConfig(
        hidden_size=8, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=16, num_query_tokens=4,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    res = ref_mod.VisualResamplerModel(res_cfg_t).eval()
    with torch.no_grad():
        res.query_embeddding.normal_(0, 0.5)
    proj = torch.nn.Linear(8, 16)

    llm, vit, res, proj = llm.double(), vit.double(), res.double(), proj.double()

    cfg = VisualCLAConfig(
        text_config=LlamaConfig.from_hf_dict(llm_cfg.to_dict()),
        vision_config=ViTConfig.from_hf_dict(vit_cfg.to_dict()),
        visual_resampler_config=ResamplerConfig(
            hidden_size=8, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=16, num_query_tokens=4,
        ),
    )

    def f64(tree):
        if isinstance(tree, dict):
            return {k: f64(v) for k, v in tree.items()}
        return np.asarray(tree, dtype)

    params = {
        "text": f64(hf_ref.llama_params_from_hf(llm)),
        "vision": f64(hf_ref.vit_params_from_hf(vit)),
        "resampler": f64(hf_ref.resampler_params_from_ref(res)),
        "projection": {
            "weight": np.asarray(hf_ref.t2n(proj.weight).T, dtype),
            "bias": np.asarray(hf_ref.t2n(proj.bias), dtype),
        },
    }
    return (llm, vit, res, proj), cfg, params


def torch_reference_generate(models, input_ids, pixel_values, max_new_tokens):
    """Reproduce VisualCLAModel.generate (reference :333-392) in torch."""
    llm, vit, res, proj = models
    with torch.no_grad():
        emb = llm.get_input_embeddings()(input_ids)
        vision_out = vit(pixel_values=pixel_values)
        img = vit.vision_model.post_layernorm(vision_out.last_hidden_state)
        img = res(encoder_hidden_states=img).last_hidden_state
        img = proj(img)
        pos = int((input_ids[0] == IMG_START).nonzero()[0])
        n = img.shape[1]
        assert int(input_ids[0, pos + n + 1]) == IMG_END
        mm = torch.cat([emb[:, : pos + 1], img, emb[:, pos + n + 1 :]], dim=1)
        out = llm.generate(
            inputs_embeds=mm,
            attention_mask=torch.ones(mm.shape[:2], dtype=torch.long),
            do_sample=False,
            max_new_tokens=max_new_tokens,
            eos_token_id=EOS,
            pad_token_id=0,
        )
    return out.numpy()


def make_prompt(rng, prompt_len=12, num_img_tokens=4):
    """ids: [bos, text..., <img>, <img_token>*n, </img>, text...]"""
    ids = rng.integers(3, 90, size=prompt_len).astype(np.int64)
    ids[0] = 1
    insert_at = 3
    ids = np.concatenate([
        ids[:insert_at],
        [IMG_START], [IMG_TOKEN] * num_img_tokens, [IMG_END],
        ids[insert_at:],
    ])
    return ids[None, :]


class TestGreedyTokenIdentity:
    def test_multimodal_greedy_matches_hf(self):
        models, cfg, params = build_composite()
        rng = np.random.default_rng(11)
        ids = make_prompt(rng)
        pixels = rng.normal(size=(1, 3, 28, 28))

        ref_ids = torch_reference_generate(
            models, torch.tensor(ids), torch.tensor(pixels, dtype=torch.float64), 8
        )

        engine = Engine(
            params, cfg, eos_token_id=EOS, pad_token_id=0,
            max_seq_len=64, prompt_buckets=(32,), dtype=jnp.float64,
        )
        img_pos = np.asarray([3], np.int32)
        ours = engine.generate(
            ids, pixels, img_pos, SamplingConfig.greedy(max_new_tokens=8)
        )
        assert ours.shape[1] <= 8
        np.testing.assert_array_equal(ours[0], ref_ids[0][: ours.shape[1]])
        assert ours.shape[1] == ref_ids.shape[1]

    def test_text_only_greedy_matches_hf(self):
        models, cfg, params = build_composite()
        llm = models[0]
        rng = np.random.default_rng(13)
        ids = rng.integers(3, 90, size=(1, 10)).astype(np.int64)
        ids[0, 0] = 1
        with torch.no_grad():
            emb = llm.get_input_embeddings()(torch.tensor(ids))
            ref = llm.generate(
                inputs_embeds=emb,
                attention_mask=torch.ones(emb.shape[:2], dtype=torch.long),
                do_sample=False, max_new_tokens=8, eos_token_id=EOS, pad_token_id=0,
            ).numpy()

        engine = Engine(
            params, cfg, eos_token_id=EOS, pad_token_id=0,
            max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float64,
        )
        ours = engine.generate(ids, None, None, SamplingConfig.greedy(max_new_tokens=8))
        np.testing.assert_array_equal(ours[0], ref[0][: ours.shape[1]])
        assert ours.shape[1] == ref.shape[1]

    def test_stream_matches_generate(self):
        models, cfg, params = build_composite()
        rng = np.random.default_rng(17)
        ids = make_prompt(rng)
        pixels = rng.normal(size=(1, 3, 28, 28))
        engine = Engine(
            params, cfg, eos_token_id=EOS, pad_token_id=0,
            max_seq_len=64, prompt_buckets=(32,), dtype=jnp.float64,
        )
        img_pos = np.asarray([3], np.int32)
        scfg = SamplingConfig.greedy(max_new_tokens=8)
        blocking = engine.generate(ids, pixels, img_pos, scfg)
        streamed = np.stack(
            list(engine.stream(ids, pixels, img_pos, scfg)), axis=1
        )
        np.testing.assert_array_equal(blocking, streamed[:, : blocking.shape[1]])

    def test_chunked_stream_matches_per_token(self):
        models, cfg, params = build_composite()
        engine = Engine(
            params, cfg, eos_token_id=EOS, pad_token_id=0,
            max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float64,
        )
        rng = np.random.default_rng(4)
        ids = rng.integers(3, 60, size=(1, 10)).astype(np.int64)
        s = SamplingConfig.greedy(max_new_tokens=9)
        per_token = [t.copy() for t in engine.stream(ids, None, None, s)]
        chunked = [t.copy()
                   for t in engine.stream(ids, None, None, s, chunk_size=4)]
        assert len(per_token) == len(chunked)
        for a, b in zip(per_token, chunked):
            np.testing.assert_array_equal(a, b)

    def test_sampled_decode_runs_with_default_config(self):
        """The reference's default sampling config end-to-end (no crash, valid ids)."""
        models, cfg, params = build_composite()
        rng = np.random.default_rng(19)
        ids = make_prompt(rng)
        pixels = rng.normal(size=(1, 3, 28, 28))
        engine = Engine(
            params, cfg, eos_token_id=EOS, pad_token_id=0,
            max_seq_len=64, prompt_buckets=(32,), dtype=jnp.float64,
        )
        scfg = SamplingConfig(max_new_tokens=8, no_repeat_ngram_size=3)
        out = engine.generate(ids, pixels, np.asarray([3], np.int32), scfg, seed=7)
        assert out.shape[0] == 1 and 1 <= out.shape[1] <= 8
        assert (out >= 0).all() and (out < 128).all()
