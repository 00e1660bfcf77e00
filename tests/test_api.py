"""End-to-end API tests on a tiny native checkpoint: load, chat, stream, int8."""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.checkpoint import save_checkpoint
from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.models import visualcla as vmod
from visualcla_tpu.text import build_test_model


def make_native_ckpt(tmp, vocab_extra=4):
    """Tiny native checkpoint dir with tokenizer.model + configs."""
    corpus_chars = sorted(set("abcdefgh 你好图片"))
    vocab = corpus_chars + ["ab", "cd", "你好"]
    scores = [-100.0] * len(corpus_chars) + [-1.0, -2.0, -3.0]
    sp = build_test_model(vocab, scores)
    sp_vocab = sp.vocab_size
    cfg = tiny_visualcla_config(vocab_size=sp_vocab + vocab_extra)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    ckpt = os.path.join(tmp, "ckpt")
    save_checkpoint(ckpt, params, cfg, dtype="float32")
    sp.save(os.path.join(ckpt, "tokenizer.model"))
    with open(os.path.join(ckpt, "added_tokens.json"), "w") as f:
        json.dump(
            {"<pad>": sp_vocab, "<img>": sp_vocab + 1,
             "</img>": sp_vocab + 2, "<img_token>": sp_vocab + 3}, f
        )
    return ckpt, cfg


@pytest.fixture(scope="module")
def loaded(tmp_path_factory):
    import visualcla_tpu as v

    tmp = str(tmp_path_factory.mktemp("api"))
    ckpt, cfg = make_native_ckpt(tmp)
    model, tokenizer, processor = v.get_model_and_tokenizer_and_processor(
        visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
    )
    return model, tokenizer, processor, cfg


def _image(cfg):
    rng = np.random.default_rng(0)
    size = cfg.vision_config.image_size
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def test_factory_surface(loaded):
    model, tokenizer, processor, cfg = loaded
    assert model.num_patch == cfg.visual_resampler_config.num_query_tokens
    assert model.image_at_head is False
    assert tokenizer.pad_token == "<pad>"
    assert processor.tokenizer is tokenizer


def test_chat_round(loaded):
    from visualcla_tpu.api import chat

    model, tokenizer, processor, cfg = loaded
    # bypass resize path: feed preprocessed pixels directly (reference accepts
    # raw pixel_values too, modeling_utils.py:153-154)
    pix = np.asarray(
        np.random.default_rng(1).standard_normal(
            (1, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
        ),
        np.float32,
    )
    gc = SamplingConfig.greedy(max_new_tokens=8)
    history = []
    response, history = chat(model, pix, "ab", history, gc, verbose=False)
    assert isinstance(response, str)
    assert history[0]["type"] == "instruction"
    assert history[0].get("first_instruction") is True
    assert history[-1] == {"type": "response", "value": response}

    # second turn replays history; image only in first instruction
    response2, history = chat(model, pix, "cd", history, gc, verbose=False)
    assert len(history) == 4
    assert "first_instruction" not in history[2]


def test_chat_stream_matches_blocking(loaded):
    from visualcla_tpu.api import chat, chat_in_stream

    model, tokenizer, processor, cfg = loaded
    pix = np.asarray(
        np.random.default_rng(2).standard_normal(
            (1, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
        ),
        np.float32,
    )
    gc = SamplingConfig.greedy(max_new_tokens=6)
    blocking, _ = chat(model, pix, "ab", [], gc, verbose=False)
    outs = list(chat_in_stream(model, pix, "ab", [], gc, verbose=False))
    assert len(outs) >= 1
    final, hist = outs[-1]
    # the stream path applies the reference's '▁'-prefix space fixup; the
    # blocking decode strips the leading dummy prefix -> compare modulo that
    assert final.lstrip(" ") == blocking.lstrip(" ")
    assert hist[-1]["value"] == final


@pytest.mark.slow
@pytest.mark.parametrize("quant_kw", [
    {"load_in_8bit": True},
    {"load_in_4bit": True},  # beyond-reference grouped-s4 tier
])
def test_load_reference_merged_dir_quantized(tmp_path, quant_kw):
    """get_model... on a reference-layout merged dir (in-memory conversion)
    with load_in_8bit / load_in_4bit: quantized text tower, chat runs."""
    import visualcla_tpu as v
    from tests.test_checkpoint import build_merged_dir
    from visualcla_tpu.ops.quantization import is_quantized
    from visualcla_tpu.processor import ImageProcessor
    from visualcla_tpu.text import build_test_model

    merged, (text, vision, resampler, proj) = build_merged_dir(str(tmp_path))
    chars = sorted(set("abcdefgh 图片?"))
    sp = build_test_model(chars + ["ab"], [-100.0] * len(chars) + [-1.0],
                          byte_fallback=False)
    sp.save(os.path.join(merged, "tokenizer.model"))
    with open(os.path.join(merged, "added_tokens.json"), "w") as f:
        json.dump({"<pad>": sp.vocab_size, "<img>": sp.vocab_size + 1,
                   "</img>": sp.vocab_size + 2, "<img_token>": sp.vocab_size + 3}, f)
    ImageProcessor(image_size=28, crop_size=28).save_pretrained(merged)

    model, tok, proc = v.get_model_and_tokenizer_and_processor(
        visualcla_model=merged, **quant_kw,
        dtype=jnp.float32, max_seq_len=256,
    )
    qp = model.params["text"]["layers"]["q_proj"]
    assert is_quantized(qp)
    if "load_in_4bit" in quant_kw:
        # grouped layout: (..., G, gs, out) s4 q + (..., G, out) scales
        assert qp["q"].ndim == qp["scale"].ndim + 1
    assert not is_quantized(model.params["vision"]["layers"]["q_proj"])
    from visualcla_tpu.api import chat

    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (40, 40, 3), dtype=np.uint8))
    resp, hist = chat(model, img, "ab",
                      [], SamplingConfig.greedy(max_new_tokens=4), verbose=False)
    assert isinstance(resp, str)


def test_int8_quantization_close():
    from visualcla_tpu.ops.quantization import quantize_tree
    from visualcla_tpu.train import train_forward_logits

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 1, 16
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    pos = jnp.full((B,), -1, jnp.int32)
    dense = train_forward_logits(params, cfg, ids, mask, pos, None)
    q = quantize_tree(params)
    quant = train_forward_logits(q, cfg, ids, mask, pos, None)
    # int8 weight-only: logits track dense closely on a tiny model
    err = np.abs(np.asarray(dense) - np.asarray(quant)).max()
    scale = np.abs(np.asarray(dense)).max()
    assert err < 0.1 * scale, (err, scale)


def test_num_return_sequences_sampled(loaded):
    """HF semantics (reference carries the knob in DEFAULT_GENERATION_CONFIG,
    modeling_utils.py:44): sampled n>1 duplicates each input row n times with
    independent draws."""
    model, tokenizer, _, cfg = loaded
    ids = np.asarray(tokenizer.encode("ab cd"), np.int32)[None]
    gc = SamplingConfig(max_new_tokens=8, do_sample=True, temperature=1.0,
                        top_k=0, top_p=1.0, repetition_penalty=1.0,
                        no_repeat_ngram_size=0, num_return_sequences=3)
    out = model.generate(ids, generation_config=gc, seed=0)
    assert out.shape[0] == 3
    # independent draws: with a near-uniform tiny model, 3 identical 8-token
    # rows would mean the expansion shares one draw
    assert not (np.array_equal(out[0], out[1])
                and np.array_equal(out[1], out[2]))
    # B=2 expansion keeps HF row order (all returns of row 0, then row 1)
    out2 = model.generate(np.concatenate([ids, ids]), generation_config=gc,
                          seed=0)
    assert out2.shape[0] == 6


def test_num_return_sequences_greedy_raises(loaded):
    model, tokenizer, _, _ = loaded
    ids = np.asarray(tokenizer.encode("ab"), np.int32)[None]
    gc = SamplingConfig.greedy(max_new_tokens=4)
    gc = dataclasses.replace(gc, num_return_sequences=2)
    with pytest.raises(ValueError, match="num_return_sequences"):
        model.generate(ids, generation_config=gc)


def test_num_return_sequences_beam(loaded):
    model, tokenizer, _, _ = loaded
    ids = np.asarray(tokenizer.encode("ab cd"), np.int32)[None]
    base = dict(max_new_tokens=6, do_sample=False, temperature=1.0,
                top_k=0, top_p=1.0, repetition_penalty=1.0,
                no_repeat_ngram_size=0, num_beams=3)
    one = model.generate(ids, generation_config=SamplingConfig(**base))
    two = model.generate(
        ids, generation_config=SamplingConfig(**base, num_return_sequences=2))
    assert two.shape[0] == 2
    # row 0 is the best hypothesis == the n=1 result (modulo padding)
    n = min(one.shape[1], two.shape[1])
    np.testing.assert_array_equal(one[0][:n], two[0][:n])
    with pytest.raises(ValueError, match="num_beams"):
        model.generate(ids, generation_config=SamplingConfig(
            **base, num_return_sequences=4))


def test_hijack_samplers_noop():
    from visualcla_tpu.api import hijack_samplers

    hijack_samplers()  # must not raise
