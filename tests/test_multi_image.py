"""Multi-image splice (webui-plugin capability) tests — model-level (B, K)
splice plus the round-5 native surfaces: api.chat with per-turn image lists,
the prompt builder's per-message markers, and the serving admission paths."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import visualcla as vmod


def test_multi_image_splice_matches_sequential():
    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    B, S, K = 2, 40, 2
    T = cfg.num_image_tokens
    size = cfg.vision_config.image_size
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, (B, S)), jnp.int32)
    pix = jnp.asarray(rng.standard_normal((B, K, 3, size, size)), jnp.float32)
    # image 0 at pos 2, image 1 at pos 2+T+2 (non-overlapping spans)
    pos = jnp.asarray([[2, 2 + T + 2], [5, -1]], jnp.int32)  # row 1: one image

    out = vmod.multimodal_embeds(params, cfg, ids, pos, pix)

    # manual: splice each image with the single-image path
    base = vmod.multimodal_embeds(params, cfg, ids, pos[:, 0], pix[:, 0])
    emb1 = vmod.encode_image(params, cfg, pix[:, 1])
    want = vmod.splice_image_embeds(base, emb1, jnp.maximum(pos[:, 1], 0))
    want = jnp.where((pos[:, 1] < 0)[:, None, None], base, want)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)

    # untouched positions keep their token embeddings
    from visualcla_tpu.models import llama

    text_emb = llama.embed(params["text"], ids)
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(text_emb[:, 0]))
    np.testing.assert_array_equal(
        np.asarray(out[1, 30:]), np.asarray(text_emb[1, 30:])
    )


# -- native-surface multi-image (round 5): api.chat / prompt / serving -------

@pytest.fixture(scope="module")
def loaded(tmp_path_factory):
    import visualcla_tpu as v

    from .test_api import make_native_ckpt

    tmp = str(tmp_path_factory.mktemp("multiimg"))
    ckpt, cfg = make_native_ckpt(tmp)
    model, tokenizer, processor = v.get_model_and_tokenizer_and_processor(
        visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=512
    )
    return model, tokenizer, cfg


def _pix(cfg, seed):
    size = cfg.vision_config.image_size
    return np.asarray(
        np.random.default_rng(seed).standard_normal((1, 3, size, size)),
        np.float32)


def test_prompt_builder_per_turn_images():
    from visualcla_tpu.text.prompt import IMAGE_PLACEHOLDER, build_prompt

    # legacy default: first turn carries exactly one placeholder
    assert build_prompt([], "hi").count(IMAGE_PLACEHOLDER) == 1
    # explicit K this turn
    assert build_prompt([], "hi", num_images=2).count(IMAGE_PLACEHOLDER) == 2
    assert build_prompt([], "hi", num_images=0).count(IMAGE_PLACEHOLDER) == 0
    # history entries replay their own counts; legacy first_instruction == 1
    hist = [
        {"type": "instruction", "value": "a", "first_instruction": True,
         "images": 1},
        {"type": "response", "value": "r"},
        {"type": "instruction", "value": "b", "images": 2},
        {"type": "response", "value": "r2"},
    ]
    assert build_prompt(hist, "c", num_images=1).count(IMAGE_PLACEHOLDER) == 4
    legacy = [
        {"type": "instruction", "value": "a", "first_instruction": True},
        {"type": "response", "value": "r"},
    ]
    assert build_prompt(legacy, "c").count(IMAGE_PLACEHOLDER) == 1


def test_all_img_marker_positions():
    from visualcla_tpu.text.prompt import all_img_marker_positions

    ids = np.array([[7, 9, 1, 2, 9, 3], [9, 1, 2, 3, 4, 5]])
    pos = all_img_marker_positions(ids, 9)
    np.testing.assert_array_equal(pos, [[1, 4], [0, -1]])
    none = all_img_marker_positions(np.array([[1, 2, 3]]), 9)
    np.testing.assert_array_equal(none, [[-1]])


def test_chat_two_images_matches_hand_built_prompt(loaded):
    """VERDICT r4 item 7 acceptance: two images across two turns produce the
    SAME tokens as the equivalent hand-built marker prompt."""
    from visualcla_tpu.api import chat
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.text.prompt import (all_img_marker_positions,
                                           build_prompt)

    model, tokenizer, cfg = loaded
    pa, pb = _pix(cfg, 1), _pix(cfg, 2)
    gc = SamplingConfig.greedy(max_new_tokens=6)

    history = []
    r1, history = chat(model, [pa], "ab", history, gc, verbose=False)
    assert history[0]["images"] == 1
    r2, history = chat(model, [pb], "cd", history, gc, verbose=False)

    # hand-built: full turn-2 prompt with BOTH markers + stacked pixels
    hist2 = [
        {"type": "instruction", "value": "ab", "first_instruction": True,
         "images": 1},
        {"type": "response", "value": r1},
    ]
    prompt = build_prompt(hist2, "cd", num_images=1)
    prompt = prompt.replace(
        "<image_placeholder>",
        tokenizer.img_start_token + model.num_patch * tokenizer.img_token
        + tokenizer.img_end_token)
    enc = tokenizer(tokenizer.bos_token + prompt, add_special_tokens=False)
    ids = enc["input_ids"]
    pos = all_img_marker_positions(ids, tokenizer.img_start_token_id)
    assert (pos >= 0).sum() == 2
    pix = np.stack([pa, pb], axis=1)  # (1, 2, 3, H, W)
    out = model.generate(ids, pixel_values=pix, generation_config=gc)
    want = tokenizer.decode(out[0], skip_special_tokens=True)
    assert r2 == want


def test_chat_second_turn_image_reaches_the_splice(loaded):
    """The second turn's image must actually flow into the prefill (the
    round-4 silent-drop failure mode): the prepared inputs stack BOTH turns'
    pixels, the prompt carries both markers, and the spliced embeddings at
    the second marker change with the second image (deterministic — greedy
    token equality on a tiny random model is too degenerate to witness
    this)."""
    import copy

    from visualcla_tpu.api import _prepare_inputs
    from visualcla_tpu.text.prompt import all_img_marker_positions

    model, tokenizer, cfg = loaded
    pa = _pix(cfg, 1)
    h1 = [{"type": "instruction", "value": "ab", "first_instruction": True,
           "images": 1, "images_pv": [pa]},
          {"type": "response", "value": "r"}]

    def prep(second_pix):
        enc, pv = _prepare_inputs(model, [second_pix], "cd",
                                  copy.deepcopy(h1))
        return enc["input_ids"], pv

    ids_a, pv_a = prep(_pix(cfg, 2))
    ids_b, pv_b = prep(_pix(cfg, 3))
    np.testing.assert_array_equal(ids_a, ids_b)
    assert pv_a.shape[:2] == (1, 2)
    pos = all_img_marker_positions(ids_a, tokenizer.img_start_token_id)
    assert pos.shape == (1, 2) and (pos >= 0).all()
    ea = vmod.multimodal_embeds(model.params, cfg, jnp.asarray(ids_a),
                                jnp.asarray(pos), jnp.asarray(pv_a))
    eb = vmod.multimodal_embeds(model.params, cfg, jnp.asarray(ids_a),
                                jnp.asarray(pos), jnp.asarray(pv_b))
    d = np.abs(np.asarray(ea - eb)).max(axis=-1)[0]
    changed = np.nonzero(d > 0)[0]
    T = cfg.num_image_tokens
    want = np.arange(int(pos[0, 1]) + 1, int(pos[0, 1]) + 1 + T)
    np.testing.assert_array_equal(changed, want)


def test_serve_prepare_request_multi(loaded):
    """serve.py multi-image protocol: images_b64 lists, history echo."""
    import base64
    import io
    import types

    from PIL import Image

    from visualcla_tpu.apps.serve import PoolWorker

    model, tokenizer, cfg = loaded

    def b64(seed):
        size = cfg.vision_config.image_size
        arr = np.random.default_rng(seed).integers(
            0, 256, (size, size, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    fake = types.SimpleNamespace(model=model)
    prep = PoolWorker._prepare_request
    ids, pv, img_pos, history, overrides, max_new = prep(
        fake, {"text": "ab", "images_b64": [b64(1), b64(2)]})
    assert isinstance(img_pos, list) and len(img_pos) == 2
    assert pv.shape[:2] == (1, 2)
    assert history[-1]["images"] == 2 and len(history[-1]["images_b64"]) == 2
    # second turn: one more image; history images replayed
    ids2, pv2, img_pos2, history2, _, _ = prep(
        fake, {"text": "cd", "images_b64": [b64(3)], "history": history})
    assert len(img_pos2) == 3
    assert pv2.shape[:2] == (1, 3)
    # marker/pixel count mismatch is loud
    with pytest.raises(ValueError):
        bad_hist = [{"type": "instruction", "value": "a",
                     "first_instruction": True},  # marker, no stored pixels
                    {"type": "response", "value": "r"}]
        prep(fake, {"text": "x", "images_b64": [b64(4)],
                    "history": bad_hist})


def test_paged_multi_image_admission_matches_engine(loaded):
    """PagedServingEngine multi-image prefill == Engine multi-image path."""
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.text.prompt import all_img_marker_positions

    model, tokenizer, cfg = loaded
    pa, pb = _pix(cfg, 5), _pix(cfg, 6)
    T = cfg.num_image_tokens
    marker = ([tokenizer.img_start_token_id]
              + [tokenizer.img_token_id] * T + [tokenizer.img_end_token_id])
    ids = np.array([3] + marker + [4, 5] + marker + [6], np.int32)[None]
    pos = all_img_marker_positions(ids, tokenizer.img_start_token_id)
    pix = np.stack([pa, pb], axis=1)
    gc = SamplingConfig.greedy(max_new_tokens=6)
    want = model.generate(ids, pixel_values=pix, generation_config=gc)[0]

    eng = PagedServingEngine(
        model.params, cfg, eos_token_id=tokenizer.eos_token_id,
        pad_token_id=tokenizer.pad_token_id, pool_size=2, block_size=16,
        num_blocks=24, max_seq_len=128, max_new_tokens_cap=8,
        prompt_buckets=(64,), sampling=gc, dtype=jnp.float32)
    eng.prefill_row(0, ids[0], pix, [int(p) for p in pos[0]], 6)
    for _ in range(8):
        eng.step()
    got = eng.collect_row(0)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got)[:len(want)])
