"""Surface parity extras: tokenizer HF aliases, resize_token_embeddings."""
import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import visualcla as vmod
from visualcla_tpu.text import VisualCLATokenizer, build_test_model


def test_tokenizer_hf_aliases():
    sp = build_test_model(["a", "b", "ab"], [-3.0, -2.0, -1.0])
    tok = VisualCLATokenizer(sp, use_native=False)
    tok.add_special_tokens(("<pad>", "<img>", "</img>", "<img_token>"))
    assert tok.convert_tokens_to_ids("<img>") == tok.img_start_token_id
    assert tok.convert_tokens_to_ids(["<img>", "</img>"]) == [
        tok.img_start_token_id, tok.img_end_token_id,
    ]
    seqs = [tok.encode("ab"), tok.encode("a b")]
    outs = tok.batch_decode(seqs, skip_special_tokens=True)
    assert outs == ["ab", "a b"]
    assert all(isinstance(t, str) for t in tok.tokenize("ab"))


def test_extend_to_resolution(tmp_path):
    import visualcla_tpu as v
    from tests.test_api import make_native_ckpt
    from visualcla_tpu.engine.sampling import SamplingConfig

    ckpt, cfg = make_native_ckpt(str(tmp_path))
    model, tok, _ = v.get_model_and_tokenizer_and_processor(
        visualcla_model=ckpt, dtype=jnp.float32, max_seq_len=256
    )
    old_size = cfg.vision_config.image_size  # 28 (2x2 patch grid)
    new_size = old_size * 2  # 4x4 grid
    model.extend_to_resolution(new_size)
    assert model.config.vision_config.image_size == new_size
    grid = (new_size // cfg.vision_config.patch_size) ** 2
    assert model.params["vision"]["position_embedding"].shape[0] == grid + 1
    # chat still runs at the new resolution
    pix = np.random.default_rng(0).standard_normal(
        (1, 3, new_size, new_size)).astype(np.float32)
    resp, _ = v.chat(model, pix, "ab", [],
                     SamplingConfig.greedy(max_new_tokens=4), verbose=False)
    assert isinstance(resp, str)


def test_resize_token_embeddings():
    cfg = tiny_visualcla_config(vocab_size=100)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    grown = vmod.resize_token_embeddings(params, 108)
    assert grown["text"]["embed_tokens"].shape[0] == 108
    assert grown["text"]["lm_head"].shape[1] == 108
    np.testing.assert_array_equal(
        np.asarray(grown["text"]["embed_tokens"][:100]),
        np.asarray(params["text"]["embed_tokens"]),
    )
    # forward still works with ids into the new range
    from visualcla_tpu.models import llama

    import dataclasses

    cfg2 = dataclasses.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, vocab_size=108)
    )
    logits = llama.forward_logits(
        grown["text"], cfg2.text_config, jnp.asarray([[1, 105, 107]], jnp.int32)
    )
    assert logits.shape == (1, 3, 108)
    shrunk = vmod.resize_token_embeddings(params, 96)
    assert shrunk["text"]["embed_tokens"].shape[0] == 96
