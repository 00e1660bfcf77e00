"""Multi-image splice (webui-plugin capability) tests."""
import jax
import jax.numpy as jnp
import numpy as np

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
