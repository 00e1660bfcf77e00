"""Training-step tests: loss semantics, convergence, stage masks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import visualcla
from visualcla_tpu.train import (
    causal_lm_loss,
    init_train_state,
    make_optimizer,
    make_train_step,
    stage1_trainable,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_visualcla_config()


@pytest.fixture(scope="module")
def batch(cfg):
    rng = np.random.default_rng(1)
    B, S = 2, 24
    n_img = cfg.num_image_tokens
    ids = rng.integers(5, cfg.text_config.vocab_size, (B, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, : n_img + 4] = -100  # mask prompt/image region
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "img_start_pos": jnp.full((B,), 1, jnp.int32),
        "pixel_values": jnp.asarray(
            rng.standard_normal(
                (B, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
            ),
            jnp.float32,
        ),
    }


def test_loss_matches_manual_ce():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4, 7)), jnp.float32)
    labels = jnp.asarray([[-100, 2, -100, 3]])
    # positions contributing: predict labels[1]=2 from logits[0], labels[3]=3 from logits[2]
    lp = jax.nn.log_softmax(logits, axis=-1)
    expected = -(lp[0, 0, 2] + lp[0, 2, 3]) / 2
    assert np.allclose(causal_lm_loss(logits, labels), expected, rtol=1e-6)


def test_loss_all_ignored_is_finite():
    logits = jnp.zeros((1, 4, 7), jnp.float32)
    labels = jnp.full((1, 4), -100, jnp.int32)
    assert np.isfinite(float(causal_lm_loss(logits, labels)))


@pytest.mark.slow
def test_train_step_reduces_loss(cfg, batch):
    params = visualcla.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    opt = make_optimizer(learning_rate=3e-3, schedule="const")
    step = jax.jit(make_train_step(cfg, opt))
    state = init_train_state(params, opt)
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8


def test_stage1_mask_freezes_text(cfg, batch):
    params = visualcla.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    opt = make_optimizer(learning_rate=1e-2, schedule="const")
    step = jax.jit(make_train_step(cfg, opt, trainable=stage1_trainable))
    state = init_train_state(params, opt)
    before_text = jax.tree.map(np.asarray, state.params["text"])
    before_res = np.asarray(state.params["resampler"]["layers"]["q_proj"])
    state, _ = step(state, batch)
    after_text = jax.tree.map(np.asarray, state.params["text"])
    same = jax.tree.map(np.array_equal, before_text, after_text)
    assert all(jax.tree.leaves(same)), "text tower must stay frozen in stage 1"
    assert not np.array_equal(before_res, np.asarray(state.params["resampler"]["layers"]["q_proj"]))


def test_cache_free_training_forward_matches_cached():
    """The cache-free training path (llama.forward with kv_cache=None —
    the fix for the L^2 scan-residual OOM at 7B) must produce exactly the
    cached dense path's hidden states."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import llama, visualcla as vmod

    cfg = tiny_visualcla_config(vocab_size=96)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    t = cfg.text_config
    rng = np.random.default_rng(0)
    B, S = 2, 24
    embeds = jnp.asarray(rng.standard_normal((B, S, t.hidden_size)),
                         jnp.float32)
    mask = np.ones((B, S), np.int32)
    mask[1, -5:] = 0  # ragged row
    pos = jnp.asarray(np.maximum(np.cumsum(mask, -1) - 1, 0), jnp.int32)
    kv_valid = jnp.asarray(mask.astype(bool))
    cache = llama.init_kv_cache(t, B, S, jnp.float32)
    h_cached, _ = llama.forward(params["text"], t, embeds, pos, cache,
                                kv_valid, jnp.int32(0))
    h_free, c = llama.forward(params["text"], t, embeds, pos, None,
                              kv_valid, jnp.int32(0))
    assert c is None
    np.testing.assert_allclose(np.asarray(h_free), np.asarray(h_cached),
                               atol=1e-5)
