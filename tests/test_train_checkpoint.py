"""Train-state save/resume round trip (orbax)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import visualcla as vmod
from visualcla_tpu.train import init_train_state, make_optimizer, make_train_step
from visualcla_tpu.train.checkpointing import (
    latest_step_dir,
    restore_train_state,
    save_train_state,
)


@pytest.mark.slow
def test_train_state_roundtrip(tmp_path):
    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    opt = make_optimizer(learning_rate=1e-3, schedule="const")
    step = jax.jit(make_train_step(cfg, opt))
    state = init_train_state(params, opt)
    batch = {
        "input_ids": jnp.ones((1, 8), jnp.int32),
        "attention_mask": jnp.ones((1, 8), jnp.int32),
        "labels": jnp.ones((1, 8), jnp.int32),
        "img_start_pos": jnp.full((1,), -1, jnp.int32),
        "pixel_values": None,
    }
    state, _ = step(state, batch)
    state, _ = step(state, batch)

    path = os.path.join(str(tmp_path), "ts", "step_2")
    save_train_state(path, state)
    template = init_train_state(params, opt)
    restored = restore_train_state(path, template)
    assert int(restored.step) == 2
    a = jax.tree.leaves(jax.tree.map(np.asarray, state.params))
    b = jax.tree.leaves(jax.tree.map(np.asarray, restored.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # optimizer moments restored too
    oa = jax.tree.leaves(jax.tree.map(np.asarray, state.opt_state))
    ob = jax.tree.leaves(jax.tree.map(np.asarray, restored.opt_state))
    for x, y in zip(oa, ob):
        np.testing.assert_array_equal(x, y)

    assert latest_step_dir(os.path.join(str(tmp_path), "ts")).endswith("step_2")
    # training continues from the restored state
    restored, m = step(restored, batch)
    assert int(restored.step) == 3 and np.isfinite(float(m["loss"]))
