"""Pipeline parallelism: identical math to llama.forward, GPipe schedule.

Runs on the virtual 8-device CPU mesh (conftest).  Every test checks EXACT
agreement (f64) with the single-device forward — PP only changes the execution
schedule, never the numbers (unlike the reference's device_map placement,
which this replaces; SURVEY.md §2.c).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import llama
from visualcla_tpu.parallel import pipeline as pp


def make_cfg(layers=4):
    return dataclasses.replace(
        tiny_visualcla_config(vocab_size=64).text_config,
        num_hidden_layers=layers,
    )


def make_inputs(cfg, B=2, S=8, Smax=16, dtype=jnp.float64, kv_quant="none"):
    rng = np.random.default_rng(0)
    params = llama.init_params(jax.random.PRNGKey(1), cfg, dtype)
    ids = jnp.asarray(rng.integers(3, 60, (B, S)), jnp.int32)
    embeds = llama.embed(params, ids)
    positions = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    cache = llama.init_kv_cache(cfg, B, Smax, dtype, kv_quant=kv_quant)
    kv_valid = jnp.concatenate(
        [jnp.ones((B, S), bool), jnp.zeros((B, Smax - S), bool)], axis=-1
    )
    return params, embeds, positions, cache, kv_valid


def run_ref(params, cfg, embeds, positions, cache, kv_valid, slot):
    return llama.forward(params, cfg, embeds, positions, cache, kv_valid, slot)


@pytest.mark.parametrize("n_pipe,n_data,n_micro", [
    (2, 1, 1), (4, 1, 1), (2, 1, 2), (2, 2, 2), (4, 2, 1),
])
def test_pipeline_prefill_matches_forward(n_pipe, n_data, n_micro):
    cfg = make_cfg(layers=4)
    B = max(2, n_data * n_micro)
    params, embeds, positions, cache, kv_valid = make_inputs(cfg, B=B)
    mesh = pp.make_pipe_mesh(n_pipe, n_data)
    h_ref, c_ref = run_ref(params, cfg, embeds, positions, cache, kv_valid,
                           jnp.int32(0))
    h_pp, c_pp = pp.pipeline_forward(
        params, cfg, embeds, positions, cache, kv_valid, jnp.int32(0),
        mesh, n_micro=n_micro,
    )
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=1e-12, atol=1e-12)
    for k in c_ref:
        np.testing.assert_allclose(np.asarray(c_pp[k]), np.asarray(c_ref[k]),
                                   rtol=1e-12, atol=1e-12)


@pytest.mark.slow
def test_pipeline_decode_steps_match():
    """Prefill + 3 single-token decode steps through the pipeline equal the
    plain forward run step-by-step (cache handoff between calls included)."""
    cfg = make_cfg(layers=4)
    B, S, Smax = 2, 6, 16
    params, embeds, positions, cache, kv_valid = make_inputs(cfg, B=B, S=S,
                                                             Smax=Smax)
    mesh = pp.make_pipe_mesh(2, 1)

    h_ref, c_ref = run_ref(params, cfg, embeds, positions, cache, kv_valid,
                           jnp.int32(0))
    c_pp = llama.init_kv_cache(cfg, B, Smax, jnp.float64)
    h_pp, c_pp = pp.pipeline_forward(params, cfg, embeds, positions, c_pp,
                                     kv_valid, jnp.int32(0), mesh)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref), atol=1e-12)

    rng = np.random.default_rng(7)
    kvv_ref = kvv_pp = kv_valid
    for step in range(3):
        tok = jnp.asarray(rng.integers(3, 60, (B, 1)), jnp.int32)
        emb = llama.embed(params, tok)
        pos = jnp.full((B, 1), S + step, jnp.int32)
        slot = jnp.int32(S + step)
        kvv_ref = kvv_ref.at[:, S + step].set(True)
        kvv_pp = kvv_pp.at[:, S + step].set(True)
        h_ref, c_ref = run_ref(params, cfg, emb, pos, c_ref, kvv_ref, slot)
        h_pp, c_pp = pp.pipeline_forward(params, cfg, emb, pos, c_pp, kvv_pp,
                                         slot, mesh)
        np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                                   rtol=1e-12, atol=1e-12)


def test_pipeline_per_row_slots():
    """Continuous-batching style per-row write slots through the pipeline."""
    cfg = make_cfg(layers=2)
    B, Smax = 2, 16
    params, embeds, positions, cache, _ = make_inputs(cfg, B=B, S=1, Smax=Smax)
    slot = jnp.asarray([3, 7], jnp.int32)
    kv_valid = (jnp.arange(Smax)[None, :] <= slot[:, None])
    mesh = pp.make_pipe_mesh(2, 1)
    pos = jnp.asarray([[3], [7]], jnp.int32)
    h_ref, c_ref = run_ref(params, cfg, embeds, pos, cache, kv_valid, slot)
    h_pp, c_pp = pp.pipeline_forward(params, cfg, embeds, pos, cache, kv_valid,
                                     slot, mesh)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=1e-12, atol=1e-12)
    for k in c_ref:
        np.testing.assert_allclose(np.asarray(c_pp[k]), np.asarray(c_ref[k]),
                                   rtol=1e-12, atol=1e-12)


def test_pipeline_int8_kv_cache():
    cfg = make_cfg(layers=2)
    params, embeds, positions, cache, kv_valid = make_inputs(
        cfg, B=2, kv_quant="int8", dtype=jnp.float32
    )
    mesh = pp.make_pipe_mesh(2, 1)
    h_ref, c_ref = run_ref(params, cfg, embeds, positions, cache, kv_valid,
                           jnp.int32(0))
    h_pp, c_pp = pp.pipeline_forward(params, cfg, embeds, positions, cache,
                                     kv_valid, jnp.int32(0), mesh)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(c_pp["k"]), np.asarray(c_ref["k"]))


def test_stage_param_specs_and_sharding():
    cfg = make_cfg(layers=4)
    mesh = pp.make_pipe_mesh(2, 1)
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    sharded = pp.shard_text_params(params, mesh, cfg)
    qs = sharded["layers"]["q_proj"]
    # layer axis split across the two stages
    shard_shapes = {tuple(s.data.shape) for s in qs.addressable_shards}
    assert shard_shapes == {(2,) + tuple(qs.shape[1:])}
    with pytest.raises(ValueError):
        pp.stage_param_specs(3, cfg)  # 4 layers % 3 stages


def test_bad_microbatch_count_raises():
    cfg = make_cfg(layers=2)
    params, embeds, positions, cache, kv_valid = make_inputs(cfg, B=2)
    mesh = pp.make_pipe_mesh(2, 1)
    with pytest.raises(ValueError):
        pp.pipeline_forward(params, cfg, embeds, positions, cache, kv_valid,
                            jnp.int32(0), mesh, n_micro=3)


@pytest.mark.slow
def test_pipeline_grad_matches_plain():
    """Reverse-mode AD through the GPipe schedule (ppermute transposes to the
    reverse ring) gives the same gradients as the plain forward."""
    cfg = make_cfg(layers=4)
    B, S, Smax = 2, 8, 16
    params, embeds0, positions, cache0, kv_valid = make_inputs(cfg, B=B, S=S,
                                                               Smax=Smax)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(3, 60, (B, S)), jnp.int32)
    mesh = pp.make_pipe_mesh(2, 1)

    def loss_pp(p):
        cache = llama.init_kv_cache(cfg, B, Smax, jnp.float64)
        h, _ = pp.pipeline_forward(p, cfg, llama.embed(p, ids), positions,
                                   cache, kv_valid, jnp.int32(0), mesh,
                                   n_micro=2)
        return jnp.sum(h ** 2)

    def loss_ref(p):
        cache = llama.init_kv_cache(cfg, B, Smax, jnp.float64)
        h, _ = llama.forward(p, cfg, llama.embed(p, ids), positions, cache,
                             kv_valid, jnp.int32(0))
        return jnp.sum(h ** 2)

    g_pp = jax.grad(loss_pp)(params)
    g_ref = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-10)


@pytest.mark.slow
def test_pipeline_train_step_matches_plain():
    """make_train_step(pipeline_mesh=...) produces the same loss/grad_norm as
    the plain step — full multimodal composite, 2-stage pipe."""
    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    cfg = tiny_visualcla_config(vocab_size=128)  # 2 text layers
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    mesh = pp.make_pipe_mesh(2, 1)
    opt = make_optimizer(learning_rate=1e-3)
    B, S = 2, 24
    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(1)
    batch = {
        "input_ids": jnp.asarray(rng.integers(3, 120, (B, S)), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.concatenate(
            [jnp.full((B, n_img + 2), -100, jnp.int32),
             jnp.ones((B, S - n_img - 2), jnp.int32)], axis=-1),
        "img_start_pos": jnp.zeros((B,), jnp.int32),
        "pixel_values": jnp.asarray(
            rng.standard_normal(
                (B, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
            ), jnp.float32),
    }
    plain_step = make_train_step(cfg, opt)
    pp_step = make_train_step(cfg, opt, pipeline_mesh=mesh, n_micro=2)
    _, m_plain = plain_step(init_train_state(params, opt), batch)
    _, m_pp = pp_step(init_train_state(params, opt), batch)
    np.testing.assert_allclose(float(m_pp["loss"]), float(m_plain["loss"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(m_pp["grad_norm"]),
                               float(m_plain["grad_norm"]), rtol=1e-5)


@pytest.mark.parametrize("n_pipe,n_model,n_micro", [(2, 2, 1), (2, 4, 2), (4, 2, 1)])
def test_pipeline_tp_composition(n_pipe, n_model, n_micro):
    """PP x TP on a ('pipe','model') mesh — 'pipe' manual (GPipe ring),
    'model' left to GSPMD (partial-manual shard_map). Exact equality."""
    cfg = make_cfg(layers=4)
    B = max(2, n_micro)
    params, embeds, positions, cache, kv_valid = make_inputs(cfg, B=B)
    mesh = pp.make_pipe_tp_mesh(n_pipe, n_model,
                                devices=jax.devices()[: n_pipe * n_model])
    text = pp.shard_text_params(params, mesh, cfg)
    h_ref, c_ref = run_ref(params, cfg, embeds, positions, cache, kv_valid,
                           jnp.int32(0))
    h_pp, c_pp = pp.pipeline_forward(
        text, cfg, embeds, positions, cache, kv_valid, jnp.int32(0),
        mesh, n_micro=n_micro,
    )
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=1e-12, atol=1e-12)
    for k in c_ref:
        np.testing.assert_allclose(np.asarray(c_pp[k]), np.asarray(c_ref[k]),
                                   rtol=1e-12, atol=1e-12)
