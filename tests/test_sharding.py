"""TP/DP sharding on a virtual 8-device CPU mesh (SURVEY.md §4: the TPU-idiomatic
analog of a fake-NCCL multi-host test).  Sharded execution must be numerically
identical (f64) to single-device execution."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import llama, visualcla
from visualcla_tpu.parallel import sharding


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return sharding.make_mesh(n_data=2, n_model=4)


def test_mesh_axes(mesh8):
    assert mesh8.shape == {"data": 2, "model": 4}


def test_sharded_forward_matches_single_device(mesh8):
    cfg = tiny_visualcla_config()
    params = visualcla.init_params(jax.random.PRNGKey(0), cfg, jnp.float64)

    rng = np.random.default_rng(0)
    B, S = 2, 16
    ids = rng.integers(3, 90, (B, S))
    ids[:, 3] = 100
    pixels = rng.normal(size=(B, 3, 28, 28))
    img_pos = np.full((B,), 3, np.int32)
    mask = np.ones((B, S), np.int32)

    def run(p, ids, mask, img_pos, pixels):
        cache = llama.init_kv_cache(cfg.text_config, B, S, jnp.float64)
        logits, _ = visualcla.prefill_forward(
            p, cfg, ids, mask, img_pos, pixels, cache
        )
        return logits

    ref = np.asarray(
        run(params, jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(img_pos), jnp.asarray(pixels))
    )

    sharded_params = sharding.shard_params(params, mesh8)
    # verify at least one big tensor actually got model-sharded
    qspec = sharded_params["text"]["layers"]["q_proj"].sharding.spec
    assert "model" in str(qspec)

    data_sh = NamedSharding(mesh8, P("data"))
    with mesh8:
        out = jax.jit(run)(
            sharded_params,
            jax.device_put(jnp.asarray(ids), data_sh),
            jax.device_put(jnp.asarray(mask), data_sh),
            jax.device_put(jnp.asarray(img_pos), data_sh),
            jax.device_put(jnp.asarray(pixels), data_sh),
        )
    # logits are fp32 by contract; sharded all-reduce ordering gives ~1e-8 noise
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_fsdp_train_step_matches_tp_only(mesh8):
    """ZeRO-style layer-axis param sharding: same loss, params stay sharded."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.parallel import sharding as shd
    from visualcla_tpu.train import init_train_state, make_optimizer, make_train_step

    cfg = tiny_visualcla_config()  # 2 layers % data(2) == 0
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    opt = make_optimizer(learning_rate=1e-3, schedule="const")
    step = make_train_step(cfg, opt)
    B, S = 4, 24
    batch = {
        "input_ids": jnp.ones((B, S), jnp.int32),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.ones((B, S), jnp.int32),
        "img_start_pos": jnp.full((B,), -1, jnp.int32),
        "pixel_values": None,
    }
    losses = {}
    for fsdp in (False, True):
        # re-init per run: donation may reclaim buffers aliased by device_put
        params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
        p = shd.shard_params(params, mesh8, fsdp=fsdp)
        state = init_train_state(p, opt)
        data_sharding = NamedSharding(mesh8, P("data"))
        b = {k: (jax.device_put(v, data_sharding) if v is not None else None)
             for k, v in batch.items()}
        state, m = jax.jit(step)(state, b)
        losses[fsdp] = float(m["loss"])
        if fsdp:
            sh = state.params["text"]["layers"]["q_proj"].sharding
            assert "data" in str(sh.spec)  # layer axis stays data-sharded
    assert np.isclose(losses[False], losses[True], rtol=1e-5)


def test_sequence_sharded_forward(mesh8):
    """Activations sharded over ('data', 'model') on (batch, seq): GSPMD
    inserts the attention collectives; logits match the replicated run.
    (The backward pass under sequence sharding trips an XLA-CPU crash in this
    jaxlib — forward-only here; grads are covered by the TP/DP/FSDP tests.)"""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.train import train_forward_logits

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(1)
    B, S = 4, 32  # S % model(4) == 0
    ids = jnp.asarray(rng.integers(4, 90, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    pos = jnp.full((B,), -1, jnp.int32)

    fwd = jax.jit(lambda p, i, m: train_forward_logits(p, cfg, i, m, pos, None))
    ref = np.asarray(fwd(params, ids, mask))

    from visualcla_tpu.parallel import sharding as shd

    p = shd.shard_params(params, mesh8)
    seq_sharding = NamedSharding(mesh8, P("data", "model"))
    out = fwd(p, jax.device_put(ids, seq_sharding),
              jax.device_put(mask, seq_sharding))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4, rtol=1e-4)


def test_pod_mesh_shapes(mesh8):
    from visualcla_tpu.parallel.distributed import pod_mesh

    m = pod_mesh(n_data=2)
    assert m.shape == {"data": 2, "model": len(jax.devices()) // 2}
    m1 = pod_mesh(n_data=1)
    assert m1.shape["model"] == len(jax.devices())


def test_spec_validation_skips_indivisible_dims(mesh8):
    # hidden=16 with model=4 divides; a 6-dim axis must fall back to replicated
    spec = sharding._valid_spec(P(None, "model"), (3, 6), mesh8)
    assert spec == P()
    spec = sharding._valid_spec(P(None, "model"), (3, 8), mesh8)
    assert spec == P(None, "model")


def test_beam_and_speculative_under_mesh_match_single_device(mesh8, tmp_path):
    """Beam search and speculative decode trace their own jits OUTSIDE the
    Engine's _scoped programs — the model's mesh must still reach the
    attention dispatch at trace time (code-review round 2: the scope now
    wraps the api-level beam dispatch and SpeculativeDecoder's jits, and the
    override is thread-local)."""
    import dataclasses
    import json
    import os

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

    plain, tok, _ = v.get_model_and_tokenizer_and_processor(
        visualcla_model=merged, dtype=jnp.float32, max_seq_len=128)
    meshed, _, _ = v.get_model_and_tokenizer_and_processor(
        visualcla_model=merged, dtype=jnp.float32, max_seq_len=128,
        mesh=mesh8)

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 90, (1, 12)).astype(np.int32)
    gc_beam = dataclasses.replace(
        SamplingConfig.greedy(max_new_tokens=6), num_beams=2)
    gc_greedy = SamplingConfig.greedy(max_new_tokens=6)

    want_beam = np.asarray(plain.generate(ids, generation_config=gc_beam))
    got_beam = np.asarray(meshed.generate(ids, generation_config=gc_beam))
    np.testing.assert_array_equal(want_beam, got_beam)

    want_spec = np.asarray(plain.generate(
        ids, generation_config=gc_greedy, speculative=True, spec_k=3))
    got_spec = np.asarray(meshed.generate(
        ids, generation_config=gc_greedy, speculative=True, spec_k=3))
    np.testing.assert_array_equal(want_spec, got_spec)


def test_paged_tp_b8_token_identity(mesh8):
    """Paged serving under the full data=2 x model=4 mesh with an int8 KV
    pool and a full B=8 row set decodes token-identically to the unsharded
    engine, and leaves no non-aliasable donations (VERDICT r2 item 3 /
    BASELINE config 5, continuous-batching serving on v5e-8)."""
    import warnings

    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig

    cfg = tiny_visualcla_config(vocab_size=96, hidden_size=16)
    params = visualcla.init_params(jax.random.PRNGKey(21), cfg, jnp.float32)
    rng = np.random.default_rng(22)
    prompts = [rng.integers(4, 90, size=(int(n),)).astype(np.int32)
               for n in rng.integers(6, 40, size=8)]

    def run(p, mesh_):
        eng = PagedServingEngine(
            p, cfg, eos_token_id=2, pad_token_id=0,
            pool_size=8, block_size=8, num_blocks=96,
            max_seq_len=96, max_new_tokens_cap=8, prompt_buckets=(16, 32, 48),
            sampling=SamplingConfig.greedy(max_new_tokens=8),
            dtype=jnp.float32, kv_quant="int8", mesh=mesh_,
        )
        # mixed admission: even rows one-shot, odd rows chunked
        for r, prompt in enumerate(prompts):
            if r % 2:
                pp = eng.begin_prefill(r, prompt, None, None, 8, chunk=16)
                while not pp.step():
                    pass
            else:
                eng.prefill_row(r, prompt, None, None, 8)
        for _ in range(8):
            eng.step()
        return [list(eng.collect_row(r)) for r in range(8)]

    want = run(params, None)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        got = run(sharding.shard_params(params, mesh8), mesh8)
    assert want == got
    bad = [str(w.message) for w in caught
           if "donated buffers were not usable" in str(w.message)]
    assert not bad, f"paged-TP left non-aliasable donations: {bad}"
