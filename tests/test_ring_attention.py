"""Ring attention (context parallelism) vs the dense XLA reference.

Runs on the virtual 8-device CPU mesh (conftest).  The ring result must match
``ops.attention.dot_product_attention`` — same math, different distribution.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from visualcla_tpu.ops.attention import causal_bias, dot_product_attention, padding_bias
from visualcla_tpu.parallel.ring import ring_attention_sharded


def _dense_ref(q, k, v, kv_valid, causal):
    B, S = q.shape[:2]
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    bias = causal_bias(pos, kv_valid, pos) if causal else padding_bias(kv_valid)
    return dot_product_attention(q, k, v, bias)


def _rand_qkv(rng, B, S, N, Nkv, H, dtype=np.float32):
    q = rng.standard_normal((B, S, N, H)).astype(dtype)
    k = rng.standard_normal((B, S, Nkv, H)).astype(dtype)
    v = rng.standard_normal((B, S, Nkv, H)).astype(dtype)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_dense_seq8(rng, causal):
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    q, k, v = _rand_qkv(rng, 2, 64, 4, 4, 16)
    out = ring_attention_sharded(q, k, v, mesh, causal=causal)
    ref = _dense_ref(q, k, v, jnp.ones((2, 64), bool), causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gqa_and_padding(rng):
    """Grouped-query heads + padded (invalid) tail slots."""
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("seq",))
    B, S = 2, 32
    q, k, v = _rand_qkv(rng, B, S, 8, 2, 16)
    kv_valid = jnp.asarray(
        np.concatenate([np.ones((B, 24), bool), np.zeros((B, 8), bool)], axis=1)
    )
    out = ring_attention_sharded(q, k, v, mesh, kv_valid=kv_valid)
    ref = _dense_ref(q, k, v, kv_valid, True)
    # padded-query rows are garbage in both (fully-masked); compare valid rows
    np.testing.assert_allclose(
        np.asarray(out)[:, :24], np.asarray(ref)[:, :24], atol=2e-5
    )
    # fully-masked queries emit exact zeros (no NaNs) in the ring path
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_ring_composes_with_dp_tp(rng):
    """CP x DP x TP on one mesh: seq=2, data=2, model=2."""
    devs = np.asarray(jax.devices()[:8]).reshape(2, 2, 2)
    mesh = Mesh(devs, ("data", "seq", "model"))
    q, k, v = _rand_qkv(rng, 2, 32, 4, 4, 16)
    out = ring_attention_sharded(q, k, v, mesh)
    ref = _dense_ref(q, k, v, jnp.ones((2, 32), bool), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_gqa_with_tp(rng):
    """GQA heads sharded on 'model' while the sequence rings on 'seq' —
    K/V stay at Nkv heads per shard (ICI bytes scale with Nkv, not N)."""
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("seq", "model"))
    q, k, v = _rand_qkv(rng, 1, 32, 8, 4, 16)  # G=2, Nkv=4 divisible by model=4
    out = ring_attention_sharded(q, k, v, mesh)
    ref = _dense_ref(q, k, v, jnp.ones((1, 32), bool), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_single_shard_degenerates_to_dense(rng):
    """seq axis of size 1: zero hops, plain attention."""
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("seq",))
    q, k, v = _rand_qkv(rng, 2, 16, 4, 4, 8)
    out = ring_attention_sharded(q, k, v, mesh)
    ref = _dense_ref(q, k, v, jnp.ones((2, 16), bool), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_ring_long_context_scales_past_single_shard(rng):
    """8k tokens over 8 shards — the long-context case the reference cannot
    reach (2048 cap, settings-visualcla.yaml:21)."""
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("seq",))
    q, k, v = _rand_qkv(rng, 1, 8192, 2, 2, 8)
    out = ring_attention_sharded(q, k, v, mesh)
    ref = _dense_ref(q, k, v, jnp.ones((1, 8192), bool), True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_engine_generate_long_context_cp():
    """End-to-end generate() with a 4096-token prompt on a ('data','seq')
    mesh: prefill attention rides the ring (CP path), decode runs normally,
    and greedy tokens match the unmeshed single-device engine."""
    import numpy as np
    from jax.sharding import Mesh

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import visualcla as vmod

    cfg = tiny_visualcla_config(vocab_size=96, hidden_size=16)
    params = vmod.init_params(jax.random.PRNGKey(5), cfg, jnp.float32)
    rng = np.random.default_rng(7)
    S = 4096
    ids = rng.integers(4, 90, size=(2, S)).astype(np.int32)
    s = SamplingConfig.greedy(max_new_tokens=4)

    plain = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                   max_seq_len=S + 64, prompt_buckets=(S,), dtype=jnp.float32)
    want = plain.generate(ids, sampling=s)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "seq"))
    meshed = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                    max_seq_len=S + 64, prompt_buckets=(S,),
                    dtype=jnp.float32, mesh=mesh)
    got = meshed.generate(ids, sampling=s)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
