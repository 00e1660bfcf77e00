"""shard_map'd Pallas flash attention on the virtual 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visualcla_tpu.ops import attention as attn_mod


@pytest.fixture()
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "model"))


def test_sharded_flash_matches_dense(mesh):
    rng = np.random.default_rng(0)
    B, Sq, N, H, Smax = 4, 16, 8, 64, 64
    q = jnp.asarray(rng.standard_normal((B, Sq, N, H)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Smax, N, H)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Smax, N, H)), jnp.float32)
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[:, 4:20] = True
    kv_valid = jnp.asarray(kv_valid)
    slot = jnp.int32(4)

    kt = jnp.transpose(k, (0, 2, 1, 3))  # cache order (B, Nkv, S, H)
    vt = jnp.transpose(v, (0, 2, 1, 3))
    dense = attn_mod.cached_attention(q, kt, vt, kv_valid, slot, impl="xla")

    spec = NamedSharding(mesh, P("data", None, "model", None))
    kv_spec = NamedSharding(mesh, P("data", "model", None, None))
    qd = jax.device_put(q, spec)
    kd = jax.device_put(kt, kv_spec)
    vd = jax.device_put(vt, kv_spec)
    okd = jax.device_put(kv_valid, NamedSharding(mesh, P("data", None)))
    out = attn_mod._flash_sharded(qd, kd, vd, okd, slot, mesh)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=2e-5)


def test_sharded_flash_refuses_indivisible(mesh):
    q = jnp.zeros((1, 4, 6, 64))  # 6 heads not divisible by model=4
    k = jnp.zeros((1, 6, 8, 64))  # cache order (B, Nkv, S, H)
    v = jnp.zeros((1, 6, 8, 64))
    out = attn_mod._flash_sharded(q, k, v, jnp.ones((1, 8), bool), jnp.int32(0), mesh)
    assert out is None


def test_engine_generate_on_mesh_matches_single(mesh):
    """Full Engine greedy decode on a TP×DP mesh == unmeshed decode."""
    import jax.numpy as jnp

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.parallel import sharding as shd

    cfg = tiny_visualcla_config(vocab_size=96, hidden_size=16)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    ids = rng.integers(4, 90, size=(2, 12)).astype(np.int32)
    s = SamplingConfig.greedy(max_new_tokens=6)

    plain = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                   max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float32)
    want = plain.generate(ids, sampling=s)

    sharded_params = shd.shard_params(params, mesh)
    try:
        meshed = Engine(sharded_params, cfg, eos_token_id=2, pad_token_id=0,
                        max_seq_len=64, prompt_buckets=(16,),
                        dtype=jnp.float32, mesh=mesh)
        got = meshed.generate(ids, sampling=s)
    finally:
        attn_mod.set_attention_mesh(None)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_cached_attention_uses_mesh_when_registered(mesh):
    rng = np.random.default_rng(1)
    B, Sq, N, H, Smax = 2, 8, 4, 64, 32
    q = jnp.asarray(rng.standard_normal((B, Sq, N, H)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, Smax, H)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, Smax, H)), jnp.float32)
    kv_valid = jnp.ones((B, Smax), bool)
    dense = attn_mod.cached_attention(q, k, v, kv_valid, jnp.int32(8), impl="xla")
    attn_mod.set_attention_mesh(mesh)
    try:
        out = attn_mod.cached_attention(q, k, v, kv_valid, jnp.int32(8), impl="flash")
    finally:
        attn_mod.set_attention_mesh(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense), atol=2e-5)
