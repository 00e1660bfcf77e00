"""Paged decode attention vs dense reference (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.ops.attention import cached_attention
from visualcla_tpu.ops.pallas.paged_attention import paged_decode_attention


def build_paged(rng, B, N, Nkv, H, BS, lens, num_blocks=64):
    """Random pool + tables + equivalent contiguous cache."""
    max_blocks = (max(lens) + BS - 1) // BS
    k_pool = rng.standard_normal((num_blocks, BS, Nkv, H)).astype(np.float32)
    v_pool = rng.standard_normal((num_blocks, BS, Nkv, H)).astype(np.float32)
    tables = np.zeros((B, max_blocks), np.int32)
    next_free = 1  # block 0 reserved as the dummy target for unused entries
    Smax = max_blocks * BS
    k_dense = np.zeros((B, Smax, Nkv, H), np.float32)
    v_dense = np.zeros((B, Smax, Nkv, H), np.float32)
    for b in range(B):
        nb = (lens[b] + BS - 1) // BS
        for i in range(nb):
            tables[b, i] = next_free
            k_dense[b, i * BS:(i + 1) * BS] = k_pool[next_free]
            v_dense[b, i * BS:(i + 1) * BS] = v_pool[next_free]
            next_free += 1
    return k_pool, v_pool, tables, k_dense, v_dense, Smax


@pytest.mark.parametrize("lens", [[40, 17], [64, 1], [33, 64]])
def test_paged_matches_dense(lens):
    rng = np.random.default_rng(0)
    B, N, Nkv, H, BS = 2, 4, 4, 64, 32
    q = rng.standard_normal((B, N, H)).astype(np.float32)
    k_pool, v_pool, tables, k_dense, v_dense, Smax = build_paged(
        rng, B, N, Nkv, H, BS, lens
    )
    out = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(tables), jnp.asarray(lens, jnp.int32),
    )
    # dense reference: query sits at slot len-1 (the newest token)
    kv_valid = np.arange(Smax)[None, :] < np.asarray(lens)[:, None]
    ref = cached_attention(
        jnp.asarray(q[:, None].reshape(B, 1, N, H)),
        jnp.asarray(k_dense), jnp.asarray(v_dense),
        jnp.asarray(kv_valid),
        jnp.asarray(np.asarray(lens, np.int32) - 1),
        impl="xla",
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_paged_gqa():
    rng = np.random.default_rng(1)
    B, N, Nkv, H, BS = 1, 8, 2, 64, 16
    lens = [23]
    q = rng.standard_normal((B, N, H)).astype(np.float32)
    k_pool, v_pool, tables, k_dense, v_dense, Smax = build_paged(
        rng, B, N, Nkv, H, BS, lens
    )
    out = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(tables), jnp.asarray(lens, jnp.int32),
    )
    kv_valid = np.arange(Smax)[None, :] < np.asarray(lens)[:, None]
    ref = cached_attention(
        jnp.asarray(q.reshape(B, 1, N, H)),
        jnp.asarray(k_dense), jnp.asarray(v_dense),
        jnp.asarray(kv_valid), jnp.asarray([lens[0] - 1], jnp.int32),
        impl="xla",
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
