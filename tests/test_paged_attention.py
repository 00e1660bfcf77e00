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
        jnp.transpose(jnp.asarray(k_dense), (0, 2, 1, 3)),
        jnp.transpose(jnp.asarray(v_dense), (0, 2, 1, 3)),
        jnp.asarray(kv_valid),
        jnp.asarray(np.asarray(lens, np.int32) - 1),
        impl="xla",
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_paged_int8_kv_close_to_fp():
    from visualcla_tpu.engine.paged import quantize_kv

    rng = np.random.default_rng(2)
    B, N, Nkv, H, BS = 2, 4, 4, 64, 32
    lens = [40, 17]
    q = rng.standard_normal((B, N, H)).astype(np.float32)
    k_pool, v_pool, tables, k_dense, v_dense, Smax = build_paged(
        rng, B, N, Nkv, H, BS, lens
    )
    kq, ks = quantize_kv(jnp.asarray(k_pool))
    vq, vs = quantize_kv(jnp.asarray(v_pool))
    out8 = paged_decode_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(tables),
        jnp.asarray(lens, jnp.int32), ks, vs,
    )
    out = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(k_pool), jnp.asarray(v_pool),
        jnp.asarray(tables), jnp.asarray(lens, jnp.int32),
    )
    # int8 KV: per-element error ~1/127 of absmax
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out), atol=0.08)


def test_paged_engine_int8_kv_runs():
    import jax

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.server import Scheduler, generate_sync
    from visualcla_tpu.models import visualcla as vmod

    cfg = tiny_visualcla_config(vocab_size=96)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = PagedServingEngine(
        params, cfg, eos_token_id=2, pad_token_id=0,
        pool_size=2, block_size=16, num_blocks=24, max_seq_len=96,
        max_new_tokens_cap=8, prompt_buckets=(32,),
        sampling=SamplingConfig.greedy(max_new_tokens=8),
        dtype=jnp.float32, kv_quant="int8",
    )
    assert eng._state.k_pool.dtype == jnp.int8
    sched = Scheduler(eng)
    try:
        rng = np.random.default_rng(0)
        ids = rng.integers(4, 90, size=(12,)).astype(np.int32)
        out = generate_sync(sched, ids, max_new_tokens=6, timeout=300)
    finally:
        sched.stop()
    assert 1 <= len(out) <= 6
    assert all(0 <= t < 96 for t in out.tolist())


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
        jnp.transpose(jnp.asarray(k_dense), (0, 2, 1, 3)),
        jnp.transpose(jnp.asarray(v_dense), (0, 2, 1, 3)),
        jnp.asarray(kv_valid), jnp.asarray([lens[0] - 1], jnp.int32),
        impl="xla",
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_dense_reference_matches_kernel():
    """The kernel-unsafe-shape fallback must agree with the interpreted kernel."""
    from visualcla_tpu.ops.pallas.paged_attention import (
        _dense_reference, paged_decode_attention,
    )

    rng = np.random.default_rng(9)
    B, N, H, NB, BS, Nkv = 2, 4, 16, 8, 8, 2
    q = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((NB, BS, Nkv, H)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((NB, BS, Nkv, H)), jnp.float32)
    tables = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
    lens = jnp.asarray([20, 11], jnp.int32)
    kern = paged_decode_attention(q, kp, vp, tables, lens, interpret=True)
    dense = _dense_reference(q, kp, vp, tables, lens, None, None, H ** -0.5)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_dense_reference_int8_matches_kernel():
    from visualcla_tpu.ops.pallas.paged_attention import (
        _dense_reference, paged_decode_attention,
    )
    from visualcla_tpu.ops.quantization import quantize_kv

    rng = np.random.default_rng(10)
    B, N, H, NB, BS, Nkv = 1, 2, 16, 6, 8, 2
    q = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    kf = jnp.asarray(rng.standard_normal((NB, BS, Nkv, H)), jnp.float32)
    vf = jnp.asarray(rng.standard_normal((NB, BS, Nkv, H)), jnp.float32)
    kp, ks = quantize_kv(kf)
    vp, vs = quantize_kv(vf)
    tables = jnp.asarray([[1, 2]], jnp.int32)
    lens = jnp.asarray([13], jnp.int32)
    kern = paged_decode_attention(q, kp, vp, tables, lens, ks, vs,
                                  interpret=True)
    dense = _dense_reference(q, kp, vp, tables, lens, ks, vs, H ** -0.5)
    np.testing.assert_allclose(np.asarray(kern), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def _build_layered(rng, L, NB, BS, Nkv, H, B, lens, layer):
    """Multi-layer pool + tables + append metadata for lens INCLUDING new tok."""
    kp = rng.standard_normal((L, NB, BS, Nkv, H)).astype(np.float32)
    vp = rng.standard_normal((L, NB, BS, Nkv, H)).astype(np.float32)
    max_blocks = max((ln + BS - 1) // BS for ln in lens)
    tables = np.zeros((B, max_blocks), np.int32)
    nxt = 1
    for b in range(B):
        nb = (lens[b] + BS - 1) // BS
        for i in range(nb):
            tables[b, i] = nxt
            nxt += 1
    blk = np.array([tables[b, (lens[b] - 1) // BS] for b in range(B)], np.int32)
    off = np.array([(lens[b] - 1) % BS for b in range(B)], np.int32)
    return kp, vp, tables, blk, off


@pytest.mark.parametrize("N,Nkv", [(4, 4), (8, 2)])
def test_append_attention_matches_scatter_then_decode(N, Nkv):
    from visualcla_tpu.ops.pallas.paged_attention import paged_append_attention

    rng = np.random.default_rng(3)
    L, NB, BS, H, B = 3, 12, 16, 64, 2
    lens = [24, 17]
    layer = 1
    kp, vp, tables, blk, off = _build_layered(rng, L, NB, BS, Nkv, H, B, lens,
                                              layer)
    q = rng.standard_normal((B, N, H)).astype(np.float32)
    kn = rng.standard_normal((B, Nkv, H)).astype(np.float32)
    vn = rng.standard_normal((B, Nkv, H)).astype(np.float32)

    o, kp2, vp2, _, _ = paged_append_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kp.reshape(L, NB, BS, -1)),
        jnp.asarray(vp.reshape(L, NB, BS, -1)), jnp.asarray(tables),
        jnp.asarray(lens, jnp.int32), jnp.asarray(blk), jnp.asarray(off),
        jnp.int32(layer),
    )
    kp2 = jnp.asarray(kp2).reshape(kp.shape)
    vp2 = jnp.asarray(vp2).reshape(vp.shape)
    # reference: scatter on the layer slice, then the plain decode kernel
    ref_kp = kp[layer].copy()
    ref_vp = vp[layer].copy()
    for b in range(B):
        ref_kp[blk[b], off[b]] = kn[b]
        ref_vp[blk[b], off[b]] = vn[b]
    ref = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(ref_kp), jnp.asarray(ref_vp),
        jnp.asarray(tables), jnp.asarray(lens, jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)
    # pool: append rows written on the target layer, everything else intact
    exp_kp = kp.copy()
    exp_kp[layer] = ref_kp
    exp_vp = vp.copy()
    exp_vp[layer] = ref_vp
    np.testing.assert_allclose(np.asarray(kp2), exp_kp, atol=0)
    np.testing.assert_allclose(np.asarray(vp2), exp_vp, atol=0)


def test_append_attention_int8():
    from visualcla_tpu.ops.pallas.paged_attention import paged_append_attention
    from visualcla_tpu.ops.quantization import quantize_kv

    rng = np.random.default_rng(4)
    L, NB, BS, Nkv, H, B, N = 2, 10, 32, 2, 64, 2, 4
    lens = [40, 33]
    layer = 0
    kpf, vpf, tables, blk, off = _build_layered(rng, L, NB, BS, Nkv, H, B,
                                                lens, layer)
    kp, ks = quantize_kv(jnp.asarray(kpf))
    vp, vs = quantize_kv(jnp.asarray(vpf))
    q = rng.standard_normal((B, N, H)).astype(np.float32)
    knf = rng.standard_normal((B, Nkv, H)).astype(np.float32)
    vnf = rng.standard_normal((B, Nkv, H)).astype(np.float32)
    kn, ksn = quantize_kv(jnp.asarray(knf))
    vn, vsn = quantize_kv(jnp.asarray(vnf))

    o, kp2, vp2, ks2, vs2 = paged_append_attention(
        jnp.asarray(q), kn, vn, kp.reshape(L, NB, BS, -1),
        vp.reshape(L, NB, BS, -1), jnp.asarray(tables),
        jnp.asarray(lens, jnp.int32), jnp.asarray(blk), jnp.asarray(off),
        jnp.int32(layer), ksn, vsn, ks, vs,
    )
    kp2 = jnp.asarray(kp2).reshape(kp.shape)
    vp2 = jnp.asarray(vp2).reshape(vp.shape)
    # reference: scatter ints+scales on the layer slice, then plain decode
    ref_kp = np.asarray(kp)[layer].copy()
    ref_vp = np.asarray(vp)[layer].copy()
    ref_ks = np.asarray(ks)[layer].copy()
    ref_vs = np.asarray(vs)[layer].copy()
    for b in range(B):
        ref_kp[blk[b], off[b]] = np.asarray(kn)[b]
        ref_vp[blk[b], off[b]] = np.asarray(vn)[b]
        ref_ks[blk[b], off[b]] = np.asarray(ksn)[b]
        ref_vs[blk[b], off[b]] = np.asarray(vsn)[b]
    ref = paged_decode_attention(
        jnp.asarray(q), jnp.asarray(ref_kp), jnp.asarray(ref_vp),
        jnp.asarray(tables), jnp.asarray(lens, jnp.int32),
        jnp.asarray(ref_ks), jnp.asarray(ref_vs),
    )
    # int8 pools run the append kernel's dots in bf16 (f32 slab upcasts cost
    # 8.9 ms/step at 7B B=8); the old kernel reference computes in f32 —
    # agree to bf16 resolution
    np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=5e-3)
    np.testing.assert_array_equal(np.asarray(kp2)[layer], ref_kp)
    np.testing.assert_array_equal(np.asarray(vp2)[layer], ref_vp)
    np.testing.assert_allclose(np.asarray(ks2)[layer], ref_ks, atol=0)
    np.testing.assert_allclose(np.asarray(vs2)[layer], ref_vs, atol=0)
    # untouched layer intact
    np.testing.assert_array_equal(np.asarray(kp2)[1], np.asarray(kp)[1])


def test_append_attention_parked_rows_keep_pool_intact():
    """Parked rows (lens=1, blk=0) must only dirty dummy block 0."""
    from visualcla_tpu.ops.pallas.paged_attention import paged_append_attention

    rng = np.random.default_rng(5)
    L, NB, BS, Nkv, H, B, N = 2, 8, 16, 4, 64, 2, 4
    lens = [24, 1]  # row 1 parked
    kp, vp, tables, blk, off = _build_layered(rng, L, NB, BS, Nkv, H, B,
                                              [24, 16], 0)
    tables[1, :] = 0  # parked row's table is zeroed
    blk[1] = 0
    off[1] = 0
    q = rng.standard_normal((B, N, H)).astype(np.float32)
    kn = rng.standard_normal((B, Nkv, H)).astype(np.float32)
    vn = rng.standard_normal((B, Nkv, H)).astype(np.float32)
    o, kp2, vp2, _, _ = paged_append_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kp.reshape(L, NB, BS, -1)),
        jnp.asarray(vp.reshape(L, NB, BS, -1)), jnp.asarray(tables),
        jnp.asarray(lens, jnp.int32), jnp.asarray(blk), jnp.asarray(off),
        jnp.int32(0),
    )
    kp2 = jnp.asarray(kp2).reshape(kp.shape)
    kp2 = np.asarray(kp2)
    # every non-dummy block except row 0's append block is untouched
    exp = kp.copy()
    exp[0, blk[0], off[0]] = kn[0]
    np.testing.assert_allclose(kp2[:, 1:], exp[:, 1:], atol=0)
    assert np.isfinite(np.asarray(o)).all()


def test_dense_append_matches_kernel():
    from visualcla_tpu.ops.pallas.paged_attention import (
        _dense_append, paged_append_attention,
    )

    rng = np.random.default_rng(6)
    L, NB, BS, Nkv, H, B, N = 2, 8, 8, 2, 16, 2, 4
    lens = [20, 11]
    layer = 1
    kp, vp, tables, blk, off = _build_layered(rng, L, NB, BS, Nkv, H, B, lens,
                                              layer)
    q = jnp.asarray(rng.standard_normal((B, N, H)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, Nkv, H)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, Nkv, H)), jnp.float32)
    args = (q, kn, vn, jnp.asarray(kp.reshape(L, NB, BS, -1)),
            jnp.asarray(vp.reshape(L, NB, BS, -1)), jnp.asarray(tables),
            jnp.asarray(lens, jnp.int32), jnp.asarray(blk), jnp.asarray(off),
            jnp.int32(layer))
    o_k, kp_k, vp_k, _, _ = paged_append_attention(*args, interpret=True)
    o_d, kp_d, vp_d, _, _ = _dense_append(*args, None, None, None, None,
                                          H ** -0.5)
    np.testing.assert_allclose(np.asarray(o_k), np.asarray(o_d), rtol=2e-5,
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(kp_k), np.asarray(kp_d), atol=0)
    np.testing.assert_allclose(np.asarray(vp_k), np.asarray(vp_d), atol=0)


# ---------------------------------------------------------------------------
# Sq>1 verify kernel (speculative decoding's batched verify step)
# ---------------------------------------------------------------------------

def _build_verify(rng, L, NB, BS, Nkv, H, B, lens_total, Sq):
    """Pool + tables where lens_total INCLUDES the Sq new tokens; every
    block a row's post-append context touches is allocated."""
    kp = rng.standard_normal((L, NB, BS, Nkv, H)).astype(np.float32)
    vp = rng.standard_normal((L, NB, BS, Nkv, H)).astype(np.float32)
    max_blocks = max((ln + BS - 1) // BS for ln in lens_total)
    tables = np.zeros((B, max_blocks), np.int32)
    nxt = 1
    for b in range(B):
        nb = (lens_total[b] + BS - 1) // BS
        for i in range(nb):
            tables[b, i] = nxt
            nxt += 1
    return kp, vp, tables


@pytest.mark.parametrize("lens_old,Sq", [([24, 17], 3), ([30, 13], 4)])
def test_verify_attention_matches_sequential_append(lens_old, Sq):
    """One (B, Sq) verify call == Sq sequential single-token append+attend
    calls (the causality + append contract, checked against the audited
    single-token kernel)."""
    from visualcla_tpu.ops.pallas.paged_attention import (
        paged_append_attention, paged_verify_attention)

    rng = np.random.default_rng(6)
    L, NB, BS, Nkv, H, B, N = 2, 12, 16, 4, 64, 2, 4
    layer = 1
    lens_total = [ln + Sq for ln in lens_old]
    kp, vp, tables = _build_verify(rng, L, NB, BS, Nkv, H, B, lens_total, Sq)
    q = rng.standard_normal((B, Sq, N, H)).astype(np.float32)
    kn = rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)
    vn = rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)

    o, kp2, vp2, _, _ = paged_verify_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kp.reshape(L, NB, BS, -1)),
        jnp.asarray(vp.reshape(L, NB, BS, -1)), jnp.asarray(tables),
        jnp.asarray(lens_total, jnp.int32), jnp.int32(layer),
    )
    # sequential reference over the single-token kernel
    rkp = jnp.asarray(kp.reshape(L, NB, BS, -1))
    rvp = jnp.asarray(vp.reshape(L, NB, BS, -1))
    refs = []
    for j in range(Sq):
        lens_j = np.asarray(lens_old, np.int32) + j + 1  # incl. new token
        blk = np.array([tables[b, (lens_j[b] - 1) // BS] for b in range(B)],
                       np.int32)
        off = np.array([(lens_j[b] - 1) % BS for b in range(B)], np.int32)
        oj, rkp, rvp, _, _ = paged_append_attention(
            jnp.asarray(q[:, j]), jnp.asarray(kn[:, j]), jnp.asarray(vn[:, j]),
            rkp, rvp, jnp.asarray(tables), jnp.asarray(lens_j),
            jnp.asarray(blk), jnp.asarray(off), jnp.int32(layer),
        )
        refs.append(np.asarray(oj))
    ref = np.stack(refs, axis=1)  # (B, Sq, N, H)
    np.testing.assert_allclose(np.asarray(o), ref, atol=3e-5)
    np.testing.assert_allclose(np.asarray(kp2), np.asarray(rkp), atol=0)
    np.testing.assert_allclose(np.asarray(vp2), np.asarray(rvp), atol=0)


def test_verify_attention_block_split_append():
    """New tokens spanning TWO pool blocks (base%BS + Sq > BS) write both
    correctly; matches the dense reference."""
    from visualcla_tpu.ops.pallas.paged_attention import (
        _dense_verify, paged_verify_attention)

    rng = np.random.default_rng(7)
    L, NB, BS, Nkv, H, B, N, Sq = 2, 10, 16, 4, 64, 2, 4, 5
    lens_old = [14, 30]  # base offsets 14, 30 -> both split across blocks
    lens_total = [ln + Sq for ln in lens_old]
    kp, vp, tables = _build_verify(rng, L, NB, BS, Nkv, H, B, lens_total, Sq)
    q = rng.standard_normal((B, Sq, N, H)).astype(np.float32)
    kn = rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)
    vn = rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
            jnp.asarray(kp.reshape(L, NB, BS, -1)),
            jnp.asarray(vp.reshape(L, NB, BS, -1)), jnp.asarray(tables),
            jnp.asarray(lens_total, jnp.int32), jnp.int32(0))
    o, kp2, vp2, _, _ = paged_verify_attention(*args)
    ro, rkp, rvp, _, _ = _dense_verify(*args, None, None, None, None,
                                       1.0 / np.sqrt(H))
    np.testing.assert_allclose(np.asarray(o), np.asarray(ro), atol=3e-5)
    np.testing.assert_allclose(np.asarray(kp2), np.asarray(rkp), atol=0)
    np.testing.assert_allclose(np.asarray(vp2), np.asarray(rvp), atol=0)


def test_verify_attention_int8():
    from visualcla_tpu.ops.pallas.paged_attention import (
        _dense_verify, paged_verify_attention)
    from visualcla_tpu.ops.quantization import quantize_kv

    rng = np.random.default_rng(8)
    L, NB, BS, Nkv, H, B, N, Sq = 2, 10, 32, 2, 64, 2, 4, 3
    lens_old = [40, 30]
    lens_total = [ln + Sq for ln in lens_old]
    kpf, vpf, tables = _build_verify(rng, L, NB, BS, Nkv, H, B, lens_total, Sq)
    kp, ks = quantize_kv(jnp.asarray(kpf))
    vp, vs = quantize_kv(jnp.asarray(vpf))
    q = rng.standard_normal((B, Sq, N, H)).astype(np.float32)
    kn, ksn = quantize_kv(jnp.asarray(
        rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)))
    vn, vsn = quantize_kv(jnp.asarray(
        rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)))
    args = (jnp.asarray(q), kn, vn, kp.reshape(L, NB, BS, -1),
            vp.reshape(L, NB, BS, -1), jnp.asarray(tables),
            jnp.asarray(lens_total, jnp.int32), jnp.int32(1),
            ksn, vsn, ks, vs)
    o, kp2, vp2, ks2, vs2 = paged_verify_attention(*args)
    ro, rkp, rvp, rks, rvs = _dense_verify(*args, 1.0 / np.sqrt(H))
    # kernel dots run bf16 (pool compute dtype), dense reference f32
    np.testing.assert_allclose(np.asarray(o), np.asarray(ro), atol=6e-3)
    np.testing.assert_array_equal(np.asarray(kp2), np.asarray(rkp))
    np.testing.assert_array_equal(np.asarray(vp2), np.asarray(rvp))
    np.testing.assert_allclose(np.asarray(ks2), np.asarray(rks), atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs2), np.asarray(rvs), atol=1e-6)


def test_verify_attention_parked_rows_only_dirty_dummy():
    """A parked row (lens_total == Sq, zeroed table) must only write dummy
    block 0 even though other rows append normally."""
    from visualcla_tpu.ops.pallas.paged_attention import (
        paged_verify_attention)

    rng = np.random.default_rng(9)
    L, NB, BS, Nkv, H, B, N, Sq = 2, 8, 16, 4, 64, 2, 4, 3
    lens_total = [24 + Sq, Sq]  # row 1 parked
    kp, vp, tables = _build_verify(rng, L, NB, BS, Nkv, H, B,
                                   [lens_total[0], 1], Sq)
    tables = tables.copy()
    tables[1, :] = 0
    q = rng.standard_normal((B, Sq, N, H)).astype(np.float32)
    kn = rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)
    vn = rng.standard_normal((B, Sq, Nkv, H)).astype(np.float32)
    o, kp2, vp2, _, _ = paged_verify_attention(
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kp.reshape(L, NB, BS, -1)),
        jnp.asarray(vp.reshape(L, NB, BS, -1)), jnp.asarray(tables),
        jnp.asarray(lens_total, jnp.int32), jnp.int32(0),
    )
    kp2 = np.asarray(kp2).reshape(kp.shape)
    # all non-dummy blocks intact except row 0's append range
    base0 = lens_total[0] - Sq
    exp = kp.copy()
    for j in range(Sq):
        s = base0 + j
        exp[0, tables[0, s // BS], s % BS] = kn[0, j]
    np.testing.assert_allclose(kp2[:, 1:], exp[:, 1:], atol=0)
    assert np.isfinite(np.asarray(o)[0]).all()
