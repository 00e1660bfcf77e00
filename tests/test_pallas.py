"""Pallas kernel tests (interpret mode on the CPU backend) vs the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.ops.attention import cached_attention, dot_product_attention
from visualcla_tpu.ops.pallas.flash_attention import flash_attention


def dense_ref(q, k, v, kv_valid, write_slot):
    # cached_attention takes K/V in cache order (B, Nkv, S, H)
    return cached_attention(
        q, jnp.transpose(k, (0, 2, 1, 3)), jnp.transpose(v, (0, 2, 1, 3)),
        kv_valid, write_slot, impl="xla",
    )


def rand(rng, shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_flash_prefill_matches_dense(dtype):
    rng = np.random.default_rng(0)
    B, Sq, N, H = 2, 48, 4, 64
    Smax = 96
    q = rand(rng, (B, Sq, N, H), dtype)
    k = rand(rng, (B, Smax, N, H), dtype)
    v = rand(rng, (B, Smax, N, H), dtype)
    # left-padded rows: row 0 has 40 valid, row 1 has 48
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[0, 8:48] = True
    kv_valid[1, 0:48] = True
    out = flash_attention(
        q, k, v, jnp.asarray(kv_valid), jnp.int32(0),
        block_q=16, block_kv=32, interpret=True,
    )
    ref = dense_ref(q, k, v, jnp.asarray(kv_valid), jnp.int32(0))
    tol = 2e-6 if dtype == jnp.float32 else 2e-2
    # queries at slots 0..7 of row 0 see no valid kv slot: flash's contract is
    # ZEROS there (dense softmaxes all-NEG_INF to mean(V) — undefined output)
    np.testing.assert_array_equal(np.asarray(out, np.float32)[0, :8], 0.0)
    visible = np.asarray(out, np.float32).copy()
    visible[0, :8] = np.asarray(ref, np.float32)[0, :8]
    np.testing.assert_allclose(
        visible, np.asarray(ref, np.float32), atol=tol, rtol=tol
    )


def test_flash_decode_mid_cache():
    rng = np.random.default_rng(1)
    B, N, H, Smax = 2, 4, 64, 128
    q = rand(rng, (B, 1, N, H))
    k = rand(rng, (B, Smax, N, H))
    v = rand(rng, (B, Smax, N, H))
    write_slot = jnp.int32(77)
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[:, 10:78] = True  # slots up to and including the new token
    out = flash_attention(
        q, k, v, jnp.asarray(kv_valid), write_slot,
        block_q=8, block_kv=32, interpret=True,
    )
    ref = dense_ref(q, k, v, jnp.asarray(kv_valid), write_slot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_flash_gqa_repeat():
    rng = np.random.default_rng(2)
    B, Sq, N, Nkv, H, Smax = 1, 16, 8, 2, 32, 32
    q = rand(rng, (B, Sq, N, H))
    k = rand(rng, (B, Smax, Nkv, H))
    v = rand(rng, (B, Smax, Nkv, H))
    kv_valid = jnp.ones((B, Smax), bool)
    out = flash_attention(q, k, v, kv_valid, jnp.int32(16),
                          block_q=8, block_kv=32, interpret=True)
    ref = dense_ref(q, k, v, kv_valid, jnp.int32(16))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_flash_uneven_shapes_pad():
    """Sq/Skv not multiples of the block sizes."""
    rng = np.random.default_rng(3)
    B, Sq, N, H, Smax = 1, 23, 2, 64, 70
    q = rand(rng, (B, Sq, N, H))
    k = rand(rng, (B, Smax, N, H))
    v = rand(rng, (B, Smax, N, H))
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[:, :23] = True
    out = flash_attention(q, k, v, jnp.asarray(kv_valid), jnp.int32(0),
                          block_q=16, block_kv=32, interpret=True)
    ref = dense_ref(q, k, v, jnp.asarray(kv_valid), jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_full_attention_flash_matches_dense():
    from visualcla_tpu.ops.attention import full_attention

    rng = np.random.default_rng(5)
    B, Sq, N, H, Skv = 2, 257, 4, 64, 257  # ViT-like odd lengths, head_dim 64
    q = rand(rng, (B, Sq, N, H))
    k = rand(rng, (B, Skv, N, H))
    v = rand(rng, (B, Skv, N, H))
    dense = full_attention(q, k, v, impl="xla")
    flash = full_attention(q, k, v, impl="flash")  # interpret auto on CPU
    np.testing.assert_allclose(np.asarray(flash), np.asarray(dense), atol=2e-6)


def test_vit_forward_flash_vs_xla(monkeypatch):
    from visualcla_tpu.core.config import ViTConfig
    from visualcla_tpu.models import clip_vit

    cfg = ViTConfig(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                    num_attention_heads=2, image_size=28, patch_size=14)
    params = clip_vit.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    pix = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, 28, 28)),
                      jnp.float32)
    ref = clip_vit.forward(params, cfg, pix)
    monkeypatch.setenv("VISUALCLA_VIT_ATTN", "flash")
    out = clip_vit.forward(params, cfg, pix)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_llama_forward_flash_vs_xla():
    """Whole decoder stack: flash (interpret) output == XLA path output."""
    import importlib

    from visualcla_tpu.core.config import LlamaConfig
    from visualcla_tpu.models import llama
    from visualcla_tpu.ops import attention as attn_mod

    fa = importlib.import_module("visualcla_tpu.ops.pallas.flash_attention")

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, max_position_embeddings=64,
    )
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (2, 10)), jnp.int32)

    ref_logits = llama.forward_logits(params, cfg, ids)

    orig = fa.flash_attention

    def interp_flash(*a, **kw):
        kw["interpret"] = True
        kw.setdefault("block_q", 8)
        kw.setdefault("block_kv", 128)
        return orig(*a, **kw)

    attn_mod.set_attention_impl("flash")
    fa_mod_orig = fa.flash_attention
    try:
        fa.flash_attention = interp_flash
        flash_logits = llama.forward_logits(params, cfg, ids)
    finally:
        fa.flash_attention = fa_mod_orig
        attn_mod.set_attention_impl(None)
    np.testing.assert_allclose(
        np.asarray(flash_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4
    )


def test_flash_gqa_batched_decode_left_pad():
    """GQA decode with B>1 and uneven left padding (per-row write slots)."""
    rng = np.random.default_rng(7)
    B, N, Nkv, H, Smax = 3, 8, 2, 32, 64
    q = rand(rng, (B, 1, N, H))
    k = rand(rng, (B, Smax, Nkv, H))
    v = rand(rng, (B, Smax, Nkv, H))
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[0, 5:31] = True
    kv_valid[1, 0:31] = True
    kv_valid[2, 12:31] = True
    slot = jnp.asarray([30, 30, 30], jnp.int32)
    out = flash_attention(q, k, v, jnp.asarray(kv_valid), slot,
                          block_q=8, block_kv=32, interpret=True)
    ref = dense_ref(q, k, v, jnp.asarray(kv_valid), slot)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_flash_gqa_no_hbm_head_repeat():
    """The GQA path must NOT materialize K/V expanded to N query heads in HBM
    (it would cost N/Nkv x decode bandwidth); kv heads are indexed per-program
    via the BlockSpec index map.  Checked on the traced jaxpr: no intermediate
    carries an (B, *, N, H)- or (B, N, *, H)-shaped kv-sized array."""
    B, Sq, N, Nkv, H, Smax = 2, 1, 8, 2, 32, 128
    q = jnp.zeros((B, Sq, N, H))
    k = jnp.zeros((B, Smax, Nkv, H))
    v = jnp.zeros((B, Smax, Nkv, H))
    kv_valid = jnp.ones((B, Smax), bool)
    jaxpr = jax.make_jaxpr(
        lambda *a: flash_attention(*a, causal=True, interpret=True)
    )(q, k, v, kv_valid, jnp.int32(0))
    bad = {(B, Smax, N, H), (B, N, Smax, H)}
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            shape = tuple(getattr(var.aval, "shape", ()))
            assert shape not in bad, (
                f"{eqn.primitive.name} materializes kv at {shape} (N-head expand)"
            )


def test_flash_decode_fully_masked_row_emits_zeros():
    """A batch row with zero visible kv slots yields exactly zero output."""
    rng = np.random.default_rng(8)
    B, N, H, Smax = 2, 4, 32, 64
    q = rand(rng, (B, 1, N, H))
    k = rand(rng, (B, Smax, N, H))
    v = rand(rng, (B, Smax, N, H))
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[0, :33] = True  # row 1 sees nothing
    out = flash_attention(q, k, v, jnp.asarray(kv_valid), jnp.int32(32),
                          block_q=8, block_kv=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out)[1], 0.0)
    ref = dense_ref(q, k, v, jnp.asarray(kv_valid), jnp.int32(32))
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(ref)[0], atol=2e-6)


def test_flash_stacked_cache_matches_sliced():
    """layer_index mode (scalar-prefetched layer into the FULL stacked cache)
    == slicing the layer first, fp and int8."""
    from visualcla_tpu.ops.quantization import quantize_kv

    rng = np.random.default_rng(9)
    L, B, Nkv, N, H, Smax = 3, 2, 2, 4, 32, 64
    q = rand(rng, (B, 1, N, H))
    kc = rand(rng, (L, B, Nkv, Smax, H))
    vc = rand(rng, (L, B, Nkv, Smax, H))
    kv_valid = np.zeros((B, Smax), bool)
    kv_valid[:, :41] = True
    slot = jnp.int32(40)
    for l in range(L):
        sliced = flash_attention(
            q, kc[l], vc[l], jnp.asarray(kv_valid), slot,
            causal=True, kv_layout="bnsh", interpret=True)
        stacked = flash_attention(
            q, kc, vc, jnp.asarray(kv_valid), slot,
            causal=True, layer_index=jnp.int32(l), interpret=True)
        np.testing.assert_allclose(np.asarray(stacked), np.asarray(sliced),
                                   atol=2e-6)

    # int8 KV + scales, stacked
    kq, ks = quantize_kv(kc)   # (L,B,Nkv,S,H) -> scales (L,B,Nkv,S)
    vq, vs = quantize_kv(vc)
    for l in range(L):
        sliced = flash_attention(
            q, kq[l], vq[l], jnp.asarray(kv_valid), slot,
            causal=True, kv_layout="bnsh", k_scale=ks[l], v_scale=vs[l],
            interpret=True)
        stacked = flash_attention(
            q, kq, vq, jnp.asarray(kv_valid), slot,
            causal=True, layer_index=jnp.int32(l), k_scale=ks, v_scale=vs,
            interpret=True)
        np.testing.assert_allclose(np.asarray(stacked), np.asarray(sliced),
                                   atol=2e-5)


def test_flash_vmem_guard_falls_back_to_dense(monkeypatch):
    """When the whole-KV-row VMEM staging would overflow, cached_attention
    must fall back to the dense dequant path and still compute the same
    numbers (VERDICT r2 item 8: guard + fallback for long-context configs)."""
    from visualcla_tpu.ops import attention as attn

    rng = np.random.default_rng(5)
    B, Sq, N, Nkv, Skv, H = 2, 8, 4, 2, 32, 8
    q = jnp.asarray(rng.standard_normal((B, Sq, N, H)), jnp.float32)
    kf = rng.standard_normal((B, Nkv, Skv, H)).astype(np.float32)
    vf = rng.standard_normal((B, Nkv, Skv, H)).astype(np.float32)
    from visualcla_tpu.ops.quantization import quantize_kv

    kq, ks = quantize_kv(jnp.asarray(kf).transpose(0, 2, 1, 3))
    vq, vs = quantize_kv(jnp.asarray(vf).transpose(0, 2, 1, 3))
    kq = kq.transpose(0, 2, 1, 3); vq = vq.transpose(0, 2, 1, 3)
    ks = ks.transpose(0, 2, 1); vs = vs.transpose(0, 2, 1)
    kv_valid = jnp.asarray(
        np.arange(Skv)[None, :] < np.asarray([20, 32])[:, None])
    slot = jnp.asarray([12, 24], jnp.int32)

    want = attn.cached_attention(q, kq, vq, kv_valid, slot,
                                 k_scale=ks, v_scale=vs, impl="flash")
    assert attn._flash_prefill_fits_vmem(q, kq, kv_valid, True)
    monkeypatch.setattr(attn, "_FLASH_VMEM_BUDGET", 1)  # force the guard
    assert not attn._flash_prefill_fits_vmem(q, kq, kv_valid, True)
    got = attn.cached_attention(q, kq, vq, kv_valid, slot,
                                k_scale=ks, v_scale=vs, impl="flash")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
