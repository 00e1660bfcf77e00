"""int8 KV cache for the contiguous engine (per-token-per-head scales).

The TPU analog of KV-cache quantization (beyond the reference, whose only
quantization is bitsandbytes weight-int8, inference.py:24-25): half the cache
bytes, dequant folded into the attention read.  Quantization error is bounded
by the per-row absmax scale, so outputs track the fp cache closely; values
already representable in int8 steps round-trip exactly.
"""
import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.engine.generate import Engine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.models import llama
from visualcla_tpu.models import visualcla as vmod
from visualcla_tpu.ops.attention import cached_attention
from visualcla_tpu.ops.pallas.flash_attention import flash_attention
from visualcla_tpu.ops.quantization import quantize_kv


def test_quantize_kv_roundtrip_exact_for_grid_values():
    """Values on the scale grid (absmax * i/127) dequantize exactly."""
    rng = np.random.default_rng(0)
    base = rng.integers(-127, 128, size=(2, 5, 3, 8)).astype(np.float32)
    base[..., 0] = 127  # pin absmax per row → scale = 0.03125 exactly
    x = base * 0.03125  # every value an integer multiple of the scale
    q, s = quantize_kv(jnp.asarray(x))
    deq = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    np.testing.assert_allclose(deq, x, rtol=0, atol=1e-6)


def test_quantize_kv_zero_rows_safe():
    q, s = quantize_kv(jnp.zeros((1, 4, 2, 8)))
    assert np.all(np.asarray(q) == 0)
    assert np.all(np.asarray(s) == 1.0)


def _attn_inputs(rng, B=2, Sq=4, Skv=16, N=4, H=8):
    q = rng.standard_normal((B, Sq, N, H)).astype(np.float32)
    k = rng.standard_normal((B, Skv, N, H)).astype(np.float32)
    v = rng.standard_normal((B, Skv, N, H)).astype(np.float32)
    kv_valid = np.zeros((B, Skv), bool)
    kv_valid[:, : 8 + Sq] = True
    slot = np.int32(8)
    return q, k, v, kv_valid, slot


def test_flash_int8_matches_xla_dense_dequant():
    """Pallas int8 path (post-matmul scale folding) vs XLA dense dequant."""
    rng = np.random.default_rng(1)
    q, k, v, kv_valid, slot = _attn_inputs(rng)
    kq, ks = quantize_kv(jnp.asarray(k))
    vq, vs = quantize_kv(jnp.asarray(v))
    dense = cached_attention(
        jnp.asarray(q), jnp.transpose(kq, (0, 2, 1, 3)),
        jnp.transpose(vq, (0, 2, 1, 3)), jnp.asarray(kv_valid), slot,
        k_scale=jnp.transpose(ks, (0, 2, 1)),
        v_scale=jnp.transpose(vs, (0, 2, 1)), impl="xla",
    )
    flash = flash_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(kv_valid), slot,
        causal=True, k_scale=ks, v_scale=vs,
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(flash),
                               rtol=2e-4, atol=2e-4)


def test_flash_int8_gqa_head_repeat():
    rng = np.random.default_rng(2)
    B, Sq, Skv, N, Nkv, H = 1, 2, 16, 4, 2, 8
    q = rng.standard_normal((B, Sq, N, H)).astype(np.float32)
    k = rng.standard_normal((B, Skv, Nkv, H)).astype(np.float32)
    v = rng.standard_normal((B, Skv, Nkv, H)).astype(np.float32)
    kv_valid = np.ones((B, Skv), bool)
    kq, ks = quantize_kv(jnp.asarray(k))
    vq, vs = quantize_kv(jnp.asarray(v))
    dense = cached_attention(
        jnp.asarray(q), jnp.transpose(kq, (0, 2, 1, 3)),
        jnp.transpose(vq, (0, 2, 1, 3)), jnp.asarray(kv_valid),
        np.int32(Skv - Sq),
        k_scale=jnp.transpose(ks, (0, 2, 1)),
        v_scale=jnp.transpose(vs, (0, 2, 1)), impl="xla",
    )
    flash = flash_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(kv_valid), np.int32(Skv - Sq),
        causal=True, k_scale=ks, v_scale=vs,
    )
    np.testing.assert_allclose(np.asarray(dense), np.asarray(flash),
                               rtol=2e-4, atol=2e-4)


def test_forward_int8_cache_close_to_fp():
    """Full decoder forward with an int8 cache tracks the fp32 cache."""
    cfg = tiny_visualcla_config(vocab_size=64).text_config
    params = llama.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    B, S = 2, 10
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(3, 60, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    pos = jnp.cumsum(mask, axis=-1) - 1

    def run(kv_quant):
        cache = llama.init_kv_cache(cfg, B, 16, jnp.float32, kv_quant=kv_quant)
        kv_valid = jnp.concatenate(
            [mask.astype(bool), jnp.zeros((B, 6), bool)], axis=-1)
        h, cache = llama.forward(
            params, cfg, llama.embed(params, ids), pos.astype(jnp.int32),
            cache, kv_valid, jnp.int32(0))
        return llama.logits(params, h)

    lf = np.asarray(run("none"))
    lq = np.asarray(run("int8"))
    # int8 cache error is small relative to logit scale
    denom = np.maximum(np.abs(lf).max(), 1e-6)
    assert np.abs(lq - lf).max() / denom < 0.05
    # and greedy choices agree on a comfortable majority of positions
    agree = (lf.argmax(-1) == lq.argmax(-1)).mean()
    assert agree > 0.8


def test_engine_generate_int8_kv_end_to_end():
    """Engine(kv_quant='int8') generates; greedy tokens match the fp engine
    for a short horizon on the tiny model."""
    cfg = tiny_visualcla_config(vocab_size=64)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(4)
    ids = rng.integers(3, 60, size=(1, 12)).astype(np.int64)
    scfg = SamplingConfig.greedy(max_new_tokens=6)
    fp = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float32)
    q8 = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float32,
                kv_quant="int8")
    out_fp = fp.generate(ids, None, None, scfg)
    out_q8 = q8.generate(ids, None, None, scfg)
    assert out_q8.shape[0] == 1 and out_q8.shape[1] >= 1
    # same first token always (prefill logits differ only via cache writes of
    # the prompt itself — quantized reads; allow divergence later, require the
    # first decode choices to agree on the tiny model)
    np.testing.assert_array_equal(out_fp[0][:2], out_q8[0][:2])


def test_speculative_with_int8_cache_matches_plain_int8():
    """Speculation composes with the int8 cache: identical tokens to the
    plain int8 engine (both see the same quantized reads)."""
    from visualcla_tpu.engine.speculative import SpeculativeDecoder

    cfg = tiny_visualcla_config(vocab_size=64)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(5)
    ids = rng.integers(3, 60, size=(1, 12)).astype(np.int64)
    scfg = SamplingConfig.greedy(max_new_tokens=8)
    q8 = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                max_seq_len=64, prompt_buckets=(16,), dtype=jnp.float32,
                kv_quant="int8")
    plain = q8.generate(ids, None, None, scfg)
    spec = SpeculativeDecoder(q8, spec_k=3).generate(ids, None, None, scfg)
    a = plain[0][plain[0] != 0]
    b = spec[0][spec[0] != 0]
    np.testing.assert_array_equal(a, b)
