"""int4 weights composed with the serving stack.

The max-compression deployment is grouped-s4 weights (0.5 B/param, packed
int8 carriers — ops/quantization.py) + the paged-KV pool + int8 KV
(per-token scales): ~4x less weight HBM and ~2x less KV HBM than the bf16
baseline, all on one engine.  These tests pin that the composition stays
token-identical to the contiguous single-stream engine over the SAME
quantized params (greedy), and that speculative decoding composes with the
int4 tier (its verify chunks run the same quantized matmuls).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.engine.generate import Engine
from visualcla_tpu.engine.paged import PagedServingEngine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.engine.server import Scheduler, generate_sync
from visualcla_tpu.engine.speculative import SpeculativeDecoder
from visualcla_tpu.models import visualcla as vmod
from visualcla_tpu.ops.quantization import is_packed_grouped, quantize_tree

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def int4_setup():
    cfg = tiny_visualcla_config(vocab_size=96)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float64)
    gs = min(8, cfg.text_config.hidden_size)
    qparams = quantize_tree(params, bits=4, group=gs)
    assert is_packed_grouped(qparams["text"]["layers"]["q_proj"])
    single = Engine(
        qparams, cfg, eos_token_id=EOS, pad_token_id=PAD,
        max_seq_len=96, prompt_buckets=(32,), dtype=jnp.float64,
    )
    return cfg, qparams, single


def trim(x):
    x = list(np.asarray(x))
    return x[: x.index(EOS) + 1] if EOS in x else x


def test_paged_int8kv_matches_single_stream_int4(int4_setup):
    cfg, qparams, single = int4_setup
    sampling = SamplingConfig.greedy(max_new_tokens=10)
    rng = np.random.default_rng(11)
    ps = [rng.integers(4, 90, size=(int(rng.integers(6, 20)),)).astype(np.int32)
          for _ in range(3)]
    expected = [single.generate(p[None], None, None, sampling)[0] for p in ps]

    paged = PagedServingEngine(
        qparams, cfg, eos_token_id=EOS, pad_token_id=PAD,
        pool_size=3, block_size=16, num_blocks=24,
        max_seq_len=96, max_new_tokens_cap=16, prompt_buckets=(32,),
        sampling=sampling, dtype=jnp.float64, kv_quant="int8",
    )
    sched = Scheduler(paged)
    try:
        got = [generate_sync(sched, p, max_new_tokens=10, timeout=300)
               for p in ps]
    finally:
        sched.stop()
    for e, g in zip(expected, got):
        assert trim(e) == trim(g), (list(np.asarray(e)), list(np.asarray(g)))


def test_speculative_matches_plain_int4(int4_setup):
    """Greedy speculative decode over int4 weights is token-identical to the
    plain int4 engine (the exactness contract holds for any weight tier)."""
    cfg, qparams, single = int4_setup
    sampling = SamplingConfig.greedy(max_new_tokens=12)
    rng = np.random.default_rng(5)
    p = rng.integers(4, 90, size=(14,)).astype(np.int32)
    plain = single.generate(p[None], None, None, sampling)[0]
    spec = SpeculativeDecoder(single, spec_k=4, max_ngram=2).generate(
        p[None], None, None, sampling)[0]
    assert trim(plain) == trim(spec), (list(np.asarray(plain)),
                                       list(np.asarray(spec)))
