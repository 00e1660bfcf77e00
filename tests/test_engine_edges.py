"""Engine edge cases: bucket boundaries, overlong prompts, HF config mapping."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.api import as_sampling_config
from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.engine.generate import Engine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.models import visualcla as vmod


@pytest.fixture(scope="module")
def engine():
    cfg = tiny_visualcla_config(vocab_size=64)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    return Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                  max_seq_len=96, prompt_buckets=(16, 32, 64), dtype=jnp.float32)


def test_bucket_selection(engine):
    assert engine.bucket_len(1) == 16
    assert engine.bucket_len(16) == 16
    assert engine.bucket_len(17) == 32
    assert engine.bucket_len(64) == 64
    with pytest.raises(ValueError):
        engine.bucket_len(65)


def test_bucket_boundary_same_output(engine):
    """A prompt padded to different buckets must decode identically (left-pad
    + slot-order causality make padding invisible)."""
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 60, size=(1, 16)).astype(np.int32)
    s = SamplingConfig.greedy(max_new_tokens=6)
    out16 = engine.generate(ids, sampling=s)
    # force the next bucket by re-padding the prompt with an explicit pad+mask
    engine2 = Engine(engine.params, engine.cfg, eos_token_id=2, pad_token_id=0,
                     max_seq_len=96, prompt_buckets=(32,), dtype=jnp.float32)
    out32 = engine2.generate(ids, sampling=s)
    np.testing.assert_array_equal(np.asarray(out16), np.asarray(out32))


def test_as_sampling_config_from_hf_generation_config():
    from transformers import GenerationConfig

    gc = GenerationConfig(
        max_new_tokens=77, do_sample=True, top_p=0.8, top_k=33,
        temperature=0.6, repetition_penalty=1.2, no_repeat_ngram_size=5,
    )
    sc = as_sampling_config(gc)
    assert sc.max_new_tokens == 77
    assert sc.top_p == 0.8 and sc.top_k == 33
    assert sc.temperature == 0.6
    assert sc.repetition_penalty == 1.2
    assert sc.no_repeat_ngram_size == 5


def test_as_sampling_config_dict_ignores_unknown():
    sc = as_sampling_config({"max_new_tokens": 5, "bogus_field": 1})
    assert sc.max_new_tokens == 5


def test_load_generation_preset_errors():
    from visualcla_tpu.api import load_generation_preset

    with pytest.raises(KeyError):
        load_generation_preset("nope")
    with pytest.raises(KeyError):
        load_generation_preset("_server")  # private section not a preset
    tfs = load_generation_preset("TFS")
    assert tfs.tfs == 0.95 and tfs.do_sample


def test_top_bucket_prompt_still_gets_decode_headroom():
    """Regression: a prompt landing in a bucket == max_seq_len used to leave
    zero cache room, silently truncating generation to the prefill token.
    The cache must grow so all max_new_tokens decode slots exist."""
    cfg = tiny_visualcla_config(vocab_size=64)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                 max_seq_len=32, prompt_buckets=(32,), dtype=jnp.float32)
    ids = np.random.default_rng(0).integers(3, 60, size=(1, 30)).astype(np.int64)
    scfg = SamplingConfig.greedy(max_new_tokens=8)
    out = eng.generate(ids, None, None, scfg)
    assert out.shape[1] == 8 or 2 in out[0]  # full length unless EOS fired
    # streaming honors the grown cache too
    toks = list(eng.stream(ids, None, None, scfg))
    assert len(toks) == out.shape[1]


def test_split_prefill_identical_to_fused():
    """The two-stage (embed program + text program) prefill must produce
    exactly the fused program's tokens — the program boundary sits at the
    precomputed-embeds splice, which is associative with jit."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import visualcla as vmod

    cfg = tiny_visualcla_config(vocab_size=96)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    eng = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                 max_seq_len=96, prompt_buckets=(48,), dtype=jnp.float32)
    rng = np.random.default_rng(3)
    B = 3
    K = cfg.num_image_tokens
    ids = rng.integers(4, 90, size=(B, 40)).astype(np.int32)
    img_pos = np.array([2, 5, 1], np.int32)
    px = rng.standard_normal(
        (B, 3, cfg.vision_config.image_size, cfg.vision_config.image_size)
    ).astype(np.float32)
    sampling = SamplingConfig.greedy(max_new_tokens=6)
    old = os.environ.get("VISUALCLA_PREFILL_SPLIT")
    try:
        os.environ["VISUALCLA_PREFILL_SPLIT"] = "0"
        fused = eng.generate(ids, px, img_pos, sampling)
        os.environ["VISUALCLA_PREFILL_SPLIT"] = "1"
        split = eng.generate(ids, px, img_pos, sampling)
    finally:
        if old is None:
            os.environ.pop("VISUALCLA_PREFILL_SPLIT", None)
        else:
            os.environ["VISUALCLA_PREFILL_SPLIT"] = old
    np.testing.assert_array_equal(fused, split)
