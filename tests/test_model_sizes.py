"""Model family size presets: every LLaMA size traces through the full stack."""
import jax
import jax.numpy as jnp
import pytest

from visualcla_tpu.core.config import (
    EMB_TO_MODEL_SIZE,
    LLAMA_SIZES,
    llama_config_for_size,
    visualcla_config_for_size,
)
from visualcla_tpu.models import llama, visualcla


def test_emb_to_model_size_matches_reference():
    # scripts/merge_llama_with_visualcla_lora.py:30-35
    assert EMB_TO_MODEL_SIZE == {4096: "7B", 5120: "13B", 6656: "33B", 8192: "65B"}
    for emb, name in EMB_TO_MODEL_SIZE.items():
        assert LLAMA_SIZES[name]["hidden_size"] == emb


@pytest.mark.parametrize("size", ["7B", "13B", "33B", "65B"])
def test_every_size_traces(size):
    """eval_shape the full multimodal prefill at each family size (no memory)."""
    cfg = visualcla_config_for_size(size)
    tc = cfg.text_config
    assert tc.hidden_size % tc.num_attention_heads == 0

    def make():
        params = jax.eval_shape(
            lambda k: visualcla.init_params(k, cfg, jnp.bfloat16),
            jax.random.PRNGKey(0),
        )
        return params

    params = make()

    def fwd(params, ids, mask, pos, pix, cache):
        return visualcla.prefill_forward(params, cfg, ids, mask, pos, pix, cache)

    B, S = 1, 64
    args = (
        params,
        jax.ShapeDtypeStruct((B, S), jnp.int32),
        jax.ShapeDtypeStruct((B, S), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B, 3, 224, 224), jnp.bfloat16),
        jax.eval_shape(
            lambda: llama.init_kv_cache(tc, B, 128, jnp.bfloat16)
        ),
    )
    out = jax.eval_shape(fwd, *args)
    assert out[0].shape == (B, S, tc.vocab_size)