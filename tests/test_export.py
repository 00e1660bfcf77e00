"""Native -> reference-merged exporter (checkpoint/export.py).

Round-trip contract: export_reference_merged writes the layout the reference
merge tool produces (merge_llama_with_visualcla_lora.py:87-97); running this
repo's own convert.convert_merged over it must reproduce the original native
params bit-exactly (fp32)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.checkpoint.convert import convert_merged
from visualcla_tpu.checkpoint.export import export_reference_merged
from visualcla_tpu.checkpoint.serialize import (
    flatten_tree, load_checkpoint,
)
from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import visualcla as vmod


@pytest.fixture(scope="module")
def native(tmp_path_factory):
    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(7), cfg, jnp.float32)
    return params, cfg


def test_export_layout_matches_reference(native, tmp_path):
    params, cfg = native
    out = str(tmp_path / "merged")
    export_reference_merged(params, cfg, out, dtype="float32")
    for rel in ("config.json", "pytorch_model.bin",
                "text_encoder/config.json", "text_encoder/pytorch_model.bin",
                "vision_encoder/config.json",
                "vision_encoder/pytorch_model.bin"):
        assert os.path.exists(os.path.join(out, rel)), rel
    torch = pytest.importorskip("torch")
    root = torch.load(os.path.join(out, "pytorch_model.bin"),
                      weights_only=True)
    # reference writes the typo'd parameter name — the HF module expects it
    assert "visual_resampler.query_embeddding" in root
    assert "image_projection_layer.weight" in root
    assert all(k.startswith(("visual_resampler.", "image_projection_layer."))
               for k in root)
    text = torch.load(os.path.join(out, "text_encoder", "pytorch_model.bin"),
                      weights_only=True)
    hd = cfg.text_config.hidden_size
    assert text["model.layers.0.self_attn.q_proj.weight"].shape == (hd, hd)


def test_export_roundtrip_bit_exact(native, tmp_path):
    params, cfg = native
    merged = str(tmp_path / "merged")
    back = str(tmp_path / "native_back")
    export_reference_merged(params, cfg, merged, dtype="float32")
    convert_merged(merged, back, dtype="float32")
    params2, cfg2 = load_checkpoint(back, dtype=jnp.float32)
    flat1 = flatten_tree(jax.tree.map(np.asarray, params))
    flat2 = flatten_tree(jax.tree.map(np.asarray, params2))
    assert set(flat1) == set(flat2), (
        set(flat1) ^ set(flat2)
    )
    for k in flat1:
        np.testing.assert_array_equal(flat1[k], flat2[k], err_msg=k)
    assert cfg2.text_config == cfg.text_config
    assert cfg2.vision_config == cfg.vision_config
    assert cfg2.visual_resampler_config == cfg.visual_resampler_config


def test_export_rejects_lora_and_int8(native, tmp_path):
    params, cfg = native
    bad = dict(params)
    bad["text"] = dict(params["text"])
    lyr = dict(params["text"]["layers"])
    lyr["q_proj"] = {"w": lyr["q_proj"],
                     "lora_A": jnp.zeros((2, 4, 2)),
                     "lora_B": jnp.zeros((2, 2, 4)),
                     "lora_scale": jnp.ones((2,))}
    bad["text"]["layers"] = lyr
    with pytest.raises(ValueError, match="LoRA"):
        export_reference_merged(bad, cfg, str(tmp_path / "x"))
