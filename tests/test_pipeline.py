"""Vision-pipeline (webui-plugin equivalent) + adapter splitter tests."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tests import hf_ref
from visualcla_tpu.checkpoint.split_adapter import split
from visualcla_tpu.pipeline import VisionPipeline


def build_lora_dir(tmp):
    """Composite adapter with full resampler/projector + a vision LoRA."""
    vision, vision_cfg = hf_ref.tiny_hf_clip_vision(seed=2)
    ref_mod = hf_ref.load_reference_resampler_module()
    res_cfg = ref_mod.VisualResamplerConfig(
        hidden_size=8, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=16, num_query_tokens=4, vocab_size=10,
    )
    torch.manual_seed(11)
    resampler = ref_mod.VisualResamplerModel(res_cfg, add_pooling_layer=False)
    for p in resampler.parameters():
        torch.nn.init.normal_(p, std=0.2)
    proj = torch.nn.Linear(8, 16)

    rng = np.random.default_rng(4)
    r, alpha, vh = 2, 4, vision_cfg.hidden_size
    A = rng.standard_normal((r, vh)).astype(np.float32) * 0.1
    B = rng.standard_normal((vh, r)).astype(np.float32) * 0.1
    adapter = {
        "base_model.model.vision_model.vision_model.encoder.layers.0.self_attn.q_proj.lora_A.weight": A,
        "base_model.model.vision_model.vision_model.encoder.layers.0.self_attn.q_proj.lora_B.weight": B,
    }
    for k, v in resampler.state_dict().items():
        adapter["base_model.model.visual_resampler." + k] = v.numpy()
    adapter["base_model.model.image_projection_layer.weight"] = proj.weight.data.numpy()
    adapter["base_model.model.image_projection_layer.bias"] = proj.bias.data.numpy()
    # a text key too: the splitter must route it to the text dir
    adapter["base_model.model.text_model.model.layers.0.self_attn.q_proj.lora_A.weight"] = (
        rng.standard_normal((r, 16)).astype(np.float32)
    )
    adapter["base_model.model.text_model.model.layers.0.self_attn.q_proj.lora_B.weight"] = (
        rng.standard_normal((16, r)).astype(np.float32)
    )

    lora_dir = os.path.join(tmp, "lora")
    os.makedirs(lora_dir)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in adapter.items()},
               os.path.join(lora_dir, "adapter_model.bin"))
    with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": alpha}, f)
    with open(os.path.join(lora_dir, "config.json"), "w") as f:
        json.dump({"visual_resampler_config": res_cfg.to_dict()}, f)

    clip_dir = os.path.join(tmp, "clip")
    vision.save_pretrained(clip_dir)
    return lora_dir, clip_dir, (vision, resampler, proj, A, B, alpha, r)


def test_split_and_vision_pipeline(tmp_path):
    tmp = str(tmp_path)
    lora_dir, clip_dir, (vision, resampler, proj, A, B, alpha, r) = build_lora_dir(tmp)
    text_dir, vision_dir = split(lora_dir)
    assert os.path.exists(os.path.join(vision_dir, "visual_resampler_model.bin"))
    assert os.path.exists(os.path.join(vision_dir, "image_projection_layer_model.bin"))
    assert os.path.exists(os.path.join(vision_dir, "visual_resampler_config.json"))
    with open(os.path.join(text_dir, "adapter_config.json")) as f:
        tc = json.load(f)
    assert tc["modules_to_save"] == ["embed_tokens", "lm_head"]

    # text keys must not leak into the vision adapter and vice versa
    tsd = torch.load(os.path.join(text_dir, "adapter_model.bin"), weights_only=True)
    vsd = torch.load(os.path.join(vision_dir, "adapter_model.bin"), weights_only=True)
    assert all("vision" not in k for k in tsd)
    assert all(k.startswith("base_model.model.vision_model") for k in vsd)

    pipe = VisionPipeline.from_webui_split(
        vision_dir, clip_dir, dtype=jnp.float32
    )
    assert pipe.num_image_embeds == 4
    pipe.image_processor.image_size = 28
    pipe.image_processor.crop_size = 28

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    emb = pipe.embed_images([img])
    assert emb.shape == (1, 4, 16)
    assert np.all(np.isfinite(emb))

    # the vision LoRA must actually be folded: q_proj layer 0 differs from base
    W0 = vision.state_dict()["vision_model.encoder.layers.0.self_attn.q_proj.weight"].numpy()
    expect = (W0 + (B @ A) * (alpha / r)).T
    np.testing.assert_allclose(
        np.asarray(pipe.params["vision"]["layers"]["q_proj"][0]), expect, atol=1e-5
    )
