"""Checkpoint converter tests: merged-dir conversion, LoRA folding, native I/O."""
import json
import os

import numpy as np
import pytest
import torch

from tests import hf_ref
from visualcla_tpu.checkpoint import (
    convert_merged,
    convert_unmerged,
    load_checkpoint,
    save_checkpoint,
    flatten_tree,
)
from visualcla_tpu.checkpoint.lora import fold_lora, resize_embeddings
from visualcla_tpu.core.config import tiny_visualcla_config


def build_merged_dir(tmp, seed=0):
    """Fabricate a reference-layout merged checkpoint with tiny towers."""
    text, text_cfg = hf_ref.tiny_hf_llama(seed=seed)
    vision, vision_cfg = hf_ref.tiny_hf_clip_vision(seed=seed)
    ref_mod = hf_ref.load_reference_resampler_module()
    assert ref_mod is not None
    res_cfg = ref_mod.VisualResamplerConfig(
        hidden_size=8, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=16, num_query_tokens=4, vocab_size=10,
    )
    torch.manual_seed(seed + 1)
    resampler = ref_mod.VisualResamplerModel(res_cfg, add_pooling_layer=False).eval()
    for p in resampler.parameters():
        torch.nn.init.normal_(p, std=0.3)
    proj = torch.nn.Linear(8, 16)

    merged = os.path.join(tmp, "merged")
    os.makedirs(merged, exist_ok=True)
    text.save_pretrained(os.path.join(merged, "text_encoder"))
    vision.save_pretrained(os.path.join(merged, "vision_encoder"))
    root_sd = {"visual_resampler." + k: v for k, v in resampler.state_dict().items()}
    root_sd["image_projection_layer.weight"] = proj.weight.data
    root_sd["image_projection_layer.bias"] = proj.bias.data
    torch.save(root_sd, os.path.join(merged, "pytorch_model.bin"))
    with open(os.path.join(merged, "config.json"), "w") as f:
        json.dump(
            {
                "model_type": "visualcla",
                "text_config": text_cfg.to_dict(),
                "vision_config": vision_cfg.to_dict(),
                "use_visual_resampler": True,
                "visual_resampler_config": res_cfg.to_dict(),
            },
            f,
        )
    return merged, (text, vision, resampler, proj)


def test_convert_merged_roundtrip(tmp_path):
    merged, (text, vision, resampler, proj) = build_merged_dir(str(tmp_path))
    out = os.path.join(str(tmp_path), "native")
    convert_merged(merged, out, dtype="float32")
    params, cfg = load_checkpoint(out)

    assert cfg.text_config.vocab_size == text.config.vocab_size
    assert cfg.visual_resampler_config.num_query_tokens == 4
    assert not cfg.visual_resampler_config.add_pooling_layer

    # spot-check exact weight equality through both mapping paths
    expect_text = hf_ref.llama_params_from_hf(text)
    np.testing.assert_array_equal(
        np.asarray(params["text"]["layers"]["q_proj"]),
        expect_text["layers"]["q_proj"],
    )
    expect_vit = hf_ref.vit_params_from_hf(vision)
    np.testing.assert_array_equal(
        np.asarray(params["vision"]["patch_embedding"]), expect_vit["patch_embedding"]
    )
    expect_res = hf_ref.resampler_params_from_ref(resampler)
    np.testing.assert_array_equal(
        np.asarray(params["resampler"]["query_embedding"]),
        expect_res["query_embedding"],
    )
    np.testing.assert_array_equal(
        np.asarray(params["projection"]["weight"]), proj.weight.data.numpy().T
    )

    # converted params must run end-to-end
    import jax.numpy as jnp
    from visualcla_tpu.models import visualcla as vmod

    B, S = 1, 12
    ids = np.zeros((B, S), np.int32)
    ids[0, 1] = 1
    logits = None
    from visualcla_tpu.train import train_forward_logits

    logits = train_forward_logits(
        params, cfg, jnp.asarray(ids), jnp.ones((B, S), jnp.int32),
        jnp.full((B,), -1, jnp.int32), None,
    )
    assert np.all(np.isfinite(np.asarray(logits)))


def test_bf16_checkpoint_io(tmp_path):
    import jax.numpy as jnp

    cfg = tiny_visualcla_config()
    from visualcla_tpu.models import visualcla as vmod
    import jax

    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    out = str(tmp_path / "bf16")
    save_checkpoint(out, params, cfg, dtype="bfloat16")
    loaded, cfg2 = load_checkpoint(out)
    flat = flatten_tree(loaded)
    assert all(
        v.dtype == jnp.bfloat16 for v in flat.values()
        if jnp.issubdtype(v.dtype, jnp.floating)
    )
    assert cfg2.text_config.vocab_size == cfg.text_config.vocab_size


def test_load_checkpoint_int8_and_sharded(tmp_path):
    """Streamed int8 quantization on load + mesh placement."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.ops.quantization import is_quantized
    from visualcla_tpu.train import train_forward_logits

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    out = str(tmp_path / "ck")
    save_checkpoint(out, params, cfg, dtype="float32")

    devices = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, ("data", "model"))
    qparams, cfg2 = load_checkpoint(out, mesh=mesh, quantize_int8=True)
    assert is_quantized(qparams["text"]["layers"]["q_proj"])
    assert qparams["text"]["layers"]["q_proj"]["q"].dtype == jnp.int8
    assert not is_quantized(qparams["vision"]["layers"]["q_proj"])

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, (1, 12)), jnp.int32)
    dense = train_forward_logits(params, cfg, ids, jnp.ones_like(ids),
                                 jnp.full((1,), -1, jnp.int32), None)
    quant = train_forward_logits(qparams, cfg2, ids, jnp.ones_like(ids),
                                 jnp.full((1,), -1, jnp.int32), None)
    err = np.abs(np.asarray(dense) - np.asarray(quant)).max()
    assert err < 0.1 * np.abs(np.asarray(dense)).max()


def test_quantized_tree_checkpoint_roundtrip(tmp_path):
    """int8 trees save/load losslessly (scales stay fp32 under bf16 target)."""
    import jax
    import jax.numpy as jnp

    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.ops.quantization import is_quantized, quantize_tree

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(2), cfg, jnp.float32)
    q = quantize_tree(params)
    out = str(tmp_path / "q")
    save_checkpoint(out, q, cfg, dtype="bfloat16")
    loaded, _ = load_checkpoint(out)
    node = loaded["text"]["layers"]["q_proj"]
    assert is_quantized(node)
    assert node["q"].dtype == jnp.int8
    assert node["scale"].dtype == jnp.float32
    np.testing.assert_array_equal(
        np.asarray(node["q"]), np.asarray(q["text"]["layers"]["q_proj"]["q"])
    )
    np.testing.assert_array_equal(
        np.asarray(node["scale"], np.float32),
        np.asarray(q["text"]["layers"]["q_proj"]["scale"]),
    )


def test_fold_lora_matches_torch():
    torch.manual_seed(3)
    out_f, in_f, r = 12, 8, 4
    W = torch.randn(out_f, in_f)
    A = torch.randn(r, in_f) * 0.1
    B = torch.randn(out_f, r) * 0.1
    alpha = 8
    base = {"model.layers.0.self_attn.q_proj.weight": W.numpy().copy()}
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": A.numpy(),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": B.numpy(),
    }
    folded = fold_lora(base, adapter, {"lora_alpha": alpha, "r": r})
    expect = (W + (B @ A) * (alpha / r)).numpy()
    np.testing.assert_allclose(
        folded["model.layers.0.self_attn.q_proj.weight"], expect, atol=1e-5
    )


def test_fold_lora_modules_to_save_and_resize():
    rng = np.random.default_rng(0)
    base = {
        "model.embed_tokens.weight": rng.standard_normal((10, 4)).astype(np.float32),
        "lm_head.weight": rng.standard_normal((10, 4)).astype(np.float32),
    }
    resized = resize_embeddings(base, 14)
    assert resized["model.embed_tokens.weight"].shape == (14, 4)
    new_embed = rng.standard_normal((14, 4)).astype(np.float32)
    adapter = {
        "base_model.model.model.embed_tokens.modules_to_save.default.weight": new_embed,
    }
    folded = fold_lora(resized, adapter, {"lora_alpha": 1, "r": 1})
    np.testing.assert_array_equal(folded["model.embed_tokens.weight"], new_embed)


def test_fold_lora_raises_on_no_match():
    with pytest.raises(ValueError):
        fold_lora(
            {"some.weight": np.zeros((2, 2), np.float32)},
            {"base_model.model.other.lora_A.weight": np.zeros((1, 2), np.float32),
             "base_model.model.other.lora_B.weight": np.zeros((2, 1), np.float32)},
            {"lora_alpha": 1, "r": 1},
        )


def test_convert_unmerged_with_fabricated_adapter(tmp_path):
    """Full unmerged pipeline: base towers + composite VisualCLA adapter."""
    text, text_cfg = hf_ref.tiny_hf_llama(seed=1)
    vision, vision_cfg = hf_ref.tiny_hf_clip_vision(seed=1)
    ref_mod = hf_ref.load_reference_resampler_module()
    res_cfg = ref_mod.VisualResamplerConfig(
        hidden_size=8, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=16, num_query_tokens=4, vocab_size=10,
    )
    torch.manual_seed(9)
    resampler = ref_mod.VisualResamplerModel(res_cfg, add_pooling_layer=False)
    proj = torch.nn.Linear(8, 16)

    base_t = os.path.join(str(tmp_path), "text")
    base_v = os.path.join(str(tmp_path), "vision")
    text.save_pretrained(base_t)
    vision.save_pretrained(base_v)

    # fabricate a composite adapter: text q_proj LoRA + resized embed replacement
    # + vision fc1 LoRA + full resampler/projector (reference key layout,
    # convert_ckpt_for_tgwebui.py:46-68)
    new_vocab = text_cfg.vocab_size + 4
    rng = np.random.default_rng(5)
    r, alpha = 2, 4
    h = text_cfg.hidden_size
    adapter = {}
    A = rng.standard_normal((r, h)).astype(np.float32) * 0.1
    B = rng.standard_normal((h, r)).astype(np.float32) * 0.1
    adapter["base_model.model.text_model.model.layers.0.self_attn.q_proj.lora_A.weight"] = A
    adapter["base_model.model.text_model.model.layers.0.self_attn.q_proj.lora_B.weight"] = B
    new_embed = rng.standard_normal((new_vocab, h)).astype(np.float32)
    new_head = rng.standard_normal((new_vocab, h)).astype(np.float32)
    adapter["base_model.model.text_model.model.embed_tokens.modules_to_save.default.weight"] = new_embed
    adapter["base_model.model.text_model.lm_head.modules_to_save.default.weight"] = new_head
    vh = vision_cfg.hidden_size
    Av = rng.standard_normal((r, vh)).astype(np.float32) * 0.1
    Bv = rng.standard_normal((vh * 2, r)).astype(np.float32) * 0.1
    adapter["base_model.model.vision_model.vision_model.encoder.layers.0.mlp.fc1.lora_A.weight"] = Av
    adapter["base_model.model.vision_model.vision_model.encoder.layers.0.mlp.fc1.lora_B.weight"] = Bv
    for k, v in resampler.state_dict().items():
        adapter["base_model.model.visual_resampler." + k] = v.numpy()
    adapter["base_model.model.image_projection_layer.weight"] = proj.weight.data.numpy()
    adapter["base_model.model.image_projection_layer.bias"] = proj.bias.data.numpy()

    lora_dir = os.path.join(str(tmp_path), "lora")
    os.makedirs(lora_dir)
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in adapter.items()},
               os.path.join(lora_dir, "adapter_model.bin"))
    with open(os.path.join(lora_dir, "adapter_config.json"), "w") as f:
        json.dump({"r": r, "lora_alpha": alpha, "fan_in_fan_out": False}, f)
    with open(os.path.join(lora_dir, "config.json"), "w") as f:
        json.dump(
            {
                "text_config": text_cfg.to_dict(),
                "vision_config": vision_cfg.to_dict(),
                "use_visual_resampler": True,
                "visual_resampler_config": res_cfg.to_dict(),
            },
            f,
        )

    out = os.path.join(str(tmp_path), "native")
    convert_unmerged(base_t, base_v, [lora_dir], out, dtype="float32")
    params, cfg = load_checkpoint(out)

    assert cfg.text_config.vocab_size == new_vocab
    np.testing.assert_array_equal(np.asarray(params["text"]["embed_tokens"]), new_embed)
    np.testing.assert_array_equal(np.asarray(params["text"]["lm_head"]), new_head.T)
    # folded text q_proj layer 0
    W0 = text.state_dict()["model.layers.0.self_attn.q_proj.weight"].numpy()
    expect = (W0 + (B @ A) * (alpha / r)).T
    np.testing.assert_allclose(
        np.asarray(params["text"]["layers"]["q_proj"][0]), expect, atol=1e-5
    )
    # folded vision fc1 layer 0
    Wf = vision.state_dict()["vision_model.encoder.layers.0.mlp.fc1.weight"].numpy()
    expectf = (Wf + (Bv @ Av) * (alpha / r)).T
    np.testing.assert_allclose(
        np.asarray(params["vision"]["layers"]["fc1"][0]), expectf, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(params["projection"]["weight"]), proj.weight.data.numpy().T
    )
    assert np.asarray(params["resampler"]["query_embedding"]).shape == (4, 8)


@pytest.mark.slow
def test_from_vision_text_without_lora(tmp_path):
    """Regression: vision+text base checkpoints with NO LoRA must load — the
    tokenizer falls back to the text dir, the vocab resizes to the tokenizer,
    and the resampler/projector are fresh-initialized (reference
    from_vision_text_pretrained semantics, modeling_visualcla.py:183-261)."""
    import shutil

    import jax.numpy as jnp

    import visualcla_tpu as v

    text, text_cfg = hf_ref.tiny_hf_llama(seed=3)
    vision, vision_cfg = hf_ref.tiny_hf_clip_vision(seed=3)
    base_t = os.path.join(str(tmp_path), "text")
    base_v = os.path.join(str(tmp_path), "vision")
    text.save_pretrained(base_t)
    vision.save_pretrained(base_v)
    # the text dir needs tokenizer files: borrow the tiny checkpoint's
    tiny = os.path.join(str(tmp_path), "tiny")
    import subprocess, sys
    subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..",
                                      "tools", "make_tiny_checkpoint.py"),
         "--output", tiny],
        check=True, capture_output=True,
    )
    for f in ("tokenizer.model", "added_tokens.json",
              "special_tokens_map.json"):
        src = os.path.join(tiny, f)
        if os.path.exists(src):
            shutil.copy(src, base_t)

    model, tok, proc = v.get_model_and_tokenizer_and_processor(
        text_model=base_t, vision_model=base_v, max_seq_len=256,
        dtype=jnp.float32,
    )
    # vocab covers the tokenizer incl. added specials
    assert model.params["text"]["embed_tokens"].shape[0] >= len(tok)
    # fresh resampler + projector exist and the composite runs end-to-end
    assert "projection" in model.params
    if model.config.use_visual_resampler:
        assert "resampler" in model.params
    from visualcla_tpu.engine.sampling import SamplingConfig

    img = np.zeros((model.image_processor.image_size,
                    model.image_processor.image_size, 3), np.uint8)
    from PIL import Image

    resp, _ = v.chat(model, Image.fromarray(img), "测试", [],
                     SamplingConfig.greedy(max_new_tokens=3), verbose=False)
    assert isinstance(resp, str)
