"""Native params -> reference merged-dir layout (the inverse of convert.py).

The reference's merge tool writes an HF-consumable merged dir
(/root/reference/scripts/merge_llama_with_visualcla_lora.py:87-97):

  out/
    config.json                   composite VisualCLA config
    pytorch_model.bin             visual_resampler.* + image_projection_layer.*
    text_encoder/                 HF LlamaForCausalLM (config + weights)
    vision_encoder/               HF CLIPVisionModel (config + weights)
    tokenizer.model, preprocessor_config.json, ...  (side files)

``export_reference_merged`` emits exactly that layout from a native param
tree, so anything trained or merged on TPU interops with the HF/torch
ecosystem (and with this repo's own convert.py, round-tripping bit-equal —
tests/test_export.py).

Key names (incl. the reference's triple-d ``query_embeddding`` typo,
modeling_visual_resampler.py:587) and tensor orientations are the exact
inverses of mapping.py: torch nn.Linear stores (out, in); native stores
(in, out) stacked on a leading layer axis.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import shutil
from typing import Dict

import numpy as np

from ..core.config import VisualCLAConfig

logger = logging.getLogger(__name__)

SD = Dict[str, np.ndarray]

_SIDE_FILES = (
    "tokenizer.model", "tokenizer_config.json", "special_tokens_map.json",
    "added_tokens.json", "preprocessor_config.json",
)


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _require_plain(tree, path=""):
    """Exported trees must hold plain arrays: fold LoRA (train/lora.py) and
    dequantize int8 before exporting."""
    if isinstance(tree, dict):
        if "lora_A" in tree or ("q" in tree and "scale" in tree):
            raise ValueError(
                f"param subtree {path or '<root>'} holds "
                f"{'LoRA' if 'lora_A' in tree else 'int8'} leaves — fold/"
                "dequantize before export (train.lora.fold_params / "
                "ops.quantization.dequantize)"
            )
        for k, v in tree.items():
            _require_plain(v, f"{path}/{k}")


def llama_sd_from_tree(tree: dict) -> SD:
    """Inverse of mapping.llama_tree_from_sd."""
    sd: SD = {"model.embed_tokens.weight": _np(tree["embed_tokens"])}
    lyr = tree["layers"]
    L = lyr["input_norm"].shape[0]
    names = {
        "input_norm": ("model.layers.{}.input_layernorm.weight", False),
        "q_proj": ("model.layers.{}.self_attn.q_proj.weight", True),
        "k_proj": ("model.layers.{}.self_attn.k_proj.weight", True),
        "v_proj": ("model.layers.{}.self_attn.v_proj.weight", True),
        "o_proj": ("model.layers.{}.self_attn.o_proj.weight", True),
        "post_norm": ("model.layers.{}.post_attention_layernorm.weight", False),
        "gate_proj": ("model.layers.{}.mlp.gate_proj.weight", True),
        "up_proj": ("model.layers.{}.mlp.up_proj.weight", True),
        "down_proj": ("model.layers.{}.mlp.down_proj.weight", True),
    }
    for key, (fmt, transpose) in names.items():
        stacked = _np(lyr[key])
        for l in range(L):
            w = stacked[l]
            sd[fmt.format(l)] = np.ascontiguousarray(w.T if transpose else w)
    sd["model.norm.weight"] = _np(tree["final_norm"])
    sd["lm_head.weight"] = np.ascontiguousarray(_np(tree["lm_head"]).T)
    return sd


def vit_sd_from_tree(tree: dict, patch_size: int,
                     prefix: str = "vision_model.") -> SD:
    """Inverse of mapping.vit_tree_from_sd (conv filter re-folded to
    (H, 3, P, P))."""
    p = prefix
    sd: SD = {
        p + "embeddings.class_embedding": _np(tree["class_embedding"]),
        p + "embeddings.position_embedding.weight":
            _np(tree["position_embedding"]),
        p + "pre_layrnorm.weight": _np(tree["pre_layernorm"]["weight"]),
        p + "pre_layrnorm.bias": _np(tree["pre_layernorm"]["bias"]),
        p + "post_layernorm.weight": _np(tree["post_layernorm"]["weight"]),
        p + "post_layernorm.bias": _np(tree["post_layernorm"]["bias"]),
    }
    patch = _np(tree["patch_embedding"])  # (3*P*P, H)
    H = patch.shape[1]
    sd[p + "embeddings.patch_embedding.weight"] = np.ascontiguousarray(
        patch.T.reshape(H, 3, patch_size, patch_size)
    )
    lyr = tree["layers"]
    L = lyr["q_proj"].shape[0]
    fmt = p + "encoder.layers.{}."
    pairs = [
        ("q_proj", "self_attn.q_proj.weight", True),
        ("q_bias", "self_attn.q_proj.bias", False),
        ("k_proj", "self_attn.k_proj.weight", True),
        ("k_bias", "self_attn.k_proj.bias", False),
        ("v_proj", "self_attn.v_proj.weight", True),
        ("v_bias", "self_attn.v_proj.bias", False),
        ("o_proj", "self_attn.out_proj.weight", True),
        ("o_bias", "self_attn.out_proj.bias", False),
        ("fc1", "mlp.fc1.weight", True),
        ("fc1_bias", "mlp.fc1.bias", False),
        ("fc2", "mlp.fc2.weight", True),
        ("fc2_bias", "mlp.fc2.bias", False),
    ]
    for l in range(L):
        base = fmt.format(l)
        for key, name, transpose in pairs:
            w = _np(lyr[key])[l]
            sd[base + name] = np.ascontiguousarray(w.T if transpose else w)
        for ln_key, ln_name in (("ln1", "layer_norm1"), ("ln2", "layer_norm2")):
            sd[base + ln_name + ".weight"] = _np(lyr[ln_key]["weight"])[l]
            sd[base + ln_name + ".bias"] = _np(lyr[ln_key]["bias"])[l]
    return sd


def resampler_sd_from_tree(tree: dict,
                           prefix: str = "visual_resampler.") -> SD:
    """Inverse of mapping.resampler_tree_from_sd — writes the reference's
    actual (typo'd) ``query_embeddding`` parameter name."""
    p = prefix
    sd: SD = {
        p + "query_embeddding": _np(tree["query_embedding"])[None],  # (1,Nq,H)
    }
    lyr = tree["layers"]
    L = lyr["q_proj"].shape[0]
    att = p + "encoder.layer.{}.crossattention."
    ffn = p + "encoder.layer.{}."
    pairs = [
        ("q_proj", att, "self.query.weight", True),
        ("q_bias", att, "self.query.bias", False),
        ("k_proj", att, "self.key.weight", True),
        ("k_bias", att, "self.key.bias", False),
        ("v_proj", att, "self.value.weight", True),
        ("v_bias", att, "self.value.bias", False),
        ("attn_out", att, "output.dense.weight", True),
        ("attn_out_bias", att, "output.dense.bias", False),
        ("inter", ffn, "intermediate.dense.weight", True),
        ("inter_bias", ffn, "intermediate.dense.bias", False),
        ("out", ffn, "output.dense.weight", True),
        ("out_bias", ffn, "output.dense.bias", False),
    ]
    for l in range(L):
        for key, fmt, name, transpose in pairs:
            w = _np(lyr[key])[l]
            sd[fmt.format(l) + name] = np.ascontiguousarray(
                w.T if transpose else w)
        sd[att.format(l) + "output.LayerNorm.weight"] = _np(
            lyr["attn_ln"]["weight"])[l]
        sd[att.format(l) + "output.LayerNorm.bias"] = _np(
            lyr["attn_ln"]["bias"])[l]
        sd[ffn.format(l) + "output.LayerNorm.weight"] = _np(
            lyr["out_ln"]["weight"])[l]
        sd[ffn.format(l) + "output.LayerNorm.bias"] = _np(
            lyr["out_ln"]["bias"])[l]
    if "pooler" in tree:
        sd[p + "pooler.dense.weight"] = np.ascontiguousarray(
            _np(tree["pooler"]["weight"]).T)
        sd[p + "pooler.dense.bias"] = _np(tree["pooler"]["bias"])
    return sd


def projection_sd_from_tree(tree: dict,
                            prefix: str = "image_projection_layer.") -> SD:
    return {
        prefix + "weight": np.ascontiguousarray(_np(tree["weight"]).T),
        prefix + "bias": _np(tree["bias"]),
    }


def _save_torch_bin(sd: SD, path: str, dtype) -> None:
    import torch

    out = {}
    for k, v in sd.items():
        # copy=True: ascontiguousarray may return a read-only view (torch warns)
        t = torch.from_numpy(np.array(v, np.float32, copy=True, order="C"))
        out[k] = t.to(dtype)
    torch.save(out, path)


def _torch_dtype(name: str):
    import torch

    return {"float16": torch.float16, "bfloat16": torch.bfloat16,
            "float32": torch.float32}[name]


def export_reference_merged(
    params: dict, cfg: VisualCLAConfig, out_dir: str,
    dtype: str = "float16", side_files_from: str | None = None,
) -> None:
    """Write ``params`` as a reference merged dir (HF/torch-consumable).

    ``dtype`` matches the reference merge tool's default (fp16 .bin files).
    ``side_files_from`` optionally copies tokenizer/preprocessor files."""
    _require_plain(params)
    os.makedirs(out_dir, exist_ok=True)
    td = _torch_dtype(dtype)

    text_dir = os.path.join(out_dir, "text_encoder")
    vision_dir = os.path.join(out_dir, "vision_encoder")
    os.makedirs(text_dir, exist_ok=True)
    os.makedirs(vision_dir, exist_ok=True)

    _save_torch_bin(llama_sd_from_tree(params["text"]),
                    os.path.join(text_dir, "pytorch_model.bin"), td)
    with open(os.path.join(text_dir, "config.json"), "w") as f:
        json.dump({**dataclasses.asdict(cfg.text_config),
                   "model_type": "llama",
                   "architectures": ["LlamaForCausalLM"],
                   "torch_dtype": dtype}, f, indent=2)

    _save_torch_bin(
        vit_sd_from_tree(params["vision"], cfg.vision_config.patch_size),
        os.path.join(vision_dir, "pytorch_model.bin"), td)
    with open(os.path.join(vision_dir, "config.json"), "w") as f:
        json.dump({**dataclasses.asdict(cfg.vision_config),
                   "model_type": "clip_vision_model",
                   "architectures": ["CLIPVisionModel"],
                   "torch_dtype": dtype}, f, indent=2)

    root_sd: SD = projection_sd_from_tree(params["projection"])
    if "resampler" in params:
        root_sd.update(resampler_sd_from_tree(params["resampler"]))
    _save_torch_bin(root_sd, os.path.join(out_dir, "pytorch_model.bin"), td)

    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump({
            "model_type": "visualcla",
            "text_config": dataclasses.asdict(cfg.text_config),
            "vision_config": dataclasses.asdict(cfg.vision_config),
            "use_visual_resampler": cfg.use_visual_resampler,
            "visual_resampler_config":
                dataclasses.asdict(cfg.visual_resampler_config),
            "initializer_range": cfg.initializer_range,
            "layer_norm_eps": cfg.layer_norm_eps,
            "torch_dtype": dtype,
        }, f, indent=2)

    if side_files_from:
        for name in _SIDE_FILES:
            src = os.path.join(side_files_from, name)
            if os.path.exists(src):
                shutil.copy2(src, os.path.join(out_dir, name))
    logger.info("exported reference merged dir -> %s", out_dir)


def main(argv=None):
    import argparse

    from .serialize import load_checkpoint

    ap = argparse.ArgumentParser(
        description="Export a native checkpoint to the reference merged layout")
    ap.add_argument("--checkpoint", required=True, help="native checkpoint dir")
    ap.add_argument("--output", required=True, help="merged dir to write")
    ap.add_argument("--dtype", default="float16",
                    choices=("float16", "bfloat16", "float32"))
    args = ap.parse_args(argv)
    import jax.numpy as jnp

    params, cfg = load_checkpoint(args.checkpoint, dtype=jnp.float32)
    export_reference_merged(params, cfg, args.output, dtype=args.dtype,
                            side_files_from=args.checkpoint)


if __name__ == "__main__":
    main()
