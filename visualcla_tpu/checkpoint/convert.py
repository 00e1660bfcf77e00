"""Checkpoint converter CLI — reference formats -> native TPU checkpoint.

Two input modes, covering both reference pipelines:

1. **merged dir** (the output of scripts/merge_llama_with_visualcla_lora.py,
   layout per README_EN.md:180-193): text_encoder/ + vision_encoder/ +
   pytorch_model*.bin (resampler+projector) + config.json.

2. **unmerged**: --text_model (Chinese-Alpaca-Plus-7B HF dir) + --vision_model
   (CLIP-ViT HF dir) + one or more --lora_model dirs.  This performs the merge
   script's job offline: resize embeddings to the tokenizer, fold each LoRA
   (text/vision LoRA matrices, full resampler/projector, embed/lm_head
   modules_to_save), and emit the same dense result — no PEFT, no torch graph.

Usage:
  python -m visualcla_tpu.checkpoint.convert --merged_model DIR --output OUT
  python -m visualcla_tpu.checkpoint.convert --text_model DIR --vision_model DIR \
      --lora_model LORA1,LORA2 --output OUT [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import shutil
from typing import Optional

from ..core.config import VisualCLAConfig
from . import lora as lora_lib
from .mapping import (
    llama_tree_from_sd,
    projection_tree_from_sd,
    resampler_tree_from_sd,
    vit_tree_from_sd,
)
from .serialize import save_checkpoint
from .torch_io import load_state_dict

logger = logging.getLogger(__name__)


def _copy_side_files(src_dirs, out_dir):
    names = ("tokenizer.model", "added_tokens.json", "special_tokens_map.json",
             "tokenizer_config.json", "preprocessor_config.json")
    for name in names:
        for d in src_dirs:
            if d and os.path.exists(os.path.join(d, name)):
                shutil.copy(os.path.join(d, name), os.path.join(out_dir, name))
                break


def convert_merged(merged_dir: str, out_dir: str, dtype: str = "bfloat16") -> None:
    """Merged reference checkpoint -> native format."""
    cfg = VisualCLAConfig.from_pretrained(merged_dir)
    # consume/del as we go: at 7B the text state dict alone is ~13.5 GB; a
    # non-consuming build would hold it AND the stacked tree at once
    # (stress_weights_day.py measured the convert stage past 20 GB RSS)
    text_sd = load_state_dict(os.path.join(merged_dir, "text_encoder"))
    params = {"text": llama_tree_from_sd(text_sd, consume=True)}
    del text_sd
    vision_sd = load_state_dict(os.path.join(merged_dir, "vision_encoder"))
    params["vision"] = vit_tree_from_sd(vision_sd)
    del vision_sd
    root_sd = load_state_dict(merged_dir)
    params["projection"] = projection_tree_from_sd(root_sd)
    if cfg.use_visual_resampler:
        params["resampler"] = resampler_tree_from_sd(root_sd)
    del root_sd
    # trust the actual tensor shapes over the stored config (mirrors
    # from_merged_pretrained rebuilding configs from submodels, :163-165)
    cfg = _sync_config(cfg, params)
    save_checkpoint(out_dir, params, cfg, dtype, consume=True)
    _copy_side_files([merged_dir], out_dir)
    logger.info("converted merged checkpoint %s -> %s", merged_dir, out_dir)


def convert_unmerged(
    text_model: str,
    vision_model: str,
    lora_models: list,
    out_dir: str,
    dtype: str = "bfloat16",
    vocab_size: Optional[int] = None,
) -> None:
    """Base LLaMA + CLIP + VisualCLA LoRA(s) -> folded dense native checkpoint."""
    text_sd = load_state_dict(text_model)
    vision_sd = load_state_dict(vision_model)
    resampler_sd = {}
    projection_sd = {}
    cfg = None
    for lora_dir in lora_models:
        adapter_sd, adapter_cfg = lora_lib.load_adapter(lora_dir)
        comp = lora_lib.partition_visualcla_adapter(adapter_sd)
        if vocab_size is None:
            # infer the post-resize vocab from the adapter's full embed matrix
            for k, v in comp["text_model"].items():
                if "embed_tokens" in k and not k.endswith(("lora_A", "lora_B")) \
                        and "lora" not in k:
                    vocab_size = v.shape[0]
        if vocab_size:
            text_sd = lora_lib.resize_embeddings(text_sd, vocab_size)
        text_sd = lora_lib.fold_lora(text_sd, comp["text_model"], adapter_cfg)
        if comp["vision_model"]:
            vision_sd = lora_lib.fold_lora(vision_sd, comp["vision_model"], adapter_cfg)
        # resampler + projector ship as full weights inside the adapter
        for k, v in comp["visual_resampler"].items():
            resampler_sd["visual_resampler." + k] = v
        for k, v in comp["image_projection_layer"].items():
            projection_sd["image_projection_layer." + k] = v
        cfg_path = os.path.join(lora_dir, "config.json")
        if os.path.exists(cfg_path):
            cfg = VisualCLAConfig.from_pretrained(cfg_path)
    if cfg is None:
        # no LoRA config.json: compose the config from the base towers' own
        # HF configs (heads/eps/etc. are not derivable from weight shapes)
        import dataclasses as _dc
        import json as _json

        from ..core.config import LlamaConfig, ViTConfig

        cfg = VisualCLAConfig()
        for d, field, klass in ((text_model, "text_config", LlamaConfig),
                                (vision_model, "vision_config", ViTConfig)):
            p = os.path.join(d, "config.json")
            if os.path.exists(p):
                with open(p) as f:
                    hf = _json.load(f)
                if field == "vision_config":
                    hf = hf.get("vision_config", hf)  # CLIPModel nests it
                cfg = _dc.replace(cfg, **{field: klass.from_hf_dict(hf)})
    if not lora_models and vocab_size:
        # the resize normally happens per-LoRA; still honor an explicit
        # vocab_size (len(tokenizer) incl. added specials) with no LoRA
        text_sd = lora_lib.resize_embeddings(text_sd, vocab_size)
    params = {
        "text": llama_tree_from_sd(text_sd, consume=True),
        "vision": vit_tree_from_sd(vision_sd),
    }
    del text_sd, vision_sd
    if projection_sd:
        params["projection"] = projection_tree_from_sd(projection_sd)
    if resampler_sd and cfg.use_visual_resampler:
        params["resampler"] = resampler_tree_from_sd(resampler_sd)
    cfg = _sync_config(cfg, params)
    params, cfg = _init_missing_heads(params, cfg)
    save_checkpoint(out_dir, params, cfg, dtype, consume=True)
    _copy_side_files(lora_models + [text_model, vision_model], out_dir)
    logger.info("converted unmerged %s + %s + %s -> %s",
                text_model, vision_model, lora_models, out_dir)


def _init_missing_heads(params: dict, cfg: VisualCLAConfig):
    """Without a LoRA, the resampler + projector have no trained weights —
    the reference builds them as freshly-initialized modules
    (modeling_visualcla.py:46-67 _init_weights; normal(0, initializer_range),
    zero-init resampler queries) so the composite is structurally runnable
    before an adapter is applied.  Mirror that here.  Returns (params, cfg)
    with the resampler config synced to the actual vision width."""
    import dataclasses

    import numpy as np

    vh = cfg.vision_config.hidden_size
    th = cfg.text_config.hidden_size
    if "projection" not in params:
        import jax
        import jax.numpy as jnp

        k = jax.random.PRNGKey(0)
        params["projection"] = {
            "weight": np.asarray(
                jax.random.normal(k, (vh, th), jnp.float32)
                * cfg.initializer_range
            ),
            "bias": np.zeros((th,), np.float32),
        }
    if cfg.use_visual_resampler and "resampler" not in params:
        import jax
        import jax.numpy as jnp

        from ..models import resampler as resampler_mod

        # a fresh resampler must consume the ACTUAL vision width, not the
        # default config's (reference ties resampler hidden to the ViT)
        res = cfg.visual_resampler_config
        if res.hidden_size != vh:
            heads = res.num_attention_heads
            if vh % heads:
                heads = max(1, vh // 64)
            res = dataclasses.replace(
                res, hidden_size=vh, intermediate_size=4 * vh,
                num_attention_heads=heads,
            )
            cfg = dataclasses.replace(cfg, visual_resampler_config=res)
        params["resampler"] = jax.tree.map(
            np.asarray,
            resampler_mod.init_params(jax.random.PRNGKey(1), res, jnp.float32),
        )
    return params, cfg


def _sync_config(cfg: VisualCLAConfig, params: dict) -> VisualCLAConfig:
    """Align config dims with actual tensor shapes (vocab after resize etc.)."""
    import dataclasses

    text = dataclasses.replace(
        cfg.text_config,
        vocab_size=int(params["text"]["embed_tokens"].shape[0]),
        hidden_size=int(params["text"]["embed_tokens"].shape[1]),
        num_hidden_layers=int(params["text"]["layers"]["q_proj"].shape[0]),
        intermediate_size=int(params["text"]["layers"]["gate_proj"].shape[2]),
    )
    # patch/image size come from the weights too: patch_embedding is the
    # flattened (3*P*P, H) conv kernel and position_embedding has
    # (image/P)^2 + 1 rows
    patch = int(round((params["vision"]["patch_embedding"].shape[0] // 3) ** 0.5))
    grid = int(round((params["vision"]["position_embedding"].shape[0] - 1) ** 0.5))
    vision = dataclasses.replace(
        cfg.vision_config,
        hidden_size=int(params["vision"]["class_embedding"].shape[0]),
        num_hidden_layers=int(params["vision"]["layers"]["q_proj"].shape[0]),
        intermediate_size=int(params["vision"]["layers"]["fc1"].shape[2]),
        patch_size=patch,
        image_size=grid * patch,
    )
    res = cfg.visual_resampler_config
    if "resampler" in params:
        import dataclasses as dc

        res = dc.replace(
            res,
            hidden_size=int(params["resampler"]["query_embedding"].shape[1]),
            num_query_tokens=int(params["resampler"]["query_embedding"].shape[0]),
            num_hidden_layers=int(params["resampler"]["layers"]["q_proj"].shape[0]),
            intermediate_size=int(params["resampler"]["layers"]["inter"].shape[2]),
            add_pooling_layer="pooler" in params["resampler"],
        )
    import dataclasses as dc

    return dc.replace(
        cfg, text_config=text, vision_config=vision, visual_resampler_config=res
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--merged_model", default=None,
                    help="reference merged checkpoint dir")
    ap.add_argument("--text_model", default=None, help="base LLaMA HF dir")
    ap.add_argument("--vision_model", default=None, help="base CLIP HF dir")
    ap.add_argument("--lora_model", default=None,
                    help="comma-separated VisualCLA LoRA dirs (applied in order)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float16", "float32"))
    ap.add_argument("--vocab_size", type=int, default=None)
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    if args.merged_model:
        convert_merged(args.merged_model, args.output, args.dtype)
    else:
        if not (args.text_model and args.vision_model and args.lora_model):
            ap.error("need --merged_model OR --text_model+--vision_model+--lora_model")
        convert_unmerged(
            args.text_model, args.vision_model, args.lora_model.split(","),
            args.output, args.dtype, args.vocab_size,
        )


if __name__ == "__main__":
    main()
