"""Offline LoRA folding — the TPU-native replacement for PEFT's
``merge_and_unload`` (reference scripts/merge_llama_with_visualcla_lora.py:67-85).

Works on raw torch-layout state dicts BEFORE tree mapping, so the adapter's key
paths line up with the base checkpoint's.  Handles:
- lora_A/lora_B pairs: ``W += (B @ A) * (alpha / r)`` (torch (out, in) layout);
- ``modules_to_save`` full replacements (embed_tokens / lm_head after the
  tokenizer-size resize, convert_ckpt_for_tgwebui.py:31-35);
- tokenizer-driven embedding resize (merge script :75): new rows are drawn
  N(0, initializer_range) like HF ``resize_token_embeddings`` — they are always
  overwritten by modules_to_save in real VisualCLA adapters.
"""
from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional, Tuple

import numpy as np

SD = Dict[str, np.ndarray]


def load_adapter(lora_dir: str) -> Tuple[SD, dict]:
    """Read adapter_model.bin/.safetensors + adapter_config.json."""
    from .torch_io import load_state_dict

    sd = load_state_dict(lora_dir)
    cfg_path = os.path.join(lora_dir, "adapter_config.json")
    cfg = {}
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
    return sd, cfg


def _strip_adapter_key(key: str) -> str:
    """Normalize a PEFT key to the base-model key it targets."""
    k = key
    k = re.sub(r"^base_model\.model\.", "", k)
    k = re.sub(r"\.lora_(A|B)(\.default)?\.weight$", ".lora_\\1", k)
    k = k.replace("modules_to_save.default.", "").replace("modules_to_save.", "")
    return k


def split_adapter(sd: SD):
    """-> (lora_pairs {base_key: (A, B)}, full_replacements {base_key: W})."""
    pairs_a, pairs_b, full = {}, {}, {}
    for key, v in sd.items():
        norm = _strip_adapter_key(key)
        if norm.endswith(".lora_A"):
            pairs_a[norm[: -len(".lora_A")] + ".weight"] = v
        elif norm.endswith(".lora_B"):
            pairs_b[norm[: -len(".lora_B")] + ".weight"] = v
        else:
            full[norm] = v
    pairs = {}
    for k, a in pairs_a.items():
        if k in pairs_b:
            pairs[k] = (a, pairs_b[k])
    return pairs, full


def resize_embeddings(
    base_sd: SD,
    new_vocab: int,
    initializer_range: float = 0.02,
    seed: int = 0,
    keys: Tuple[str, ...] = ("model.embed_tokens.weight", "lm_head.weight"),
) -> SD:
    """Grow embedding/lm_head rows to ``new_vocab`` (HF resize semantics)."""
    rng = np.random.default_rng(seed)
    out = dict(base_sd)
    for k in keys:
        if k not in out:
            continue
        w = out[k]
        if w.shape[0] >= new_vocab:
            continue
        extra = rng.normal(0.0, initializer_range, (new_vocab - w.shape[0], w.shape[1]))
        out[k] = np.concatenate([w, extra.astype(w.dtype)], axis=0)
    return out


def fold_lora(
    base_sd: SD,
    adapter_sd: SD,
    adapter_cfg: Optional[dict] = None,
    *,
    key_prefix: str = "",
) -> SD:
    """Fold an adapter into a base state dict (dense result).

    ``key_prefix`` maps adapter key space onto the base's: e.g. the composite
    VisualCLA adapter uses ``text_model.model.layers...`` while the standalone
    LLaMA base uses ``model.layers...`` — pass key_prefix="text_model.".
    """
    cfg = adapter_cfg or {}
    scale = float(cfg.get("lora_alpha", 1.0)) / float(cfg.get("r", 1.0))
    if cfg.get("use_rslora"):
        scale = float(cfg.get("lora_alpha", 1.0)) / np.sqrt(float(cfg.get("r", 1.0)))
    pairs, full = split_adapter(adapter_sd)
    out = dict(base_sd)
    applied = 0
    for k, (a, b) in pairs.items():
        bk = k[len(key_prefix):] if key_prefix and k.startswith(key_prefix) else k
        if bk not in out:
            continue
        delta = (b.astype(np.float32) @ a.astype(np.float32)) * scale
        if cfg.get("fan_in_fan_out"):
            delta = delta.T
        out[bk] = (out[bk].astype(np.float32) + delta).astype(out[bk].dtype)
        applied += 1
    for k, w in full.items():
        bk = k[len(key_prefix):] if key_prefix and k.startswith(key_prefix) else k
        if bk in out:
            if out[bk].dtype != w.dtype:
                w = w.astype(out[bk].dtype)
            out[bk] = w
            applied += 1
    if applied == 0 and (pairs or full):
        raise ValueError(
            f"no adapter keys matched the base state dict (prefix={key_prefix!r}); "
            f"example adapter keys: {list(pairs) [:3] + list(full)[:3]}"
        )
    return out


def partition_visualcla_adapter(adapter_sd: SD) -> Dict[str, SD]:
    """Split a composite VisualCLA adapter into per-component dicts, mirroring
    convert_ckpt_for_tgwebui.py:46-68.  Keys keep their intra-component paths."""
    comp = {"text_model": {}, "vision_model": {}, "visual_resampler": {},
            "image_projection_layer": {}}
    for key, v in adapter_sd.items():
        norm = re.sub(r"^base_model\.model\.", "", key)
        for name in comp:
            if norm.startswith(name + "."):
                # vision keys keep their inner "vision_model." prefix (the
                # composite doubles it: vision_model.vision_model.encoder...),
                # which is exactly the CLIPVisionModel base key space.
                comp[name][norm[len(name) + 1:]] = v
                break
    return comp
