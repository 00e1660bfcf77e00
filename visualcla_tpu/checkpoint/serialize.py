"""Native checkpoint format: flat-key safetensors + composite config.json.

Layout of a converted checkpoint directory:
  config.json              composite config (same schema as the reference's)
  params.safetensors       all weights, keys are '/'-joined tree paths,
                           stacked-layer MXU layout, bf16 by default
  tokenizer.model          copied through if present at conversion time
  added_tokens.json        the 4 VisualCLA specials with their ids
  preprocessor_config.json image preprocessing config

Loading streams tensor-by-tensor from the (mmap'd) safetensors file and places
each directly onto its mesh sharding — peak host memory stays ~1 tensor, and
per-device transfers only carry that device's shard.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VisualCLAConfig


def flatten_tree(tree: dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, path))
        else:
            out[path] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _config_to_dict(cfg: VisualCLAConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["model_type"] = "visualcla"
    return d


def save_checkpoint(
    out_dir: str,
    params: dict,
    cfg: VisualCLAConfig,
    dtype: str = "bfloat16",
) -> None:
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)
    flat = flatten_tree(params)
    target = jnp.dtype(dtype)
    tensors = {}
    for k, v in flat.items():
        # safetensors writes the raw buffer: non-C-contiguous arrays (e.g.
        # np.stack over transposed torch weights) silently corrupt without this
        arr = np.ascontiguousarray(v)
        if np.issubdtype(arr.dtype, np.floating) and arr.dtype != target:
            # numpy can't hold bf16 — round-trip through jnp and view as u16
            if target == jnp.bfloat16:
                arr = np.asarray(jnp.asarray(arr).astype(jnp.bfloat16))
            else:
                arr = arr.astype(target)
        tensors[k] = arr
    save_file(tensors, os.path.join(out_dir, "params.safetensors"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(_config_to_dict(cfg), f, indent=2)


def load_checkpoint(
    ckpt_dir: str,
    mesh: Optional[Any] = None,
    dtype=None,
):
    """-> (params pytree on device, VisualCLAConfig).

    With ``mesh``, every tensor is placed with its TP sharding from
    ``parallel.sharding.param_specs`` as it streams off disk.
    """
    from safetensors import safe_open

    cfg = VisualCLAConfig.from_pretrained(ckpt_dir)
    path = os.path.join(ckpt_dir, "params.safetensors")

    flat = {}
    with safe_open(path, framework="flax") as f:
        keys = list(f.keys())
        for k in keys:
            flat[k] = f.get_tensor(k)
    params = unflatten_tree(flat)
    if dtype is not None:
        params = jax.tree.map(
            lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            params,
        )
    if mesh is not None:
        from ..parallel import sharding

        params = sharding.shard_params(params, mesh)
    return params, cfg
