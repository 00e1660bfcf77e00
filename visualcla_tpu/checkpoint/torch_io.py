"""Readers for the reference's torch checkpoint containers.

Handles every container format the reference stack can produce:
- ``pytorch_model.bin`` (torch pickle) and glob'd multi-file variants
  (reference modeling_visualcla.py:144-149);
- HF sharded checkpoints via ``pytorch_model.bin.index.json``;
- ``model.safetensors`` (+ index) for newer exports;
- LoRA ``adapter_model.bin`` / ``adapter_model.safetensors``.

All tensors are returned as fp32/fp16 numpy arrays on host.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict

import numpy as np


def _torch_load(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v for k, v in sd.items()}


def _to_numpy(t) -> np.ndarray:
    import torch

    if isinstance(t, torch.Tensor):
        if t.dtype == torch.bfloat16:
            t = t.float()
        return t.detach().cpu().numpy()
    return np.asarray(t)


def load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    """Load the full state dict from an HF-style model directory (any container)."""
    d = model_dir
    # sharded index (bin or safetensors; load_file dispatches per shard)
    for index_name in ("pytorch_model.bin.index.json",
                       "model.safetensors.index.json"):
        idx = os.path.join(d, index_name)
        if os.path.exists(idx):
            with open(idx) as f:
                weight_map = json.load(f)["weight_map"]
            out = {}
            for shard in sorted(set(weight_map.values())):
                out.update(load_file(os.path.join(d, shard)))
            return out
    for name in ("pytorch_model.bin", "model.safetensors", "adapter_model.bin",
                 "adapter_model.safetensors"):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return load_file(p)
    # reference-style glob: pytorch_model*.bin at the merged-dir root
    ckpts = sorted(glob.glob(os.path.join(d, "pytorch_model*.bin")))
    if ckpts:
        out = {}
        for c in ckpts:
            out.update(load_file(c))
        return out
    raise FileNotFoundError(f"no checkpoint container found under {d}")


def load_file(path: str) -> Dict[str, np.ndarray]:
    """Load one checkpoint file (torch pickle or safetensors) -> numpy dict."""
    if path.endswith(".safetensors"):
        from safetensors import safe_open

        out = {}
        with safe_open(path, framework="np") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    return {k: _to_numpy(v) for k, v in _torch_load(path).items()}
