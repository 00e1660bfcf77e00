"""LoRA adapter training — the reference's actual training method, TPU-native.

The reference trains VisualCLA with PEFT LoRA over the text tower (q/k/v/o +
MLP), vision tower, plus full resampler/projector and embed/lm_head
(README_EN.md:75-91; adapter layout per convert_ckpt_for_tgwebui.py:31-64).
Here adapters are extra low-rank leaves inside the param tree, applied by
``ops.linear.linear``; the base stays frozen (int8 base = QLoRA).

- ``add_lora``: wrap chosen stacked weights W (L, in, out) with zero-init
  B and gaussian A (PEFT init), scale alpha/r;
- ``lora_trainable``: mask predicate for ``make_train_step`` reproducing the
  reference recipe (LoRA matrices + resampler + projection + embed/lm_head);
- ``merge_lora``: fold adapters to dense (the offline merge, on-device);
- ``export_adapter``: write a reference-compatible ``adapter_model.bin`` +
  ``adapter_config.json`` so trained adapters interoperate with the PEFT
  ecosystem (and with our own checkpoint/lora.py folding path).
"""
from __future__ import annotations

import json
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TEXT_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj",
                "gate_proj", "up_proj", "down_proj")
VISION_TARGETS = ("q_proj", "k_proj", "v_proj", "o_proj", "fc1", "fc2")


def add_lora(
    params: dict,
    *,
    r: int = 8,
    alpha: float = 16.0,
    rng: jax.Array,
    text_targets: Sequence[str] = TEXT_TARGETS,
    vision_targets: Sequence[str] = VISION_TARGETS,
    dtype=jnp.float32,
) -> dict:
    """Return params with LoRA leaves on the selected projections."""
    keys = iter(jax.random.split(rng, 64))

    def wrap(w):
        L, fin, fout = w.shape if not isinstance(w, dict) else w["q"].shape
        a = (jax.random.normal(next(keys), (L, fin, r), jnp.float32)
             * (1.0 / np.sqrt(fin))).astype(dtype)
        b = jnp.zeros((L, r, fout), dtype)
        # (L,) so the leaf scans with the stacked layers (scalar per layer)
        return {"w": w, "lora_A": a, "lora_B": b,
                "lora_scale": jnp.full((L,), alpha / r, jnp.float32)}

    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    if "text" in out:
        lyr = dict(out["text"]["layers"])
        for t in text_targets:
            lyr[t] = wrap(lyr[t])
        out["text"] = {**out["text"], "layers": lyr}
    if "vision" in out and vision_targets:
        lyr = dict(out["vision"]["layers"])
        for t in vision_targets:
            lyr[t] = wrap(lyr[t])
        out["vision"] = {**out["vision"], "layers": lyr}
    return out


def lora_trainable(path: Tuple) -> bool:
    """Reference SFT recipe: LoRA matrices + full resampler/projector +
    embed_tokens/lm_head (modules_to_save)."""
    if path and path[0] in ("resampler", "projection"):
        return True
    if path and path[-1] in ("lora_A", "lora_B"):
        return True
    if len(path) >= 2 and path[0] == "text" and path[1] in ("embed_tokens", "lm_head"):
        return True
    return False


def merge_lora(params: dict) -> dict:
    """Fold every LoRA leaf into its dense base: W + A @ B * scale."""
    from ..ops.linear import is_lora
    from ..ops.quantization import dequantize, is_quantized

    def fold(node):
        if isinstance(node, dict) and is_lora(node):
            base = node["w"]
            if is_quantized(base):
                base = dequantize(base, jnp.float32)
            delta = jnp.einsum(
                "lir,lro->lio",
                node["lora_A"].astype(jnp.float32),
                node["lora_B"].astype(jnp.float32),
            ) * node["lora_scale"].reshape(-1, 1, 1)
            return (base.astype(jnp.float32) + delta).astype(
                base.dtype if base.dtype != jnp.float32 else jnp.float32
            )
        if isinstance(node, dict):
            return {k: fold(v) for k, v in node.items()}
        return node

    return fold(params)


# HF key formats for export (reverse of checkpoint/mapping.py)
_TEXT_FMT = {
    "q_proj": "model.layers.{}.self_attn.q_proj",
    "k_proj": "model.layers.{}.self_attn.k_proj",
    "v_proj": "model.layers.{}.self_attn.v_proj",
    "o_proj": "model.layers.{}.self_attn.o_proj",
    "gate_proj": "model.layers.{}.mlp.gate_proj",
    "up_proj": "model.layers.{}.mlp.up_proj",
    "down_proj": "model.layers.{}.mlp.down_proj",
}
_VISION_FMT = {
    "q_proj": "vision_model.encoder.layers.{}.self_attn.q_proj",
    "k_proj": "vision_model.encoder.layers.{}.self_attn.k_proj",
    "v_proj": "vision_model.encoder.layers.{}.self_attn.v_proj",
    "o_proj": "vision_model.encoder.layers.{}.self_attn.out_proj",
    "fc1": "vision_model.encoder.layers.{}.mlp.fc1",
    "fc2": "vision_model.encoder.layers.{}.mlp.fc2",
}


def export_adapter(params: dict, out_dir: str, *, r: int, alpha: float) -> None:
    """Write a reference-layout composite adapter: LoRA pairs in PEFT (out, in)
    torch orientation under base_model.model.{text_model|vision_model.vision_model}
    prefixes + full resampler/projector/embed/lm_head replacements
    (key scheme per convert_ckpt_for_tgwebui.py:46-68)."""
    import torch

    from ..ops.linear import is_lora

    sd = {}

    def emit_lora(tree, fmts, prefix, double_vision=False):
        for name, fmt in fmts.items():
            node = tree["layers"].get(name)
            if not (isinstance(node, dict) and is_lora(node)):
                continue
            A = np.asarray(node["lora_A"], np.float32)  # (L, in, r)
            B = np.asarray(node["lora_B"], np.float32)  # (L, r, out)
            for l in range(A.shape[0]):
                base = f"base_model.model.{prefix}{fmt.format(l)}"
                sd[base + ".lora_A.weight"] = A[l].T  # (r, in) torch layout
                sd[base + ".lora_B.weight"] = B[l].T  # (out, r)

    if "text" in params:
        emit_lora(params["text"], _TEXT_FMT, "text_model.")
        for name in ("embed_tokens", "lm_head"):
            w = params["text"].get(name)
            if w is None or isinstance(w, dict):
                continue
            key = ("base_model.model.text_model.model.embed_tokens"
                   if name == "embed_tokens"
                   else "base_model.model.text_model.lm_head")
            arr = np.asarray(w, np.float32)
            sd[key + ".modules_to_save.default.weight"] = (
                arr if name == "embed_tokens" else arr.T
            )
    if "vision" in params:
        emit_lora(params["vision"], _VISION_FMT, "vision_model.")
    if "resampler" in params:
        sd.update(_export_resampler(params["resampler"]))
    if "projection" in params:
        sd["base_model.model.image_projection_layer.weight"] = (
            np.asarray(params["projection"]["weight"], np.float32).T
        )
        sd["base_model.model.image_projection_layer.bias"] = np.asarray(
            params["projection"]["bias"], np.float32
        )

    os.makedirs(out_dir, exist_ok=True)
    torch.save(
        # np.array(): one writable contiguous copy — jax arrays arrive as
        # non-writable numpy views; torch warns (and UB on write) when
        # wrapping read-only memory
        {k: torch.from_numpy(np.array(v))
         for k, v in sd.items()},
        os.path.join(out_dir, "adapter_model.bin"),
    )
    with open(os.path.join(out_dir, "adapter_config.json"), "w") as f:
        json.dump(
            {"peft_type": "LORA", "r": r, "lora_alpha": alpha,
             "fan_in_fan_out": False, "bias": "none"},
            f, indent=2,
        )


def _export_resampler(tree: dict) -> dict:
    """Our stacked resampler tree -> reference per-layer key names (with the
    reference's `query_embeddding` spelling, modeling_visual_resampler.py:587)."""
    out = {}
    pre = "base_model.model.visual_resampler."
    out[pre + "query_embeddding"] = np.asarray(tree["query_embedding"], np.float32)[None]
    lyr = tree["layers"]
    L = lyr["q_proj"].shape[0]
    cross = pre + "encoder.layer.{}.crossattention."
    ffn = pre + "encoder.layer.{}."
    names = [
        ("q_proj", cross + "self.query.weight", True),
        ("q_bias", cross + "self.query.bias", False),
        ("k_proj", cross + "self.key.weight", True),
        ("k_bias", cross + "self.key.bias", False),
        ("v_proj", cross + "self.value.weight", True),
        ("v_bias", cross + "self.value.bias", False),
        ("attn_out", cross + "output.dense.weight", True),
        ("attn_out_bias", cross + "output.dense.bias", False),
        ("inter", ffn + "intermediate.dense.weight", True),
        ("inter_bias", ffn + "intermediate.dense.bias", False),
        ("out", ffn + "output.dense.weight", True),
        ("out_bias", ffn + "output.dense.bias", False),
    ]
    for l in range(L):
        for ours, fmt, transpose in names:
            arr = np.asarray(lyr[ours][l], np.float32)
            out[fmt.format(l)] = arr.T if transpose else arr
        for ln_ours, ln_fmt in (("attn_ln", cross + "output.LayerNorm"),
                                ("out_ln", ffn + "output.LayerNorm")):
            out[ln_fmt.format(l) + ".weight"] = np.asarray(
                lyr[ln_ours]["weight"][l], np.float32
            )
            out[ln_fmt.format(l) + ".bias"] = np.asarray(
                lyr[ln_ours]["bias"][l], np.float32
            )
    return out
