"""HF-torch state-dict layouts -> our stacked MXU-oriented param trees.

Torch ``nn.Linear`` stores (out, in); our projections are ``x @ W`` with W
(in, out), so every linear transposes.  Per-layer weights stack on a leading
layer axis (one ``lax.scan`` trace + clean GSPMD sharding).

Key names follow the reference checkpoints:
- LLaMA:      ``model.layers.N...`` (text_encoder/, modeling_visualcla.py:151)
- CLIP ViT:   ``vision_model.encoder.layers.N...`` (vision_encoder/, :157)
- resampler:  ``visual_resampler.encoder.layer.N.crossattention...`` with the
  reference's triple-d ``query_embeddding`` typo (modeling_visual_resampler.py:587)
- projector:  ``image_projection_layer.{weight,bias}`` (:102)
"""
from __future__ import annotations

from typing import Dict

import numpy as np

SD = Dict[str, np.ndarray]


def _num_layers(sd: SD, fmt: str) -> int:
    n = 0
    while fmt.format(n) in sd:
        n += 1
    return n


def llama_tree_from_sd(sd: SD, prefix: str = "", consume: bool = False) -> dict:
    """``consume=True`` pops tensors out of ``sd`` as they are stacked, so a
    7B conversion's peak memory is ~one state dict plus ONE stacked leaf
    instead of two full copies (stress_weights_day.py, round 4)."""
    p = prefix
    L = _num_layers(sd, p + "model.layers.{}.input_layernorm.weight")
    get = sd.pop if consume else sd.__getitem__

    def stack(fmt, transpose=True):
        ws = [get(p + fmt.format(l)) for l in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        return np.stack(ws)

    return {
        "embed_tokens": get(p + "model.embed_tokens.weight"),
        "layers": {
            "input_norm": stack("model.layers.{}.input_layernorm.weight", False),
            "q_proj": stack("model.layers.{}.self_attn.q_proj.weight"),
            "k_proj": stack("model.layers.{}.self_attn.k_proj.weight"),
            "v_proj": stack("model.layers.{}.self_attn.v_proj.weight"),
            "o_proj": stack("model.layers.{}.self_attn.o_proj.weight"),
            "post_norm": stack("model.layers.{}.post_attention_layernorm.weight", False),
            "gate_proj": stack("model.layers.{}.mlp.gate_proj.weight"),
            "up_proj": stack("model.layers.{}.mlp.up_proj.weight"),
            "down_proj": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": get(p + "model.norm.weight"),
        "lm_head": get(p + "lm_head.weight").T,
    }


def vit_tree_from_sd(sd: SD, prefix: str = "vision_model.") -> dict:
    p = prefix
    lyr = p + "encoder.layers.{}."
    L = _num_layers(sd, lyr + "layer_norm1.weight")

    def ln(name):
        return {"weight": sd[p + name + ".weight"], "bias": sd[p + name + ".bias"]}

    def stack_w(fmt):
        return np.stack([sd[fmt.format(l)].T for l in range(L)])

    def stack_b(fmt):
        return np.stack([sd[fmt.format(l)] for l in range(L)])

    conv = sd[p + "embeddings.patch_embedding.weight"]  # (H, 3, P, P)
    H = conv.shape[0]
    return {
        "class_embedding": sd[p + "embeddings.class_embedding"],
        "patch_embedding": conv.reshape(H, -1).T,
        "position_embedding": sd[p + "embeddings.position_embedding.weight"],
        "pre_layernorm": ln("pre_layrnorm"),  # HF's typo'd attribute name
        "layers": {
            "ln1": {"weight": stack_b(lyr + "layer_norm1.weight"),
                    "bias": stack_b(lyr + "layer_norm1.bias")},
            "q_proj": stack_w(lyr + "self_attn.q_proj.weight"),
            "q_bias": stack_b(lyr + "self_attn.q_proj.bias"),
            "k_proj": stack_w(lyr + "self_attn.k_proj.weight"),
            "k_bias": stack_b(lyr + "self_attn.k_proj.bias"),
            "v_proj": stack_w(lyr + "self_attn.v_proj.weight"),
            "v_bias": stack_b(lyr + "self_attn.v_proj.bias"),
            "o_proj": stack_w(lyr + "self_attn.out_proj.weight"),
            "o_bias": stack_b(lyr + "self_attn.out_proj.bias"),
            "ln2": {"weight": stack_b(lyr + "layer_norm2.weight"),
                    "bias": stack_b(lyr + "layer_norm2.bias")},
            "fc1": stack_w(lyr + "mlp.fc1.weight"),
            "fc1_bias": stack_b(lyr + "mlp.fc1.bias"),
            "fc2": stack_w(lyr + "mlp.fc2.weight"),
            "fc2_bias": stack_b(lyr + "mlp.fc2.bias"),
        },
        "post_layernorm": ln("post_layernorm"),
    }


def resampler_tree_from_sd(sd: SD, prefix: str = "visual_resampler.") -> dict:
    p = prefix
    lyr = p + "encoder.layer.{}.crossattention."
    ffn = p + "encoder.layer.{}."
    L = _num_layers(sd, lyr + "self.query.weight")

    def stack_w(fmt):
        return np.stack([sd[fmt.format(l)].T for l in range(L)])

    def stack_b(fmt):
        return np.stack([sd[fmt.format(l)] for l in range(L)])

    # the reference registers the parameter as `query_embeddding` (3 d's)
    qkey = p + "query_embeddding"
    if qkey not in sd:
        qkey = p + "query_embedding"
    tree = {
        "query_embedding": np.asarray(sd[qkey])[0],  # (1, Nq, H) -> (Nq, H)
        "layers": {
            "q_proj": stack_w(lyr + "self.query.weight"),
            "q_bias": stack_b(lyr + "self.query.bias"),
            "k_proj": stack_w(lyr + "self.key.weight"),
            "k_bias": stack_b(lyr + "self.key.bias"),
            "v_proj": stack_w(lyr + "self.value.weight"),
            "v_bias": stack_b(lyr + "self.value.bias"),
            "attn_out": stack_w(lyr + "output.dense.weight"),
            "attn_out_bias": stack_b(lyr + "output.dense.bias"),
            "attn_ln": {"weight": stack_b(lyr + "output.LayerNorm.weight"),
                        "bias": stack_b(lyr + "output.LayerNorm.bias")},
            "inter": stack_w(ffn + "intermediate.dense.weight"),
            "inter_bias": stack_b(ffn + "intermediate.dense.bias"),
            "out": stack_w(ffn + "output.dense.weight"),
            "out_bias": stack_b(ffn + "output.dense.bias"),
            "out_ln": {"weight": stack_b(ffn + "output.LayerNorm.weight"),
                       "bias": stack_b(ffn + "output.LayerNorm.bias")},
        },
    }
    if p + "pooler.dense.weight" in sd:
        tree["pooler"] = {
            "weight": sd[p + "pooler.dense.weight"].T,
            "bias": sd[p + "pooler.dense.bias"],
        }
    return tree


def projection_tree_from_sd(sd: SD, prefix: str = "image_projection_layer.") -> dict:
    return {"weight": sd[prefix + "weight"].T, "bias": sd[prefix + "bias"]}
