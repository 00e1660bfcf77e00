"""Helpers to build tiny HF/torch reference models and copy their weights into
our JAX param pytrees.  Used by the parity tests (SURVEY.md §4: token-identity
harness against a CPU-run HF reference).
"""
from __future__ import annotations

import importlib.util
import os
import sys

import numpy as np
import torch

REFERENCE_ROOT = "/root/reference"


def load_reference_resampler_module():
    """Import the reference's resampler module file directly (bypassing its
    package __init__, which needs an older transformers).  Returns None if the
    reference checkout or its deps are unavailable."""
    path = os.path.join(
        REFERENCE_ROOT, "models", "visualcla", "modeling_visual_resampler.py"
    )
    if not os.path.exists(path):
        return None
    try:
        spec = importlib.util.spec_from_file_location("ref_visual_resampler", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules["ref_visual_resampler"] = mod
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


def t2n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# weight copy: HF torch -> our stacked JAX layout
# ---------------------------------------------------------------------------

def llama_params_from_hf(hf_model) -> dict:
    """HF LlamaForCausalLM -> our stacked param dict (fp32 numpy)."""
    sd = hf_model.state_dict()
    L = hf_model.config.num_hidden_layers

    def stack(fmt, transpose=True):
        ws = [t2n(sd[fmt.format(l)]) for l in range(L)]
        if transpose:
            ws = [w.T for w in ws]
        return np.stack(ws)

    return {
        "embed_tokens": t2n(sd["model.embed_tokens.weight"]),
        "layers": {
            "input_norm": stack("model.layers.{}.input_layernorm.weight", transpose=False),
            "q_proj": stack("model.layers.{}.self_attn.q_proj.weight"),
            "k_proj": stack("model.layers.{}.self_attn.k_proj.weight"),
            "v_proj": stack("model.layers.{}.self_attn.v_proj.weight"),
            "o_proj": stack("model.layers.{}.self_attn.o_proj.weight"),
            "post_norm": stack("model.layers.{}.post_attention_layernorm.weight", transpose=False),
            "gate_proj": stack("model.layers.{}.mlp.gate_proj.weight"),
            "up_proj": stack("model.layers.{}.mlp.up_proj.weight"),
            "down_proj": stack("model.layers.{}.mlp.down_proj.weight"),
        },
        "final_norm": t2n(sd["model.norm.weight"]),
        "lm_head": t2n(sd["lm_head.weight"]).T,
    }


def vit_params_from_hf(hf_model) -> dict:
    """HF CLIPVisionModel -> our stacked param dict (fp32 numpy)."""
    sd = hf_model.state_dict()
    cfg = hf_model.config
    L = cfg.num_hidden_layers
    pre = "vision_model."

    def ln(name):
        return {"weight": t2n(sd[pre + name + ".weight"]), "bias": t2n(sd[pre + name + ".bias"])}

    def stack_w(fmt):
        return np.stack([t2n(sd[fmt.format(l)]).T for l in range(L)])

    def stack_b(fmt):
        return np.stack([t2n(sd[fmt.format(l)]) for l in range(L)])

    lyr = pre + "encoder.layers.{}."
    # torch conv kernel (H, 3, P, P) -> flattened (3*P*P, H) matching patchify order
    conv = t2n(sd[pre + "embeddings.patch_embedding.weight"])
    H = conv.shape[0]
    return {
        "class_embedding": t2n(sd[pre + "embeddings.class_embedding"]),
        "patch_embedding": conv.reshape(H, -1).T,
        "position_embedding": t2n(sd[pre + "embeddings.position_embedding.weight"]),
        "pre_layernorm": ln("pre_layrnorm"),  # HF's typo'd attribute name
        "layers": {
            "ln1": {"weight": stack_b(lyr + "layer_norm1.weight"), "bias": stack_b(lyr + "layer_norm1.bias")},
            "q_proj": stack_w(lyr + "self_attn.q_proj.weight"),
            "q_bias": stack_b(lyr + "self_attn.q_proj.bias"),
            "k_proj": stack_w(lyr + "self_attn.k_proj.weight"),
            "k_bias": stack_b(lyr + "self_attn.k_proj.bias"),
            "v_proj": stack_w(lyr + "self_attn.v_proj.weight"),
            "v_bias": stack_b(lyr + "self_attn.v_proj.bias"),
            "o_proj": stack_w(lyr + "self_attn.out_proj.weight"),
            "o_bias": stack_b(lyr + "self_attn.out_proj.bias"),
            "ln2": {"weight": stack_b(lyr + "layer_norm2.weight"), "bias": stack_b(lyr + "layer_norm2.bias")},
            "fc1": stack_w(lyr + "mlp.fc1.weight"),
            "fc1_bias": stack_b(lyr + "mlp.fc1.bias"),
            "fc2": stack_w(lyr + "mlp.fc2.weight"),
            "fc2_bias": stack_b(lyr + "mlp.fc2.bias"),
        },
        "post_layernorm": ln("post_layernorm"),
    }


def resampler_params_from_ref(ref_model) -> dict:
    """Reference VisualResamplerModel (torch) -> our stacked param dict."""
    sd = ref_model.state_dict()
    L = ref_model.config.num_hidden_layers

    def stack_w(fmt):
        return np.stack([t2n(sd[fmt.format(l)]).T for l in range(L)])

    def stack_b(fmt):
        return np.stack([t2n(sd[fmt.format(l)]) for l in range(L)])

    lyr = "encoder.layer.{}.crossattention."
    ffn = "encoder.layer.{}."
    params = {
        "query_embedding": t2n(sd["query_embeddding"])[0],  # reference's (1, Nq, H)
        "layers": {
            "q_proj": stack_w(lyr + "self.query.weight"),
            "q_bias": stack_b(lyr + "self.query.bias"),
            "k_proj": stack_w(lyr + "self.key.weight"),
            "k_bias": stack_b(lyr + "self.key.bias"),
            "v_proj": stack_w(lyr + "self.value.weight"),
            "v_bias": stack_b(lyr + "self.value.bias"),
            "attn_out": stack_w(lyr + "output.dense.weight"),
            "attn_out_bias": stack_b(lyr + "output.dense.bias"),
            "attn_ln": {
                "weight": stack_b(lyr + "output.LayerNorm.weight"),
                "bias": stack_b(lyr + "output.LayerNorm.bias"),
            },
            "inter": stack_w(ffn + "intermediate.dense.weight"),
            "inter_bias": stack_b(ffn + "intermediate.dense.bias"),
            "out": stack_w(ffn + "output.dense.weight"),
            "out_bias": stack_b(ffn + "output.dense.bias"),
            "out_ln": {
                "weight": stack_b(ffn + "output.LayerNorm.weight"),
                "bias": stack_b(ffn + "output.LayerNorm.bias"),
            },
        },
    }
    if getattr(ref_model, "pooler", None) is not None:
        params["pooler"] = {
            "weight": t2n(sd["pooler.dense.weight"]).T,
            "bias": t2n(sd["pooler.dense.bias"]),
        }
    return params


def tiny_hf_llama(vocab_size=128, hidden=16, layers=2, heads=4, seed=0):
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(seed)
    cfg = HFLlamaConfig(
        vocab_size=vocab_size,
        hidden_size=hidden,
        intermediate_size=hidden * 2,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        num_key_value_heads=heads,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = LlamaForCausalLM(cfg).eval().float()
    return model, cfg


def tiny_hf_clip_vision(hidden=8, layers=2, heads=2, image_size=28, patch=14, seed=0):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(seed)
    cfg = CLIPVisionConfig(
        hidden_size=hidden,
        intermediate_size=hidden * 2,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        image_size=image_size,
        patch_size=patch,
        attn_implementation="eager",
    )
    model = CLIPVisionModel(cfg).eval().float()
    return model, cfg
