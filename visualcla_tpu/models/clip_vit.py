"""CLIP ViT-L/14 vision tower — pure-functional JAX.

Replaces the reference's HF ``CLIPVisionModel`` (used at
/root/reference/models/visualcla/modeling_visualcla.py:157-160, 283-284).  The
VisualCLA pipeline applies ``post_layernorm`` to the FULL last hidden state
(including CLS), not just the pooled token — ``forward`` here reproduces that.

TPU-first notes:
- The patch conv (14x14 stride 14, no bias) is expressed as reshape + matmul:
  mathematically identical, and maps directly onto the MXU instead of relying on
  conv lowering.
- Layers are stacked and scanned (single-layer trace), pre-LN residual blocks,
  quick_gelu MLP, fp32 softmax.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import ViTConfig
from ..ops.activations import ACT2FN
from ..ops.attention import full_attention
from ..ops.linear import linear
from ..ops.norms import layer_norm

Params = dict


def init_params(rng: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    P = cfg.patch_size
    keys = jax.random.split(rng, 10)

    def norm(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    def ln(shape_h=H):
        return {"weight": jnp.ones((shape_h,), dtype), "bias": jnp.zeros((shape_h,), dtype)}

    return {
        "class_embedding": norm(keys[0], (H,)),
        "patch_embedding": norm(keys[1], (3 * P * P, H)),  # conv kernel flattened
        "position_embedding": norm(keys[2], (cfg.seq_len, H)),
        "pre_layernorm": ln(),
        "layers": {
            "ln1": {"weight": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "q_proj": norm(keys[3], (L, H, H)),
            "q_bias": jnp.zeros((L, H), dtype),
            "k_proj": norm(keys[4], (L, H, H)),
            "k_bias": jnp.zeros((L, H), dtype),
            "v_proj": norm(keys[5], (L, H, H)),
            "v_bias": jnp.zeros((L, H), dtype),
            "o_proj": norm(keys[6], (L, H, H)),
            "o_bias": jnp.zeros((L, H), dtype),
            "ln2": {"weight": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "fc1": norm(keys[7], (L, H, I)),
            "fc1_bias": jnp.zeros((L, I), dtype),
            "fc2": norm(keys[8], (L, I, H)),
            "fc2_bias": jnp.zeros((L, H), dtype),
        },
        "post_layernorm": ln(),
    }


def _torch_bicubic_1d(in_size: int, out_size: int) -> jnp.ndarray:
    """(out, in) interpolation matrix matching torch.nn.functional.interpolate
    mode='bicubic' (a=-0.75, align_corners=False, no antialias)."""
    import numpy as np

    a = -0.75

    def w(x):
        x = abs(x)
        if x < 1.0:
            return ((a + 2) * x - (a + 3)) * x * x + 1
        if x < 2.0:
            return (((x - 5) * x + 8) * x - 4) * a
        return 0.0

    scale = in_size / out_size
    M = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(src))
        t = src - x0
        for tap, off in enumerate(range(-1, 3)):
            j = min(max(x0 + off, 0), in_size - 1)
            M[i, j] += w(off - t)
    return jnp.asarray(M, jnp.float32)


def extend_position_embedding(params: Params, patch_size: int, after: int) -> Params:
    """Bicubic-resize the ViT position table for a larger input resolution.

    Capability port of the reference's ``extend_position_embedding``
    (modeling_visualcla.py:13-43) with the grid math fixed: the reference
    reshapes the 256 patch embeddings to a (256, 256, -1) grid — we use the
    actual (16, 16) patch grid, interpolating positions spatially like every
    ViT-resize implementation (CLS row passes through unchanged).
    """
    pe = params["position_embedding"]
    n_before, H = pe.shape
    grid_before = int((n_before - 1) ** 0.5)
    grid_after = after // patch_size
    cls_row, grid = pe[:1], pe[1:].reshape(grid_before, grid_before, H)
    M = _torch_bicubic_1d(grid_before, grid_after).astype(jnp.float32)
    g = grid.astype(jnp.float32)
    g = jnp.einsum("oi,ijh->ojh", M, g)
    g = jnp.einsum("oj,ijh->ioh", M, g)
    new_pe = jnp.concatenate(
        [cls_row, g.reshape(grid_after * grid_after, H).astype(pe.dtype)], axis=0
    )
    out = dict(params)
    out["position_embedding"] = new_pe
    return out


def patchify(pixel_values: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """(B, 3, H, W) -> (B, num_patches, 3*P*P) matching torch Conv2d's
    (out = W_flat @ patch_flat) channel-major flattening order."""
    B, C, H, W = pixel_values.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = pixel_values.reshape(B, C, gh, P, gw, P)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, C, P, P)
    return x.reshape(B, gh * gw, C * P * P)


def forward(params: Params, cfg: ViTConfig, pixel_values: jnp.ndarray,
            remat: bool = False) -> jnp.ndarray:
    """(B, 3, 224, 224) -> (B, 257, H) — last hidden state with post_layernorm
    applied over the full sequence (reference modeling_visualcla.py:284)."""
    B = pixel_values.shape[0]
    H = cfg.hidden_size
    eps = cfg.layer_norm_eps
    act = ACT2FN[cfg.hidden_act]

    patches = patchify(pixel_values, cfg.patch_size).astype(params["patch_embedding"].dtype)
    patch_embeds = patches @ params["patch_embedding"]  # (B, 256, H)
    cls = jnp.broadcast_to(params["class_embedding"][None, None, :], (B, 1, H))
    x = jnp.concatenate([cls, patch_embeds], axis=1)  # (B, 257, H)
    x = x + params["position_embedding"][None]
    x = layer_norm(x, params["pre_layernorm"]["weight"], params["pre_layernorm"]["bias"], eps)

    N, hd = cfg.num_attention_heads, cfg.head_dim
    S = x.shape[1]

    def layer(h, p):
        r = h
        y = layer_norm(h, p["ln1"]["weight"], p["ln1"]["bias"], eps)
        q = (linear(y, p["q_proj"]) + p["q_bias"]).reshape(B, S, N, hd)
        k = (linear(y, p["k_proj"]) + p["k_bias"]).reshape(B, S, N, hd)
        v = (linear(y, p["v_proj"]) + p["v_bias"]).reshape(B, S, N, hd)
        attn = full_attention(q, k, v)  # bidirectional, no mask
        h = r + linear(attn.reshape(B, S, N * hd), p["o_proj"]) + p["o_bias"]
        r = h
        y = layer_norm(h, p["ln2"]["weight"], p["ln2"]["bias"], eps)
        h = r + linear(act(linear(y, p["fc1"]) + p["fc1_bias"]), p["fc2"]) + p["fc2_bias"]
        return h, None

    body = jax.checkpoint(layer) if remat else layer
    x, _ = jax.lax.scan(body, x, params["layers"])
    x = layer_norm(
        x, params["post_layernorm"]["weight"], params["post_layernorm"]["bias"], eps
    )
    return x
