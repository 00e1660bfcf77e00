"""Visual resampler — 64 learnable queries cross-attending over image tokens.

Replaces the reference's BERT-style ``VisualResamplerModel``
(/root/reference/models/visualcla/modeling_visual_resampler.py:569-737).  The
behavior-defining quirk (reference :315-316): each layer's K/V sequence is the
concatenation ``[current query states ; image tokens]`` — the queries attend over
themselves AND the image.  Residual blocks are post-LN (BERT), FFN uses exact gelu,
layer_norm_eps defaults to 1e-12.

Pure-functional JAX, stacked layers + ``lax.scan``; no dropout (inference), fp32
softmax and fp32 LayerNorm statistics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import ResamplerConfig
from ..ops.activations import ACT2FN
from ..ops.attention import full_attention
from ..ops.norms import layer_norm

Params = dict


def init_params(rng: jax.Array, cfg: ResamplerConfig, dtype=jnp.float32) -> Params:
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    keys = jax.random.split(rng, 8)

    def norm(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    params = {
        # zero-init in the reference (modeling_visual_resampler.py:587)
        "query_embedding": jnp.zeros((cfg.num_query_tokens, H), dtype),
        "layers": {
            "q_proj": norm(keys[0], (L, H, H)),
            "q_bias": jnp.zeros((L, H), dtype),
            "k_proj": norm(keys[1], (L, H, H)),
            "k_bias": jnp.zeros((L, H), dtype),
            "v_proj": norm(keys[2], (L, H, H)),
            "v_bias": jnp.zeros((L, H), dtype),
            "attn_out": norm(keys[3], (L, H, H)),
            "attn_out_bias": jnp.zeros((L, H), dtype),
            "attn_ln": {"weight": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
            "inter": norm(keys[4], (L, H, I)),
            "inter_bias": jnp.zeros((L, I), dtype),
            "out": norm(keys[5], (L, I, H)),
            "out_bias": jnp.zeros((L, H), dtype),
            "out_ln": {"weight": jnp.ones((L, H), dtype), "bias": jnp.zeros((L, H), dtype)},
        },
    }
    if cfg.add_pooling_layer:
        params["pooler"] = {"weight": norm(keys[6], (H, H)), "bias": jnp.zeros((H,), dtype)}
    return params


def forward(
    params: Params, cfg: ResamplerConfig, image_embeds: jnp.ndarray,
    remat: bool = False,
) -> jnp.ndarray:
    """(B, S_img, H) image tokens -> (B, num_query_tokens, H) resampled tokens."""
    B = image_embeds.shape[0]
    H, N, hd = cfg.hidden_size, cfg.num_attention_heads, cfg.head_dim
    Nq = cfg.num_query_tokens
    eps = cfg.layer_norm_eps
    act = ACT2FN[cfg.hidden_act]

    hidden = jnp.broadcast_to(params["query_embedding"][None], (B, Nq, H)).astype(
        image_embeds.dtype
    )

    def layer(h, xs):
        p, hmask = xs
        # K/V over [queries ; image] — reference modeling_visual_resampler.py:315-316
        kv_in = jnp.concatenate([h, image_embeds], axis=1)  # (B, Nq+S_img, H)
        Skv = kv_in.shape[1]
        q = (h @ p["q_proj"] + p["q_bias"]).reshape(B, Nq, N, hd)
        k = (kv_in @ p["k_proj"] + p["k_bias"]).reshape(B, Skv, N, hd)
        v = (kv_in @ p["v_proj"] + p["v_bias"]).reshape(B, Skv, N, hd)
        # the reference softmaxes in the input dtype (modeling_visual_resampler.py:243)
        ctx = full_attention(q, k, v, softmax_dtype="native")  # (B, Nq, N, hd)
        # pruned/masked heads contribute zero context — numerically identical
        # to the reference's prune_linear_layer slicing (:285-303), kept as a
        # mask so the stacked-layer scan layout is undisturbed
        ctx = (ctx * hmask[None, None, :, None].astype(ctx.dtype)).reshape(B, Nq, H)
        # post-LN self-output (reference :266-277)
        attn_out = layer_norm(
            ctx @ p["attn_out"] + p["attn_out_bias"] + h,
            p["attn_ln"]["weight"], p["attn_ln"]["bias"], eps,
        )
        # post-LN FFN (reference :331-357)
        ffn = act(attn_out @ p["inter"] + p["inter_bias"]) @ p["out"] + p["out_bias"]
        h = layer_norm(ffn + attn_out, p["out_ln"]["weight"], p["out_ln"]["bias"], eps)
        return h, None

    L = jax.tree.leaves(params["layers"])[0].shape[0]
    head_mask = params.get("head_mask")
    if head_mask is None:
        head_mask = jnp.ones((L, N), image_embeds.dtype)
    body = jax.checkpoint(layer) if remat else layer
    hidden, _ = jax.lax.scan(body, hidden, (params["layers"], head_mask))
    return hidden


def prune_heads(params: Params, cfg: ResamplerConfig, heads_to_prune: dict) -> Params:
    """Reference ``VisualResamplerAttention.prune_heads``
    (modeling_visual_resampler.py:287-303) — ``{layer: [head, ...]}``.

    The reference slices head rows out of q/k/v and columns out of the output
    projection; a removed head's contribution to ``ctx @ attn_out`` is exactly
    zero, so a per-layer head mask reproduces the pruned model's outputs
    bit-for-bit while keeping the scan-friendly stacked weights."""
    L = jax.tree.leaves(params["layers"])[0].shape[0]
    N = cfg.num_attention_heads
    mask = params.get("head_mask")
    mask = jnp.ones((L, N)) if mask is None else jnp.asarray(mask)
    for l, heads in heads_to_prune.items():
        if not 0 <= l < L:
            raise ValueError(f"layer {l} out of range (0..{L - 1})")
        for h in heads:
            if not 0 <= h < N:
                raise ValueError(f"head {h} out of range (0..{N - 1})")
            mask = mask.at[l, h].set(0.0)
    return {**params, "head_mask": mask}


def pool(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """Pooler: tanh(dense(first token)) (reference :517-529). Unused by the chat
    pipeline but part of the model surface."""
    first = hidden[:, 0]
    return jnp.tanh(first @ params["pooler"]["weight"] + params["pooler"]["bias"])
