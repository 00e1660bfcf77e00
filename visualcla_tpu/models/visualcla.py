"""Composite VisualCLA model: CLIP-ViT -> resampler -> projection -> LLaMA splice.

Replaces the reference's ``VisualCLAModel``
(/root/reference/models/visualcla/modeling_visualcla.py:70-405).  The embedding
splice (reference :358-370) replaces the ``num_patch`` placeholder ``<img_token>``
embeddings between ``<img>`` and ``</img>`` with projected image embeddings.  In a
jitted graph the marker position is a *dynamic* value, so the splice is a
``dynamic_update_slice`` at ``img_start_pos + 1`` — the sequence length never
changes (the placeholders reserve the space), keeping shapes static for XLA.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import VisualCLAConfig
from . import clip_vit, llama, resampler

Params = dict


def init_params(rng: jax.Array, cfg: VisualCLAConfig, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    vision_h = cfg.vision_config.hidden_size
    text_h = cfg.text_config.hidden_size
    params = {
        "vision": clip_vit.init_params(k1, cfg.vision_config, dtype),
        "text": llama.init_params(k2, cfg.text_config, dtype),
        "projection": {
            "weight": (
                jax.random.normal(k4, (vision_h, text_h), jnp.float32)
                * cfg.initializer_range
            ).astype(dtype),
            "bias": jnp.zeros((text_h,), dtype),
        },
    }
    if cfg.use_visual_resampler:
        params["resampler"] = resampler.init_params(k3, cfg.visual_resampler_config, dtype)
    return params


def encode_image(params: Params, cfg: VisualCLAConfig, pixel_values: jnp.ndarray,
                 remat: bool = False) -> jnp.ndarray:
    """(B, 3, H, W) pixels -> (B, num_image_tokens, text_hidden) image embeddings.

    Mirrors reference modeling_visualcla.py:283-288/349-354: ViT (with full-sequence
    post_layernorm) -> resampler -> linear projection.
    """
    image_embeds = clip_vit.forward(params["vision"], cfg.vision_config, pixel_values,
                                    remat=remat)
    if cfg.use_visual_resampler:
        image_embeds = resampler.forward(
            params["resampler"], cfg.visual_resampler_config, image_embeds,
            remat=remat,
        )
    return image_embeds @ params["projection"]["weight"] + params["projection"]["bias"]


def check_img_start_pos(img_start_pos, num_image_tokens: int, seq_len: int) -> None:
    """HOST-side guard for the splice: inside jit, an out-of-range marker
    would silently clamp ``dynamic_update_slice`` and overwrite unrelated
    prompt embeddings.  Call before tracing with the final (padded) length."""
    import numpy as np

    ip = np.asarray(img_start_pos)
    if np.any((ip >= 0) & (ip + 1 + num_image_tokens > seq_len)):
        raise ValueError(
            f"image marker at {ip.tolist()} leaves no room for "
            f"{num_image_tokens} image tokens in a {seq_len}-slot prompt"
        )


def splice_image_embeds(
    inputs_embeds: jnp.ndarray,  # (B, S, H)
    image_embeds: jnp.ndarray,  # (B, T, H)
    img_start_pos: jnp.ndarray,  # (B,) int32 — position of <img> in input_ids
) -> jnp.ndarray:
    """Overwrite the T placeholder embeddings following <img> with image embeddings.

    Equivalent to the reference's concat-splice (modeling_visualcla.py:358-370) given
    that the prompt pre-fills exactly T ``<img_token>`` placeholders.
    """
    def one(row_embeds, row_img, pos):
        start = (jnp.asarray(pos + 1, jnp.int32), jnp.int32(0))
        return jax.lax.dynamic_update_slice(
            row_embeds, row_img.astype(row_embeds.dtype), start
        )

    return jax.vmap(one)(inputs_embeds, image_embeds, img_start_pos)


def multimodal_embeds(
    params: Params,
    cfg: VisualCLAConfig,
    input_ids: jnp.ndarray,  # (B, S)
    img_start_pos: jnp.ndarray,  # (B,) int32; -1 = text-only row
    pixel_values: Optional[jnp.ndarray],  # (B, 3, H, W) | (B, K, 3, H, W) | None
    remat: bool = False,
) -> jnp.ndarray:
    """Token embeddings with image embeddings spliced in (text-only rows untouched).

    Multi-image (the webui plugin's capability, README_EN.md:294-296): pass
    pixel_values (B, K, 3, H, W) with img_start_pos (B, K) giving each image's
    ``<img>`` marker position (-1 = slot unused)."""
    inputs_embeds = llama.embed(params["text"], input_ids)
    if pixel_values is None:
        return inputs_embeds
    if pixel_values.ndim == 5:  # multi-image
        B, K = pixel_values.shape[:2]
        flat = encode_image(
            params, cfg, pixel_values.reshape((B * K,) + pixel_values.shape[2:]),
            remat=remat,
        )
        image_embeds = flat.reshape((B, K) + flat.shape[1:])
        pos = img_start_pos.reshape(B, K)
        out = inputs_embeds
        for k in range(K):
            spliced = splice_image_embeds(
                out, image_embeds[:, k], jnp.maximum(pos[:, k], 0)
            )
            out = jnp.where((pos[:, k] < 0)[:, None, None], out, spliced)
        return out
    image_embeds = encode_image(params, cfg, pixel_values, remat=remat)
    spliced = splice_image_embeds(inputs_embeds, image_embeds, jnp.maximum(img_start_pos, 0))
    keep_text = (img_start_pos < 0)[:, None, None]
    return jnp.where(keep_text, inputs_embeds, spliced)


def resize_token_embeddings(
    params: Params, new_size: int, rng: Optional[jax.Array] = None,
    initializer_range: float = 0.02,
) -> Params:
    """Grow (or truncate) the text tower's vocab rows — the reference's
    ``resize_token_embeddings`` step before applying LoRA at runtime
    (scripts/inference/inference.py:66-74).  New rows draw N(0, init_range)
    like HF; offline conversion normally handles this, but the capability is
    part of the surface."""
    text = dict(params["text"])
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)

    def grow(w, key, row_axis):
        old = w.shape[row_axis]
        if new_size == old:
            return w
        if new_size < old:
            return jax.lax.slice_in_dim(w, 0, new_size, axis=row_axis)
        shape = list(w.shape)
        shape[row_axis] = new_size - old
        extra = (jax.random.normal(key, shape, jnp.float32)
                 * initializer_range).astype(w.dtype)
        return jnp.concatenate([w, extra], axis=row_axis)

    text["embed_tokens"] = grow(text["embed_tokens"], k1, 0)  # (V, H)
    text["lm_head"] = grow(text["lm_head"], k2, 1)  # (H, V)
    out = dict(params)
    out["text"] = text
    return out


def find_img_start(input_ids, img_start_token_id: int) -> jnp.ndarray:
    """First position of <img> per row, or -1 if absent.  (B, S) -> (B,) int32."""
    hit = input_ids == img_start_token_id
    pos = jnp.argmax(hit, axis=-1).astype(jnp.int32)
    return jnp.where(jnp.any(hit, axis=-1), pos, -1)


def prefill_forward(
    params: Params,
    cfg: VisualCLAConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    img_start_pos: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray],
    kv_cache: dict,
) -> Tuple[jnp.ndarray, dict]:
    """Full multimodal prefill.  Returns (logits (B, S, V), updated kv_cache)."""
    embeds = multimodal_embeds(params, cfg, input_ids, img_start_pos, pixel_values)
    B, S = input_ids.shape
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0).astype(jnp.int32)
    Smax = kv_cache["k"].shape[3]
    kv_valid = jnp.concatenate(
        [attention_mask.astype(bool), jnp.zeros((B, Smax - S), bool)], axis=-1
    )
    hidden, kv_cache = llama.forward(
        params["text"], cfg.text_config, embeds, positions, kv_cache, kv_valid, jnp.int32(0)
    )
    return llama.logits(params["text"], hidden), kv_cache
