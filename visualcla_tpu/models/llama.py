"""LLaMA decoder — pure-functional JAX, stacked layers scanned with ``lax.scan``.

Replaces the reference's HF ``LlamaForCausalLM`` (used at
/root/reference/models/visualcla/modeling_visualcla.py:151-156).  Numerics match HF
exactly for greedy-parity: fp32 RMSNorm statistics, fp32 rope tables, fp32 softmax,
fp32 logits.

Design (TPU-first, not a port):
- Params are a flat dict pytree; all per-layer weights are stacked on a leading
  layer axis so one ``lax.scan`` traces a single layer (fast compiles, natural
  rematerialization point, and layer-stacked arrays shard cleanly under GSPMD).
- Weight layout is (in_features, out_features) so every projection is ``x @ W``
  — the MXU-native orientation; the checkpoint converter transposes torch weights.
- One unified ``forward`` covers prefill and decode: the KV cache is a fixed-shape
  (L, B, N_kv, S_max, H) buffer, the current chunk is written at ``write_slot`` and
  attention runs over the whole buffer under an additive validity/causality bias.
  Static shapes throughout — XLA never sees a dynamic sequence length.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig
from ..ops.attention import cached_attention
from ..ops.norms import rms_norm
from ..ops.linear import linear
from ..ops.quantization import is_quantized, q_take
from ..ops.rope import apply_rope, rope_table

Params = dict


def init_params(rng: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    """Random init (tests/bench); real weights come from checkpoint/."""
    L, H, I = cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size
    N, Nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    keys = jax.random.split(rng, 9)

    def norm(key, shape, scale=0.02):
        return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

    return {
        "embed_tokens": norm(keys[0], (cfg.vocab_size, H)),
        "layers": {
            "input_norm": jnp.ones((L, H), dtype),
            "q_proj": norm(keys[1], (L, H, N * hd)),
            "k_proj": norm(keys[2], (L, H, Nkv * hd)),
            "v_proj": norm(keys[3], (L, H, Nkv * hd)),
            "o_proj": norm(keys[4], (L, N * hd, H)),
            "post_norm": jnp.ones((L, H), dtype),
            "gate_proj": norm(keys[5], (L, H, I)),
            "up_proj": norm(keys[6], (L, H, I)),
            "down_proj": norm(keys[7], (L, I, H)),
        },
        "final_norm": jnp.ones((H,), dtype),
        # distinct key: reusing keys[0] would make lm_head an exact reshape
        # of embed_tokens (same element count -> same flat random stream)
        "lm_head": norm(keys[8], (H, cfg.vocab_size)),
    }


def init_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.float32,
    kv_quant: str = "none",
) -> dict:
    """KV cache buffers.  ``kv_quant='int8'`` stores int8 values with
    per-token-per-head fp32 scales — half the cache bytes, dequant fused into
    the attention read (Pallas kernel / XLA).

    Layout is (L, B, Nkv, S, hd) — kv heads MAJOR over slots — which is the
    flash kernel's operand order.  Storing the cache in any other order makes
    XLA relayout it at the decode-loop boundary: whole-cache copy ops worth
    4x the cache bytes in transient HBM (measured via
    tools/probe_fused_loop.py; it blocked the 7B bf16 batch-8 fused loop)."""
    L, Nkv, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    shape = (L, batch, Nkv, max_len, hd)
    if kv_quant == "int8":
        sshape = (L, batch, Nkv, max_len)
        return {
            "k": jnp.zeros(shape, jnp.int8),
            "v": jnp.zeros(shape, jnp.int8),
            "k_scale": jnp.ones(sshape, jnp.float32),
            "v_scale": jnp.ones(sshape, jnp.float32),
        }
    if kv_quant != "none":
        raise ValueError(f"unknown kv_quant {kv_quant!r}")
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def embed(params: Params, input_ids: jnp.ndarray) -> jnp.ndarray:
    """Token embedding lookup (B, S) -> (B, S, H).  Supports int8 tables."""
    w = params["embed_tokens"]
    if is_quantized(w):
        return q_take(w, input_ids, axis=0).astype(params["final_norm"].dtype)
    return jnp.take(w, input_ids, axis=0)


def forward(
    params: Params,
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, Sq, H)
    rope_positions: jnp.ndarray,  # (B, Sq) int32 — RoPE position ids
    kv_cache: dict,  # {'k','v': (L, B, Nkv, Smax, hd)} — see init_kv_cache
    kv_valid: jnp.ndarray,  # (B, Smax) bool — valid AFTER this chunk is written
    write_slot: jnp.ndarray,  # () or (B,) int32 — cache slot of the chunk's first token
    remat: bool = False,  # rematerialize each layer (training memory/FLOPs trade)
    unroll: bool = False,  # unroll the layer scan (decode-step programs)
    ring_axis: str | None = None,  # CP: ring-attend the prefill over this mesh axis
) -> Tuple[jnp.ndarray, dict]:
    """Run the decoder stack.  Returns (final_norm hidden (B, Sq, H), new kv_cache).

    Causality uses cache *slot* order (query at slot ``write_slot+i`` sees kv slots
    <= its own), so left-padded batches work; ``rope_positions`` is independent and
    carries the HF ``position_ids`` semantics (cumsum of attention mask - 1).
    ``write_slot`` may be per-row (B,) — the continuous-batching case where each
    request sits at a different cache depth.
    """
    cos, sin = rope_table(
        rope_positions, cfg.head_dim, cfg.rope_theta
    )  # (B, Sq, hd) fp32
    h, kv_cache = decoder_stack(
        params["layers"], cfg, inputs_embeds, cos, sin,
        kv_cache, kv_valid, write_slot, remat=remat, unroll=unroll,
        ring_axis=ring_axis,
    )
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, kv_cache


def decoder_stack(
    layers: Params,  # per-layer params stacked on a leading (local) layer axis
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, Sq, H)
    cos: jnp.ndarray,  # (B, Sq, hd) fp32 rope tables
    sin: jnp.ndarray,
    kv_cache: dict,  # leading dim = this stack's layer count
    kv_valid: jnp.ndarray,
    write_slot: jnp.ndarray,
    remat: bool = False,
    unroll: bool = False,
    ring_axis: str | None = None,
) -> Tuple[jnp.ndarray, dict]:
    """Scan a stack of decoder layers (no embedding / final norm).

    Factored out of ``forward`` so pipeline parallelism can run each stage's
    local layer slice with the identical math (parallel/pipeline.py)."""
    B, Sq, H = inputs_embeds.shape
    N, Nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    # kv_cache=None: the cache-free training path (see layer_forward)
    quant = kv_cache is not None and "k_scale" in kv_cache
    if getattr(cfg, "attention_bias", False):
        raise NotImplementedError(
            "attention_bias=true checkpoints (bias terms on q/k/v/o) are not "
            "supported — the parameter tree has no bias leaves"
        )
    act_name = getattr(cfg, "hidden_act", "silu")
    if act_name == "silu":
        act = jax.nn.silu
    else:
        from ..ops.activations import ACT2FN

        act = ACT2FN[act_name]

    def layer(carry, xs):
        h, cache = carry
        p, l = xs
        # packed-int4 leaves ride OUTSIDE the scan xs (closure) and re-enter
        # as lazy {"q","scale","layer"} dicts: scan slicing them per layer
        # would materialize a per-layer HBM copy of the carrier feeding the
        # Pallas int4 kernel (ops/quantization.split_stacked_grouped)
        p = {**p, **quantization.attach_layer(packed_leaves, l)}
        h, cache = layer_forward(
            p, cfg, h, cos, sin, cache, kv_valid, write_slot, l, act=act,
            ring_axis=ring_axis,
        )
        return (h, cache), None

    from ..ops import quantization

    rest_leaves, packed_leaves = quantization.split_stacked_grouped(layers)
    L = jax.tree.leaves(layers)[0].shape[0]  # local layer count (PP: L/P)
    body = jax.checkpoint(layer) if remat else layer
    (h, kv_cache), _ = jax.lax.scan(
        body,
        (inputs_embeds, kv_cache),
        (rest_leaves, jnp.arange(L, dtype=jnp.int32)),
        unroll=L if unroll else 1,
    )
    return h, kv_cache


def _chunk_causal_attention(q, k, v, valid):
    """Causal attention over a chunk's own K/V (the cache-free training
    path).  q (B, Sq, N, hd); k/v (B, Nkv, Sq, hd) cache order; valid
    (B, Sq) bool.  f32 scores/softmax — the same numerics class as the
    dense cached path (ops/attention.py), checked equal by
    tests/test_train.py."""
    B, Sq, N, hd = q.shape
    Nkv = k.shape[1]
    rep = N // Nkv
    if rep > 1:
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum(
        "binh,bnjh->bnij", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * (1.0 / float(hd) ** 0.5)
    i = jnp.arange(Sq)[None, None, :, None]
    j = jnp.arange(Sq)[None, None, None, :]
    mask = (j <= i) & valid[:, None, None, :]
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnij,bnjh->binh", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


def put_chunk(buf, chunk, l, slot):
    """Write a chunk into the FULL stacked cache buffer at layer ``l``,
    slot(s) ``slot`` (scalar = contiguous update, (B,) = per-row vmap).
    Slots live on dim 3: buffers are (L, B, Nkv, Smax, hd) for k/v and
    (L, B, Nkv, Smax) for int8 scales, chunks (B, Nkv, Sq[, hd]).

    One dynamic-update-slice on the stacked buffer: with the buffer stored in
    the attention kernel's operand order (see init_kv_cache) XLA updates it
    in place."""
    zero = jnp.int32(0)
    if slot.ndim == 0:
        idx = (l, zero, zero, slot) + (zero,) * (buf.ndim - 4)
        return jax.lax.dynamic_update_slice(buf, chunk[None], idx)

    def put(row_buf, row_chunk, s):
        return jax.lax.dynamic_update_slice(
            row_buf, row_chunk, (zero, s) + (zero,) * (row_buf.ndim - 2)
        )

    bl = jax.lax.dynamic_index_in_dim(buf, l, axis=0, keepdims=False)
    bl = jax.vmap(put)(bl, chunk, slot)
    return jax.lax.dynamic_update_index_in_dim(buf, bl, l, axis=0)


def layer_forward(
    p: Params,  # ONE layer's params (no leading layer axis)
    cfg: LlamaConfig,
    h: jnp.ndarray,  # (B, Sq, H)
    cos: jnp.ndarray,  # (B, Sq, hd)
    sin: jnp.ndarray,
    cache: dict,  # STACKED buffers (L, B, Nkv, Smax, ...) — written at layer l
    kv_valid: jnp.ndarray,
    write_slot: jnp.ndarray,
    l: jnp.ndarray,  # () int32 layer index into the stacked cache
    act=jax.nn.silu,
    ring_axis: str | None = None,
) -> Tuple[jnp.ndarray, dict]:
    """One decoder layer: qkv -> rope -> cache write at (l, slot) -> attention
    over the cache -> mlp.  Shared by the layer scan (decoder_stack) and the
    engine's flattened decode loop (engine/generate.py), which iterates
    step x layer in a SINGLE while_loop so the cache sits in exactly one
    loop carry."""
    B, Sq, H = h.shape
    N, Nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    quant = cache is not None and "k_scale" in cache
    x = rms_norm(h, p["input_norm"], cfg.rms_norm_eps)
    q = linear(x, p["q_proj"]).reshape(B, Sq, N, hd)
    k = linear(x, p["k_proj"]).reshape(B, Sq, Nkv, hd)
    v = linear(x, p["v_proj"]).reshape(B, Sq, Nkv, hd)
    q, k = apply_rope(q, k, cos, sin)
    slot = jnp.asarray(write_slot, jnp.int32)
    # to cache order (B, Nkv, Sq, hd); free for decode (Sq == 1 bitcast)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if cache is None and ring_axis is None:
        # TRAINING (cache=None): attend over the chunk's own K/V — no cache
        # buffer exists.  Carrying the stacked (L, ...) cache through the
        # layer scan under AD saves it ONCE PER SCAN STEP (an L^2 blowup:
        # two 4 GB bf16[32,32,1,32,512,128] residuals OOM'd the 7B QLoRA
        # step at seq 512 on the 16 GB chip before this path existed).
        # Same math as the dense cached path restricted to the chunk's
        # slots: query i sees kv j <= i among the valid.
        attn = _chunk_causal_attention(q, k, v, kv_valid[:, :Sq])
        h = h + linear(attn.reshape(B, Sq, N * hd), p["o_proj"])
        x2 = rms_norm(h, p["post_norm"], cfg.rms_norm_eps)
        gate = act(linear(x2, p["gate_proj"])) * linear(x2, p["up_proj"])
        h = h + linear(gate, p["down_proj"])
        return h, None
    if cache is not None:
        if quant:
            from ..ops.quantization import quantize_kv

            kq, ksc = quantize_kv(k)
            vq, vsc = quantize_kv(v)
            writes = {"k": kq, "v": vq, "k_scale": ksc, "v_scale": vsc}
        else:
            kv_dtype = cache["k"].dtype
            writes = {"k": k.astype(kv_dtype), "v": v.astype(kv_dtype)}
        cache = {name: put_chunk(cache[name], chunk, l, slot)
                 for name, chunk in writes.items()}
    if ring_axis is not None and Sq > 1:
        # Context-parallel prefill: attention over THIS chunk's fresh K/V via
        # ring attention (sequence sharded over the ``ring_axis`` mesh axis,
        # K/V rotating on the ICI ring) instead of reading back the cache.
        # Valid because the Engine's prefill writes from slot 0 and only the
        # chunk's slots are kv-valid, so chunk attention == cache attention;
        # causality uses slot indices as positions (write_slot == 0).
        from ..ops.attention import current_attention_mesh
        from ..parallel.ring import ring_attention_sharded

        attn = ring_attention_sharded(
            q, k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3),
            current_attention_mesh(),
            seq_axis=ring_axis, kv_valid=kv_valid[:, :Sq], causal=True,
        )
    elif quant:
        # the full stacked cache goes straight to the attention dispatch:
        # single-device flash reads layer l in place (scalar prefetch) —
        # no per-layer (B, Nkv, Smax, hd) slice copy in HBM
        attn = cached_attention(
            q, cache["k"], cache["v"], kv_valid, write_slot,
            k_scale=cache["k_scale"], v_scale=cache["v_scale"],
            layer_index=l,
        )
    else:
        attn = cached_attention(q, cache["k"], cache["v"], kv_valid,
                                write_slot, layer_index=l)
    h = h + linear(attn.reshape(B, Sq, N * hd), p["o_proj"])
    x2 = rms_norm(h, p["post_norm"], cfg.rms_norm_eps)
    gate = act(linear(x2, p["gate_proj"])) * linear(x2, p["up_proj"])
    h = h + linear(gate, p["down_proj"])
    return h, cache


def logits(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """LM head; accumulate in >=fp32, return fp32 (HF casts logits to .float())."""
    acc = jnp.promote_types(hidden.dtype, jnp.float32)
    w = params["lm_head"]
    if is_quantized(w):
        from ..ops.quantization import is_grouped
        if is_grouped(w):
            # grouped s4 head: the batched-over-groups dot already accumulates
            # the partials in fp32 and never materializes a dequantized head
            from ..ops.quantization import _q_matmul_grouped
            return _q_matmul_grouped(hidden, w, out_dtype=jnp.float32)
        # per-output-channel scale commutes with the contraction — scaling
        # the (B, V) logits instead of the (H, V) weight avoids materializing
        # a dequantized bf16 lm_head (400 MB at 7B) every decode step
        y = jnp.dot(hidden, w["q"].astype(hidden.dtype),
                    preferred_element_type=acc)
        return (y * w["scale"][..., 0, :]).astype(jnp.float32)
    return jnp.dot(hidden, w, preferred_element_type=acc).astype(jnp.float32)


def forward_logits(
    params: Params,
    cfg: LlamaConfig,
    input_ids: jnp.ndarray,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Convenience full-sequence forward for tests: (B, S) ids -> (B, S, V) logits."""
    B, S = input_ids.shape
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0)
    cache = init_kv_cache(cfg, B, S, params["final_norm"].dtype)
    h, _ = forward(
        params,
        cfg,
        embed(params, input_ids),
        positions.astype(jnp.int32),
        cache,
        attention_mask.astype(bool),
        jnp.int32(0),
    )
    return logits(params, h)
