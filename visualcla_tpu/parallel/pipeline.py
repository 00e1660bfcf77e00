"""Pipeline parallelism (PP) for the LLaMA decoder stack.

The reference's only multi-device mechanism is HF ``device_map='auto'`` —
sequential per-layer placement with implicit activation hops and NO overlap
(scripts/inference/inference.py:48-53).  This module is its TPU-native
equivalent done right: the layer-stacked parameter layout (L, ...) shards on a
``pipe`` mesh axis, ``shard_map`` hands every stage its local L/P layer slice,
and a GPipe schedule rotates microbatch activations stage-to-stage with
``lax.ppermute`` — so stages compute concurrently instead of idling like
device_map pipelines do.  Combines with DP on a ('pipe', 'data') mesh; the KV
cache shards layer-wise with the stage that owns those layers (no KV traffic).

Schedule (M microbatches, P stages, T = M + P - 1 ticks):
  tick t: stage s runs microbatch m = t - s (if 0 <= m < M) through its local
  layers, then sends its activation to stage s+1.  SPMD means inactive stages
  execute too — their writes are masked out.  Bubble fraction = (P-1)/T, the
  standard GPipe tradeoff; raise M to amortize.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import LlamaConfig
from ..models import llama
from ..ops.norms import rms_norm
from ..ops.rope import rope_table

PIPE, DATA, MODEL = "pipe", "data", "model"


def make_pipe_mesh(n_pipe: int, n_data: int = 1, devices=None) -> Mesh:
    """A ('pipe', 'data') mesh.  ``pipe`` is the outer axis — on multi-slice
    deployments map it to DCN (stage boundaries are point-to-point sends,
    the only traffic that tolerates DCN latency; SURVEY.md §2.c)."""
    devices = devices if devices is not None else jax.devices()
    grid = np.asarray(devices[: n_pipe * n_data]).reshape(n_pipe, n_data)
    return Mesh(grid, (PIPE, DATA))


def make_pipe_tp_mesh(n_pipe: int, n_model: int, devices=None) -> Mesh:
    """A ('pipe', 'model') mesh: PP stages over DCN/outer, Megatron TP over
    ICI within each stage.  ``pipeline_forward`` runs 'pipe' manually (GPipe
    ppermute ring) and leaves 'model' to GSPMD (partial-manual shard_map)."""
    devices = devices if devices is not None else jax.devices()
    grid = np.asarray(devices[: n_pipe * n_model]).reshape(n_pipe, n_model)
    return Mesh(grid, (PIPE, MODEL))


def stage_param_specs(n_pipe: int, cfg: LlamaConfig, tp: bool = False) -> dict:
    """PartitionSpecs for the text tower under PP: stacked layer params shard
    their leading layer axis over 'pipe'; stage-independent params replicate.
    ``tp=True`` adds Megatron sharding on 'model' within each stage (column-
    parallel QKV/gate/up, row-parallel O/down) for ('pipe','model') meshes."""
    if cfg.num_hidden_layers % n_pipe:
        raise ValueError(
            f"num_hidden_layers {cfg.num_hidden_layers} not divisible by "
            f"pipe={n_pipe}"
        )
    col = P(PIPE, None, MODEL) if tp else P(PIPE, None, None)
    row = P(PIPE, MODEL, None) if tp else P(PIPE, None, None)
    layer_spec = {}
    for name in ("input_norm", "post_norm"):
        layer_spec[name] = P(PIPE)
    for name in ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj"):
        layer_spec[name] = col
    for name in ("o_proj", "down_proj"):
        layer_spec[name] = row
    return {
        "embed_tokens": P(None, MODEL) if tp else P(),
        "layers": layer_spec,
        "final_norm": P(),
        "lm_head": P(None, MODEL) if tp else P(),
    }


def shard_text_params(text_params: dict, mesh: Mesh, cfg: LlamaConfig) -> dict:
    """Place the text tower for PP on ``mesh`` (('pipe','data') or
    ('pipe','model') — the latter adds Megatron TP within stages)."""
    specs = stage_param_specs(mesh.shape[PIPE], cfg, tp=MODEL in mesh.shape)

    def put(path_spec, tree):
        if isinstance(tree, dict):
            return {k: put(path_spec[k], v) for k, v in tree.items()}
        return jax.device_put(tree, NamedSharding(mesh, path_spec))

    return put(specs, text_params)


def pipeline_kv_cache(
    cfg: LlamaConfig, batch: int, max_len: int, dtype, mesh: Mesh,
    kv_quant: str = "none",
) -> dict:
    """KV cache sharded layer-wise over 'pipe' and batch over 'data' — each
    stage holds exactly its own layers' cache."""
    cache = llama.init_kv_cache(cfg, batch, max_len, dtype, kv_quant=kv_quant)
    return {
        k: jax.device_put(
            v, NamedSharding(mesh, P(PIPE, DATA) + (None,) * (v.ndim - 2))
        )
        for k, v in cache.items()
    }


def pipeline_forward(
    params: dict,  # text tower params (PP-sharded or host)
    cfg: LlamaConfig,
    inputs_embeds: jnp.ndarray,  # (B, Sq, H)
    rope_positions: jnp.ndarray,  # (B, Sq) int32
    kv_cache: dict,  # (L, B, Smax, ...) — leading axis sharded on 'pipe'
    kv_valid: jnp.ndarray,  # (B, Smax) bool
    write_slot: jnp.ndarray,  # () or (B,) int32
    mesh: Mesh,
    n_micro: int = 1,
    remat: bool = False,  # rematerialize each layer (training memory trade)
) -> Tuple[jnp.ndarray, dict]:
    """PP forward of the decoder stack (embed/final-norm outside, replicated).

    Semantics identical to ``llama.forward``; only the execution schedule
    differs.  ``n_micro`` microbatches must divide the batch.
    Returns (final_norm'd hidden (B, Sq, H), updated kv_cache)."""
    B, Sq, H = inputs_embeds.shape
    n_pipe = mesh.shape[PIPE]
    n_data = mesh.shape.get(DATA, 1)
    M = n_micro
    if B % (M * n_data):
        raise ValueError(
            f"batch {B} must be divisible by n_micro*data={M * n_data}"
        )
    mb = B // M  # rows per microbatch (sharded over 'data' inside)

    cos, sin = rope_table(rope_positions, cfg.head_dim, cfg.rope_theta)
    slot = jnp.asarray(write_slot, jnp.int32)
    per_row_slot = slot.ndim > 0

    # microbatch views: leading (M, mb, ...)
    def mb_view(x):
        return x.reshape((M, mb) + x.shape[1:])

    embeds_mb = mb_view(inputs_embeds)
    cos_mb, sin_mb = mb_view(cos), mb_view(sin)
    kvok_mb = mb_view(kv_valid)
    slot_mb = mb_view(slot) if per_row_slot else slot
    # cache batch axis -> explicit (M, mb) so each data shard owns a slice of
    # EVERY microbatch (global row b = m*mb + j stays row b at any n_micro)
    cache_mb = {
        k: v.reshape(v.shape[:1] + (M, mb) + v.shape[2:])
        for k, v in kv_cache.items()
    }

    batch3 = P(None, DATA, None, None)  # (M, mb, Sq, H)-like operands

    def stage_fn(layers_local, cache_local, embeds_, cos_, sin_, kvok_, slot_):
        s = jax.lax.axis_index(PIPE)
        T = M + n_pipe - 1
        mb_loc = embeds_.shape[1]  # rows per microbatch on THIS data shard

        def tick(t, carry):
            buf, outs, cache = carry
            m = t - s  # this stage's microbatch index at tick t
            m_c = jnp.clip(m, 0, M - 1)
            active = (m >= 0) & (m < M)
            h_in = jnp.where(
                s == 0,
                jax.lax.dynamic_index_in_dim(embeds_, m_c, 0, keepdims=False),
                buf,
            )
            mb_slot = (
                jax.lax.dynamic_index_in_dim(slot_, m_c, 0, keepdims=False)
                if per_row_slot else slot_
            )
            # this microbatch's slice of the stage's cache: (L_loc, mb, Smax, ...)
            cache_m = {
                k: jax.lax.dynamic_index_in_dim(v, m_c, 1, keepdims=False)
                for k, v in cache.items()
            }
            h_out, cache_m = llama.decoder_stack(
                layers_local, cfg, h_in,
                jax.lax.dynamic_index_in_dim(cos_, m_c, 0, keepdims=False),
                jax.lax.dynamic_index_in_dim(sin_, m_c, 0, keepdims=False),
                cache_m,
                jax.lax.dynamic_index_in_dim(kvok_, m_c, 0, keepdims=False),
                mb_slot,
                remat=remat,
            )

            def put_rows(full, part):
                cur = jax.lax.dynamic_index_in_dim(full, m_c, 1, keepdims=False)
                part = jnp.where(active, part, cur)  # mask inactive ticks
                return jax.lax.dynamic_update_index_in_dim(full, part, m_c, 1)

            cache = {k: put_rows(cache[k], cache_m[k]) for k in cache}
            # last stage banks the finished microbatch
            out_cur = jax.lax.dynamic_index_in_dim(outs, m_c, 0, keepdims=False)
            bank = jnp.where((s == n_pipe - 1) & active, h_out, out_cur)
            outs = jax.lax.dynamic_update_index_in_dim(outs, bank, m_c, 0)
            # rotate activations to the next stage (ring; wrap is ignored)
            buf = jax.lax.ppermute(
                h_out, PIPE, [(i, (i + 1) % n_pipe) for i in range(n_pipe)]
            )
            return buf, outs, cache

        buf0 = jnp.zeros((mb_loc, Sq, H), inputs_embeds.dtype)
        outs0 = jnp.zeros((M, mb_loc, Sq, H), inputs_embeds.dtype)
        _, outs, cache_local = jax.lax.fori_loop(
            0, T, tick, (buf0, outs0, cache_local)
        )
        # only the last stage holds real outputs; replicate across 'pipe'
        outs = jax.lax.psum(
            jnp.where(s == n_pipe - 1, outs, jnp.zeros_like(outs)), PIPE
        )
        return outs, cache_local

    layer_specs = P(PIPE)  # leading layer axis; rest replicated per stage
    if MODEL in mesh.shape:
        # PP × TP: only 'pipe' runs manually; 'model' stays a GSPMD auto axis
        # — Megatron shardings on the stage-local weights partition the
        # matmuls inside each stage (partial-manual shard_map).
        cache_spec = P(PIPE)
        extra = dict(axis_names={PIPE})
        b3, kvs, ss = P(), P(), P()
    else:
        cache_spec = P(PIPE, None, DATA)  # (L, M, mb, ...): stages × DP rows
        extra = {}
        b3 = batch3
        kvs = P(None, DATA, None)
        ss = P(None, DATA) if per_row_slot else P()
    fn = shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: layer_specs, params["layers"]),
            jax.tree.map(lambda _: cache_spec, cache_mb),
            b3,  # embeds (M, mb, Sq, H)
            b3,  # cos
            b3,  # sin
            kvs,  # kv_valid (M, mb, Smax)
            ss,
        ),
        out_specs=(b3, jax.tree.map(lambda _: cache_spec, cache_mb)),
        check_vma=False,
        **extra,
    )
    if extra:  # partial-manual (auto 'model') only lowers under jit — an
        # eager call trips a misleading "out_specs refers to 'model'" error
        fn = jax.jit(fn)
    out = fn(params["layers"], cache_mb, embeds_mb, cos_mb, sin_mb, kvok_mb,
             slot_mb)
    hidden_mb, cache_mb = out
    h = hidden_mb.reshape(B, Sq, H)
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    kv_cache = {
        k: v.reshape(v.shape[:1] + (B,) + v.shape[3:]) for k, v in cache_mb.items()
    }
    return h, kv_cache
