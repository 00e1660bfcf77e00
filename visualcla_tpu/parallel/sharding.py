"""Mesh + GSPMD sharding rules (the TPU-native "distributed backend").

The reference has no distributed runtime (SURVEY.md §2.c: only HF
``device_map='auto'`` layer placement, scripts/inference/inference.py:48-53).  The
TPU equivalent is a ``jax.sharding.Mesh`` over ICI with named axes:

- ``data``: batch sharding (DP) for batch eval / serving,
- ``model``: Megatron-style tensor parallelism (TP) — attention heads and MLP
  hidden sharded on ``model``; row-parallel projections produce partial sums that
  XLA turns into all-reduces over ICI.

All rules are expressed as PartitionSpecs per param-tree path; activations are
sharded by batch and the TP collectives are inserted by GSPMD from the param
shardings — no hand-written collectives (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA, MODEL = "data", "model"


def make_mesh(
    n_data: int = 1, n_model: Optional[int] = None, devices=None
) -> Mesh:
    """Build a (data, model) mesh.  Defaults: all devices on the model axis
    (TP is the main strategy for a 7B model on a v5e-8 slice)."""
    devices = devices if devices is not None else jax.devices()
    if n_model is None:
        n_model = len(devices) // n_data
    grid = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(grid, (DATA, MODEL))


# ---------------------------------------------------------------------------
# parameter partition specs (path-based rules)
# ---------------------------------------------------------------------------

# LLaMA: layers are stacked with a leading layer axis (None in every spec).
_LLAMA_RULES = {
    "embed_tokens": P(None, MODEL),        # (V, H): shard H (gathered per-token)
    "lm_head": P(None, MODEL),             # (H, V): shard V — logits sharded
    "final_norm": P(),
    ("layers", "input_norm"): P(),
    ("layers", "post_norm"): P(),
    ("layers", "q_proj"): P(None, None, MODEL),   # column-parallel
    ("layers", "k_proj"): P(None, None, MODEL),
    ("layers", "v_proj"): P(None, None, MODEL),
    ("layers", "o_proj"): P(None, MODEL, None),   # row-parallel -> all-reduce
    ("layers", "gate_proj"): P(None, None, MODEL),
    ("layers", "up_proj"): P(None, None, MODEL),
    ("layers", "down_proj"): P(None, MODEL, None),
}

# ViT: same Megatron pattern; biases of column-parallel layers shard on MODEL.
_VIT_RULES = {
    "class_embedding": P(),
    "patch_embedding": P(None, MODEL),
    "position_embedding": P(None, MODEL),
    "pre_layernorm": P(),
    "post_layernorm": P(),
    ("layers", "ln1"): P(),
    ("layers", "ln2"): P(),
    ("layers", "q_proj"): P(None, None, MODEL),
    ("layers", "q_bias"): P(None, MODEL),
    ("layers", "k_proj"): P(None, None, MODEL),
    ("layers", "k_bias"): P(None, MODEL),
    ("layers", "v_proj"): P(None, None, MODEL),
    ("layers", "v_bias"): P(None, MODEL),
    ("layers", "o_proj"): P(None, MODEL, None),
    ("layers", "o_bias"): P(),
    ("layers", "fc1"): P(None, None, MODEL),
    ("layers", "fc1_bias"): P(None, MODEL),
    ("layers", "fc2"): P(None, MODEL, None),
    ("layers", "fc2_bias"): P(),
}

_RESAMPLER_RULES = {
    "query_embedding": P(),
    "pooler": P(),
    ("layers", "q_proj"): P(None, None, MODEL),
    ("layers", "q_bias"): P(None, MODEL),
    ("layers", "k_proj"): P(None, None, MODEL),
    ("layers", "k_bias"): P(None, MODEL),
    ("layers", "v_proj"): P(None, None, MODEL),
    ("layers", "v_bias"): P(None, MODEL),
    ("layers", "attn_out"): P(None, MODEL, None),
    ("layers", "attn_out_bias"): P(),
    ("layers", "attn_ln"): P(),
    ("layers", "inter"): P(None, None, MODEL),
    ("layers", "inter_bias"): P(None, MODEL),
    ("layers", "out"): P(None, MODEL, None),
    ("layers", "out_bias"): P(),
    ("layers", "out_ln"): P(),
}


def _lookup(rules: dict, path: tuple) -> P:
    """Longest-prefix match of a param path against a rule table."""
    for depth in range(len(path), 0, -1):
        key = path[0] if depth == 1 else tuple(path[:depth])
        if key in rules:
            return rules[key]
    return P()


def _tree_specs(tree, rules: dict, prefix=()) -> dict:
    out = {}
    for k, v in tree.items():
        path = prefix + (k,)
        if isinstance(v, dict):
            if (set(v.keys()) == {"q", "scale"}
                    and np.ndim(v["q"]) == np.ndim(v["scale"]) + 1):
                # GROUPED quantized leaf: q (..., G, gs, out), scale
                # (..., G, out).  The base rule maps the ORIGINAL (..., in,
                # out) weight; the contraction dim split into (G, gs) must
                # carry the in-dim axis on G, never on gs (a 'model'-divisible
                # gs would silently shard inside a group — same rule as
                # checkpoint/serialize.py's streamed int4 load).
                base = tuple(_lookup(rules, path))
                base = base + (None,) * (np.ndim(v["scale"]) - len(base))
                out[k] = {"q": P(*base[:-1], None, base[-1]),
                          "scale": P(*base)}
            else:
                out[k] = _tree_specs(v, rules, path)
        else:
            spec = _lookup(rules, path)
            # drop specs that don't divide the dim evenly or exceed rank
            out[k] = spec
    return out


def param_specs(params: dict, fsdp: bool = False) -> dict:
    """PartitionSpec pytree matching a composite VisualCLA param tree.

    ``fsdp=True`` additionally shards every stacked layer tensor's leading
    LAYER axis over 'data' (ZeRO-style parameter sharding for training: each
    DP rank stores 1/n of the layer stack; GSPMD all-gathers a layer at use
    and reduce-scatters its grads).  Requires num_layers % data == 0."""
    specs = {}
    if "text" in params:
        specs["text"] = _tree_specs(params["text"], _LLAMA_RULES)
    if "vision" in params:
        specs["vision"] = _tree_specs(params["vision"], _VIT_RULES)
    if "resampler" in params:
        specs["resampler"] = _tree_specs(params["resampler"], _RESAMPLER_RULES)
    if "projection" in params:
        specs["projection"] = {"weight": P(None, MODEL), "bias": P(MODEL)}
    # standalone LLaMA param tree
    if "embed_tokens" in params:
        specs = _tree_specs(params, _LLAMA_RULES)
    if fsdp:
        specs = _apply_fsdp(specs)
    return specs


def _apply_fsdp(specs, inside_layers: bool = False):
    out = {}
    for k, v in specs.items():
        if isinstance(v, dict):
            out[k] = _apply_fsdp(v, inside_layers or k == "layers")
        elif inside_layers:
            rest = tuple(v)[1:] if len(v) >= 1 else ()
            out[k] = P(DATA, *rest)  # leading axis of stacked tensors = layer
        else:
            out[k] = v
    return out


def _lookup_flat(flat_key: str) -> P:
    """PartitionSpec for a '/'-joined checkpoint path (e.g. 'text/layers/q_proj').

    Quantized leaves reuse their parent weight's spec ('.../q_proj/scale' maps
    like '.../q_proj'; _valid_spec later clears axes that don't divide)."""
    parts = [p for p in flat_key.split("/") if p not in ("q", "scale")]
    if not parts:
        return P()
    comp, rest = parts[0], tuple(parts[1:])
    if comp == "text":
        return _lookup(_LLAMA_RULES, rest)
    if comp == "vision":
        return _lookup(_VIT_RULES, rest)
    if comp == "resampler":
        return _lookup(_RESAMPLER_RULES, rest)
    if comp == "projection":
        return {"weight": P(None, MODEL), "bias": P(MODEL)}.get(
            rest[0] if rest else "", P()
        )
    return _lookup(_LLAMA_RULES, tuple(parts))  # standalone llama tree


def _valid_spec(spec: P, shape: tuple, mesh: Mesh) -> P:
    """Clear axes that don't divide the corresponding dim evenly."""
    if len(spec) > len(shape):
        return P()
    fixed = []
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None or axis not in mesh.axis_names:
            # missing axes happen on partial meshes (e.g. ('data','seq') CP)
            fixed.append(None)
        else:
            size = mesh.shape[axis]
            fixed.append(axis if dim % size == 0 else None)
    while fixed and fixed[-1] is None:
        fixed.pop()
    return P(*fixed)


def shard_params(params: dict, mesh: Mesh, fsdp: bool = False) -> dict:
    """Place a param tree onto the mesh with TP (+optional FSDP) shardings."""
    specs = param_specs(params, fsdp=fsdp)

    def place(p, spec):
        spec = _valid_spec(spec, np.shape(p), mesh)
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs)


def kv_cache_specs() -> dict:
    """KV cache (L, B, N_kv, S, hd): batch on data, heads on model.
    int8 caches add per-token-per-head scales (L, B, N_kv, S)."""
    kv = P(None, DATA, MODEL, None, None)
    sc = P(None, DATA, MODEL, None)
    return {"k": kv, "v": kv, "k_scale": sc, "v_scale": sc}


def batch_spec() -> P:
    return P(DATA)
