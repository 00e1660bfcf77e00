"""Native checkpoint format: flat-key safetensors + composite config.json.

Layout of a converted checkpoint directory:
  config.json              composite config (same schema as the reference's)
  params.safetensors       all weights, keys are '/'-joined tree paths,
                           stacked-layer MXU layout, bf16 by default
  tokenizer.model          copied through if present at conversion time
  added_tokens.json        the 4 VisualCLA specials with their ids
  preprocessor_config.json image preprocessing config

Loading streams tensor-by-tensor from the (mmap'd) safetensors file and places
each directly onto its mesh sharding — peak host memory stays ~1 tensor, and
per-device transfers only carry that device's shard.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VisualCLAConfig


def flatten_tree(tree: dict, prefix: str = "") -> Dict[str, Any]:
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, path))
        else:
            out[path] = v
    return out


def unflatten_tree(flat: Dict[str, Any]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _config_to_dict(cfg: VisualCLAConfig) -> dict:
    d = dataclasses.asdict(cfg)
    d["model_type"] = "visualcla"
    return d


# safetensors dtype tags for the hand-rolled streaming writer
_SAFETENSORS_TAGS = {
    "float64": "F64", "float32": "F32", "float16": "F16", "bfloat16": "BF16",
    "int64": "I64", "int32": "I32", "int16": "I16", "int8": "I8",
    "uint8": "U8", "bool": "BOOL",
}


def _leaf_target_dtype(key: str, src: np.dtype, target: np.dtype) -> np.dtype:
    """Conversion rule shared by the header pass and the data pass:
    quantization scales stay fp32 (the dequant precision contract);
    floating leaves convert to ``target``; everything else passes through."""
    if key.endswith("/scale"):
        return np.dtype(src)
    if np.issubdtype(src, np.floating) and src != target:
        return np.dtype(target)
    return np.dtype(src)


def save_checkpoint(
    out_dir: str,
    params: dict,
    cfg: VisualCLAConfig,
    dtype: str = "bfloat16",
    consume: bool = False,
) -> None:
    """Write the native checkpoint, STREAMING one leaf at a time.

    The safetensors file is written by hand (8-byte length + JSON header +
    contiguous data section, the format safe_open reads) so peak host memory
    during a 7B conversion is the params tree plus ONE converted leaf —
    `safetensors.numpy.save_file` would require a second full converted copy
    of every tensor at once, which is what pushed the weights-day convert
    stage past its address-space budget (stress_weights_day.py, round 4).
    ``consume=True`` additionally pops leaves from ``params`` as they are
    written, so memory FALLS over the save instead of holding steady.

    bf16 goes through ml_dtypes (numpy-native round-to-nearest-even — the
    same rounding jnp.astype applies) with no jax/XLA allocation at all."""
    import ml_dtypes

    os.makedirs(out_dir, exist_ok=True)
    flat = flatten_tree(params)
    if consume:
        # flat now holds the only references we need; drop the tree's so the
        # per-leaf pops below actually free memory
        params.clear()
    target = (np.dtype(ml_dtypes.bfloat16) if dtype == "bfloat16"
              else np.dtype(dtype))

    # pass 1 (no copies): header with final dtypes/shapes/offsets
    header = {}
    offset = 0
    for k, v in flat.items():
        tdt = _leaf_target_dtype(k, v.dtype, target)
        tag = _SAFETENSORS_TAGS.get(tdt.name)
        if tag is None:
            raise ValueError(f"cannot serialize dtype {tdt} (leaf {k!r})")
        nbytes = int(np.prod(v.shape, dtype=np.int64)) * tdt.itemsize
        header[k] = {"dtype": tag, "shape": list(v.shape),
                     "data_offsets": [offset, offset + nbytes]}
        offset += nbytes

    # pass 2: convert + append one leaf at a time
    header_bytes = json.dumps(header).encode("utf-8")
    # pad the header with spaces to 8-byte alignment (what the official
    # writer does — readers mmap the data section at this offset)
    if len(header_bytes) % 8:
        header_bytes += b" " * (8 - len(header_bytes) % 8)
    with open(os.path.join(out_dir, "params.safetensors"), "wb") as f:
        f.write(len(header_bytes).to_bytes(8, "little"))
        f.write(header_bytes)
        for k in list(header.keys()):
            v = flat.pop(k) if consume else flat[k]
            tdt = _leaf_target_dtype(k, v.dtype, target)
            if v.dtype != tdt:
                arr = np.asarray(v).astype(tdt)  # astype output is contiguous
            else:
                arr = np.ascontiguousarray(v)
            del v
            arr.tofile(f)
            del arr
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(_config_to_dict(cfg), f, indent=2)


def load_checkpoint(
    ckpt_dir: str,
    mesh: Optional[Any] = None,
    dtype=None,
    quantize_int8: bool = False,
    quantize: Optional[str] = None,  # None/"none" | "int8" | "int4"
    group: int = 128,
):
    """-> (params pytree on device, VisualCLAConfig).

    Tensors stream off the mmap'd file one at a time on the HOST (peak host
    memory ~1 tensor), are optionally quantized there (``quantize='int8'`` is
    the reference's load_in_8bit scope — text tower only; ``'int4'`` is the
    beyond-reference group-wise s4 tier: layer matmuls + lm_head grouped,
    embedding per-row int8), and are placed directly with their TP sharding
    when ``mesh`` is given.  The bf16 original of a quantized weight never
    touches device HBM.  ``quantize_int8`` is the legacy bool alias.
    """
    from safetensors import safe_open

    if quantize in (None, "none"):
        quantize = "int8" if quantize_int8 else "none"
    if quantize not in ("none", "int8", "int4"):
        raise ValueError(f"quantize must be none/int8/int4, got {quantize!r}")

    cfg = VisualCLAConfig.from_pretrained(ckpt_dir)
    path = os.path.join(ckpt_dir, "params.safetensors")

    if mesh is not None:
        from jax.sharding import NamedSharding

        from ..parallel import sharding as shd

    def place(arr, flat_key, spec=None, keep_dtype=False):
        target = None
        if (dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating)
                and not keep_dtype and not flat_key.endswith("/scale")):
            # quantization scales stay fp32 (the dequant precision
            # contract — save_checkpoint preserves them fp32 too)
            target = dtype
        if mesh is None:
            out = jnp.asarray(arr, target)
        else:
            if spec is None:
                spec = shd._lookup_flat(flat_key)
            spec = shd._valid_spec(spec, arr.shape, mesh)
            out = jax.device_put(
                jnp.asarray(arr, target), NamedSharding(mesh, spec)
            )
        return out

    from ..ops.quantization import (
        INT8_TEXT_LEAVES, effective_group, quantize_grouped_np, quantize_np,
    )

    # int4 scope: grouped s4 for the matmul leaves; per-row int8 embedding
    # (gathers don't benefit from grouping — ops/quantization.py)
    int4_grouped = {
        k for k in INT8_TEXT_LEAVES if k != "text/embed_tokens"
    }

    def read_quantized(f, k, quant_fn):
        """Quantize a stored leaf, streaming stacked (>=3-d) leaves one
        leading-axis slice at a time into preallocated outputs: get_tensor
        would copy the full bf16 leaf (2.7 GB for a 7B down_proj) out of the
        mmap before quantization even starts (weights-day RSS trace,
        round 4)."""
        sl = f.get_slice(k)
        shape = tuple(sl.get_shape())
        if len(shape) < 3:
            return quant_fn(f.get_tensor(k))
        first = quant_fn(sl[0])
        out = {kk: np.empty((shape[0],) + v.shape, v.dtype)
               for kk, v in first.items() if kk != "bits"}
        for kk in out:
            out[kk][0] = first[kk]
        for i in range(1, shape[0]):
            qd = quant_fn(sl[i])
            for kk in out:
                out[kk][i] = qd[kk]
        return out

    flat = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            shape = tuple(f.get_slice(k).get_shape())
            eff = (effective_group(shape[-2], group)
                   if quantize == "int4" and k in int4_grouped else None)
            if eff is not None:
                qd = read_quantized(
                    f, k,
                    lambda a, eff=eff: quantize_grouped_np(a, group=eff,
                                                           bits=4))
                # packed int8 carrier transfers as-is (s4 cannot cross the
                # axon program boundary — ops/quantization.py module note)
                q4 = jnp.asarray(qd["q"])
                spec = None
                if mesh is not None:
                    # the contraction dim split into (G, gs): carry the base
                    # spec's in-dim axis on G, never on gs (a 'model'-divisible
                    # gs would otherwise silently shard inside a group)
                    base = tuple(shd._lookup_flat(k))
                    base = base + (None,) * (len(shape) - len(base))
                    from jax.sharding import PartitionSpec as P
                    spec = P(*base[:-1], None, base[-1])
                flat[k] = {
                    "q": place(q4, k, spec=spec, keep_dtype=True),
                    "scale": place(qd["scale"], k + "/scale"),
                }
            elif quantize in ("int8", "int4") and k in INT8_TEXT_LEAVES:
                qd = read_quantized(
                    f, k,
                    lambda a, ax=INT8_TEXT_LEAVES[k]: quantize_np(a, axis=ax))
                flat[k] = {
                    "q": place(qd["q"], k),
                    "scale": place(qd["scale"], k + "/scale"),
                }
            else:
                flat[k] = place(f.get_tensor(k), k)
    params = unflatten_tree(flat)
    return params, cfg
