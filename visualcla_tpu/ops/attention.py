"""Attention ops — XLA reference path.

``dot_product_attention`` is the numerics-defining implementation (fp32 softmax,
matching HF eager attention).  The Pallas flash kernels in ``ops/pallas/`` are
drop-in replacements selected by the dispatch helpers here; everything funnels
through the same (B, S, N, H) layout so kernels can be swapped per-phase
(prefill vs decode) without touching model code.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = float(jnp.finfo(jnp.float32).min)


def dot_product_attention(
    q: jnp.ndarray,  # (B, Sq, N, H)
    k: jnp.ndarray,  # (B, Sk, Nkv, H)
    v: jnp.ndarray,  # (B, Sk, Nkv, H)
    bias: Optional[jnp.ndarray] = None,  # (B, 1|N, Sq, Sk) additive
    scale: Optional[float] = None,
    softmax_dtype: str = "fp32",
) -> jnp.ndarray:
    """Dense attention.  Returns (B, Sq, N, H) in q.dtype.

    softmax_dtype:
      - "fp32": scores+softmax hard-cast to fp32, like HF's eager attention for
        LLaMA/CLIP (``softmax(..., dtype=torch.float32)``) — bit-matches HF at any
        model precision.
      - "native": promote(q.dtype, fp32) — like code that softmaxes in the input
        dtype (the reference's resampler), while keeping bf16 runtime safe.
    """
    b, sq, n, h = q.shape
    nkv = k.shape[2]
    if n != nkv:  # grouped-query: repeat KV heads
        rep = n // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = h ** -0.5
    if softmax_dtype == "fp32":
        acc = jnp.float32
    else:
        acc = jnp.promote_types(q.dtype, jnp.float32)
    # (B, N, Sq, Sk) — scores in the matmul dtype, then upcast like torch does
    logits = jnp.einsum(
        "bqnh,bknh->bnqk", q, k,
        preferred_element_type=jnp.promote_types(q.dtype, jnp.float32),
    )
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(logits.dtype)
    probs = jax.nn.softmax(logits.astype(acc), axis=-1).astype(q.dtype)
    out = jnp.einsum("bnqk,bknh->bqnh", probs, v)
    return out


_ATTN_IMPL = None  # None = auto (flash on TPU, xla elsewhere)
_ATTN_MESH = None  # Mesh for shard_map-wrapped flash under TP/DP


def set_attention_impl(name: str | None) -> None:
    """Force the attention backend: 'flash' (Pallas), 'xla', or None = auto."""
    global _ATTN_IMPL
    assert name in (None, "flash", "xla")
    _ATTN_IMPL = name


def set_attention_mesh(mesh) -> None:
    """Register the process-wide default mesh used to shard_map the flash
    kernel (heads on 'model', batch on 'data').  None reverts to
    single-device dispatch.  Scoped overrides (below) take precedence."""
    global _ATTN_MESH
    _ATTN_MESH = mesh


import contextlib  # noqa: E402
import threading  # noqa: E402

_TLS = threading.local()  # per-thread override stack (trace-time reads)


def current_attention_mesh():
    """The mesh in effect for the calling thread: innermost scoped override
    if any, else the process default."""
    stack = getattr(_TLS, "mesh_override", None)
    return stack[-1] if stack else _ATTN_MESH


@contextlib.contextmanager
def attention_mesh_scope(mesh):
    """Temporarily register ``mesh`` (which may be None) around a jitted
    program invocation.  Engines use this instead of setting the global at
    construction, so a meshed and an unmeshed engine in one process can't
    inherit each other's mesh at trace time (the mesh is only read while
    tracing; cached executables are unaffected).  The override is
    THREAD-LOCAL: the serving Scheduler steps its engine on a daemon thread,
    and its scope must not leak into (or clobber) a concurrent trace on the
    main thread."""
    stack = getattr(_TLS, "mesh_override", None)
    if stack is None:
        stack = _TLS.mesh_override = []
    stack.append(mesh)
    try:
        yield
    finally:
        stack.pop()


def _flash_sharded(q, k, v, kv_valid, write_slot, mesh, *,
                   k_scale=None, v_scale=None):
    """Pallas flash under a TP×DP mesh: heads are embarrassingly parallel, so
    shard_map over ('data', 'model') runs the kernel per-shard with no
    collectives (the surrounding matmuls' all-reduces are GSPMD's job).
    K/V arrive in cache order (B, Nkv, Skv, H) — kv heads on 'model'."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from .pallas.flash_attention import flash_attention

    DATA, MODEL = "data", "model"
    if MODEL not in mesh.axis_names or DATA not in mesh.axis_names:
        # e.g. a ('data','seq') CP mesh: dense fallback partitions fine
        return None
    n_model = mesh.shape[MODEL]
    n_data = mesh.shape[DATA]
    B, _, N, _ = q.shape
    Nkv = k.shape[1]
    if N % n_model or Nkv % n_model or B % n_data:
        # indivisible head/batch counts: dense fallback partitions fine
        return None
    qs = P(DATA, None, MODEL, None)
    kvs = P(DATA, MODEL, None, None)
    slot_spec = P() if jnp.asarray(write_slot).ndim == 0 else P(DATA)

    if k_scale is None:
        fn = shard_map(
            lambda q_, k_, v_, ok_, s_: flash_attention(
                q_, k_, v_, ok_, s_, causal=True, kv_layout="bnsh"),
            mesh=mesh,
            in_specs=(qs, kvs, kvs, P(DATA, None), slot_spec),
            out_specs=qs,
            check_vma=False,  # pallas_call outputs carry no vma annotation
        )
        return fn(q, k, v, kv_valid, write_slot)
    scale_spec = P(DATA, MODEL, None)  # (B, Nkv, Skv): kv heads on 'model'
    fn = shard_map(
        lambda q_, k_, v_, ok_, s_, ks_, vs_: flash_attention(
            q_, k_, v_, ok_, s_, causal=True, k_scale=ks_, v_scale=vs_,
            kv_layout="bnsh"),
        mesh=mesh,
        in_specs=(qs, kvs, kvs, P(DATA, None), slot_spec, scale_spec,
                  scale_spec),
        out_specs=qs,
        check_vma=False,
    )
    return fn(q, k, v, kv_valid, write_slot, k_scale, v_scale)


@contextlib.contextmanager
def attention_impl_scope(name: str):
    """Trace-time, THREAD-LOCAL backend override (mirrors
    attention_mesh_scope).  Training uses it to pin the dense-XLA path:
    the flash kernels are inference-only (pallas_call has no JVP rule —
    the 7B QLoRA probe hit exactly that), and at SFT sequence lengths
    attention is ~1–2% of the step's FLOPs, so a flash backward kernel
    buys nothing a remat'd dense attention doesn't."""
    assert name in ("flash", "xla")
    stack = getattr(_TLS, "impl_override", None)
    if stack is None:
        stack = _TLS.impl_override = []
    stack.append(name)
    try:
        yield
    finally:
        stack.pop()


def attention_impl() -> str:
    import os

    stack = getattr(_TLS, "impl_override", None)
    if stack:
        return stack[-1]
    if _ATTN_IMPL is not None:
        return _ATTN_IMPL
    env = os.environ.get("VISUALCLA_ATTN")
    if env in ("flash", "xla"):
        return env
    return "flash" if jax.default_backend() == "tpu" else "xla"


_FLASH_VMEM_BUDGET = 12 * 2**20  # of the 16 MB v5e VMEM; rest is Mosaic slack


def _flash_prefill_fits_vmem(q, k, kv_valid, kv_int8: bool) -> bool:
    """Guard for the flash kernels' whole-KV-row VMEM staging.

    The prefill kernels stage one (Skv, H) K and V row per program plus —
    for int8 caches — (Nkv, Skv) f32 scale rows and the (B, Skv) validity
    mask (flash_attention.py in_specs).  At the reference's 2048-token
    context that is well under 2 MB, but long-context configs (ring-CP
    tests at 8k+, future 32k) can push the double-buffered staging past
    VMEM: fall back to the dense dequant path instead of letting Mosaic
    fail with a scoped-vmem OOM (VERDICT r2 item 8).  The Sq==1 decode
    kernel blocks the KV dim and never triggers this."""
    Skv = k.shape[-2]
    H = k.shape[-1]
    Nkv = k.shape[-3]
    B = kv_valid.shape[0]
    if q.shape[1] == 1:  # decode kernel: (Nkv, bkv) blocks, always fits
        return True
    per_program = 2 * Skv * H * k.dtype.itemsize  # K + V rows
    per_program += B * Skv * 4  # kvok (full array, shared)
    if kv_int8:
        per_program += 2 * Nkv * Skv * 4  # scale rows
    return 2 * per_program <= _FLASH_VMEM_BUDGET  # x2: double buffering


def cached_attention(
    q: jnp.ndarray,  # (B, Sq, N, H)
    k: jnp.ndarray,  # (B, Nkv, Skv, H) — full cache buffer (fp or int8),
    v: jnp.ndarray,  # CACHE ORDER: heads major over slots (llama.init_kv_cache)
    kv_valid: jnp.ndarray,  # (B, Skv) bool
    write_slot: jnp.ndarray,  # () or (B,) int32
    *,
    k_scale: jnp.ndarray | None = None,  # (B, Nkv, Skv) f32 when k/v are int8
    v_scale: jnp.ndarray | None = None,
    impl: str | None = None,
    layer_index: jnp.ndarray | None = None,  # () int32: k/v are the FULL
    # stacked cache (L, B, Nkv, Skv, H) — single-device flash reads layer
    # ``layer_index`` in place (scalar prefetch, no slice copy); other
    # backends slice here
) -> jnp.ndarray:
    """Causal attention over a KV cache: Pallas flash kernel on TPU, dense XLA
    fallback elsewhere.  Query i occupies slot write_slot+i (per-row when
    write_slot is (B,)) and sees kv slots <= its own among the valid ones.
    int8 caches pass per-token-per-head scales; dequant happens inside the
    kernel (the HBM read stays int8 — half the decode bandwidth).

    K/V come in the (B, Nkv, Skv, H) order the cache is stored in — the flash
    kernel's native operand order — so the decode loop streams the cache with
    ZERO relayout: with the old (B, Skv, Nkv, H) contract XLA chose the kernel
    layout inside the loop and inserted whole-cache copy ops at the loop
    boundary (4x cache bytes of transient — the round-1 bf16 B>=2 fused-loop
    compile rejection, bisected in tools/probe_fused_loop.py)."""
    impl = impl or attention_impl()
    mesh = current_attention_mesh()
    if impl == "flash" and not _flash_prefill_fits_vmem(
            q, k, kv_valid, k_scale is not None):
        impl = "xla"  # VMEM guard: fall back to dense dequant (see helper)
    if (impl == "flash" and mesh is None and layer_index is not None):
        from .pallas.flash_attention import flash_attention

        return flash_attention(q, k, v, kv_valid, write_slot, causal=True,
                               k_scale=k_scale, v_scale=v_scale,
                               layer_index=layer_index)
    if layer_index is not None:  # sharded / dense backends: slice the layer
        def _take(x):
            return (None if x is None else
                    jax.lax.dynamic_index_in_dim(x, layer_index, 0,
                                                 keepdims=False))

        k, v, k_scale, v_scale = _take(k), _take(v), _take(k_scale), _take(v_scale)
    if impl == "flash":
        if mesh is not None:
            out = _flash_sharded(q, k, v, kv_valid, write_slot, mesh,
                                 k_scale=k_scale, v_scale=v_scale)
            if out is not None:
                return out
        else:
            from .pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, kv_valid, write_slot, causal=True,
                                   k_scale=k_scale, v_scale=v_scale,
                                   kv_layout="bnsh")
    # dense fallback: back to (B, Skv, Nkv, H) for the shared numerics path
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if k_scale is not None:  # dequantize (XLA fuses the mul)
        k = (k.astype(jnp.float32)
             * k_scale.transpose(0, 2, 1)[..., None]).astype(q.dtype)
        v = (v.astype(jnp.float32)
             * v_scale.transpose(0, 2, 1)[..., None]).astype(q.dtype)
    B, Sq = q.shape[:2]
    Smax = k.shape[1]
    slot = jnp.asarray(write_slot, jnp.int32).reshape(-1, 1)  # (1|B, 1)
    q_slots = slot + jnp.arange(Sq, dtype=jnp.int32)[None, :]
    q_slots = jnp.broadcast_to(q_slots, (B, Sq))
    kv_slots = jnp.broadcast_to(jnp.arange(Smax, dtype=jnp.int32)[None, :], (B, Smax))
    bias = causal_bias(q_slots, kv_valid, kv_slots)
    return dot_product_attention(q, k, v, bias)


def full_attention(
    q: jnp.ndarray,  # (B, Sq, N, H)
    k: jnp.ndarray,  # (B, Skv, N, H)
    v: jnp.ndarray,
    *,
    softmax_dtype: str = "fp32",
    impl: str | None = None,
) -> jnp.ndarray:
    """Bidirectional unmasked attention (ViT / resampler).

    Default is dense XLA even on TPU: at ViT scale (257 tokens) XLA's fused
    attention beats the Pallas kernel's padding+launch overheads (measured:
    TTFT 86ms vs 117ms).  Set VISUALCLA_VIT_ATTN=flash to force the kernel
    (longer-sequence vision inputs).  The flash path accumulates softmax in
    fp32 — a numerical superset of the resampler's "native"-dtype softmax.
    NB: under a registered attention mesh (multi-chip) the forced-flash knob
    is ignored and dense XLA runs — the bidirectional kernel has no
    shard_map wrapper; GSPMD partitions the dense path itself."""
    import os

    if impl is None:
        impl = os.environ.get("VISUALCLA_VIT_ATTN", "xla")
    if impl == "flash" and current_attention_mesh() is None:
        from .pallas.flash_attention import flash_attention

        B, Skv = k.shape[0], k.shape[1]
        kv_valid = jnp.ones((B, Skv), jnp.int32)
        return flash_attention(
            q, k, v, kv_valid, jnp.int32(0), causal=False,
            block_q=128, block_kv=128,
        )
    return dot_product_attention(q, k, v, softmax_dtype=softmax_dtype)


def causal_bias(
    q_positions: jnp.ndarray,  # (B, Sq) int32 absolute positions of queries
    kv_valid: jnp.ndarray,  # (B, Sk) bool — which kv slots hold real tokens
    kv_positions: jnp.ndarray,  # (B, Sk) int32 absolute positions of kv slots
) -> jnp.ndarray:
    """Additive fp32 bias (B, 1, Sq, Sk): causal + validity masking."""
    ok = kv_valid[:, None, :] & (kv_positions[:, None, :] <= q_positions[:, :, None])
    bias = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)
    return bias[:, None, :, :]


def padding_bias(kv_valid: jnp.ndarray) -> jnp.ndarray:
    """Additive fp32 bias (B, 1, 1, Sk) masking invalid kv slots (bidirectional)."""
    bias = jnp.where(kv_valid, 0.0, NEG_INF).astype(jnp.float32)
    return bias[:, None, None, :]
