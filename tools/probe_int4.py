"""Probe int4 weight storage for the decode path on the real chip.

The int8 B1 fused decode loop sits at ~92% of its weight-bandwidth roofline
(DEVNOTES fifth window), so the next single-stream jump must halve weight
bytes: int4.  Questions this probe answers on the v5e:

  1. Does native ``jnp.int4`` (XLA s4) compile/run, and is it bit-PACKED in
     HBM (arg size ~N/2 bytes) or byte-expanded?
  2. Step time of a scan-over-layers decode-shaped loop at flagship width
     with (a) int8 weights, (b) native s4 weights, (c) nibble-packed-in-int8
     weights unpacked in-graph before the dot.
  3. Group-wise (G=128) scale formulation cost vs per-channel.

  python tools/probe_int4.py [--layers N] [--batch B]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()

H = 4096


def timed(step, params, h, iters=20):
    out = step(params, h)
    jax.device_get(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(params, out)
    jax.device_get(out)
    return (time.perf_counter() - t0) / iters


def arg_bytes(step, params, h):
    try:
        comp = jax.jit(step).lower(params, h).compile()
        m = comp.memory_analysis()
        return m.argument_size_in_bytes
    except Exception as e:  # noqa: BLE001
        return f"memory_analysis failed: {str(e)[:80]}"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    L, B = args.layers, args.batch
    rng = np.random.default_rng(0)

    wf = rng.standard_normal((L, H, H)).astype(np.float32) * 0.02
    # per-channel int8
    s8 = np.abs(wf).max(axis=-2, keepdims=True) / 127.0
    q8 = np.clip(np.round(wf / s8), -127, 127).astype(np.int8)
    # per-channel int4 (range -7..7 symmetric)
    s4 = np.abs(wf).max(axis=-2, keepdims=True) / 7.0
    q4 = np.clip(np.round(wf / s4), -7, 7).astype(np.int8)
    # nibble-pack along the contraction dim: (L, H/2, H) bytes
    packed = ((q4[:, 0::2, :] & 0xF) | ((q4[:, 1::2, :] & 0xF) << 4)).astype(
        np.uint8)

    h0 = jnp.zeros((B, H), jnp.bfloat16)

    variants = {}

    variants["int8"] = (
        {"q": jnp.asarray(q8), "s": jnp.asarray(s8[:, 0, :])},
        lambda x, p, i: (x @ p["q"][i].astype(x.dtype)) * p["s"][i].astype(x.dtype),
    )

    try:
        # EXPECTED TO FAIL under axon: s4 cannot cross the program boundary
        # (jit args / transfers are UNIMPLEMENTED at the PJRT layer) — the
        # shipped format is the packed-bitcast variant below.
        q4s4 = jnp.asarray(q4).astype(jnp.int4)
        variants["s4-native"] = (
            {"q": q4s4, "s": jnp.asarray(s4[:, 0, :])},
            lambda x, p, i: (x @ p["q"][i].astype(x.dtype)) * p["s"][i].astype(x.dtype),
        )
    except Exception as e:  # noqa: BLE001
        print("s4 creation failed (expected under axon):", str(e)[:100])

    # the SHIPPED path (ops/quantization.py): int8 carrier packed along the
    # OUTPUT dim, bitcast to s4 inside the program — bit-identical layout,
    # so the dot's RHS reads packed bytes straight from HBM
    from visualcla_tpu.ops.quantization import pack_s4, unpack_s4

    packed_out = pack_s4(q4)  # (L, H, H/2) int8

    def bitcast_mm(x, p, i):
        w = unpack_s4(p["q"][i])  # (H, H) s4, trace-time bitcast
        return (x @ w.astype(x.dtype)) * p["s"][i].astype(x.dtype)

    variants["packed-bitcast"] = (
        {"q": jnp.asarray(packed_out), "s": jnp.asarray(s4[:, 0, :])},
        bitcast_mm,
    )

    def unpack_mm(x, p, i):
        b = p["q"][i]  # (H/2, H) uint8
        lo = (b & 0xF).astype(jnp.int8)
        lo = jnp.where(lo > 7, lo - 16, lo)
        hi = (b >> 4).astype(jnp.int8)
        hi = jnp.where(hi > 7, hi - 16, hi)
        w = jnp.stack([lo, hi], axis=1).reshape(H, H)  # interleave rows back
        return (x @ w.astype(x.dtype)) * p["s"][i].astype(x.dtype)

    variants["packed-u8"] = (
        {"q": jnp.asarray(packed), "s": jnp.asarray(s4[:, 0, :])},
        unpack_mm,
    )

    for name, (params, mm) in variants.items():
        def step(params, h, mm=mm):
            def body(h, i):
                y = mm(h, params, i)
                return h + y.astype(h.dtype) * 1e-3, None
            h, _ = jax.lax.scan(body, h, jnp.arange(L))
            return h

        jstep = jax.jit(step)
        try:
            dt = timed(jstep, params, h0)
        except Exception as e:  # noqa: BLE001
            print(f"{name:11s}: FAILED {str(e)[:120]}")
            continue
        ab = arg_bytes(step, params, h0)
        per_layer_us = dt * 1e6 / L
        print(f"{name:11s}: {dt*1e3:7.3f} ms/step  {per_layer_us:7.1f} us/layer"
              f"  arg_bytes={ab}", flush=True)

    # correctness spot check: s4-native / packed == host dequant reference
    x = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    ref = np.asarray(x, np.float32) @ (q4[0].astype(np.float32) * s4[0])
    for name in ("s4-native", "packed-u8", "packed-bitcast"):
        if name not in variants:
            continue
        params, mm = variants[name]
        got = np.asarray(jax.jit(lambda x, p, mm=mm: mm(x, p, 0))(x, params),
                         np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name} rel err vs host dequant: {err:.2e}")


if __name__ == "__main__":
    main()
