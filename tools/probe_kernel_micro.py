"""Microbenchmark the paged append kernel in isolation at flagship decode
shapes: a jitted scan of 32 chained kernel calls (≈ one decode step's worth
of attention) with donated pools, at several context lengths and batch
sizes.  Separates kernel cost from the rest of the decode step.

  python tools/probe_kernel_micro.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache
from visualcla_tpu.ops.pallas.paged_attention import paged_append_attention

enable_compilation_cache()

L, NB, BS, Nkv, hd, N = 32, 64, 64, 32, 128, 32
KVL = Nkv * hd


@functools.partial(jax.jit, static_argnames=("B",), donate_argnums=(2, 3))
def attn_32layers(q, kn, kp, vp, tables, lens, blk, off, B):
    def body(carry, l):
        kp, vp = carry
        o, kp, vp, _, _ = paged_append_attention(
            q, kn, kn, kp, vp, tables, lens, blk, off, l)
        return (kp, vp), jnp.sum(o)

    (kp, vp), osum = jax.lax.scan(
        body, (kp, vp), jnp.arange(L, dtype=jnp.int32))
    return kp, vp, jnp.sum(osum)


def run(B, ctx, reps=30):
    max_blocks = 8
    rng = np.random.default_rng(0)
    kp = jnp.zeros((L, NB, BS, KVL), jnp.bfloat16)
    vp = jnp.zeros((L, NB, BS, KVL), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, N, hd)), jnp.bfloat16)
    kn = jnp.asarray(rng.standard_normal((B, Nkv, hd)), jnp.bfloat16)
    tables = np.zeros((B, max_blocks), np.int32)
    nxt = 1
    for b in range(B):
        for i in range((ctx + BS - 1) // BS):
            tables[b, i] = nxt
            nxt = nxt % (NB - 2) + 1
    lens = jnp.full((B,), ctx, jnp.int32)
    blk = jnp.asarray(tables[np.arange(B), (ctx - 1) // BS])
    off = jnp.full((B,), (ctx - 1) % BS, jnp.int32)
    tables = jnp.asarray(tables)

    kp, vp, s = attn_32layers(q, kn, kp, vp, tables, lens, blk, off, B)
    jax.device_get(s)
    t0 = time.perf_counter()
    for _ in range(reps):
        kp, vp, s = attn_32layers(q, kn, kp, vp, tables, lens, blk, off, B)
    jax.device_get(s)
    dt = (time.perf_counter() - t0) / reps
    print(f"B={B} ctx={ctx}: {dt*1e3:.2f} ms / 32 kernel calls "
          f"({dt/L*1e6:.0f} us/call)", flush=True)


def main():
    for B, ctx in ((8, 101), (8, 480), (1, 101), (16, 101)):
        try:
            run(B, ctx)
        except Exception as e:  # noqa: BLE001
            print(f"B={B} ctx={ctx}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
