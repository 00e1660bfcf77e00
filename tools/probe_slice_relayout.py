"""Minimal repro for the nested-decode-loop weight-slice relayout temps.

Round-4 measurement (probe_fused_loop, nested+unroll, bf16 L=32 B=8): the
fused nested loop OOMs HBM by 2.33 GB and XLA's buffer dump attributes the
overrun to per-layer ``bf16[1,4096,4096]{1,2,0:T(8,128)(2,1)}`` HLO temps —
relayout copies of STATIC weight slices (so the round-3 "dynamic_index
relayout" theory was incomplete: the copy is a layout transpose, not a
gather artifact).  {1,2,0} = contraction dim minormost, i.e. XLA wants the
B=8 dot's rhs TRANSPOSED relative to the stacked (L, in, out) storage.

This probe isolates that: a while_loop over a fori_loop of L
dynamic_slice'd layers of a stacked weight (the traced-index form the real
decode loop uses — NOT unrolled static slices), h = h @ W_l, in two
storage orientations:

  a) stacked (L, I, O), dot contracting h's last with W's dim 1 (as stored
     by models/llama.py init);
  b) stacked (L, O, I), dot contracting h's last with W's dim 2 ("x @ W^T"
     orientation).

MEASURED RESULT (round 4, real chip): temp = 0.000 GB in BOTH orientations
— the minimal slice+matmul loop does NOT reproduce the copies.  The real
program's 32 MB temps are ``fusion.*.remat*`` clones, i.e. they arise from
XLA's HBM rematerializer interacting with the full per-layer body (flash
custom call + 7 weight matmuls), not from slicing or storage orientation
per se.  Documented in DEVNOTES (third-window investigation, round-4
closure); the flat step x layer loop — one layer's slices live at a time —
remains the correct mitigation for bf16 B>=2.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()

L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
D = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
STEPS = 64
GB = 1024 ** 3


def loop_a(w, h):  # w: (L, I, O)
    def body(c):
        h, i = c
        def layer(l, hh):
            wl = jax.lax.dynamic_slice(w, (l, 0, 0), (1, D, D))[0]
            return jnp.tanh(hh @ wl)
        return jax.lax.fori_loop(0, L, layer, h), i + 1
    return jax.lax.while_loop(lambda c: c[1] < STEPS, body, (h, 0))[0]


def loop_b(w, h):  # w: (L, O, I) — contract h's last with w's LAST dim
    def body(c):
        h, i = c
        def layer(l, hh):
            wl = jax.lax.dynamic_slice(w, (l, 0, 0), (1, D, D))[0]
            out = jax.lax.dot_general(
                hh, wl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(hh.dtype)
            return jnp.tanh(out)
        return jax.lax.fori_loop(0, L, layer, h), i + 1
    return jax.lax.while_loop(lambda c: c[1] < STEPS, body, (h, 0))[0]


def measure(name, fn):
    # non-constant weights (folding-proof) with tiny magnitude so tanh stays
    # in its linear region and the loop doesn't saturate to +-1 constants
    key = jax.random.PRNGKey(0)
    w = (jax.random.normal(key, (L, D, D), jnp.bfloat16) * 1e-2)
    h = jnp.ones((B, D), jnp.bfloat16)
    compiled = jax.jit(fn).lower(w, h).compile()
    ma = compiled.memory_analysis()
    # warm + time.  Sync via device_get of a scalar: under the axon tunnel
    # block_until_ready() can return before execution finishes (measured in
    # round 4 — a 125 ms loop "completed" in 1 ms; the following fetch then
    # stalled 11 s), so a value fetch is the only trustworthy barrier.
    out = compiled(w, h)
    jax.device_get(out[0, 0])
    t0 = time.perf_counter()
    out = compiled(w, h)
    jax.device_get(out[0, 0])
    dt = time.perf_counter() - t0
    per_step_us = dt / STEPS / L * 1e6
    print(f"{name}: temp={ma.temp_size_in_bytes/GB:.3f}GB "
          f"args={ma.argument_size_in_bytes/GB:.3f}GB "
          f"{per_step_us:.1f} us/layer-step", flush=True)
    return ma.temp_size_in_bytes


ta = measure("a (L,I,O) h@W ", loop_a)
tb = measure("b (L,O,I) h@W^T", loop_b)
print(f"relayout-temp delta: {(ta - tb)/GB:+.3f} GB "
      f"({'TRANSPOSED STORAGE WINS' if tb < ta else 'no difference'})")
