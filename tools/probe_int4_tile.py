"""On-chip tile-size + unpack-mode probe for ops/pallas/int4_matmul.py (v5e).

The kernel grids over output tiles only; `_pick_tile` sizes the tile under a
VMEM budget.  This probe times each 7B matmul shape at several tile widths
and both in-kernel nibble-decode forms ("shift" arithmetic vs "xor"
excess-8), with the iteration loop INSIDE one jit program (a lax.scan whose
carry perturbs x each step, forcing sequential execution) so ONE dispatch
amortizes over the whole loop.

MEASUREMENT HYGIENE (learned 2026-08-19 the hard way): per-dispatch host
overhead through the axon tunnel is ~1 ms when the single CPU core is
loaded (another process at 85% inflated a 33 us kernel to 450-2200 us with
4.5x run-to-run noise).  So (a) never run this concurrently with anything
CPU-bound, (b) use >=512 in-program iterations so residual dispatch cost is
<2 us/iter, (c) sanity-check the auto row against the full-model decode
trace (33.2 us/call avg across these shapes, round 3).

  python tools/probe_int4_tile.py [--iters 512] [--tiles] [--batch 1]

Default probes unpack modes at the auto tile only; --tiles adds the tile
sweep (more compiles through the slow remote service).
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache
from visualcla_tpu.ops.quantization import quantize_grouped, device_put_quantized
from visualcla_tpu.ops.pallas.int4_matmul import int4_matmul, _pick_tile

enable_compilation_cache()

# (name, in_dim, out_dim) — the four distinct 7B decode matmul shapes
SHAPES = [
    ("qkv/o", 4096, 4096),
    ("gate/up", 4096, 11008),
    ("down", 11008, 4096),
    ("lm_head", 4096, 50048),
]


@functools.partial(jax.jit, static_argnames=("tile", "unpack", "iters"))
def _run(x, qd, *, tile, unpack, iters):
    def body(c, _):
        y = int4_matmul(c, qd["q"], qd["scale"], tile=tile, unpack=unpack)
        # fold a scalar of y back into x: forces sequencing, keeps shape
        return x * (1.0 + 0.0 * jnp.sum(y)), ()
    c, _ = jax.lax.scan(body, x, None, length=iters)
    return c


def bench_shape(name, in_dim, out_dim, tiles, unpacks, iters, B=1):
    rng = np.random.default_rng(0)
    w = (rng.standard_normal((in_dim, out_dim)) * 0.02).astype(np.float32)
    q = device_put_quantized(quantize_grouped(w))
    x0 = jnp.asarray(rng.standard_normal((B, in_dim)).astype(np.float32))
    mb = q["q"].size / 2**20 + q["scale"].size * 4 / 2**20
    G, gsh, out = q["q"].shape[-3:]

    for unpack in unpacks:
        for tile in tiles:
            eff = tile or _pick_tile(G, gsh, out)
            # skip tiles the kernel's VMEM plan would reject (scoped OOM)
            if 2 * G * (gsh + 4) * eff > 14 * 2**20:
                continue
            try:
                jax.device_get(_run(x0, q, tile=tile, unpack=unpack,
                                    iters=iters))  # compile + warm
            except Exception as e:  # noqa: BLE001
                print(f"{name:8s} {unpack:5s} tile={eff:5d}: FAILED "
                      f"({str(e)[:120]})", flush=True)
                continue
            t0 = time.perf_counter()
            jax.device_get(_run(x0, q, tile=tile, unpack=unpack, iters=iters))
            us = (time.perf_counter() - t0) / iters * 1e6
            print(f"{name:8s} {unpack:5s} in={in_dim:5d} out={out_dim:5d} "
                  f"tile={eff:5d}{' (auto)' if tile is None else '       '}: "
                  f"{us:7.1f} us ({mb / us * 1e3:5.0f} GB/s eff)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--tiles", action="store_true",
                    help="sweep tile widths too (default: auto tile only)")
    args = ap.parse_args()
    print("backend:", jax.default_backend())
    for name, i, o in SHAPES:
        tiles = ([t for t in (256, 512, 1024, 2048) if t <= o] + [None]
                 if args.tiles else [None])
        bench_shape(name, i, o, tiles, ("xor", "msb"), args.iters,
                    B=args.batch)


if __name__ == "__main__":
    main()
