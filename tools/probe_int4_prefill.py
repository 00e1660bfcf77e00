"""Prefill-shape (T~128) matmul path shootout: where does the int4 TTFT
gap to int8 come from, and which int4 path is fastest at prefill token
counts?  (Round-4 verdict item 2 remainder: int4 TTFT within ~5 ms of int8.)

The iteration loop runs INSIDE one jit program (lax.scan with a sequencing
carry) — per-dispatch host overhead through the axon tunnel is ~1 ms, far
above these matmuls, so per-call timing is meaningless (the first version
of this probe measured every path at the same 1 ms floor).

Paths per 7B matmul shape at T tokens:
  kernel   - the Pallas int4 kernel (current default for T <= 256)
  dequant  - dequantize to ONE bf16 temp + plain dot
  int8     - raw int8 dot with fused operand convert + post scale (reference
             tier; the TTFT target)
  bf16     - plain bf16 dot (the floor: pure MXU cost at this T)

  python tools/probe_int4_prefill.py [--tokens 128] [--iters 128]
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

enable_compilation_cache()

SHAPES = [("qkv/o", 4096, 4096), ("gate/up", 4096, 11008),
          ("down", 11008, 4096), ("lm_head", 4096, 50048)]
GS = 128


@functools.partial(jax.jit, static_argnames=("fn", "iters"))
def _loop(x, fn, iters):
    def body(c, _):
        y = fn(c)
        # fold a scalar of y back into x: forces sequencing, keeps shape
        return x * (1.0 + 0.0 * jnp.sum(y).astype(x.dtype)), ()

    c, _ = jax.lax.scan(body, x, None, length=iters)
    return c


def timeit(fn, x, iters):
    jax.device_get(_loop(x, fn, iters))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(_loop(x, fn, iters))
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--iters", type=int, default=128)
    args = ap.parse_args()
    T = args.tokens
    rng = np.random.default_rng(0)

    from visualcla_tpu.ops import quantization as q
    from visualcla_tpu.ops.pallas.int4_matmul import int4_matmul

    def kernel_path(x, w4):
        return int4_matmul(x, w4["q"], w4["scale"], None, variant="group")

    def scratch_path(x, w4):
        return int4_matmul(x, w4["q"], w4["scale"], None, variant="scratch")

    def tiled_path(x, w4, tile=None):
        return int4_matmul(x, w4["q"], w4["scale"], None, variant="tiled",
                           tile=tile)

    def dequant_path(x, w4):
        return x @ q.dequantize(w4, x.dtype)

    def int8_path(x, w8):
        return (x @ w8["q"].astype(x.dtype)) * w8["scale"][..., 0, :].astype(
            x.dtype)

    def bf16_path(x, wb):
        return x @ wb

    totals = {}
    for name, din, dout in SHAPES:
        w = (rng.standard_normal((din, dout)) * 0.02).astype(np.float32)
        w4 = q.device_put_quantized(q.quantize_grouped(w, group=GS))
        w8 = q.device_put_quantized(q.quantize(w))
        wb = jnp.asarray(w, jnp.bfloat16)
        x = jnp.asarray((rng.standard_normal((T, din))).astype(np.float32),
                        dtype=jnp.bfloat16)

        paths = {
            "kernel": functools.partial(kernel_path, w4=w4),
            "scratch": functools.partial(scratch_path, w4=w4),
            "tiled": functools.partial(tiled_path, w4=w4),
            "dequant": functools.partial(dequant_path, w4=w4),
            "int8": functools.partial(int8_path, w8=w8),
            "bf16": functools.partial(bf16_path, wb=wb),
        }
        if T > 256:  # whole-x forms exceed their VMEM block past MAX_TOKENS
            paths.pop("kernel")
            paths.pop("scratch")
            for to in (256, 384, 512, 768):
                paths[f"tiled{to}"] = functools.partial(
                    tiled_path, w4=w4, tile=to)
        row = {}
        for pname, fn in paths.items():
            try:
                row[pname] = timeit(fn, x, args.iters)
            except Exception as e:  # noqa: BLE001
                row[pname] = float("nan")
                print(f"  {name} {pname}: FAILED {str(e)[:100]}", flush=True)
        print(f"T={T} {name:8s} " + "  ".join(
            f"{k} {v:8.1f}us" for k, v in row.items()), flush=True)
        for k, v in row.items():
            totals[k] = totals.get(k, 0.0) + v * (
                4 if name == "qkv/o" else 2 if name == "gate/up"
                else 1 if name == "down" else 1 / 32)

    print("\nper-7B-forward totals (32 x (4*qkvo + 2*gateup + down) "
          "+ lm_head):")
    for k, v in totals.items():
        print(f"  {k}: {v*32/1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
