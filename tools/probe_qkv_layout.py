"""Probe XLA's weight-layout choices for the decode-step q/k/v projections.

A scan-over-layers decode program at batch >= 4 makes XLA relayout the
sliced q/k/v weights (transposed copies inside the loop body — copy.62/63
in the 7B B=8 paged-step HLO, ~2.8 ms/step at int8).  This probe compiles
three formulations of a minimal layer loop at flagship width and reports
(a) in-loop copy bytes found in the optimized HLO, (b) measured step time:

  1. separate q/k/v dots ((L, in, out) storage — today's layout)
  2. fused qkv dot ((L, in, 3*out) storage, split after)
  3. separate dots with k/v stored transposed ((L, out, in))

  python tools/probe_qkv_layout.py [--bf16] [--layers N] [--batch B]
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()

H, NKV, HD = 4096, 32, 128


def rope_like(x):  # stand-in for rope: cheap elementwise on (B, N, hd)
    return x * 0.5 + jnp.flip(x, axis=-1) * 0.5


def build(kind, L, int8):
    rng = np.random.default_rng(0)

    def w(shape):
        a = rng.standard_normal(shape).astype(np.float32) * 0.02
        if int8:
            s = np.abs(a).max(axis=-2, keepdims=True) / 127.0
            q = np.clip(np.round(a / s), -127, 127).astype(np.int8)
            return {"q": jnp.asarray(q), "scale": jnp.asarray(s)}
        return jnp.asarray(a, jnp.bfloat16)

    def mm(x, wt, transposed=False):
        if isinstance(wt, dict):
            q = wt["q"]
            if transposed:
                y = jax.lax.dot_general(x, q.astype(x.dtype),
                                        (((1,), (1,)), ((), ())))
                return y * wt["scale"][..., 0, :].astype(x.dtype)
            y = x @ q.astype(x.dtype)
            return y * wt["scale"][..., 0, :].astype(x.dtype)
        if transposed:
            return jax.lax.dot_general(x, wt.astype(x.dtype),
                                       (((1,), (1,)), ((), ())))
        return x @ wt.astype(x.dtype)

    if kind == "separate":
        params = {"q": w((L, H, H)), "k": w((L, H, H)), "v": w((L, H, H))}

        def layer(x, p):
            q = mm(x, p["q"]).reshape(-1, NKV, HD)
            k = mm(x, p["k"]).reshape(-1, NKV, HD)
            v = mm(x, p["v"]).reshape(-1, NKV, HD)
            return rope_like(q) + rope_like(k) * 0.1 + v * 0.01
    elif kind == "fused":
        params = {"qkv": w((L, H, 3 * H))}

        def layer(x, p):
            qkv = mm(x, p["qkv"])
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(-1, NKV, HD)
            k = k.reshape(-1, NKV, HD)
            v = v.reshape(-1, NKV, HD)
            return rope_like(q) + rope_like(k) * 0.1 + v * 0.01
    else:  # transposed k/v storage
        def wt(shape):
            x = w(shape)
            if isinstance(x, dict):
                return {"q": jnp.swapaxes(x["q"], -1, -2),
                        "scale": x["scale"]}
            return jnp.swapaxes(x, -1, -2)

        params = {"q": w((L, H, H)), "k": wt((L, H, H)), "v": wt((L, H, H))}

        def layer(x, p):
            q = mm(x, p["q"]).reshape(-1, NKV, HD)
            k = mm(x, p["k"], transposed=True).reshape(-1, NKV, HD)
            v = mm(x, p["v"], transposed=True).reshape(-1, NKV, HD)
            return rope_like(q) + rope_like(k) * 0.1 + v * 0.01

    return params, layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    L, B = args.layers, args.batch
    int8 = not args.bf16

    for kind in ("separate", "fused", "transposed"):
        params, layer = build(kind, L, int8)

        @jax.jit
        def step(params, h):
            def body(h, p):
                o = layer(h[:, 0, :], p)
                return h + o.reshape(B, 1, NKV * HD) * 1e-3, None

            h, _ = jax.lax.scan(body, h, params)
            return h

        h = jnp.zeros((B, 1, H), jnp.bfloat16)
        try:
            comp = step.lower(params, h).compile()
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: compile FAILED {str(e)[:100]}")
            continue
        txt = comp.as_text()
        # in-loop big copies: s8/bf16 copies of >= 1 MB
        copies = []
        for m in re.finditer(r"%copy[.\d]* = (s8|bf16)\[([\d,]+)\]", txt):
            dims = [int(d) for d in m.group(2).split(",")]
            bytes_ = int(np.prod(dims)) * (1 if m.group(1) == "s8" else 2)
            if bytes_ >= 1 << 20:
                copies.append(bytes_)
        out = step(params, h)
        jax.device_get(out)
        t0 = time.perf_counter()
        for _ in range(20):
            out = step(params, out)
        jax.device_get(out)
        dt = (time.perf_counter() - t0) / 20
        print(f"{kind:11s}: {dt*1e3:7.2f} ms/step  big-copies: "
              f"{len(copies)} x {sorted(set(c >> 20 for c in copies))} MiB",
              flush=True)


if __name__ == "__main__":
    main()
