"""Attribute the paged decode step's device time: compile the exact _step /
_step_n programs the serving engine dispatches (flagship size), print
``memory_analysis()``, and enumerate big copy/transpose ops in the optimized
HLO (the round-1 method that found the decode-loop cache relayout).

  python tools/probe_paged_step.py [--bf16] [--kvint8] [--run]
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()

DT_BYTES = {"bf16": 2, "f32": 4, "s8": 1, "s32": 4, "f16": 2, "pred": 1,
            "u32": 4, "s64": 8}


def big_ops(hlo: str, min_mb: float = 8.0):
    """(op, shape, MB) for copy/transpose/bitcast-convert ops over min_mb."""
    out = []
    for m in re.finditer(
            r"(\w+)\s*=\s*(\w+)\[([\d,]*)\][^ ]*\s+(copy|transpose)\(", hlo):
        dt, dims = m.group(2), m.group(3)
        if dt not in DT_BYTES or not dims:
            continue
        n = 1
        for d in dims.split(","):
            n *= int(d)
        mb = n * DT_BYTES[dt] / 1e6
        if mb >= min_mb:
            out.append((m.group(4), f"{dt}[{dims}]", mb))
    return out


def main():
    from __graft_entry__ import _flagship_config
    from tools.bench_serving import build_params
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig

    cfg = _flagship_config()
    params = build_params(cfg, _quant_flag())
    eng = PagedServingEngine(
        params, cfg, eos_token_id=-7, pad_token_id=49954,
        pool_size=8, block_size=64, num_blocks=64,
        max_seq_len=512, max_new_tokens_cap=256,
        prompt_buckets=(128,),
        sampling=SamplingConfig.greedy(max_new_tokens=96),
        kv_quant="int8" if "--kvint8" in sys.argv else "none",
        dtype=jnp.bfloat16,
    )
    tables = jnp.asarray(eng.tables)
    lens = jnp.asarray(np.full((eng.B,), 100, np.int32))

    for name, fn, args in (
        ("step", eng._step, (eng.params, eng._state, tables, lens,
                             eng.sampling)),
        ("step_n(8)", eng._step_n, (eng.params, eng._state, tables, lens,
                                    eng.sampling, 8)),
    ):
        try:
            compiled = fn.__wrapped__.lower(*args).compile()  # scoped(jit())
        except Exception as e:  # noqa: BLE001 — probe the rest anyway
            print(f"== {name}: COMPILE FAILED: {str(e)[:160]}")
            continue
        ma = compiled.memory_analysis()
        print(f"== {name}: temp {ma.temp_size_in_bytes/1e9:.2f} GB, "
              f"args {ma.argument_size_in_bytes/1e9:.2f} GB, "
              f"out {ma.output_size_in_bytes/1e9:.2f} GB")
        hlo = compiled.as_text()
        ops = big_ops(hlo)
        tot = sum(mb for _, _, mb in ops)
        print(f"   {len(ops)} copy/transpose ops >=8MB, {tot/1e3:.2f} GB total")
        from collections import Counter

        c = Counter((op, shape) for op, shape, _ in ops)
        for (op, shape), k in c.most_common(12):
            one = next(mb for o, s, mb in ops if (o, s) == (op, shape))
            print(f"   {k:3d}x {op:9s} {shape}  ({one:.0f} MB each)")

    if "--run" in sys.argv:
        import time

        rng = np.random.default_rng(0)

        def fill():
            for r in range(8):
                eng.prefill_row(
                    r, rng.integers(5, 30000, size=(100,)).astype(np.int32),
                    None, None, 256)

        fill()
        eng.step()
        jax.device_get(eng._state.gen_len)
        t0 = time.perf_counter()
        for _ in range(30):
            eng.step()
        jax.device_get(eng._state.gen_len)
        dt = time.perf_counter() - t0
        print(f"single-step x30 (B8): {dt/30*1e3:.1f} ms/step "
              f"= {8*30/dt:.1f} tok/s", flush=True)
        # fused chunks, both loop structures (step_n syncs lens per chunk)
        for impl in ("nested", "flat"):
            os.environ["VISUALCLA_PAGED_LOOP"] = impl
            try:
                eng.step_n(4)  # compile
            except Exception as e:  # noqa: BLE001
                print(f"step_n[{impl}]: COMPILE FAILED: {str(e)[:140]}")
                continue
            g0 = int(jax.device_get(eng._state.gen_len)[0])
            t0 = time.perf_counter()
            for _ in range(5):
                eng.step_n(8)
            dt = time.perf_counter() - t0
            g1 = int(jax.device_get(eng._state.gen_len)[0])
            steps = g1 - g0
            if steps:
                print(f"step_n[{impl}] x{steps} steps (B8): "
                      f"{dt/steps*1e3:.1f} ms/step = {8*steps/dt:.1f} tok/s",
                      flush=True)


if __name__ == "__main__":
    main()
