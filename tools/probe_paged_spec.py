"""Speculative-decoding-in-the-pool cost probe (VERDICT r4 item 4).

Zeros-weights timing is honest for COST (step time is shape-bound) but not
for acceptance (a zeros model's argmax chain is constant, so n-gram drafts
trivially accept — the round-3 lesson).  So this probe measures the two
honest quantities and REPORTS THE MODEL, not a fake speedup:

  t_plain(B)  ms per plain fused decode step at occupancy B
  t_spec(B)   ms per speculative iteration (draft + (B, K+1) verify +
              acceptance bookkeeping)

Effective speedup at acceptance E[a] accepted drafts/iteration is
  (1 + E[a]) * t_plain / t_spec
and the break-even acceptance is t_spec/t_plain - 1.  The serving policy
(spec_max_active) is set from where break-even exceeds the realistic
prompt-lookup acceptance range (~0.3-1.5 accepted/iter on chat replay;
single-stream round-4 measured 1.6x end-to-end at int4 K=4).

  python tools/probe_paged_spec.py [--int8|--int4] [--k 4] [--pools 1,2,4,8]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    quant = "int4" if "--int4" in sys.argv else "int8"
    k = 4
    if "--k" in sys.argv:
        k = int(sys.argv[sys.argv.index("--k") + 1])
    pools = (1, 2, 4, 8)
    if "--pools" in sys.argv:
        pools = tuple(int(x) for x in
                      sys.argv[sys.argv.index("--pools") + 1].split(","))
    ctx = 512
    steps = 16

    from __graft_entry__ import _flagship_config
    from tools.bench_serving import build_params
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig

    cfg = _flagship_config()
    params = build_params(cfg, quant)
    rng = np.random.default_rng(0)
    rows = []
    for pool in pools:
        eng = PagedServingEngine(
            params, cfg, eos_token_id=-7, pad_token_id=49954,
            pool_size=pool, block_size=64,
            num_blocks=1 + pool * ((ctx + 1024 + 63) // 64 + 1),
            max_seq_len=ctx + 1024 + 64, max_new_tokens_cap=1024,
            prompt_buckets=(ctx,),
            sampling=SamplingConfig.greedy(max_new_tokens=1024),
            dtype=jnp.bfloat16, kv_quant="int8", spec_k=k,
            spec_max_active=pool,
        )
        for r in range(pool):
            eng.prefill_row(
                r, rng.integers(5, 30000, size=(ctx,)).astype(np.int32),
                None, None, 1024)

        def sync():
            np.asarray(jax.device_get(eng._state.gen_len))

        def time_fn(fn, n_dispatch=4):
            fn(); sync()  # compile+warm
            g0 = np.asarray(jax.device_get(eng._state.gen_len)).sum()
            t0 = time.perf_counter()
            for _ in range(n_dispatch):
                fn()
            sync()
            dt = (time.perf_counter() - t0) / n_dispatch
            g1 = np.asarray(jax.device_get(eng._state.gen_len)).sum()
            return dt * 1e3, (g1 - g0) / n_dispatch

        t_plain, tok_plain = time_fn(lambda: eng.step_n(steps))
        t_spec, tok_spec = time_fn(lambda: eng.spec_step_n(steps))
        # per-iteration costs: each dispatch runs `steps` iterations unless
        # early-exited; normalize by tokens for plain (1 tok/row/iter)
        plain_ms_iter = t_plain / max(tok_plain / pool, 1)
        spec_iters = max(tok_spec / pool / (k + 1), 1)  # zeros: full accept
        spec_ms_iter = t_spec / spec_iters
        ratio = spec_ms_iter / plain_ms_iter
        rows.append({
            "pool": pool, "quant": quant, "k": k,
            "plain_ms_per_step": round(plain_ms_iter, 2),
            "spec_ms_per_iter": round(spec_ms_iter, 2),
            "cost_ratio": round(ratio, 3),
            "breakeven_accept": round(max(ratio - 1, 0), 3),
            "speedup_at_1.0_accept": round(2 / ratio, 2),
            "speedup_at_0.5_accept": round(1.5 / ratio, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
        del eng
    print(json.dumps({"quant": quant, "k": k, "rows": rows}), flush=True)


if __name__ == "__main__":
    main()
