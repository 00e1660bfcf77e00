"""Fused contiguous decode-loop throughput at arbitrary batch (round-4
verdict item 10: B=16 datapoints showing where the HBM/KV ceiling bends,
feeding serving-pool sizing).

Same measurement as bench.py's batch-8 section (hand-built post-prefill
DecodeState, zeros weights — decode timing is weight-shape-bound), at a
configurable batch.

  python tools/probe_fused_batch.py --batch 16 [--int4|--bf16] [--seq 256]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--prompt", type=int, default=128)
    ap.add_argument("--int4", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()
    quant = "int4" if args.int4 else ("bf16" if args.bf16 else "int8")

    from __graft_entry__ import _flagship_config
    from tools.bench_serving import build_params
    from visualcla_tpu.engine.generate import DecodeState, Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import llama

    cfg = _flagship_config()
    params = build_params(cfg, quant)
    B, seq, prompt = args.batch, args.seq, args.prompt
    eng = Engine(params, cfg, eos_token_id=2, pad_token_id=49954,
                 max_seq_len=seq, prompt_buckets=(prompt,), dtype=jnp.bfloat16)
    smp = SamplingConfig.greedy(max_new_tokens=seq - prompt - 8)

    def fresh_state():
        cache = llama.init_kv_cache(cfg.text_config, B, seq, jnp.bfloat16)
        kv_valid = jnp.concatenate(
            [jnp.ones((B, prompt), bool), jnp.zeros((B, seq - prompt), bool)],
            axis=-1)
        return DecodeState(
            cache=cache, kv_valid=kv_valid, cur_slot=jnp.int32(prompt),
            positions=jnp.full((B,), prompt, jnp.int32),
            gen_ids=jnp.zeros((B, smp.max_new_tokens), jnp.int32),
            gen_len=jnp.int32(1), last_token=jnp.ones((B,), jnp.int32),
            finished=jnp.zeros((B,), bool), key=jax.random.PRNGKey(0),
            mu=jnp.full((B,), 2.0 * smp.mirostat_tau, jnp.float32))

    st = eng._decode_loop(eng.params, fresh_state(), smp, smp.max_new_tokens)
    jax.device_get(st.gen_ids[:, -1])  # compile + warm
    del st
    st = fresh_state()
    jax.device_get(st.last_token)
    t0 = time.perf_counter()
    st = eng._decode_loop(eng.params, st, smp, smp.max_new_tokens)
    jax.device_get(st.gen_ids[:, -1])
    dt = time.perf_counter() - t0
    n = int(st.gen_len) - 1
    print(f"fused B={B} {quant}: {B * n / dt:.1f} tok/s aggregate "
          f"({n} steps in {dt:.2f}s, {dt / n * 1e3:.2f} ms/step)", flush=True)


if __name__ == "__main__":
    main()
