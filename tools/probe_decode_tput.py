"""Minimal fused-decode throughput probe: one engine, one fused loop, one
number.  For quick A/Bs (int4 tile geometry, unpack modes) against the
headline B1 decode tok/s without running the whole driver bench.

  python tools/probe_decode_tput.py [--quant int4] [--tokens 256] [--b 1]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--b", type=int, default=1)
    args = ap.parse_args()

    from bench import _sync, build_engine
    from visualcla_tpu.engine.sampling import SamplingConfig

    engine, cfg = build_engine(128 + args.tokens + 8, args.quant)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, size=(args.b, 100)).astype(np.int32)
    sampling = SamplingConfig.greedy(max_new_tokens=args.tokens)

    st = engine.start(ids, None, None, sampling)
    st = engine._decode_loop(engine.params, st, sampling, args.tokens)
    _sync(st.gen_ids[:, -1])  # compile + warm
    st = engine.start(ids, None, None, sampling)
    _sync(st.last_token)
    t0 = time.perf_counter()
    st = engine._decode_loop(engine.params, st, sampling, args.tokens)
    _sync(st.gen_ids[:, -1])
    dt = time.perf_counter() - t0
    n = (int(st.gen_len) - 1) * args.b
    print(json.dumps({
        "quant": args.quant, "b": args.b,
        "tile_env": os.environ.get("VISUALCLA_INT4_TILE"),
        "tok_s": round(n / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
