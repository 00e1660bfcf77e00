"""TTFT-only probe: raw uint8 frame -> device preprocess -> prefill (incl.
image encode) -> first token, p50 of N.  Same measured region as bench.py's
TTFT section but without the decode/batch8 sections, so prefill-routing
A/Bs (e.g. VISUALCLA_INT4_PREFILL=dequant vs the kernel default) turn
around in ~2 min each on the tunnel.

  python tools/probe_ttft.py [--quant int4] [--iters 7]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4",
                    choices=("bf16", "int8", "int4"))
    ap.add_argument("--iters", type=int, default=7)
    ap.add_argument("--max-seq", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.processor import device_preprocess

    engine, cfg = bench_mod.build_engine(args.max_seq, args.quant)
    rng = np.random.default_rng(0)
    input_ids = rng.integers(5, 30000, size=(1, 100)).astype(np.int32)
    img_start_pos = np.full((1,), 2, np.int32)
    frame_u8 = rng.integers(0, 256, size=(1, 480, 640, 3)).astype(np.uint8)
    preprocess = jax.jit(lambda u8: device_preprocess(u8, dtype=jnp.float32))
    sampling = SamplingConfig.greedy(max_new_tokens=8)

    # warm/compile
    pv = preprocess(jnp.asarray(frame_u8))
    st = engine.start(input_ids, pv, img_start_pos, sampling)
    bench_mod._sync(st.last_token)

    ttfts = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        pv = preprocess(jnp.asarray(frame_u8))
        st = engine.start(input_ids, pv, img_start_pos, sampling)
        bench_mod._sync(st.last_token)
        ttfts.append(time.perf_counter() - t0)
    print(json.dumps({
        "quant": args.quant,
        "prefill_routing": os.environ.get("VISUALCLA_INT4_PREFILL",
                                          "default"),
        "ttft_ms_p50": round(float(np.median(ttfts)) * 1e3, 1),
        "ttft_ms_all": [round(t * 1e3, 1) for t in ttfts],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
