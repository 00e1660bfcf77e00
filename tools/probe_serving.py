"""Where does paged-serving wall time go?  Drives PagedServingEngine
directly (no Scheduler) on the real chip and times each phase separately:

  - prefill per row (dispatch + compute, synced)
  - fused step_n(chunk) decode with NO per-chunk snapshot (pure decode rate)
  - the same with a per-chunk snapshot (the Scheduler's pattern)

Every timing round-trips a value (axon's block_until_ready is a no-op).

  python tools/probe_serving.py [--bf16] [--chunk N] [--rows N]
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


def main():
    chunk = 8
    rows = 8
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    if "--rows" in sys.argv:
        rows = int(sys.argv[sys.argv.index("--rows") + 1])

    from __graft_entry__ import _flagship_config
    from tools.bench_serving import build_params, _quant_flag
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig

    max_new = 96
    cfg = _flagship_config()
    params = build_params(cfg, _quant_flag())
    eng = PagedServingEngine(
        params, cfg, eos_token_id=-7, pad_token_id=49954,
        pool_size=rows, block_size=64, num_blocks=8 + rows * 4,
        max_seq_len=512, max_new_tokens_cap=max_new,
        prompt_buckets=(128,),
        sampling=SamplingConfig.greedy(max_new_tokens=max_new),
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)

    def sync():
        jax.device_get(eng._state.gen_len)

    def fill_rows():
        for r in range(rows):
            eng.prefill_row(r, rng.integers(5, 30000, size=(100,)).astype(np.int32),
                            None, None, max_new)

    def drain_rows():
        eng.snapshot()
        for r in range(rows):
            eng.collect_row(r)

    # warm all programs
    fill_rows()
    eng.step_n(chunk)
    eng.step()
    eng.snapshot()
    sync()
    drain_rows()

    t0 = time.perf_counter()
    fill_rows()
    sync()
    t_prefill = time.perf_counter() - t0

    n_chunks = max_new // chunk - 1  # rows already hold 1 token from prefill
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        eng.step_n(chunk)
    sync()
    t_decode = time.perf_counter() - t0
    toks_nosnap = int(np.sum(jax.device_get(eng._state.gen_len)))

    # again, with a per-chunk snapshot (Scheduler pattern)
    drain_rows()
    fill_rows()
    sync()
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        eng.step_n(chunk)
        eng.snapshot()
    t_snap = time.perf_counter() - t0
    toks_snap = int(np.sum(jax.device_get(eng._state.gen_len)))

    # single fused chunk latency (dispatch + compute + sync), fresh rows so
    # no row hits its cap mid-measurement
    drain_rows()
    fill_rows()
    sync()
    lat = []
    for _ in range(5):
        t0 = time.perf_counter()
        eng.step_n(chunk)
        sync()
        lat.append(time.perf_counter() - t0)

    print(f"prefill {rows} rows (bucket 128): {t_prefill*1e3:.1f} ms total "
          f"({t_prefill/rows*1e3:.1f} ms/row)")
    print(f"decode no-snapshot: {n_chunks} chunks x {chunk} -> "
          f"{toks_nosnap - rows} tok in {t_decode:.3f}s = "
          f"{(toks_nosnap - rows)/t_decode:.1f} tok/s")
    print(f"decode + per-chunk snapshot: {toks_snap - rows} tok in "
          f"{t_snap:.3f}s = {(toks_snap - rows)/t_snap:.1f} tok/s "
          f"(snapshot adds {(t_snap - t_decode)/n_chunks*1e3:.1f} ms/chunk)")
    print(f"single chunk latency (synced): min {min(lat)*1e3:.1f} ms "
          f"median {sorted(lat)[2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
