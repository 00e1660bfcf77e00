"""Serving throughput: concurrent requests through the continuous-batching
scheduler on the real chip (paged pool, int8 weights by default).

Measures aggregate generated tokens/s with fused multi-step decode chunks
(Scheduler step_chunk) vs single-step driving — under the axon tunnel every
dispatch costs ~10ms, so chunking is the difference between dispatch-bound
and compute-bound serving.

  python tools/bench_serving.py [n_requests] [max_new] [--bf16|--int4] [--chunk N]
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


def build_params(cfg, quant: str):
    """Zeros-weights text tower at the requested tier ("bf16" | "int8" |
    "int4" grouped-v2) — timing is weight-shape-bound, content-free."""
    from visualcla_tpu.models import visualcla

    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    if quant == "bf16":
        return {"text": jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes["text"])}
    from visualcla_tpu.checkpoint.serialize import flatten_tree, unflatten_tree
    from visualcla_tpu.ops.quantization import INT8_TEXT_LEAVES

    GROUP = 128
    out = {}
    for kk, s in flatten_tree(shapes["text"]).items():
        key = "text/" + kk
        if (quant == "int4" and key in INT8_TEXT_LEAVES
                and key != "text/embed_tokens"):
            lead, in_dim, odim = s.shape[:-2], s.shape[-2], s.shape[-1]
            g = in_dim // GROUP
            out[kk] = {
                "q": jnp.zeros((*lead, g, GROUP // 2, odim), jnp.uint8),
                "scale": jnp.ones((*lead, g, odim), jnp.float32),
            }
        elif key in INT8_TEXT_LEAVES:
            ax = INT8_TEXT_LEAVES[key] % len(s.shape)
            sshape = tuple(1 if i == ax else d for i, d in enumerate(s.shape))
            out[kk] = {"q": jnp.zeros(s.shape, jnp.int8),
                       "scale": jnp.ones(sshape, jnp.float32)}
        else:
            out[kk] = jnp.zeros(s.shape, s.dtype)
    return {"text": unflatten_tree(out)}


def _quant_flag() -> str:
    if "--bf16" in sys.argv:
        return "bf16"
    if "--int4" in sys.argv:
        return "int4"
    return "int8"


def measure(quant: str = "int8", n_req: int = 64, max_new: int = 96,
            chunk: int = 16, pool: int = 32, params=None):
    """Measure end-to-end aggregate tok/s through the Scheduler + paged
    engine (warm run after one compile run).  Returns
    (tok_s, total_tokens, wall_seconds, stats_delta).  Shared by the CLI
    below and bench.py's serving section."""
    import queue

    from __graft_entry__ import _flagship_config
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.server import Request, Scheduler

    cfg = _flagship_config()
    if params is None:
        params = build_params(cfg, quant)

    eng = PagedServingEngine(
        params, cfg, eos_token_id=-7, pad_token_id=49954,
        pool_size=pool, block_size=64, num_blocks=16 + pool * 6,
        max_seq_len=512, max_new_tokens_cap=max_new,
        prompt_buckets=(128,),
        sampling=SamplingConfig.greedy(max_new_tokens=max_new),
        dtype=jnp.bfloat16,
    )
    sched = Scheduler(eng, step_chunk=chunk)
    rng = np.random.default_rng(0)

    def run_batch():
        outs = []
        t0 = time.perf_counter()
        for _ in range(n_req):
            q: queue.Queue = queue.Queue()
            sched.submit(Request(
                input_ids=rng.integers(5, 30000, size=(100,)).astype(np.int32),
                pixel_values=None, img_start_pos=None,
                max_new_tokens=max_new, out=q))
            outs.append(q)
        total = 0
        for q in outs:
            while True:
                kind, payload = q.get(timeout=1200)
                if kind == "done":
                    total += len(payload)
                    break
                if kind == "error":
                    raise RuntimeError(payload)
        return total, time.perf_counter() - t0

    try:
        run_batch()  # warm/compile
        s0 = sched.stats()
        total, dt = run_batch()
        s1 = sched.stats()
        d = {k: s1[k] - s0[k] for k in s1}
        return total / dt, total, dt, d
    finally:
        sched.stop()


def measure_slo(quant: str = "int8", pool: int = 8, ctx: int = 512,
                max_new: int = 96, n_req: int = 0, step_chunk: int = 8,
                prefill_chunk: int = 256, kv_quant: str = "int8",
                params=None, eng=None, spec_k: int = 0):
    """Per-request latency SLOs under load (VERDICT r4 item 2).

    Closed-loop at concurrency == pool: `pool` client threads each submit a
    ctx-token request, timestamp every ('token', ...) arrival on their own
    queue, and immediately submit the next — the pool stays saturated, and a
    new request's TTFT includes the admission path through busy decode
    (chunked-prefill interleave when prefill_chunk > 0).  All stamps are
    client-side (queue arrival), so inter-token gaps include the scheduler's
    step_chunk batching — the fused-dispatch latency/throughput trade is IN
    the number, not hidden.

    Returns (metrics dict, engine) — pass the engine back in to reuse its
    compiled programs across Scheduler variants (chunk A/Bs)."""
    import queue
    import threading

    from __graft_entry__ import _flagship_config
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.server import Request, Scheduler

    cfg = _flagship_config()
    n_req = n_req or 3 * pool
    if eng is None:
        if params is None:
            params = build_params(cfg, quant)
        blocks_per_row = (ctx + max_new + 63) // 64 + 1
        eng = PagedServingEngine(
            params, cfg, eos_token_id=-7, pad_token_id=49954,
            pool_size=pool, block_size=64,
            num_blocks=1 + pool * blocks_per_row,
            max_seq_len=ctx + max_new + 64, max_new_tokens_cap=max_new,
            prompt_buckets=(min(256, ctx), ctx),
            sampling=SamplingConfig.greedy(max_new_tokens=max_new),
            dtype=jnp.bfloat16, kv_quant=kv_quant,
            spec_k=spec_k, spec_max_active=pool,
        )
    sched = Scheduler(eng, step_chunk=step_chunk, prefill_chunk=prefill_chunk)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(5, 30000, size=(ctx,)).astype(np.int32)
               for _ in range(8)]
    lock = threading.Lock()
    results = []  # (submit_t, [token_ts...])
    remaining = [n_req]

    def client():
        while True:
            with lock:
                if remaining[0] <= 0:
                    return
                remaining[0] -= 1
                i = remaining[0]
            q: queue.Queue = queue.Queue()
            t0 = time.perf_counter()
            sched.submit(Request(
                input_ids=prompts[i % len(prompts)], pixel_values=None,
                img_start_pos=None, max_new_tokens=max_new, out=q))
            stamps = []
            while True:
                # cold compiles of a new (bucket, chunk, pool) program set
                # through the tunnel helper can exceed 20 min — a shorter
                # timeout kills the warm wave and wedges the engine
                kind, payload = q.get(timeout=2700)
                if kind == "token":
                    stamps.append(time.perf_counter())
                elif kind == "done":
                    break
                else:
                    raise RuntimeError(payload)
            with lock:
                results.append((t0, stamps))

    def run_wave():
        results.clear()
        remaining[0] = n_req
        threads = [threading.Thread(target=client) for _ in range(pool)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return time.perf_counter() - t0

    try:
        run_wave()  # warm/compile every program (prefill buckets, chunks)
        wall = run_wave()
        ttfts = np.array([s[0] - t0 for t0, s in results if s]) * 1e3
        gaps = np.concatenate([np.diff(s) for _, s in results
                               if len(s) > 1]) * 1e3
        total = sum(len(s) for _, s in results)
        st = sched.stats()
        return {
            "quant": quant, "pool": pool, "ctx": ctx, "max_new": max_new,
            "n_req": len(results), "step_chunk": step_chunk,
            "prefill_chunk": prefill_chunk, "kv_quant": kv_quant,
            "spec_k": spec_k, "spec_dispatches": st.get("spec_dispatches", 0),
            "ttft_ms_p50": round(float(np.percentile(ttfts, 50)), 1),
            "ttft_ms_p95": round(float(np.percentile(ttfts, 95)), 1),
            "intertok_ms_p50": round(float(np.percentile(gaps, 50)), 2),
            "intertok_ms_p95": round(float(np.percentile(gaps, 95)), 2),
            "agg_tok_s": round(total / wall, 1),
        }, eng
    finally:
        sched.stop()


def slo_main():
    """--slo [--pool N] [--ctx N] [--int4]: print the SLO table rows for one
    engine config, A/B-ing chunked admission and step_chunk."""
    import json

    pool = 8
    if "--pool" in sys.argv:
        pool = int(sys.argv[sys.argv.index("--pool") + 1])
    ctx = 512
    if "--ctx" in sys.argv:
        ctx = int(sys.argv[sys.argv.index("--ctx") + 1])
    quant = _quant_flag()
    eng = None
    variants = [dict(step_chunk=8, prefill_chunk=256),
                dict(step_chunk=8, prefill_chunk=0),
                dict(step_chunk=1, prefill_chunk=256)]
    if "--quick" in sys.argv:
        variants = variants[:1]
    spec_k = 0
    if "--spec" in sys.argv:
        # Scheduler-path spec validation: zeros weights make acceptance
        # ~full, so treat the numbers as the FULL-ACCEPT UPPER BOUND of
        # speculative serving, not an expected-production figure
        spec_k = 4
        eng = None  # spec engine is a different construction
    for v in variants:
        m, eng = measure_slo(quant, pool=pool, ctx=ctx, eng=eng,
                             spec_k=spec_k, **v)
        print(json.dumps(m), flush=True)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_req = int(args[0]) if args else 12
    max_new = int(args[1]) if len(args) > 1 else 96
    chunk = 8
    if "--chunk" in sys.argv:
        chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
    pool = 8
    if "--pool" in sys.argv:
        pool = int(sys.argv[sys.argv.index("--pool") + 1])

    tok_s, total, dt, d = measure(_quant_flag(), n_req, max_new, chunk, pool)
    print(f"serving[chunk={chunk},{_quant_flag()}]: {tok_s:.1f} tok/s "
          f"aggregate ({total} tokens, {n_req} reqs in {dt:.2f}s)",
          flush=True)
    print("loop attribution: "
          f"step {d['t_step']:.2f}s ({d['chunk_dispatches']} chunks + "
          f"{d['single_steps']} singles), "
          f"snapshot {d['t_snapshot']:.2f}s, "
          f"prefill {d['t_prefill']:.2f}s ({d['prefills']}), "
          f"collect {d['t_collect']:.2f}s ({d['collects']}), "
          f"stream {d['t_stream']:.2f}s, "
          f"iters {d['iterations']} (idle {d['idle_sleeps']})", flush=True)


def stall():
    """--stall: max inter-token gap seen by a RUNNING stream while a long
    prompt is admitted — sync admission stalls it for the whole prompt
    forward; chunked admission (Scheduler prefill_chunk) bounds the stall to
    one chunk.  Prints both so the improvement is measured, not asserted."""
    import queue
    import threading

    from __graft_entry__ import _flagship_config
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.server import Request, Scheduler

    cfg = _flagship_config()
    params = build_params(cfg, _quant_flag())
    long_len = 1000  # overflow-bucketed long prompt
    rng = np.random.default_rng(0)

    def one(prefill_chunk):
        eng = PagedServingEngine(
            params, cfg, eos_token_id=-7, pad_token_id=49954,
            pool_size=4, block_size=64, num_blocks=48,
            max_seq_len=2048, max_new_tokens_cap=64,
            prompt_buckets=(128, 256, 512, 1024),
            sampling=SamplingConfig.greedy(max_new_tokens=64),
            dtype=jnp.bfloat16,
        )
        sched = Scheduler(eng, step_chunk=1, prefill_chunk=prefill_chunk)
        try:
            sq: queue.Queue = queue.Queue()
            sched.submit(Request(
                input_ids=rng.integers(5, 30000, size=(100,)).astype(np.int32),
                pixel_values=None, img_start_pos=None,
                max_new_tokens=64, out=sq))
            stamps, done = [], None
            lq: queue.Queue = queue.Queue()

            def inject():
                time.sleep(0.25)  # let the stream reach steady state
                sched.submit(Request(
                    input_ids=rng.integers(
                        5, 30000, size=(long_len,)).astype(np.int32),
                    pixel_values=None, img_start_pos=None,
                    max_new_tokens=8, out=lq))
            threading.Thread(target=inject, daemon=True).start()
            while True:
                kind, payload = sq.get(timeout=1200)
                stamps.append(time.perf_counter())
                if kind == "done":
                    break
                if kind == "error":
                    raise RuntimeError(payload)
            while True:  # drain the long request too
                kind, payload = lq.get(timeout=1200)
                if kind in ("done", "error"):
                    break
            gaps = np.diff(stamps)
            return float(gaps.max() * 1e3), float(np.median(gaps) * 1e3)
        finally:
            sched.stop()

    one(0)  # warm every program (sync prefill for the long bucket)
    sync_max, sync_med = one(0)
    one(256)  # warm the chunk programs
    ch_max, ch_med = one(256)
    print(f"admission stall (1000-tok prompt injected into a live stream):\n"
          f"  sync    prefill: max gap {sync_max:7.1f} ms (median step {sync_med:.1f} ms)\n"
          f"  chunked prefill: max gap {ch_max:7.1f} ms (median step {ch_med:.1f} ms)",
          flush=True)


if __name__ == "__main__":
    if "--stall" in sys.argv:
        stall()
    elif "--slo" in sys.argv:
        slo_main()
    else:
        main()
