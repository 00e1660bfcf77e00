"""Attribute the paged B=8 decode step's device time by ablation: time the
full _step program against variants with (a) argmax-only sampling, (b) the
attention kernel skipped (zeros), (c) bare layer matmuls.  All at flagship
size on the real chip.

  python tools/probe_paged_attrib.py [--bf16]
"""
from __future__ import annotations

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


def main():
    from __graft_entry__ import _flagship_config
    from tools.bench_serving import build_params, _quant_flag
    from visualcla_tpu.engine import paged as pg
    from visualcla_tpu.engine.paged import PagedServingEngine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import llama

    cfg = _flagship_config()
    params = build_params(cfg, _quant_flag())
    eng = PagedServingEngine(
        params, cfg, eos_token_id=-7, pad_token_id=49954,
        pool_size=8, block_size=64, num_blocks=64,
        max_seq_len=512, max_new_tokens_cap=256,
        prompt_buckets=(128,),
        sampling=SamplingConfig.greedy(max_new_tokens=256),
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    for r in range(8):
        eng.prefill_row(r, rng.integers(5, 30000, size=(100,)).astype(np.int32),
                        None, None, 256)
    tables = jnp.asarray(eng.tables)
    lens = jnp.asarray(eng.ctx_len + 1)
    state = eng._state
    tcfg = cfg.text_config

    def time_fn(name, fn, *args, reps=20):
        try:
            out = fn(*args)  # compile
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {str(e)[:120]}")
            return
        jax.device_get(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.device_get(jax.tree.leaves(out)[0])
        dt = (time.perf_counter() - t0) / reps
        print(f"{name}: {dt*1e3:.2f} ms", flush=True)

    # (a) full step minus sampling: forward + logits + argmax
    @jax.jit
    def fwd_logits_argmax(params, st, tables, lens):
        run, blk, off, lens_attn = eng._append_meta(st, tables, lens)
        embeds = llama.embed(params["text"], st.last_token[:, None])
        hidden, kp, vp, ks, vs = pg.paged_decode_forward(
            params["text"], tcfg, embeds, st.positions,
            st.k_pool, st.v_pool, tables, blk, off, lens_attn,
            st.k_scales, st.v_scales)
        logits = llama.logits(params["text"], hidden)[:, 0]
        return jnp.argmax(logits, -1), kp, vp

    # (b) forward only, no logits
    @jax.jit
    def fwd_only(params, st, tables, lens):
        run, blk, off, lens_attn = eng._append_meta(st, tables, lens)
        embeds = llama.embed(params["text"], st.last_token[:, None])
        hidden, kp, vp, ks, vs = pg.paged_decode_forward(
            params["text"], tcfg, embeds, st.positions,
            st.k_pool, st.v_pool, tables, blk, off, lens_attn,
            st.k_scales, st.v_scales)
        return jnp.sum(hidden), kp, vp

    # (c) layers with attention replaced by zeros (matmul floor)
    def zero_append(q, kn, vn, kp, vp, *a, **kw):
        return jnp.zeros_like(q), kp, vp, None, None

    @jax.jit
    def fwd_noattn(params, st, tables, lens):
        run, blk, off, lens_attn = eng._append_meta(st, tables, lens)
        embeds = llama.embed(params["text"], st.last_token[:, None])
        orig = pg._paged_append
        pg._paged_append = zero_append
        try:
            hidden, kp, vp, ks, vs = pg.paged_decode_forward(
                params["text"], tcfg, embeds, st.positions,
                st.k_pool, st.v_pool, tables, blk, off, lens_attn,
                st.k_scales, st.v_scales)
        finally:
            pg._paged_append = orig
        return jnp.sum(hidden), kp, vp

    # the real engine step via its public dispatch (state donation makes
    # lower-level repeat timing awkward; use the step loop)
    eng.step()
    jax.device_get(eng._state.gen_len)
    t0 = time.perf_counter()
    for _ in range(20):
        eng.step()
    jax.device_get(eng._state.gen_len)
    print(f"full step (engine.step): {(time.perf_counter()-t0)/20*1e3:.2f} ms",
          flush=True)

    time_fn("fwd+logits+argmax", fwd_logits_argmax, eng.params, eng._state,
            tables, lens)
    time_fn("fwd only", fwd_only, eng.params, eng._state, tables, lens)
    time_fn("fwd, attention zeroed", fwd_noattn, eng.params, eng._state,
            tables, lens)


if __name__ == "__main__":
    main()
