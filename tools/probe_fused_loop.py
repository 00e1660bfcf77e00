"""Probe the fused-decode-loop compile footprint on the real chip.

Round-1 left the bf16 B>=2 fused decode loop rejected by the tunnel compile
helper with an estimated ~2GB above-live transient (DEVNOTES).  This tool
compiles decode-loop programs WITHOUT running them and prints
``memory_analysis()`` so the transient can be attributed and the fix
(per-layer KV flow, cache layout) validated by measurement instead of theory.

Usage:
  python tools/probe_fused_loop.py L B slots [xla]
e.g.
  python tools/probe_fused_loop.py 32 1 768      # known-good B1 program
  python tools/probe_fused_loop.py 16 8 256      # half-depth B8
  python tools/probe_fused_loop.py 32 8 256      # the rejected program
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    slots = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    if "xla" in sys.argv[4:]:
        from visualcla_tpu.ops.attention import set_attention_impl

        set_attention_impl("xla")

    import dataclasses

    from __graft_entry__ import _flagship_config
    from visualcla_tpu.engine.generate import DecodeState, Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import llama, visualcla

    cfg = _flagship_config()
    cfg = dataclasses.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, num_hidden_layers=L)
    )
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, dtype), jax.random.PRNGKey(0)
    )
    params = {"text": jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                   shapes["text"])}
    prompt = 128
    engine = Engine(params, cfg, eos_token_id=2, pad_token_id=49954,
                    max_seq_len=slots, prompt_buckets=(prompt,), dtype=dtype)
    s = SamplingConfig.greedy(max_new_tokens=slots - prompt - 8)
    cache = llama.init_kv_cache(cfg.text_config, B, slots, dtype)
    state = DecodeState(
        cache=cache,
        kv_valid=jnp.concatenate(
            [jnp.ones((B, prompt), bool), jnp.zeros((B, slots - prompt), bool)],
            axis=-1),
        cur_slot=jnp.int32(prompt),
        positions=jnp.full((B,), prompt, jnp.int32),
        gen_ids=jnp.zeros((B, s.max_new_tokens), jnp.int32),
        gen_len=jnp.int32(1),
        last_token=jnp.ones((B,), jnp.int32),
        finished=jnp.zeros((B,), bool),
        key=jax.random.PRNGKey(0),
        mu=jnp.full((B,), 2.0 * s.mirostat_tau, jnp.float32),
    )

    GB = 1024 ** 3
    weights_gb = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(params)) / GB
    cache_gb = sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(cache)) / GB
    print(f"L={L} B={B} slots={slots} weights={weights_gb:.2f}GB "
          f"cache={cache_gb:.2f}GB", flush=True)

    loop = jax.jit(engine._decode_loop_impl, static_argnames=("sampling",),
                   donate_argnames=("state",))
    for name, fn, args in [
        ("decode_step", jax.jit(engine._decode_step_impl,
                                static_argnames=("sampling",),
                                donate_argnames=("state",)),
         (params, state, s)),
        ("decode_loop", loop, (params, state, s, s.max_new_tokens)),
    ]:
        try:
            compiled = fn.lower(*args).compile()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: COMPILE FAILED: {str(e)[:200]}", flush=True)
            continue
        try:
            ma = compiled.memory_analysis()
            print(f"{name}: args={ma.argument_size_in_bytes/GB:.3f}GB "
                  f"out={ma.output_size_in_bytes/GB:.3f}GB "
                  f"alias={ma.alias_size_in_bytes/GB:.3f}GB "
                  f"temp={ma.temp_size_in_bytes/GB:.3f}GB", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: compiled, memory_analysis failed: {e}", flush=True)


if __name__ == "__main__":
    main()
