"""Probe the fused-decode-loop compile footprint on the real chip.

Round-1 left the bf16 B>=2 fused decode loop rejected by the tunnel compile
helper with an estimated ~2GB above-live transient (DEVNOTES).  This tool
compiles decode-loop programs WITHOUT running them and prints
``memory_analysis()`` so the transient can be attributed and the fix
(per-layer KV flow, cache layout) validated by measurement instead of theory.

Usage:
  python tools/probe_fused_loop.py L B slots [xla] [int8] [run]
e.g.
  python tools/probe_fused_loop.py 32 1 768      # known-good B1 program
  python tools/probe_fused_loop.py 16 8 256      # half-depth B8
  python tools/probe_fused_loop.py 32 8 256 run  # compile AND time the loop
  VISUALCLA_DECODE_LOOP=nested python tools/probe_fused_loop.py 32 8 256 int8 run

``run`` times the fused loop (tokens/s); ``int8`` uses int8 weights.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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

    int8 = "int8" in sys.argv[4:]
    kvint8 = "kvint8" in sys.argv[4:]
    do_run = "run" in sys.argv[4:]
    cfg = _flagship_config()
    cfg = dataclasses.replace(
        cfg, text_config=dataclasses.replace(cfg.text_config, num_hidden_layers=L)
    )
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, dtype), jax.random.PRNGKey(0)
    )
    if int8:
        from visualcla_tpu.checkpoint.serialize import flatten_tree, unflatten_tree
        from visualcla_tpu.ops.quantization import INT8_TEXT_LEAVES

        flat = flatten_tree(shapes["text"])
        out = {}
        for kk, s in flat.items():
            key = "text/" + kk
            if key in INT8_TEXT_LEAVES:
                ax = INT8_TEXT_LEAVES[key] % len(s.shape)
                sshape = tuple(1 if i == ax else d for i, d in enumerate(s.shape))
                out[kk] = {"q": jnp.zeros(s.shape, jnp.int8),
                           "scale": jnp.ones(sshape, jnp.float32)}
            else:
                out[kk] = jnp.zeros(s.shape, s.dtype)
        params = {"text": unflatten_tree(out)}
    else:
        params = {"text": jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                       shapes["text"])}
    prompt = 128
    engine = Engine(params, cfg, eos_token_id=2, pad_token_id=49954,
                    max_seq_len=slots, prompt_buckets=(prompt,), dtype=dtype)
    s = SamplingConfig.greedy(max_new_tokens=slots - prompt - 8)

    def make_state():
        cache = llama.init_kv_cache(cfg.text_config, B, slots, dtype,
                                    kv_quant="int8" if kvint8 else "none")
        return DecodeState(
            cache=cache,
            kv_valid=jnp.concatenate(
                [jnp.ones((B, prompt), bool),
                 jnp.zeros((B, slots - prompt), bool)], axis=-1),
            cur_slot=jnp.int32(prompt),
            positions=jnp.full((B,), prompt, jnp.int32),
            gen_ids=jnp.zeros((B, s.max_new_tokens), jnp.int32),
            gen_len=jnp.int32(1),
            last_token=jnp.ones((B,), jnp.int32),
            finished=jnp.zeros((B,), bool),
            key=jax.random.PRNGKey(0),
            mu=jnp.full((B,), 2.0 * s.mirostat_tau, jnp.float32),
        )

    state = make_state()
    cache = state.cache

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

    if do_run:
        import os
        import time

        impl = os.environ.get("VISUALCLA_DECODE_LOOP", "flat")
        opts = None
        flags = os.environ.get("VISUALCLA_XLA_OPTS", "")
        if flags:  # "k=v,k=v" -> compiler_options for the remote compile
            opts = dict(kv.split("=", 1) for kv in flags.split(","))
        fn = (engine._decode_loop_nested_impl if impl == "nested"
              else engine._decode_loop_impl)
        jitted = jax.jit(fn, static_argnames=("sampling",),
                         donate_argnames=("state",))
        lowered = jitted.lower(engine.params, state, s, s.max_new_tokens)
        compiled = lowered.compile(opts) if opts else lowered.compile()
        try:
            ma = compiled.memory_analysis()
            print(f"run[{impl}] opts={opts}: temp="
                  f"{ma.temp_size_in_bytes/GB:.3f}GB", flush=True)
        except Exception:  # noqa: BLE001
            pass
        st = compiled(engine.params, state, s.max_new_tokens)
        np.asarray(jax.device_get(st.gen_ids[:, -1]))  # warm
        del st, state
        state = make_state()
        np.asarray(jax.device_get(state.last_token))
        t0 = time.perf_counter()
        st = compiled(engine.params, state, s.max_new_tokens)
        np.asarray(jax.device_get(st.gen_ids[:, -1]))
        dt = time.perf_counter() - t0
        n = int(st.gen_len) - 1
        print(f"run[{impl}]: {B * n / dt:.2f} tok/s aggregate "
              f"({n} steps x B{B} in {dt:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
