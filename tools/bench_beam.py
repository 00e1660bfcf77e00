"""Measure fused device-side beam search vs greedy on the real chip.

Round-1 review: host-driven beam paid a tunnel round trip per step; the
target is beam wall-clock within ~2x of greedy per token.  The fused scorer
(engine/beam.py:beam_generate_fused) runs the whole loop on device.

  python tools/bench_beam.py [nb] [T]
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
    nb = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from __graft_entry__ import _flagship_config
    from visualcla_tpu.engine.beam import beam_generate, beam_generate_fused
    from visualcla_tpu.models import visualcla

    cfg = _flagship_config()
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, dtype), jax.random.PRNGKey(0)
    )
    if "--int8" in sys.argv:
        from visualcla_tpu.checkpoint.serialize import flatten_tree, unflatten_tree
        from visualcla_tpu.ops.quantization import INT8_TEXT_LEAVES

        flat = flatten_tree(shapes["text"])
        out8 = {}
        for kk, s in flat.items():
            key = "text/" + kk
            if key in INT8_TEXT_LEAVES:
                ax = INT8_TEXT_LEAVES[key] % len(s.shape)
                sshape = tuple(1 if i == ax else d for i, d in enumerate(s.shape))
                out8[kk] = {"q": jnp.zeros(s.shape, jnp.int8),
                            "scale": jnp.ones(sshape, jnp.float32)}
            else:
                out8[kk] = jnp.zeros(s.shape, s.dtype)
        params = {"text": unflatten_tree(out8)}
    else:
        params = {"text": jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                       shapes["text"])}
    S = 64
    for a in sys.argv:
        if a.startswith("--prompt="):
            S = int(a.split("=")[1])
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, size=(1, S)).astype(np.int32)

    # eos_token_id=-7: unreachable, so zeros-weights runs measure a full
    # T-step loop instead of instant EOS hypotheses
    kw = dict(num_beams=nb, max_new_tokens=T, eos_token_id=-7,
              pad_token_id=49954, max_seq_len=S + T + 8, dtype=dtype)

    if "--flat" in sys.argv:
        kw["structure"] = "flat"
    out = beam_generate_fused(params, cfg, ids, None, None, **kw)  # compile
    t0 = time.perf_counter()
    out = beam_generate_fused(params, cfg, ids, None, None, **kw)
    dt_f = time.perf_counter() - t0
    n = max(len(out), 1)
    print(f"fused beam nb={nb}: {dt_f / n * 1e3:.1f} ms/token "
          f"({n} tokens in {dt_f:.2f}s)", flush=True)

    if "--host" in sys.argv:
        kw.pop("structure", None)  # fused-only knob
        out = beam_generate(params, cfg, ids, None, None, **kw)  # compile
        t0 = time.perf_counter()
        out = beam_generate(params, cfg, ids, None, None, **kw)
        dt_h = time.perf_counter() - t0
        n = max(len(out), 1)
        print(f"host  beam nb={nb}: {dt_h / n * 1e3:.1f} ms/token "
              f"({n} tokens in {dt_h:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
