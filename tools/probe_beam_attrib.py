"""Attribute the fused-beam per-token cost (VERDICT r4 item 5 groundwork).

Round-4 measured fused beam at 28.9 ms/token vs 11.1 greedy (int8, nb=4,
S=64) and the verdict hypothesized the residual is attention over the nb×
duplicated prompt KV — but at S=64 the whole prompt KV is ~32 MB, far too
small to cost 17 ms.  Before building shared-prompt KV, measure where the
step time actually goes.  Variants, each a single jitted while_loop running
T steps at nb rows over zeros int8 7B weights (eos unreachable):

  forward    embed -> nb-row decode forward -> logits -> argmax (no scorer)
  +topk      + log_softmax + flat top_k(2nb) over (nb*V,) + candidate pick
  +reorder   + the per-step _reorder_tail gather of the generated tail
  full       beam_generate_fused itself (adds hypothesis bookkeeping:
             process_candidates fori, hyp_add, is_done, gen reorders)

  python tools/probe_beam_attrib.py [nb] [T] [--prompt=512] [--bf16]
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


def build_params(dtype, int8=True):
    from __graft_entry__ import _flagship_config
    from visualcla_tpu.models import visualcla

    cfg = _flagship_config()
    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, dtype), jax.random.PRNGKey(0)
    )
    if not int8:
        return {"text": jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes["text"])}, cfg
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
    return {"text": unflatten_tree(out8)}, cfg


def main():
    nb = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    T = int(sys.argv[2]) if len(sys.argv) > 2 and sys.argv[2].isdigit() else 64
    S = 512
    for a in sys.argv:
        if a.startswith("--prompt="):
            S = int(a.split("=")[1])
    dtype = jnp.bfloat16
    params, cfg = build_params(dtype, int8="--bf16" not in sys.argv)
    text_cfg = cfg.text_config

    from visualcla_tpu.engine.beam import _reorder_tail, beam_generate_fused
    from visualcla_tpu.models import llama

    Scap = S + T + 8
    Smax = -(-Scap // 256) * 256
    V = text_cfg.vocab_size

    def make_loop(variant: str):
        @jax.jit
        def loop(params_, cache):
            kv_valid = jnp.concatenate(
                [jnp.ones((nb, S), bool), jnp.zeros((nb, Smax - S), bool)], -1)
            carry0 = dict(
                cache=cache, kv_valid=kv_valid,
                tokens=jnp.ones((nb,), jnp.int32),
                scores=jnp.zeros((nb,), jnp.float32),
                beams=jnp.arange(nb, dtype=jnp.int32),
                slot=jnp.int32(S), pos=jnp.int32(S), i=jnp.int32(0),
            )

            def cond(c):
                return c["i"] < T

            def body(c):
                cache = c["cache"]
                if variant == "+reorder":
                    cache = _reorder_tail(cache, c["beams"], S, end=Scap)
                kv_valid = c["kv_valid"].at[:, c["slot"]].set(True)
                embeds = llama.embed(params_["text"], c["tokens"][:, None])
                hidden, cache = llama.forward(
                    params_["text"], text_cfg, embeds,
                    jnp.full((nb, 1), c["pos"], jnp.int32), cache, kv_valid,
                    c["slot"])
                lg = llama.logits(params_["text"], hidden)[:, 0]
                if variant == "forward":
                    tokens = jnp.argmax(lg, -1).astype(jnp.int32)
                    scores, beams = c["scores"], c["beams"]
                else:
                    logprobs = jax.nn.log_softmax(lg.astype(jnp.float32), -1)
                    flat = (c["scores"][:, None] + logprobs).reshape(-1)
                    top_s, top_i = jax.lax.top_k(flat, 2 * nb)
                    beams = (top_i[:nb] // V).astype(jnp.int32)
                    tokens = (top_i[:nb] % V).astype(jnp.int32)
                    scores = top_s[:nb]
                return dict(cache=cache, kv_valid=kv_valid, tokens=tokens,
                            scores=scores, beams=beams, slot=c["slot"] + 1,
                            pos=c["pos"] + 1, i=c["i"] + 1)

            c = jax.lax.while_loop(cond, body, carry0)
            return c["tokens"], c["cache"]

        return loop

    def fresh_cache():
        return llama.init_kv_cache(text_cfg, nb, Smax, dtype)

    for variant in ("forward", "+topk", "+reorder"):
        loop = make_loop(variant)
        toks, cache_out = loop(params, fresh_cache())
        jax.device_get(toks)  # compile + warm
        del cache_out
        t0 = time.perf_counter()
        toks, cache_out = loop(params, fresh_cache())
        jax.device_get(toks)
        dt = time.perf_counter() - t0
        del cache_out
        print(f"{variant:9s} nb={nb} S={S}: {dt / T * 1e3:6.1f} ms/token",
              flush=True)

    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, size=(1, S)).astype(np.int32)

    def run_full(T_):
        kw = dict(num_beams=nb, max_new_tokens=T_, eos_token_id=-7,
                  pad_token_id=49954, max_seq_len=S + T_ + 8, dtype=dtype)
        out = beam_generate_fused(params, cfg, ids, None, None, **kw)
        t0 = time.perf_counter()
        out = beam_generate_fused(params, cfg, ids, None, None, **kw)
        return time.perf_counter() - t0, max(len(out), 1)

    dt1, n1 = run_full(T)
    dt2, n2 = run_full(2 * T)
    print(f"full      nb={nb} S={S}: {dt1 / n1 * 1e3:6.1f} ms/token "
          f"({n1} tokens, incl. prefill+dispatch)", flush=True)
    # slope removes the fixed prefill + dispatch + finalize cost — the
    # honest marginal per-token figure to compare against the variants
    print(f"full-slope nb={nb} S={S}: "
          f"{(dt2 - dt1) / max(n2 - n1, 1) * 1e3:6.1f} ms/token "
          f"((t({n2})-t({n1}))/{n2 - n1})", flush=True)


if __name__ == "__main__":
    main()
