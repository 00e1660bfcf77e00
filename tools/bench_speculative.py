"""Measure prompt-lookup speculative decoding on REAL logits, on chip.

VERDICT r2 item 5: speculative decoding was CPU-exactness-tested but never
measured on hardware (a zeros-weights bench would fake 100% acceptance — all
logits tie, argmax is constant).  This uses the 134M rehearsal checkpoint
(tools/rehearse_real_weights.py's real HF ``LlamaForCausalLM`` + CLIP +
reference resampler, random-init weights -> real, non-degenerate logits) and
reports plain-greedy vs speculative tokens/s plus acceptance on

  - a REPETITIVE prompt (a short token phrase tiled — prompt-lookup's best
    case: drafts come from n-gram matches in the context), and
  - a NON-REPETITIVE prompt (uniform random ids — its worst case).

  python tools/bench_speculative.py [--ckpt /tmp/spec_ckpt] [--new 192]
                                    [--spec-k 8]
  python tools/bench_speculative.py --cost7b [--quant int4]   # chunk-cost
      mode: 7B shapes, zeros weights — measures ms/verify-chunk vs
      ms/plain-step (content-free); combine with the 134M acceptance for
      the honest 7B projection (BENCHMARKS.md).

Fabrication + conversion run in a subprocess (the rehearsal module pins
jax to CPU at import; this process stays on the TPU).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from visualcla_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

_FAB = """
import sys
sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo!r} + "/tools")
from rehearse_real_weights import build_big_merged
from visualcla_tpu.checkpoint.convert import convert_merged
merged, _ = build_big_merged({work!r}, layers=12, hidden=768, heads=12,
                             vocab=32000)
convert_merged(merged, {native!r}, dtype="bfloat16")
print("fabricated + converted")
"""


def ensure_ckpt(ckpt_dir: str) -> str:
    native = os.path.join(ckpt_dir, "native")
    if os.path.isdir(native) and os.listdir(native):
        return native
    os.makedirs(ckpt_dir, exist_ok=True)
    code = _FAB.format(repo=REPO, work=ckpt_dir, native=native)
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-3000:])
        raise RuntimeError("rehearsal checkpoint fabrication failed")
    return native


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/spec_ckpt")
    ap.add_argument("--new", type=int, default=192)
    ap.add_argument("--spec-k", type=int, default=8)
    ap.add_argument("--max-seq", type=int, default=512)
    ap.add_argument("--cost7b", action="store_true",
                    help="measure 7B-shape chunk/step cost (zeros weights) "
                         "instead of the 134M real-logits acceptance run")
    ap.add_argument("--quant", default="int4", choices=("bf16", "int8", "int4"))
    ap.add_argument("--native", default=None,
                    help="path to an existing native checkpoint (e.g. the "
                         "weights-day fabricated 7B, /tmp/wday/native7b): "
                         "runs the END-TO-END spec-vs-plain A/B at that "
                         "scale with --quant weights — real, non-degenerate "
                         "logits, real chunk costs, no projection")
    args = ap.parse_args()

    if args.cost7b:
        return cost7b(args)

    native = args.native or ensure_ckpt(args.ckpt)

    import jax
    import jax.numpy as jnp

    from visualcla_tpu.checkpoint.serialize import load_checkpoint
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.speculative import SpeculativeDecoder

    if args.native:
        quantize = None if args.quant == "bf16" else args.quant
        params, cfg = load_checkpoint(native, dtype=jnp.bfloat16,
                                      quantize=quantize)
    else:
        params, cfg = load_checkpoint(native, dtype=jnp.bfloat16)
    eng = Engine(params, cfg, eos_token_id=2, pad_token_id=0,
                 max_seq_len=args.max_seq, prompt_buckets=(128,),
                 dtype=jnp.bfloat16)
    spec = SpeculativeDecoder(eng, spec_k=args.spec_k)
    sampling = SamplingConfig.greedy(max_new_tokens=args.new)

    rng = np.random.default_rng(0)
    phrase = rng.integers(5, 30000, size=(12,))
    prompts = {
        "repetitive": np.tile(phrase, 9)[None, :100].astype(np.int32),
        "random": rng.integers(5, 30000, size=(1, 100)).astype(np.int32),
    }

    results = {}
    for name, ids in prompts.items():
        # warm both program sets
        plain_out = eng.generate(ids, sampling=sampling)
        spec_out = spec.generate(ids, sampling=sampling)
        a, b = np.asarray(plain_out)[0], np.asarray(spec_out)[0]
        n = min(len(a), len(b))
        diff = np.nonzero(a[:n] != b[:n])[0]
        # On chip the Sq=K+1 verify pass and the Sq=1 decode step reduce in
        # different bf16 orders; an argmax near-tie can flip a token, after
        # which the sequences legitimately diverge (CPU f32 tests are exact).
        # Report the first flip instead of failing.
        first_div = int(diff[0]) if len(diff) else None

        t0 = time.perf_counter()
        plain_out = eng.generate(ids, sampling=sampling)
        n_plain = np.asarray(plain_out).shape[1]
        t_plain = time.perf_counter() - t0

        t0 = time.perf_counter()
        spec_out = spec.generate(ids, sampling=sampling)
        n_spec = np.asarray(spec_out).shape[1]
        t_spec = time.perf_counter() - t0

        results[name] = {
            "plain_tok_s": round(n_plain / t_plain, 1),
            "spec_tok_s": round(n_spec / t_spec, 1),
            "speedup": round((n_spec / t_spec) / (n_plain / t_plain), 2),
            "acceptance": round(spec.last_stats["acceptance"], 3),
            "tokens_per_chunk": round(spec.last_stats["tokens_per_chunk"], 2),
            "first_divergence": first_div,
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"speculative_bench": results,
                      "model": (f"native:{args.native}:{args.quant}"
                                if args.native else "134M-rehearsal"),
                      "spec_k": args.spec_k,
                      "new_tokens": args.new}))
    return 0


def cost7b(args) -> int:
    """Measure the 7B-shape COST model on chip: ms per verify chunk vs ms per
    plain decode step (zeros weights — per-program cost is content-free; only
    ACCEPTANCE needs real logits, which the 134M mode measures).  Speculative
    pays at 7B iff tokens_per_chunk > chunk_ms / step_ms."""
    sys.path.insert(0, REPO)
    import bench as bench_mod
    import numpy as np_

    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.speculative import SpeculativeDecoder

    eng, cfg = bench_mod.build_engine(512, quant=args.quant)
    spec = SpeculativeDecoder(eng, spec_k=args.spec_k)
    sampling = SamplingConfig.greedy(max_new_tokens=args.new)
    ids = np_.random.default_rng(0).integers(5, 30000, size=(1, 100)).astype(
        np_.int32)

    eng.generate(ids, sampling=sampling)  # warm
    t0 = time.perf_counter()
    out = eng.generate(ids, sampling=sampling)
    step_ms = (time.perf_counter() - t0) / np_.asarray(out).shape[1] * 1e3

    spec.generate(ids, sampling=sampling)  # warm
    t0 = time.perf_counter()
    spec.generate(ids, sampling=sampling)
    dt = time.perf_counter() - t0
    chunks = spec.last_stats["chunks"]
    chunk_ms = dt / max(chunks, 1) * 1e3
    breakeven = chunk_ms / step_ms
    print(json.dumps({
        "speculative_cost_7b": {
            "quant": args.quant, "spec_k": args.spec_k,
            "plain_step_ms": round(step_ms, 2),
            "verify_chunk_ms": round(chunk_ms, 2),
            "breakeven_tokens_per_chunk": round(breakeven, 2),
            "note": "spec wins at 7B iff real-logits tokens_per_chunk "
                    "exceeds the breakeven (134M mode measures 2.27 on a "
                    "repetitive prompt, 2026-08-19)",
        }}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
