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
merged = build_big_merged({work!r}, layers=12, hidden=768, heads=12,
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
    args = ap.parse_args()

    native = ensure_ckpt(args.ckpt)

    import jax
    import jax.numpy as jnp

    from visualcla_tpu.checkpoint.serialize import load_checkpoint
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.engine.speculative import SpeculativeDecoder

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
        assert np.array_equal(np.asarray(plain_out), np.asarray(spec_out)), (
            f"speculative diverged from greedy on {name}")

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
            "identical": True,
        }
        print(name, json.dumps(results[name]), flush=True)
    print(json.dumps({"speculative_bench": results,
                      "model": "134M-rehearsal", "spec_k": args.spec_k,
                      "new_tokens": args.new}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
