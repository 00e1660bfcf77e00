"""Headline benchmark: VisualCLA-7B decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no perf numbers (BASELINE.md); ``vs_baseline`` is
computed against a nominal 30 tok/s — a representative single-stream fp16
HF ``generate`` rate for LLaMA-7B on an A100-class GPU — so >=2.0 meets the
north-star "2x HF-on-GPU decode tokens/s/chip" (BASELINE.json).

HEADLINE = int8 single-stream decode.  int8 is the reference's own
first-class serving config (``--load_in_8bit``, inference.py:24-25), and on
one 16GB v5e it is the right production choice: bf16 single-stream decode is
HBM-bound at a ~60 tok/s roofline (weights/bandwidth = 13.6GB / 819GB/s), so
no implementation can reach 2x30 in bf16 on this chip — int8 halves the
bytes and clears the target with room (see BENCHMARKS.md).  The same JSON
line carries the full bf16 numbers (single-stream + fused batch-8) so the
unquantized story stays visible.

Measures, on the real attached TPU with the full flagship architecture
(CLIP-ViT-L/14 + 6L/64q resampler + 7B LLaMA):
  - decode tokens/s/chip (fused while-loop decode, batch 1 + batch 8, greedy)
  - p50 TTFT: image encode (ViT+resampler+projection) + prefill + first token
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()

# Known-answer canary through the persistent cache BEFORE any measurement:
# a poisoned/stale cached executable would skew every number below with no
# exception (the round-2/3 CPU-cache lesson, applied to the TPU bench path).
# Wipes + recompiles on mismatch; raises (no numbers reported) if even the
# cold compile miscomputes.
if jax.default_backend() == "tpu":
    from visualcla_tpu.utils.cache import DEFAULT_CACHE_DIR
    from visualcla_tpu.utils.tpu_cache_guard import ensure_clean_tpu_cache

    ensure_clean_tpu_cache(DEFAULT_CACHE_DIR)

HF_GPU_BASELINE_TOK_S = 30.0


def build_engine(max_seq_len: int, quant: str = "bf16",
                 prompt_buckets=(128,)):
    from __graft_entry__ import _flagship_config
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.models import visualcla

    cfg = _flagship_config()
    dtype = jnp.bfloat16
    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, dtype), jax.random.PRNGKey(0)
    )
    # zeros init (random values don't change timing; zeros materialize fast)
    if quant in ("int8", "int4"):
        # build the quantized layout directly (quantizing a live bf16 7B tree
        # on-device would need 21GB peak; real loads quantize host-side while
        # streaming — checkpoint/serialize.py)
        from visualcla_tpu.ops.quantization import INT8_TEXT_LEAVES
        from visualcla_tpu.checkpoint.serialize import flatten_tree, unflatten_tree

        GROUP = 128
        flat = flatten_tree(jax.tree.map(lambda s: s, shapes))
        out = {}
        for k, s in flat.items():
            if (quant == "int4" and k in INT8_TEXT_LEAVES
                    and k != "text/embed_tokens"):
                # grouped s4 v2: uint8 carrier (..., G, gs/2, out), scale
                # (..., G, out) — contraction-packed deinterleaved halves
                # (ops/quantization.py module docstring)
                lead, in_dim, odim = s.shape[:-2], s.shape[-2], s.shape[-1]
                g = in_dim // GROUP
                out[k] = {
                    "q": jnp.zeros((*lead, g, GROUP // 2, odim), jnp.uint8),
                    "scale": jnp.ones((*lead, g, odim), jnp.float32),
                }
            elif k in INT8_TEXT_LEAVES:
                ax = INT8_TEXT_LEAVES[k] % len(s.shape)
                scale_shape = tuple(
                    1 if i == ax else d for i, d in enumerate(s.shape)
                )
                out[k] = {"q": jnp.zeros(s.shape, jnp.int8),
                          "scale": jnp.ones(scale_shape, jnp.float32)}
            else:
                out[k] = jnp.zeros(s.shape, s.dtype)
        params = unflatten_tree(out)
    else:
        params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    return Engine(
        params, cfg,
        eos_token_id=2, pad_token_id=49954,
        max_seq_len=max_seq_len, prompt_buckets=prompt_buckets, dtype=dtype,
    ), cfg


def _sync(x) -> None:
    """Force completion: device_get a concrete value.  (block_until_ready is a
    no-op under the axon tunnel platform, so timing must round-trip data.)"""
    np.asarray(jax.device_get(x))


def run(max_seq_len: int, quant: str = "bf16"):
    from visualcla_tpu.engine.sampling import SamplingConfig

    engine, cfg = build_engine(max_seq_len, quant)
    B, S = 1, 100
    n_img = cfg.num_image_tokens
    rng = np.random.default_rng(0)
    input_ids = rng.integers(5, 30000, size=(B, S)).astype(np.int32)
    img_start_pos = np.full((B,), 2, np.int32)
    # TTFT starts from a RAW camera-sized uint8 frame: the reference's
    # TTFT-equivalent spans PIL decode + CLIPImageProcessor resize/crop/
    # normalize (modeling_utils.py:149-154), so the measured region includes
    # the fused on-device preprocess (processor.device_preprocess), not just
    # the model prefill on pre-made pixel_values (VERDICT r2 item 7).
    from visualcla_tpu.processor import device_preprocess

    frame_u8 = rng.integers(0, 256, size=(B, 480, 640, 3)).astype(np.uint8)
    preprocess = jax.jit(
        lambda u8: device_preprocess(u8, dtype=jnp.float32))
    pixel_values = preprocess(jnp.asarray(frame_u8))

    decode_tokens = max_seq_len - 128 - 8
    sampling = SamplingConfig.greedy(max_new_tokens=decode_tokens)

    # -- warmup / compile ---------------------------------------------------
    st = engine.start(input_ids, pixel_values, img_start_pos, sampling)
    _sync(st.gen_ids[:, -1])
    st = engine._decode_loop(engine.params, st, sampling, sampling.max_new_tokens)
    _sync(st.gen_ids[:, -1])

    # -- TTFT (raw uint8 frame -> preprocess -> prefill incl. image encode ->
    #    first token), p50 of 5 ---------------------------------------------
    ttfts = []
    for _ in range(5):
        t0 = time.perf_counter()
        pv = preprocess(jnp.asarray(frame_u8))
        st = engine.start(input_ids, pv, img_start_pos, sampling)
        _sync(st.last_token)
        ttfts.append(time.perf_counter() - t0)
    ttft_ms = float(np.median(ttfts) * 1e3)

    # -- decode throughput (fused loop; token count is fixed: greedy on zeros
    #    params never hits EOS=2 since argmax of uniform logits is 0) --------
    st = engine.start(input_ids, pixel_values, img_start_pos, sampling)
    _sync(st.last_token)
    t0 = time.perf_counter()
    st = engine._decode_loop(engine.params, st, sampling, sampling.max_new_tokens)
    _sync(st.gen_ids[:, -1])
    dt = time.perf_counter() - t0
    n_decoded = int(st.gen_len) - 1  # first token was sampled in prefill
    tok_s = n_decoded / dt

    # -- batched serving throughput (B=8 rows decoding together; smaller KV
    #    budget so 8 cache rows + the 14GB weights fit a 16GB chip).  This
    #    section is best-effort: if its fresh compiles fail (transient tunnel
    #    compile-service outages), report the single-stream numbers anyway. --
    import gc

    del st  # free the B1 KV cache before allocating 8 rows (16GB chip)
    if quant == "bf16":
        # bf16's 13.4 GB weights leave no room for 8 KV rows + the vision
        # tower (~0.75 GB): drop it — the B8 section then uses the
        # hand-built-state fallback (the decode loop never touches vision).
        # Quantized tiers KEEP it so the B8 metric spans the REAL two-stage
        # multimodal prefill (round-5 verdict item 3).
        engine.params = {"text": engine.params["text"]}
    gc.collect()
    tok_s_b8 = None
    for b8_attempt in range(3):
        try:
            tok_s_b8 = _run_batch8(engine, cfg, input_ids, pixel_values,
                                   img_start_pos)
            break
        except Exception as e:  # noqa: BLE001
            print(f"# batch8 attempt {b8_attempt} failed: {str(e)[:160]}",
                  file=sys.stderr)
            gc.collect()  # drop any half-built engine state before retrying
            time.sleep(20)
    return tok_s, ttft_ms, n_decoded, tok_s_b8


def batch8_setup(engine, cfg):
    """B8 serving-bench fixtures: (engine8, sampling, fresh_state, B8).

    Shared with tools/prewarm_bench.py so the prewarmed programs provably
    carry the same cache keys as the measured ones."""
    import jax

    from visualcla_tpu.engine.generate import DecodeState, Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import llama

    B8, seq8, prompt8 = 8, 256, 128
    engine8 = Engine(
        engine.params, cfg, eos_token_id=2, pad_token_id=49954,
        max_seq_len=seq8, prompt_buckets=(prompt8,), dtype=engine.dtype,
    )
    s8 = SamplingConfig.greedy(max_new_tokens=seq8 - prompt8 - 8)

    def fresh_state():
        cache = llama.init_kv_cache(cfg.text_config, B8, seq8, engine.dtype)
        kv_valid = jnp.concatenate(
            [jnp.ones((B8, prompt8), bool), jnp.zeros((B8, seq8 - prompt8), bool)],
            axis=-1,
        )
        return DecodeState(
            cache=cache, kv_valid=kv_valid,
            cur_slot=jnp.int32(prompt8),
            positions=jnp.full((B8,), prompt8, jnp.int32),
            gen_ids=jnp.zeros((B8, s8.max_new_tokens), jnp.int32),
            gen_len=jnp.int32(1),
            last_token=jnp.ones((B8,), jnp.int32),
            finished=jnp.zeros((B8,), bool),
            key=jax.random.PRNGKey(0),
            mu=jnp.full((B8,), 2.0 * s8.mirostat_tau, jnp.float32),
        )

    return engine8, s8, fresh_state, B8


def _run_batch8(engine, cfg, input_ids, pixel_values, img_start_pos):
    """Aggregate decode throughput with 8 rows sharing every step.

    The post-prefill DecodeState comes from the REAL B=8 multimodal prefill
    (round 5): Engine.start auto-splits batched image prefills into two
    programs (vision encode+splice, then text forward — the one COMBINED
    B>=2 graph is what the tunnel's compile helper rejects, bench round-4
    note), so the path batch eval runs is the path this bench proves.  If
    the split prefill still fails to build in an unhealthy tunnel window,
    the old hand-built state keeps the decode metric alive (noted on
    stderr — decode math is identical either way)."""
    import gc

    engine8, s8, fresh_state, B8 = batch8_setup(engine, cfg)

    def real_state():
        ids8 = np.repeat(np.asarray(input_ids), B8, axis=0)
        pv8 = jnp.repeat(jnp.asarray(pixel_values), B8, axis=0)
        pos8 = np.repeat(np.asarray(img_start_pos), B8, axis=0)
        st = engine8.start(ids8, pv8, pos8, s8)
        _sync(st.last_token)
        return st

    try:
        real_state()  # compile both split-prefill programs
        fresh_state = real_state  # the metric now spans the REAL path
        print("# B8 state: real two-stage multimodal prefill", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"# B8 split prefill unavailable ({str(e)[:90]}); "
              "hand-built state fallback", file=sys.stderr)
        gc.collect()

    # the fused-loop compile is rejected when the tunnel's compile helper is
    # in an unhealthy window (it compiled fine in healthy ones — see
    # BENCH_HISTORY.json); retry a few times before falling back.  Once it
    # lands in the persistent compile cache, later runs skip straight through.
    for fused_attempt in range(3):
        st = None
        try:
            st = engine8._decode_loop(engine8.params, fresh_state(), s8,
                                      s8.max_new_tokens)
            _sync(st.gen_ids[:, -1])  # compile + warm
            del st
            st = fresh_state()
            t0 = time.perf_counter()
            st = engine8._decode_loop(engine8.params, st, s8, s8.max_new_tokens)
            _sync(st.gen_ids[:, -1])
            dt8 = time.perf_counter() - t0
            return B8 * (int(st.gen_len) - 1) / dt8
        except Exception as e:  # noqa: BLE001
            print(f"# fused B8 loop attempt {fused_attempt} failed "
                  f"({str(e)[:90]})", file=sys.stderr)
            del st  # drop the 8-row KV cache before re-allocating (16GB chip)
            gc.collect()
            if fused_attempt < 2:
                time.sleep(30)
    print("# fused B8 loop unavailable; falling back to chained single steps",
          file=sys.stderr)
    # fallback: chain N async single-step dispatches, sync once — the
    # single-step program is small enough for the tunnel's compile helper,
    # and async chaining keeps dispatch off the critical path
    N = 64
    st = fresh_state()
    st = engine8._decode_step(engine8.params, st, s8)
    _sync(st.last_token)  # compile + warm
    del st
    st = fresh_state()
    _sync(st.last_token)
    t0 = time.perf_counter()
    for _ in range(N):
        st = engine8._decode_step(engine8.params, st, s8)
    _sync(st.gen_ids[:, -1])
    dt8 = time.perf_counter() - t0
    return B8 * N / dt8


class _SectionTimeout(Exception):
    pass


def _run_with_deadline(fn, seconds: int):
    """Bound a bench section by wall clock: the axon tunnel sometimes HANGS
    (no error — device calls block forever), and an unbounded hang would eat
    the driver's whole bench window.  SIGALRM is main-thread only, which is
    where bench runs."""
    import signal

    def _raise(signum, frame):
        raise _SectionTimeout(f"section exceeded {seconds}s (tunnel hang?)")

    prev = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        return fn()
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, prev)


def _run_resilient(quant):
    """run() with OOM budget shrinking + transient-tunnel retries + a
    per-attempt wall-clock deadline (cold compiles through the tunnel take
    1-3 min/program; 35 min covers a fully cold section with margin —
    VISUALCLA_BENCH_DEADLINE_S overrides)."""
    deadline = int(os.environ.get("VISUALCLA_BENCH_DEADLINE_S", 2100))
    for max_seq in (768, 512, 384):
        for attempt in range(3):
            try:
                return _run_with_deadline(lambda: run(max_seq, quant),
                                          deadline)
            except _SectionTimeout as e:
                print(f"# {quant} section timed out: {e}", file=sys.stderr)
                return None
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower():
                    print(f"# OOM at max_seq={max_seq}, shrinking", file=sys.stderr)
                    break  # shrink the KV budget
                if ("remote_compile" in msg or "INTERNAL" in msg
                        or "UNAVAILABLE" in msg or "crashed" in msg):
                    # transient tunnel failure (compile service / worker
                    # restart): retry at the same size
                    print(f"# transient failure (attempt {attempt}): "
                          f"{msg[:120]}", file=sys.stderr)
                    continue
                raise
    return None


def main():
    import gc

    if "--xla-attn" in sys.argv:
        from visualcla_tpu.ops.attention import set_attention_impl

        set_attention_impl("xla")

    only_int4 = "--only-int4" in sys.argv

    # -- int4 (beyond-reference group-wise s4 weights): the fastest
    #    single-stream config — decode is weight-bandwidth-bound, s4 halves
    #    the weight bytes vs int8 ------------------------------------------
    int4_result = None
    if "--no-int4" not in sys.argv:
        int4_result = _run_resilient("int4")
        gc.collect()

    # -- int8 (the reference's --load_in_8bit serving config) ----------------
    int8_result = None
    if "--no-int8" not in sys.argv and not only_int4:
        int8_result = _run_resilient("int8")
        gc.collect()

    # -- bf16 on the same line (single-stream + fused batch 8) ---------------
    bf16_result = None
    if "--no-bf16" not in sys.argv and not only_int4:
        bf16_result = _run_resilient("bf16")

    # -- paged continuous-batching serving (the production config:
    #    Scheduler + PagedServingEngine, int8 weights, pool 32, chunk 16) ----
    serving_tok_s = None
    if "--no-serving" not in sys.argv and not only_int4:
        try:
            gc.collect()
            from tools.bench_serving import measure as _serving_measure

            serving_tok_s, _, _, _ = _run_with_deadline(
                lambda: _serving_measure("int8", n_req=64, max_new=96,
                                         chunk=16, pool=32),
                int(os.environ.get("VISUALCLA_BENCH_DEADLINE_S", 2100)))
            gc.collect()
        except Exception as e:  # noqa: BLE001 — serving line is best-effort
            print(f"# serving section failed: {str(e)[:160]}",
                  file=sys.stderr)

    if int8_result is None and bf16_result is None and int4_result is None:
        raise RuntimeError("benchmark failed for int4, int8 and bf16")

    if only_int4 and int4_result is not None:
        tok_s, ttft_ms, n, tok_s_b8 = int4_result
        print(json.dumps({
            "metric": "decode_tokens_per_s_per_chip_7b_int4",
            "value": round(tok_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_s / HF_GPU_BASELINE_TOK_S, 3),
            "ttft_ms_p50": round(ttft_ms, 1),
            "decode_tokens": n,
            "batch8_tokens_per_s_per_chip": (
                round(tok_s_b8, 2) if tok_s_b8 else None),
            "device": str(jax.devices()[0]),
        }))
        return

    if int8_result is not None:
        tok_s, ttft_ms, n, tok_s_b8 = int8_result
        out = {
            "metric": "decode_tokens_per_s_per_chip_7b_int8",
            "value": round(tok_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_s / HF_GPU_BASELINE_TOK_S, 3),
            "ttft_ms_p50": round(ttft_ms, 1),
            "decode_tokens": n,
            "batch8_tokens_per_s_per_chip": (
                round(tok_s_b8, 2) if tok_s_b8 else None
            ),
            "device": str(jax.devices()[0]),
        }
        if bf16_result is not None:
            b_tok_s, b_ttft, _, b_b8 = bf16_result
            out["bf16_tokens_per_s_per_chip"] = round(b_tok_s, 2)
            out["bf16_ttft_ms_p50"] = round(b_ttft, 1)
            out["bf16_batch8_tokens_per_s_per_chip"] = (
                round(b_b8, 2) if b_b8 else None
            )
            out["bf16_vs_baseline"] = round(b_tok_s / HF_GPU_BASELINE_TOK_S, 3)
        if int4_result is not None:
            q_tok_s, q_ttft, _, q_b8 = int4_result
            out["int4_tokens_per_s_per_chip"] = round(q_tok_s, 2)
            out["int4_ttft_ms_p50"] = round(q_ttft, 1)
            out["int4_batch8_tokens_per_s_per_chip"] = (
                round(q_b8, 2) if q_b8 else None
            )
            out["int4_vs_baseline"] = round(q_tok_s / HF_GPU_BASELINE_TOK_S, 3)
            if q_tok_s > tok_s:
                # the quantized headline is the best quantized config
                out["metric"] = "decode_tokens_per_s_per_chip_7b_int4"
                out["value"] = round(q_tok_s, 2)
                out["vs_baseline"] = round(q_tok_s / HF_GPU_BASELINE_TOK_S, 3)
                out["ttft_ms_p50"] = round(q_ttft, 1)
                out["int8_tokens_per_s_per_chip"] = round(tok_s, 2)
                out["int8_ttft_ms_p50"] = round(ttft_ms, 1)
                out["int8_batch8_tokens_per_s_per_chip"] = (
                    round(tok_s_b8, 2) if tok_s_b8 else None)
                out["batch8_tokens_per_s_per_chip"] = (
                    round(q_b8, 2) if q_b8 else None)
        if serving_tok_s is not None:
            out["paged_serving_tokens_per_s_int8_pool32"] = round(
                serving_tok_s, 1)
    else:  # int8 unavailable this run: report bf16 as the line
        tok_s, ttft_ms, n, tok_s_b8 = bf16_result
        out = {
            "metric": "decode_tokens_per_s_per_chip_7b",
            "value": round(tok_s, 2),
            "unit": "tokens/s/chip",
            "vs_baseline": round(tok_s / HF_GPU_BASELINE_TOK_S, 3),
            "ttft_ms_p50": round(ttft_ms, 1),
            "decode_tokens": n,
            "batch8_tokens_per_s_per_chip": (
                round(tok_s_b8, 2) if tok_s_b8 else None
            ),
            "device": str(jax.devices()[0]),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
