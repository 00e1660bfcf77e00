"""Long-context prefill probe: the reference's REAL operating point.

Every TTFT number through round 4 used a 100-token prompt in a 128 bucket,
but the reference serves multi-turn chat up to ``truncation_length: 2048``
(reference scripts/inference/text_generation_webui/settings/
settings-visualcla.yaml:21) — a late-conversation turn replays ~2000 tokens
of history plus the 66 image-marker tokens through prefill before the first
new token.  This probe measures that axis: for S in {512, 1024, 2048}
(exact bucket hits, image spliced at position 2, i.e. the late-turn shape),
it reports

  - model prefill latency (pre-made pixel_values -> first sampled token)
  - full TTFT (raw 480x640 uint8 frame -> on-device preprocess -> prefill)
  - prefill MFU vs the v5e's 197 TFLOP/s bf16 peak (matmul FLOPs of
    ViT + resampler + projector + LLaMA counted from the config; causal
    attention counted at half)

  python tools/probe_prefill.py --quant int4 --lens 512,1024,2048
  VISUALCLA_INT4_PREFILL=dequant ... (A/B the kernel-vs-dequant routing)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

V5E_BF16_PEAK = 197e12


def prefill_flops(cfg, S: int) -> float:
    """Matmul FLOPs of one multimodal prefill at text length S (B=1).

    2*m*n*k per dot; causal text attention at half the full S^2 cost; the
    lm_head runs on the LAST position only (engine/generate.py:240)."""
    t = cfg.text_config
    H, I, L = t.hidden_size, t.intermediate_size, t.num_hidden_layers
    f = S * L * 2 * (4 * H * H + 3 * H * I)  # qkv+o + gate/up/down
    f += L * 2 * S * S * H  # 2 (QK^T + AV) * 0.5 causal
    f += 2 * H * t.vocab_size  # last-position logits
    v = cfg.vision_config
    Sv = (v.image_size // v.patch_size) ** 2 + 1
    Hv, Iv, Lv = v.hidden_size, v.intermediate_size, v.num_hidden_layers
    f += Sv * Lv * 2 * (4 * Hv * Hv + 2 * Hv * Iv)
    f += Lv * 2 * 2 * Sv * Sv * Hv  # full (non-causal) attention
    f += Sv * 2 * 3 * Hv * v.patch_size**2  # patchify matmul
    r = cfg.visual_resampler_config
    Q, Hr, Lr = r.num_query_tokens, r.hidden_size, r.num_hidden_layers
    Kv = Q + Sv  # K/V over cat(queries, image) (models/resampler.py:76)
    f += Lr * 2 * (Q * Hr * Hr + 2 * Kv * Hr * Hr + Q * Hr * Hr)  # q,kv,o
    f += Lr * 2 * 2 * Q * Kv * Hr  # cross-attention scores + mix
    f += Lr * 2 * 2 * Q * Hr * r.intermediate_size  # FFN
    f += Q * 2 * Hr * cfg.text_config.hidden_size  # projector
    return float(f)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int4",
                    choices=("bf16", "int8", "int4"))
    ap.add_argument("--lens", default="512,1024,2048")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()
    lens = tuple(int(x) for x in args.lens.split(","))

    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.processor import device_preprocess

    engine, cfg = bench_mod.build_engine(
        max(lens), args.quant, prompt_buckets=lens)
    rng = np.random.default_rng(0)
    frame_u8 = rng.integers(0, 256, size=(1, 480, 640, 3)).astype(np.uint8)
    preprocess = jax.jit(lambda u8: device_preprocess(u8, dtype=jnp.float32))
    sampling = SamplingConfig.greedy(max_new_tokens=8)
    pv0 = preprocess(jnp.asarray(frame_u8))
    bench_mod._sync(pv0)

    rows = []
    for S in lens:
        ids = rng.integers(5, 30000, size=(1, S)).astype(np.int32)
        img_pos = np.full((1,), 2, np.int32)
        st = engine.start(ids, pv0, img_pos, sampling)  # compile + warm
        bench_mod._sync(st.last_token)
        model_ms, full_ms = [], []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            st = engine.start(ids, pv0, img_pos, sampling)
            bench_mod._sync(st.last_token)
            model_ms.append((time.perf_counter() - t0) * 1e3)
            t0 = time.perf_counter()
            pv = preprocess(jnp.asarray(frame_u8))
            st = engine.start(ids, pv, img_pos, sampling)
            bench_mod._sync(st.last_token)
            full_ms.append((time.perf_counter() - t0) * 1e3)
        p50 = float(np.median(model_ms))
        rows.append({
            "S": S,
            "prefill_ms_p50": round(p50, 1),
            "ttft_ms_p50": round(float(np.median(full_ms)), 1),
            "mfu": round(prefill_flops(cfg, S) / (p50 / 1e3) / V5E_BF16_PEAK,
                         3),
        })
        print(json.dumps({"quant": args.quant, **rows[-1]}), flush=True)
    print(json.dumps({
        "quant": args.quant,
        "int4_prefill_routing": os.environ.get("VISUALCLA_INT4_PREFILL",
                                               "default"),
        "rows": rows,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
