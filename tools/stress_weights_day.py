"""Weights-day stress at REAL 7B memory pressure (no network needed).

The 134M rehearsal (tools/rehearse_real_weights.py) proves the ingest PATH;
this proves the FOOTPRINT: a ~13.5 GB fp16 reference-layout merged checkpoint
(LLaMA-7B shapes, 14 text shards + index exactly like the real release, ViT-L
vision tower, resampler+projector root bin) fabricated on disk, then

  1. ``convert_merged``                 (torch shards -> native safetensors)
  2. ``load_checkpoint(quantize=int8)`` (streamed quantize-during-load)
  3. ``load_checkpoint(quantize=int4)`` (grouped v2 carriers)

each stage in its OWN subprocess under ``ulimit -v`` (default 30 GB address
space — the reference's merge needs ~20 GB RSS, README.md:152) with peak RSS
recorded from ru_maxrss.  Exits non-zero if any stage dies or exceeds the RSS
budget.  Results belong in DEVNOTES.md.

  python tools/stress_weights_day.py [--workdir /tmp/wday] [--rss-budget-gb 20]
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# LLaMA-7B / CLIP-ViT-L/14 / 6-layer 64-query resampler — the flagship shapes
TEXT = dict(hidden=4096, inter=11008, layers=32, heads=32, vocab=49958,
            max_pos=2048)
VIT = dict(hidden=1024, inter=4096, layers=24, heads=16, image=224, patch=14)
RES = dict(hidden=1024, inter=4096, layers=6, heads=16, queries=64)


def fabricate(workdir: str) -> str:
    """Write the merged dir shard by shard — host RAM never holds more than
    one shard (~1 GB)."""
    import numpy as np
    import torch

    merged = os.path.join(workdir, "merged7b")
    text_dir = os.path.join(merged, "text_encoder")
    vis_dir = os.path.join(merged, "vision_encoder")
    os.makedirs(text_dir, exist_ok=True)
    os.makedirs(vis_dir, exist_ok=True)
    rng = np.random.default_rng(0)

    def t(shape):
        return torch.from_numpy(
            (rng.standard_normal(shape) * 0.02).astype(np.float16))

    H, I, L, V = TEXT["hidden"], TEXT["inter"], TEXT["layers"], TEXT["vocab"]
    index = {"metadata": {"total_size": 0}, "weight_map": {}}
    n_shards = 14

    def layer_keys(i):
        p = f"model.layers.{i}."
        return {
            p + "self_attn.q_proj.weight": (H, H),
            p + "self_attn.k_proj.weight": (H, H),
            p + "self_attn.v_proj.weight": (H, H),
            p + "self_attn.o_proj.weight": (H, H),
            p + "mlp.gate_proj.weight": (I, H),
            p + "mlp.up_proj.weight": (I, H),
            p + "mlp.down_proj.weight": (H, I),
            p + "input_layernorm.weight": (H,),
            p + "post_attention_layernorm.weight": (H,),
        }

    all_keys = {"model.embed_tokens.weight": (V, H)}
    for i in range(L):
        all_keys.update(layer_keys(i))
    all_keys.update({"model.norm.weight": (H,), "lm_head.weight": (V, H)})
    keys = list(all_keys)
    per = (len(keys) + n_shards - 1) // n_shards
    t0 = time.time()
    for s in range(n_shards):
        shard_keys = keys[s * per:(s + 1) * per]
        if not shard_keys:
            continue
        name = f"pytorch_model-{s+1:05d}-of-{n_shards:05d}.bin"
        sd = {}
        for k in shard_keys:
            sd[k] = t(all_keys[k])
            index["weight_map"][k] = name
            index["metadata"]["total_size"] += sd[k].numel() * 2
        torch.save(sd, os.path.join(text_dir, name))
        del sd
        print(f"  shard {s+1}/{n_shards} written", flush=True)
    with open(os.path.join(text_dir, "pytorch_model.bin.index.json"), "w") as f:
        json.dump(index, f)
    with open(os.path.join(text_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["LlamaForCausalLM"], "model_type": "llama",
            "hidden_size": H, "intermediate_size": I,
            "num_hidden_layers": L, "num_attention_heads": TEXT["heads"],
            "vocab_size": V, "max_position_embeddings": TEXT["max_pos"],
            "rms_norm_eps": 1e-6, "torch_dtype": "float16",
        }, f)

    # vision tower (ViT-L/14, ~0.6 GB) — single bin
    vh, vi, vl = VIT["hidden"], VIT["inter"], VIT["layers"]
    n_pos = (VIT["image"] // VIT["patch"]) ** 2 + 1
    vsd = {
        "vision_model.embeddings.class_embedding": t((vh,)),
        "vision_model.embeddings.patch_embedding.weight":
            t((vh, 3, VIT["patch"], VIT["patch"])),
        "vision_model.embeddings.position_embedding.weight": t((n_pos, vh)),
        "vision_model.pre_layrnorm.weight": t((vh,)),
        "vision_model.pre_layrnorm.bias": t((vh,)),
        "vision_model.post_layernorm.weight": t((vh,)),
        "vision_model.post_layernorm.bias": t((vh,)),
    }
    for i in range(vl):
        p = f"vision_model.encoder.layers.{i}."
        for nm, shape in (
            ("self_attn.q_proj", (vh, vh)), ("self_attn.k_proj", (vh, vh)),
            ("self_attn.v_proj", (vh, vh)), ("self_attn.out_proj", (vh, vh)),
            ("mlp.fc1", (vi, vh)), ("mlp.fc2", (vh, vi)),
        ):
            vsd[p + nm + ".weight"] = t(shape)
            vsd[p + nm + ".bias"] = t(shape[:1])
        for nm in ("layer_norm1", "layer_norm2"):
            vsd[p + nm + ".weight"] = t((vh,))
            vsd[p + nm + ".bias"] = t((vh,))
    torch.save(vsd, os.path.join(vis_dir, "pytorch_model.bin"))
    del vsd
    with open(os.path.join(vis_dir, "config.json"), "w") as f:
        json.dump({
            "architectures": ["CLIPVisionModel"], "model_type": "clip_vision_model",
            "hidden_size": vh, "intermediate_size": vi,
            "num_hidden_layers": vl, "num_attention_heads": VIT["heads"],
            "image_size": VIT["image"], "patch_size": VIT["patch"],
            "hidden_act": "quick_gelu", "layer_norm_eps": 1e-5,
        }, f)

    # resampler + projector root bin (reference merge layout)
    rh, ri, rl, nq = RES["hidden"], RES["inter"], RES["layers"], RES["queries"]
    # the reference registers the queries as `query_embeddding` (three d's,
    # modeling_visual_resampler.py:587) — fabricate the same key the real
    # merged release carries
    rsd = {"visual_resampler.query_embeddding": t((1, nq, rh)),
           "image_projection_layer.weight": t((TEXT["hidden"], rh)),
           "image_projection_layer.bias": t((TEXT["hidden"],))}
    for i in range(rl):
        p = f"visual_resampler.encoder.layer.{i}.crossattention."
        for nm, shape in (
            ("self.query", (rh, rh)), ("self.key", (rh, rh)),
            ("self.value", (rh, rh)), ("output.dense", (rh, rh)),
        ):
            rsd[p + nm + ".weight"] = t(shape)
            rsd[p + nm + ".bias"] = t(shape[:1])
        rsd[p + "output.LayerNorm.weight"] = t((rh,))
        rsd[p + "output.LayerNorm.bias"] = t((rh,))
        q = f"visual_resampler.encoder.layer.{i}."
        for nm, shape in (("intermediate.dense", (ri, rh)),
                          ("output.dense", (rh, ri))):
            rsd[q + nm + ".weight"] = t(shape)
            rsd[q + nm + ".bias"] = t(shape[:1])
        rsd[q + "output.LayerNorm.weight"] = t((rh,))
        rsd[q + "output.LayerNorm.bias"] = t((rh,))
    torch.save(rsd, os.path.join(merged, "pytorch_model.bin"))
    with open(os.path.join(merged, "config.json"), "w") as f:
        json.dump({
            "model_type": "visualcla", "use_visual_resampler": True,
            "text_config": {"model_type": "llama", "hidden_size": H,
                            "intermediate_size": I, "num_hidden_layers": L,
                            "num_attention_heads": TEXT["heads"],
                            "vocab_size": V,
                            "max_position_embeddings": TEXT["max_pos"],
                            "rms_norm_eps": 1e-6},
            "vision_config": {"model_type": "clip_vision_model",
                              "hidden_size": vh, "intermediate_size": vi,
                              "num_hidden_layers": vl,
                              "num_attention_heads": VIT["heads"],
                              "image_size": VIT["image"],
                              "patch_size": VIT["patch"],
                              "hidden_act": "quick_gelu"},
            "visual_resampler_config": {
                "hidden_size": rh, "intermediate_size": ri,
                "num_hidden_layers": rl, "num_attention_heads": RES["heads"],
                "num_query_tokens": nq},
        }, f)
    sz = sum(os.path.getsize(os.path.join(dp, fn))
             for dp, _, fns in os.walk(merged) for fn in fns)
    print(f"fabricated merged dir: {sz/1e9:.1f} GB in {time.time()-t0:.0f}s",
          flush=True)
    return merged


_STAGES = {
    "convert": """
import sys; sys.path.insert(0, {repo!r})
from visualcla_tpu.checkpoint.convert import convert_merged
convert_merged({merged!r}, {native!r}, dtype="bfloat16")
""",
    "load_int8": """
import sys; sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from visualcla_tpu.checkpoint.serialize import load_checkpoint
params, cfg = load_checkpoint({native!r}, quantize="int8")
import jax.numpy as jnp
assert params["text"]["layers"]["q_proj"]["q"].dtype == jnp.int8
""",
    "load_int4": """
import sys; sys.path.insert(0, {repo!r})
import jax; jax.config.update("jax_platforms", "cpu")
from visualcla_tpu.checkpoint.serialize import load_checkpoint
params, cfg = load_checkpoint({native!r}, quantize="int4")
import jax.numpy as jnp
assert params["text"]["layers"]["q_proj"]["q"].dtype == jnp.uint8
""",
}


def run_stage(name: str, code: str, vlimit_gb: float) -> dict:
    """Run ``code`` in a subprocess under ulimit -v; return peaks in GB.

    Reports BOTH ru_maxrss (the classic number — but it counts clean
    file-backed mmap pages, so streaming a 14 GB safetensors file inflates
    it by up to the file size even though those pages are reclaimable and
    cannot OOM the host) and the peak ANONYMOUS footprint sampled from
    /proc/self/smaps_rollup (heap + anonymous mmap — the memory that
    actually competes with other processes).  The budget applies to anon."""
    wrapper = (
        "import resource, threading, time\n"
        f"resource.setrlimit(resource.RLIMIT_AS, ({int(vlimit_gb*2**30)},) * 2)\n"
        "_peak_anon = [0]\n"
        "def _sample():\n"
        "    while True:\n"
        "        try:\n"
        "            with open('/proc/self/smaps_rollup') as f:\n"
        "                for line in f:\n"
        "                    if line.startswith('Anonymous:'):\n"
        "                        kb = int(line.split()[1])\n"
        "                        _peak_anon[0] = max(_peak_anon[0], kb)\n"
        "                        break\n"
        "        except OSError:\n"
        "            pass\n"
        "        time.sleep(0.25)\n"
        "threading.Thread(target=_sample, daemon=True).start()\n"
        + code +
        "\nimport resource\n"
        "print('PEAK_RSS_KB', resource.getrusage(resource.RUSAGE_SELF).ru_maxrss)\n"
        "print('PEAK_ANON_KB', _peak_anon[0])\n"
    )
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", wrapper],
                       capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-2000:])
        print(r.stderr[-3000:])
        raise RuntimeError(f"stage {name} failed (rc={r.returncode})")
    rss_kb = int(r.stdout.split("PEAK_RSS_KB")[-1].split()[0])
    anon_kb = int(r.stdout.split("PEAK_ANON_KB")[-1].split()[0])
    out = {"rss_gb": rss_kb / 2**20, "anon_gb": anon_kb / 2**20}
    print(f"stage {name}: peak RSS {out['rss_gb']:.1f} GB "
          f"(anonymous {out['anon_gb']:.1f} GB), {dt:.0f}s", flush=True)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/wday")
    ap.add_argument("--rss-budget-gb", type=float, default=20.0)
    ap.add_argument("--vlimit-gb", type=float, default=40.0,
                    help="ulimit -v per stage (address space; XLA reserves "
                         "virtual far above RSS, so this sits above budget)")
    ap.add_argument("--skip-fabricate", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.workdir, exist_ok=True)
    merged = os.path.join(args.workdir, "merged7b")
    if not args.skip_fabricate or not os.path.isdir(merged):
        merged = fabricate(args.workdir)
    native = os.path.join(args.workdir, "native7b")

    peaks = {}
    for name in ("convert", "load_int8", "load_int4"):
        code = _STAGES[name].format(repo=REPO, merged=merged, native=native)
        peaks[name] = run_stage(name, code, args.vlimit_gb)
    print(json.dumps({"peaks_gb": peaks, "budget_gb": args.rss_budget_gb}))
    over = {k: v for k, v in peaks.items()
            if v["anon_gb"] > args.rss_budget_gb}
    if over:
        print(f"OVER BUDGET (anonymous): {over}")
        return 1
    print("ALL STAGES WITHIN BUDGET")
    return 0


if __name__ == "__main__":
    sys.exit(main())
