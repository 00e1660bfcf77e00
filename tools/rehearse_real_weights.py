"""Real-weights pipeline rehearsal (no network needed).

Weights-day dry run for the full ingest path on the LARGEST checkpoint this
environment can mint: a real HF ``LlamaForCausalLM`` (~125M params, saved
MULTI-SHARD with ``pytorch_model.bin.index.json`` exactly like a real 7B
release) + a real HF ``CLIPVisionModel`` + the reference's own
``VisualResamplerModel`` torch module, assembled into a reference-layout
merged dir — then:

  1. ``checkpoint.convert.convert_merged``     (merged -> native safetensors)
  2. ``checkpoint.serialize.load_checkpoint``  (stream + device placement)
  3. greedy-token-identity vs HF ``generate`` on the SAME weights
  4. ``checkpoint.export.export_reference_merged`` round-trip back out

Run:  python tools/rehearse_real_weights.py [--layers 12 --hidden 768]
Exits non-zero on any mismatch.  Results recorded in docs/PARITY.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def build_big_merged(tmp: str, layers: int, hidden: int, heads: int,
                     vocab: int) -> str:
    import torch
    from transformers import (
        CLIPVisionConfig, CLIPVisionModel, LlamaConfig, LlamaForCausalLM,
    )

    sys.path.insert(0, "/root/repo/tests")
    import hf_ref

    torch.manual_seed(0)
    text_cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden,
        intermediate_size=hidden * 8 // 3 // 64 * 64,
        num_hidden_layers=layers, num_attention_heads=heads,
        max_position_embeddings=2048,
    )
    text = LlamaForCausalLM(text_cfg).eval()
    n_params = sum(p.numel() for p in text.parameters())
    print(f"text tower: {n_params/1e6:.1f}M params "
          f"({layers}L/{hidden}H/{heads} heads, vocab {vocab})")

    vis_cfg = CLIPVisionConfig(
        hidden_size=128, intermediate_size=256, num_hidden_layers=4,
        num_attention_heads=4, image_size=224, patch_size=32,
    )
    vision = CLIPVisionModel(vis_cfg).eval()

    ref_mod = hf_ref.load_reference_resampler_module()
    assert ref_mod is not None, "reference resampler module not importable"
    res_cfg = ref_mod.VisualResamplerConfig(
        hidden_size=128, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=256, num_query_tokens=16, vocab_size=10,
    )
    resampler = ref_mod.VisualResamplerModel(
        res_cfg, add_pooling_layer=False).eval()
    for p in resampler.parameters():
        torch.nn.init.normal_(p, std=0.1)
    proj = torch.nn.Linear(128, hidden)

    merged = os.path.join(tmp, "merged")
    os.makedirs(merged, exist_ok=True)
    # multi-shard save: exercises pytorch_model.bin.index.json ingestion,
    # the layout real 7B releases ship
    text.save_pretrained(os.path.join(merged, "text_encoder"),
                         max_shard_size="30MB", safe_serialization=False)
    idx = os.path.join(merged, "text_encoder", "pytorch_model.bin.index.json")
    assert os.path.exists(idx), "expected a sharded text checkpoint"
    n_shards = len(set(json.load(open(idx))["weight_map"].values()))
    print(f"text tower saved as {n_shards} shards + index")
    vision.save_pretrained(os.path.join(merged, "vision_encoder"),
                           safe_serialization=False)
    root_sd = {"visual_resampler." + k: v
               for k, v in resampler.state_dict().items()}
    root_sd["image_projection_layer.weight"] = proj.weight.data
    root_sd["image_projection_layer.bias"] = proj.bias.data
    torch.save(root_sd, os.path.join(merged, "pytorch_model.bin"))
    with open(os.path.join(merged, "config.json"), "w") as f:
        json.dump({
            "model_type": "visualcla",
            "text_config": text_cfg.to_dict(),
            "vision_config": vis_cfg.to_dict(),
            "use_visual_resampler": True,
            "visual_resampler_config": res_cfg.to_dict(),
        }, f)
    return merged, text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--hidden", type=int, default=768)
    ap.add_argument("--heads", type=int, default=12)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--keep", default=None,
                    help="directory to build in (default: temp dir)")
    args = ap.parse_args()

    import torch

    from visualcla_tpu.checkpoint.convert import convert_merged
    from visualcla_tpu.checkpoint.export import export_reference_merged
    from visualcla_tpu.checkpoint.serialize import (
        flatten_tree, load_checkpoint,
    )
    from visualcla_tpu.models import llama

    tmp = args.keep or tempfile.mkdtemp(prefix="rehearse_")
    merged, hf_text = build_big_merged(
        tmp, args.layers, args.hidden, args.heads, args.vocab)

    native = os.path.join(tmp, "native")
    convert_merged(merged, native, dtype="float32")
    print("convert_merged OK ->", native)

    params, cfg = load_checkpoint(native, dtype=jnp.float32)
    print("load_checkpoint OK:",
          sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params)) / 1e6,
          "M params on", jax.devices()[0])

    # greedy-token identity vs HF on the same weights (text-only path)
    rng = np.random.default_rng(0)
    ids = rng.integers(5, args.vocab - 5, size=(2, 21)).astype(np.int64)
    T = 16
    with torch.no_grad():
        embeds = hf_text.get_input_embeddings()(torch.from_numpy(ids))
        hf_out = hf_text.generate(
            inputs_embeds=embeds,
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            max_new_tokens=T, do_sample=False, num_beams=1,
        ).numpy()

    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig

    eng = Engine({"text": params["text"]}, cfg, eos_token_id=2,
                 pad_token_id=0, max_seq_len=128, prompt_buckets=(32,),
                 dtype=jnp.float32)
    ours = eng.generate(ids.astype(np.int32),
                        sampling=SamplingConfig.greedy(max_new_tokens=T))
    if not np.array_equal(hf_out[:, :ours.shape[1]], ours):
        print("TOKEN MISMATCH:\nHF  ", hf_out, "\nours", ours)
        sys.exit(1)
    print(f"greedy token identity OK ({ours.shape[1]} tokens x 2 rows vs HF)")

    back = os.path.join(tmp, "export_back")
    export_reference_merged(params, cfg, back, dtype="float32")
    native2 = os.path.join(tmp, "native2")
    convert_merged(back, native2, dtype="float32")
    p2, _ = load_checkpoint(native2, dtype=jnp.float32)
    f1, f2 = flatten_tree(params), flatten_tree(p2)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), np.asarray(f2[k]),
                                      err_msg=k)
    print("export round-trip bit-exact OK")
    print("REHEARSAL PASSED", tmp if args.keep else "(temp dir)")


if __name__ == "__main__":
    main()
