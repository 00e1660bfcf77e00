"""Mint a tiny random VisualCLA checkpoint (native format + tokenizer) for
demos/smoke-tests — every app runs against it without the 14GB real weights:

  python tools/make_tiny_checkpoint.py --output /tmp/tiny_ckpt
  python -m visualcla_tpu.apps.inference --visualcla_model /tmp/tiny_ckpt
  python -m visualcla_tpu.apps.serve --visualcla_model /tmp/tiny_ckpt --pool 2
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--output", required=True)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")

    from visualcla_tpu.checkpoint import save_checkpoint
    from visualcla_tpu.core.config import (
        LlamaConfig, ResamplerConfig, ViTConfig, VisualCLAConfig,
    )
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.processor import ImageProcessor
    from visualcla_tpu.text import build_test_model

    # a small real-ish vocabulary over latin + common Chinese chat chars
    chars = sorted(set(
        "abcdefghijklmnopqrstuvwxyz0123456789 .,!?:#\n"
        "图片里有什么这是一只猫狗在上的和描述张请详细回答问题"
    ))
    merges = ["图片", "什么", "这是", "描述", "一只"]
    sp = build_test_model(
        chars + merges,
        [-100.0] * len(chars) + [-float(i) for i in range(1, len(merges) + 1)],
    )
    V = sp.vocab_size + 4  # + <pad>/<img>/</img>/<img_token>

    cfg = VisualCLAConfig(
        text_config=LlamaConfig(
            vocab_size=V, hidden_size=args.hidden,
            intermediate_size=args.hidden * 2, num_hidden_layers=args.layers,
            num_attention_heads=4, max_position_embeddings=512,
        ),
        vision_config=ViTConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=args.layers,
            num_attention_heads=2, image_size=224, patch_size=14,
        ),
        visual_resampler_config=ResamplerConfig(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64, num_query_tokens=8, add_pooling_layer=False,
        ),
    )
    params = vmod.init_params(jax.random.PRNGKey(args.seed), cfg, jnp.float32)
    save_checkpoint(args.output, params, cfg, dtype="float32")
    sp.save(os.path.join(args.output, "tokenizer.model"))
    with open(os.path.join(args.output, "added_tokens.json"), "w") as f:
        json.dump({"<pad>": sp.vocab_size, "<img>": sp.vocab_size + 1,
                   "</img>": sp.vocab_size + 2, "<img_token>": sp.vocab_size + 3}, f)
    ImageProcessor().save_pretrained(args.output)
    print(f"tiny checkpoint -> {args.output} (vocab {V}, "
          f"{args.layers}L/{args.hidden}H text tower)")


if __name__ == "__main__":
    main()
