"""Training CLI — the runnable counterpart of the reference's *described*
2-stage recipe (README_EN.md:75-91; the reference ships no training code).

Stage 1 (pretrain):  resampler + projection (+ vision) on image-caption pairs.
Stage 2 (SFT):       + text/vision LoRA + embed/lm_head on instruction data.

Usage:
  python -m visualcla_tpu.train.run_training \
      --checkpoint NATIVE_CKPT --data data.jsonl --image_dir IMGS \
      --stage 2 --lora_r 8 --lora_alpha 16 --batch_size 8 --steps 1000 \
      --learning_rate 1e-4 --output OUT [--n_data 2]  # DP×TP mesh split

Outputs: native checkpoint (LoRA merged) at --output, plus the raw adapter in
PEFT format at  --output/adapter (interops with the reference ecosystem).
"""
from __future__ import annotations

import argparse
import logging
import time

import numpy as np

logger = logging.getLogger(__name__)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True, help="native checkpoint dir")
    ap.add_argument("--data", required=True, help="json/jsonl records")
    ap.add_argument("--image_dir", default="")
    ap.add_argument("--output", required=True)
    ap.add_argument("--stage", type=int, choices=(1, 2), default=2)
    ap.add_argument("--lora_r", type=int, default=8)
    ap.add_argument("--lora_alpha", type=float, default=16.0)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--warmup_steps", type=int, default=100)
    ap.add_argument("--grad_clip", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--n_data", type=int, default=0,
                    help="data-parallel axis size; 0 = single-device (no mesh); "
                         "rest of the devices go to the TP axis")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--save_every", type=int, default=0,
                    help="save full train state every N steps (0 = off)")
    ap.add_argument("--resume", default=None,
                    help="resume from an orbax train-state dir (or a root "
                         "containing step_N dirs)")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize decoder layers (memory for FLOPs)")
    ap.add_argument("--pipeline", type=int, default=0,
                    help="pipeline-parallel stages for the text tower "
                         "(GPipe over a 'pipe' axis; 0 = off; layers must "
                         "divide evenly; combines with --n_data as DP)")
    ap.add_argument("--n_micro", type=int, default=2,
                    help="GPipe microbatches per step (with --pipeline)")
    ap.add_argument("--fsdp", action="store_true",
                    help="ZeRO-style layer-axis param sharding over the data "
                         "axis (needs num_layers % n_data == 0)")
    args = ap.parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..checkpoint.serialize import load_checkpoint, save_checkpoint
    from ..parallel.sharding import DATA, make_mesh
    from ..processor import ImageProcessor
    from ..text import VisualCLATokenizer
    from ..utils import enable_compilation_cache
    from . import (
        init_train_state, make_optimizer, make_train_step, stage1_trainable,
    )
    from .data import DataLoader, ExampleBuilder, load_records
    from .lora import add_lora, export_adapter, lora_trainable, merge_lora

    enable_compilation_cache()
    pipe_mesh = None
    if args.pipeline > 1:
        from ..parallel.pipeline import make_pipe_mesh

        n_data = max(args.n_data, 1)
        pipe_mesh = make_pipe_mesh(args.pipeline, n_data)
        mesh = None  # PP shards the text layers itself; no GSPMD TP mesh
    else:
        mesh = (
            make_mesh(n_data=args.n_data)
            if args.n_data > 0 and len(jax.devices()) > 1 else None
        )
    params, cfg = load_checkpoint(args.checkpoint, mesh=mesh, dtype=jnp.float32)
    if pipe_mesh is not None:
        from ..parallel.pipeline import shard_text_params

        params = dict(params)
        params["text"] = shard_text_params(
            dict(params["text"]), pipe_mesh, cfg.text_config
        )
    if mesh is not None and args.fsdp:
        from ..parallel.sharding import shard_params

        params = shard_params(params, mesh, fsdp=True)
    tokenizer = VisualCLATokenizer.from_pretrained(args.checkpoint)
    import os

    if os.path.exists(os.path.join(args.checkpoint, "preprocessor_config.json")):
        ip = ImageProcessor.from_pretrained(args.checkpoint)
    else:
        size = cfg.vision_config.image_size
        ip = ImageProcessor(image_size=size, crop_size=size)

    if args.stage == 2:
        params = add_lora(
            params, r=args.lora_r, alpha=args.lora_alpha,
            rng=jax.random.PRNGKey(args.seed),
        )
        trainable = lora_trainable
    else:
        trainable = stage1_trainable

    records = load_records(args.data)
    builder = ExampleBuilder(
        tokenizer, ip, num_patch=cfg.num_image_tokens,
        image_dir=args.image_dir, max_len=cfg.text_config.max_position_embeddings,
    )
    total = min(args.steps, args.epochs * max(1, len(records) // args.batch_size))
    optimizer = make_optimizer(
        learning_rate=args.learning_rate, warmup_steps=args.warmup_steps,
        total_steps=total, grad_clip=args.grad_clip,
    )
    step_fn = jax.jit(
        make_train_step(cfg, optimizer, trainable=trainable, remat=args.remat,
                        pipeline_mesh=pipe_mesh, n_micro=args.n_micro),
        donate_argnums=(0,),
    )
    state = init_train_state(params, optimizer)
    if args.resume:
        from .checkpointing import latest_step_dir, restore_train_state

        src = latest_step_dir(args.resume) or args.resume
        state = restore_train_state(src, state)
        logger.info("resumed train state from %s (step %d)", src, int(state.step))

    data_sharding = (
        NamedSharding(mesh, P(DATA)) if mesh is not None else None
    )
    step = 0
    t0 = time.time()
    for epoch in range(args.epochs):
        loader = DataLoader(
            records, builder, batch_size=args.batch_size,
            image_size=cfg.vision_config.image_size,
            seed=args.seed + epoch, pad_id=tokenizer.pad_token_id,
        )
        for batch in loader:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            if data_sharding is not None:
                batch = {k: jax.device_put(v, data_sharding) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            step += 1
            if args.save_every and step % args.save_every == 0:
                from .checkpointing import save_train_state

                save_train_state(
                    os.path.join(args.output, "train_state", f"step_{step}"), state
                )
            if step % args.log_every == 0:
                loss = float(metrics["loss"])
                logger.info(
                    "step %d/%d loss %.4f gnorm %.3f (%.2f s/step)",
                    step, total, loss, float(metrics["grad_norm"]),
                    (time.time() - t0) / step,
                )
            if step >= args.steps:
                break
        if step >= args.steps:
            break

    final = state.params
    if args.stage == 2:
        export_adapter(final, args.output + "/adapter",
                       r=args.lora_r, alpha=args.lora_alpha)
        final = merge_lora(final)
    save_checkpoint(args.output, jax.device_get(final), cfg, dtype="bfloat16")
    logger.info("saved trained checkpoint -> %s (%d steps)", args.output, step)


if __name__ == "__main__":
    main()
