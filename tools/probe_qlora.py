"""7B QLoRA training step on the real chip (VERDICT r4 item 6).

The training stack was proven at toy scale on CPU; this measures the real
operating point the reference describes but never ships tooling for
(README_EN.md:75-91, the 2-stage recipe): int8 frozen decoder base + bf16
LoRA adapters + fully-trained resampler/projection/embed/lm_head
(modules_to_save), multimodal batch, remat, on the 16 GB chip.

Subset-gradient step (train/trainer.py:make_train_step_subset): grads and
Adam state exist only for the trainable partition — a full-tree f32 grad
at 7B (~27 GB) cannot exist on this chip, so the subset structure is the
fit policy, not an optimization.

Zeros weights: step TIME is shape-bound (honest); loss values are
meaningless and not reported.

  python tools/probe_qlora.py [--seq 512] [--batch 1] [--stage 2] [--r 8]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from visualcla_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def build_qlora_params(cfg, r):
    """Zeros 7B: int8 decoder base, float embed/lm_head + vision/resampler
    (bf16), LoRA adapters on text+vision projections."""
    from visualcla_tpu.checkpoint.serialize import flatten_tree, unflatten_tree
    from visualcla_tpu.models import visualcla
    from visualcla_tpu.ops.quantization import INT8_TEXT_LEAVES
    from visualcla_tpu.train.lora import add_lora

    shapes = jax.eval_shape(
        lambda k: visualcla.init_params(k, cfg, jnp.bfloat16),
        jax.random.PRNGKey(0))
    out = {}
    for top, tree in shapes.items():
        flat = flatten_tree(tree)
        q = {}
        for k, s in flat.items():
            key = f"{top}/{k}"
            if (top == "text" and key in INT8_TEXT_LEAVES
                    and k not in ("embed_tokens", "lm_head")):
                ax = INT8_TEXT_LEAVES[key] % len(s.shape)
                sshape = tuple(1 if i == ax else d
                               for i, d in enumerate(s.shape))
                q[k] = {"q": jnp.zeros(s.shape, jnp.int8),
                        "scale": jnp.ones(sshape, jnp.float32)}
            else:
                q[k] = jnp.zeros(s.shape, s.dtype)
        out[top] = unflatten_tree(q)
    return add_lora(out, r=r, alpha=2.0 * r, rng=jax.random.PRNGKey(1),
                    dtype=jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--stage", type=int, default=2, choices=(1, 2))
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    from __graft_entry__ import _flagship_config
    from visualcla_tpu.train.lora import lora_trainable
    from visualcla_tpu.train.trainer import (
        TrainState, make_optimizer, make_train_step_subset, partition_params,
        stage1_trainable,
    )

    cfg = _flagship_config()
    params = build_qlora_params(cfg, args.r)
    trainable = lora_trainable if args.stage == 2 else stage1_trainable
    opt = make_optimizer(learning_rate=1e-4, schedule="const")
    train, frozen = partition_params(params, trainable)
    del params
    n_train = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(train))
    step = jax.jit(make_train_step_subset(cfg, opt, trainable=trainable,
                                          remat=True),
                   donate_argnames=("state",))
    st = TrainState(params=train, opt_state=opt.init(train),
                    step=jnp.int32(0))

    B, S = args.batch, args.seq
    rng = np.random.default_rng(0)
    ids = rng.integers(5, 30000, size=(B, S)).astype(np.int32)
    labels = ids.copy()
    labels[:, :80] = -100  # prompt-masked prefix (SFT shape)
    batch = {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(labels),
        "img_start_pos": jnp.full((B,), 2, jnp.int32),
        "pixel_values": jnp.zeros(
            (B, 3, cfg.vision_config.image_size, cfg.vision_config.image_size),
            jnp.bfloat16),
    }

    def sync(x):
        np.asarray(jax.device_get(x))

    st, m = step(st, frozen, batch)  # compile + warm
    sync(m["loss"])
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        st, m = step(st, frozen, batch)
        sync(m["loss"])
        times.append(time.perf_counter() - t0)
    step_ms = float(np.median(times) * 1e3)
    mem = {}
    try:
        stats = jax.local_devices()[0].memory_stats()
        mem = {"peak_hbm_gb": round(stats.get("peak_bytes_in_use", 0) / 2**30,
                                    2)}
    except Exception:  # noqa: BLE001 — tunnel may not expose stats
        pass
    print(json.dumps({
        "stage": args.stage, "seq": S, "batch": B, "lora_r": args.r,
        "step_ms_p50": round(step_ms, 1),
        "tokens_per_s": round(B * S / (step_ms / 1e3), 1),
        "trainable_params_M": round(n_train / 1e6, 1), **mem,
    }), flush=True)


if __name__ == "__main__":
    main()
