"""Multimodal training step (full fine-tune or masked/LoRA-style subsets).

The reference ships no training code — its README only *describes* the 2-stage
LoRA recipe (reference README_EN.md:75-91: stage 1 image-text pretraining of
resampler+projection+vision-LoRA, stage 2 multimodal+text instruction SFT with
text-LoRA added).  This module supplies the TPU-native training capability:

- pure-functional ``train_step`` (loss -> grad -> optax update) built to be
  ``jit``-ed over a ``Mesh`` with GSPMD shardings (TP on ``model`` axis, DP on
  ``data``) — collectives (grad all-reduce over ``data``, TP partial-sum
  all-reduce over ``model``) are inserted by XLA from the shardings;
- HF-convention causal LM loss: labels aligned to inputs, shifted internally,
  ``-100`` ignored — so data pipelines written against the reference stack work
  unchanged;
- trainable-subset masks reproducing the reference's two training stages.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import optax

from ..core.config import VisualCLAConfig
from ..models import llama, visualcla

Params = Any
IGNORE_INDEX = -100


@dataclasses.dataclass
class TrainState:
    """Carried training state (pytree)."""

    params: Params
    opt_state: Any
    step: jnp.ndarray  # () int32


jax.tree_util.register_dataclass(
    TrainState, data_fields=["params", "opt_state", "step"], meta_fields=[]
)


def causal_lm_loss(
    logits: jnp.ndarray,  # (B, S, V) fp32
    labels: jnp.ndarray,  # (B, S) int32, IGNORE_INDEX masked
) -> jnp.ndarray:
    """Next-token cross-entropy, mean over non-ignored positions (HF semantics:
    shift internally, ignore_index=-100)."""
    logits = logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    mask = (targets != IGNORE_INDEX).astype(jnp.float32)
    safe_targets = jnp.where(targets == IGNORE_INDEX, 0, targets)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def train_forward_logits(
    params: Params,
    cfg: VisualCLAConfig,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    img_start_pos: jnp.ndarray,
    pixel_values: Optional[jnp.ndarray],
    remat: bool = False,
    pipeline_mesh=None,  # ('pipe','data') mesh: text tower runs GPipe-pipelined
    n_micro: int = 1,
) -> jnp.ndarray:
    """Full multimodal forward for training: (B, S) -> (B, S, V) fp32 logits.

    With ``pipeline_mesh`` the decoder stack runs pipeline-parallel
    (parallel/pipeline.py); reverse-mode AD flows through the GPipe schedule
    (ppermute transposes to the reverse ring), so the same loss/grads come out
    — verified to machine precision in tests/test_pipeline_parallel.py."""
    from ..ops.attention import attention_impl_scope

    B, S = input_ids.shape
    # the flash kernels are inference-only (no pallas JVP rule); training
    # pins dense-XLA attention — at SFT lengths attention is ~1-2% of the
    # step FLOPs, and remat handles its memory (see attention_impl_scope)
    with attention_impl_scope("xla"):
        embeds = visualcla.multimodal_embeds(
            params, cfg, input_ids, img_start_pos, pixel_values, remat=remat
        )
        positions = jnp.maximum(
            jnp.cumsum(attention_mask, axis=-1) - 1, 0).astype(jnp.int32)
        # pipeline stages still thread a cache (their hop protocol carries
        # it); the single-mesh path runs CACHE-FREE — carrying the stacked
        # (L, ...) cache through the layer scan under AD saves it once per
        # scan step, an L^2 residual blowup that OOM'd the 7B QLoRA step
        # (llama.layer_forward cache=None path)
        cache = (llama.init_kv_cache(cfg.text_config, B, S, embeds.dtype)
                 if pipeline_mesh is not None else None)
        if pipeline_mesh is not None:
            from ..parallel import pipeline as pp

            hidden, _ = pp.pipeline_forward(
                params["text"], cfg.text_config, embeds, positions, cache,
                attention_mask.astype(bool), jnp.int32(0), pipeline_mesh,
                n_micro=n_micro, remat=remat,
            )
        else:
            hidden, _ = llama.forward(
                params["text"], cfg.text_config, embeds, positions, cache,
                attention_mask.astype(bool), jnp.int32(0), remat=remat,
            )
        return llama.logits(params["text"], hidden)


# ---------------------------------------------------------------------------
# trainable-subset masks (the reference's two LoRA training stages)
# ---------------------------------------------------------------------------

def stage1_trainable(path: tuple) -> bool:
    """Pretraining stage: resampler + projection (+ vision tower); LLM frozen.
    (reference README_EN.md:79-84)."""
    return path[0] in ("resampler", "projection", "vision")


def stage2_trainable(path: tuple) -> bool:
    """Instruction-SFT stage: everything trains (text LoRA added in the
    reference; here the analog is unfreezing the text tower too)."""
    return True


def _mask_tree(params: Params, predicate: Callable[[tuple], bool]):
    def walk(tree, prefix=()):
        if isinstance(tree, Mapping):
            return {k: walk(v, prefix + (k,)) for k, v in tree.items()}
        return bool(predicate(prefix))

    return walk(params)


def make_optimizer(
    learning_rate: float = 1e-4,
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
    grad_clip: float = 1.0,
    warmup_steps: int = 0,
    total_steps: int = 10_000,
    schedule: str = "cosine",
) -> optax.GradientTransformation:
    if schedule == "cosine":
        total = max(total_steps, 2)
        warmup = min(max(warmup_steps, 1), max(total // 10, 1))
        lr = optax.warmup_cosine_decay_schedule(0.0, learning_rate, warmup, total)
    else:
        lr = learning_rate
    return optax.chain(
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(lr, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def make_train_step(
    cfg: VisualCLAConfig,
    optimizer: optax.GradientTransformation,
    trainable: Optional[Callable[[tuple], bool]] = None,
    remat: bool = False,
    pipeline_mesh=None,
    n_micro: int = 1,
):
    """Build a pure ``train_step(state, batch) -> (state, metrics)``.

    ``batch`` keys: input_ids (B,S), attention_mask (B,S), labels (B,S),
    img_start_pos (B,), pixel_values (B,3,H,W) or None.
    Jit this over a Mesh with params sharded by ``parallel.sharding.param_specs``
    and batch arrays P('data', ...) — XLA inserts TP/DP collectives.
    """

    def loss_fn(params, batch):
        logits = train_forward_logits(
            params, cfg,
            batch["input_ids"], batch["attention_mask"],
            batch["img_start_pos"], batch.get("pixel_values"),
            remat=remat, pipeline_mesh=pipeline_mesh, n_micro=n_micro,
        )
        return causal_lm_loss(logits, batch["labels"])

    def train_step(state: TrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        if trainable is not None:
            mask = _mask_tree(state.params, trainable)
            grads = jax.tree.map(
                lambda g, m: g if m else jnp.zeros_like(g), grads, mask
            )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state, step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step


def init_train_state(params: Params, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(
        params=params, opt_state=optimizer.init(params), step=jnp.int32(0)
    )


# ---------------------------------------------------------------------------
# subset-gradient training (QLoRA at 7B scale)
# ---------------------------------------------------------------------------
#
# make_train_step differentiates the WHOLE tree and masks — fine at toy
# scale, impossible at 7B (a full-tree f32 grad is ~27 GB, and jax.grad
# through the frozen int8 carriers is meaningless).  These helpers split
# the tree: grads and optimizer state exist ONLY for the trainable leaves
# (LoRA A/B, resampler/projection, embed/lm_head), the frozen remainder —
# including the int8/int4 quantized base — rides through the loss as a
# closed-over constant.  None marks "the other partition's leaf"; None is
# an empty pytree node to JAX, so flattening skips it everywhere.

def partition_params(params: Params, trainable: Callable[[tuple], bool]):
    """-> (train_tree, frozen_tree), same structure, disjoint leaves.

    Raises if an integer-dtype leaf lands in the trainable partition —
    that always means a quantized carrier under a trainable path (e.g. a
    quantized lm_head, which is a modules_to_save leaf and must stay
    float to train); jax.grad's own error points nowhere useful."""
    mask = _mask_tree(params, trainable)
    bad = []

    def check(path, p, m):
        if m and hasattr(p, "dtype") and not jnp.issubdtype(
                p.dtype, jnp.inexact):
            bad.append(("/".join(str(x) for x in path), str(p.dtype)))

    def walk(tree, msk, prefix=()):
        if isinstance(tree, Mapping):
            for k in tree:
                walk(tree[k], msk[k], prefix + (k,))
        else:
            check(prefix, tree, msk)

    walk(params, mask)
    if bad:
        raise ValueError(
            f"integer-dtype leaves in the TRAINABLE partition {bad} — "
            "quantized weights cannot train; keep modules_to_save leaves "
            "(embed_tokens/lm_head/...) unquantized for QLoRA")
    train = jax.tree.map(lambda p, m: p if m else None, params, mask)
    frozen = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return train, frozen


def merge_params(train: Params, frozen: Params) -> Params:
    """Inverse of partition_params."""
    return jax.tree.map(
        lambda a, b: b if a is None else a, train, frozen,
        is_leaf=lambda x: x is None,
    )


def make_train_step_subset(
    cfg: VisualCLAConfig,
    optimizer: optax.GradientTransformation,
    trainable: Callable[[tuple], bool],
    remat: bool = False,
    pipeline_mesh=None,
    n_micro: int = 1,
):
    """Like make_train_step, but ``state.params`` holds ONLY the trainable
    partition; the frozen partition is a step argument (donate-free, never
    copied).  ``train_step(state, frozen, batch) -> (state, metrics)``."""

    def loss_fn(train_tree, frozen_tree, batch):
        params = merge_params(train_tree, frozen_tree)
        logits = train_forward_logits(
            params, cfg,
            batch["input_ids"], batch["attention_mask"],
            batch["img_start_pos"], batch.get("pixel_values"),
            remat=remat, pipeline_mesh=pipeline_mesh, n_micro=n_micro,
        )
        return causal_lm_loss(logits, batch["labels"])

    def train_step(state: TrainState, frozen_tree, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, frozen_tree, batch)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params=params, opt_state=opt_state,
                       step=state.step + 1),
            {"loss": loss, "grad_norm": gnorm},
        )

    return train_step
