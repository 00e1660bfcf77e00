"""LoRA adapter training tests: identity at init, frozen base, merge/export."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.models import visualcla as vmod
from visualcla_tpu.train import (
    init_train_state,
    make_optimizer,
    make_train_step,
    train_forward_logits,
)
from visualcla_tpu.train.lora import (
    add_lora,
    export_adapter,
    lora_trainable,
    merge_lora,
)


@pytest.fixture(scope="module")
def cfg():
    return tiny_visualcla_config()


@pytest.fixture(scope="module")
def base_params(cfg):
    return vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)


@pytest.fixture(scope="module")
def batch(cfg):
    rng = np.random.default_rng(3)
    B, S = 2, 20
    ids = rng.integers(5, cfg.text_config.vocab_size, (B, S)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.ones((B, S), jnp.int32),
        "labels": jnp.asarray(ids),
        "img_start_pos": jnp.full((B,), -1, jnp.int32),
        "pixel_values": None,
    }


def test_lora_init_is_identity(cfg, base_params, batch):
    lp = add_lora(base_params, r=4, alpha=8, rng=jax.random.PRNGKey(1))
    base_out = train_forward_logits(
        base_params, cfg, batch["input_ids"], batch["attention_mask"],
        batch["img_start_pos"], None,
    )
    lora_out = train_forward_logits(
        lp, cfg, batch["input_ids"], batch["attention_mask"],
        batch["img_start_pos"], None,
    )
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(lora_out), atol=1e-6)


def test_lora_training_updates_only_adapters(cfg, base_params, batch):
    lp = add_lora(base_params, r=4, alpha=8, rng=jax.random.PRNGKey(1))
    opt = make_optimizer(learning_rate=5e-3, schedule="const")
    step = jax.jit(make_train_step(cfg, opt, trainable=lora_trainable))
    state = init_train_state(lp, opt)
    losses = []
    for _ in range(6):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses

    node = state.params["text"]["layers"]["q_proj"]
    np.testing.assert_array_equal(  # frozen base
        np.asarray(node["w"]),
        np.asarray(base_params["text"]["layers"]["q_proj"]),
    )
    assert not np.array_equal(np.asarray(node["lora_B"]),
                              np.zeros_like(np.asarray(node["lora_B"])))
    # embed/lm_head train fully (modules_to_save semantics)
    assert not np.array_equal(np.asarray(state.params["text"]["embed_tokens"]),
                              np.asarray(base_params["text"]["embed_tokens"]))
    # vision base frozen too
    np.testing.assert_array_equal(
        np.asarray(state.params["vision"]["layers"]["q_proj"]["w"]),
        np.asarray(base_params["vision"]["layers"]["q_proj"]),
    )


def test_merge_lora_matches_adapter_forward(cfg, base_params, batch):
    lp = add_lora(base_params, r=4, alpha=8, rng=jax.random.PRNGKey(2))
    # give B a nonzero value so the merge is non-trivial
    lp["text"]["layers"]["q_proj"]["lora_B"] = (
        jax.random.normal(jax.random.PRNGKey(3),
                          lp["text"]["layers"]["q_proj"]["lora_B"].shape) * 0.05
    )
    merged = merge_lora(lp)
    assert not isinstance(merged["text"]["layers"]["q_proj"], dict)
    out_l = train_forward_logits(
        lp, cfg, batch["input_ids"], batch["attention_mask"],
        batch["img_start_pos"], None,
    )
    out_m = train_forward_logits(
        merged, cfg, batch["input_ids"], batch["attention_mask"],
        batch["img_start_pos"], None,
    )
    np.testing.assert_allclose(np.asarray(out_l), np.asarray(out_m), atol=1e-5)


def test_export_adapter_roundtrip(cfg, base_params, batch, tmp_path):
    """export_adapter -> checkpoint.lora folding == merge_lora (format interop)."""
    from visualcla_tpu.checkpoint import lora as ck_lora
    from visualcla_tpu.checkpoint.mapping import llama_tree_from_sd

    lp = add_lora(base_params, r=4, alpha=8, rng=jax.random.PRNGKey(4),
                  vision_targets=())
    lp["text"]["layers"]["q_proj"]["lora_B"] = (
        jax.random.normal(jax.random.PRNGKey(5),
                          lp["text"]["layers"]["q_proj"]["lora_B"].shape) * 0.1
    )
    out_dir = str(tmp_path / "adapter")
    export_adapter(lp, out_dir, r=4, alpha=8)
    assert os.path.exists(os.path.join(out_dir, "adapter_model.bin"))

    # rebuild an HF-layout base state dict from our tree, then fold the
    # exported adapter through the independent checkpoint path
    text = base_params["text"]
    L = cfg.text_config.num_hidden_layers
    hf_sd = {"model.embed_tokens.weight": np.asarray(text["embed_tokens"]),
             "model.norm.weight": np.asarray(text["final_norm"]),
             "lm_head.weight": np.asarray(text["lm_head"]).T}
    fmt = {
        "q_proj": "self_attn.q_proj", "k_proj": "self_attn.k_proj",
        "v_proj": "self_attn.v_proj", "o_proj": "self_attn.o_proj",
        "gate_proj": "mlp.gate_proj", "up_proj": "mlp.up_proj",
        "down_proj": "mlp.down_proj",
    }
    for l in range(L):
        for ours, hf in fmt.items():
            hf_sd[f"model.layers.{l}.{hf}.weight"] = np.asarray(
                text["layers"][ours][l]).T
        hf_sd[f"model.layers.{l}.input_layernorm.weight"] = np.asarray(
            text["layers"]["input_norm"][l])
        hf_sd[f"model.layers.{l}.post_attention_layernorm.weight"] = np.asarray(
            text["layers"]["post_norm"][l])

    adapter_sd, adapter_cfg = ck_lora.load_adapter(out_dir)
    comp = ck_lora.partition_visualcla_adapter(adapter_sd)
    folded_sd = ck_lora.fold_lora(hf_sd, comp["text_model"], adapter_cfg)
    folded_tree = llama_tree_from_sd(folded_sd)

    merged = merge_lora(lp)
    np.testing.assert_allclose(
        folded_tree["layers"]["q_proj"],
        np.asarray(merged["text"]["layers"]["q_proj"]),
        atol=1e-5,
    )


def test_subset_step_matches_masked_full_step(cfg, base_params, batch):
    """The 7B-scale subset-gradient step (grads + optimizer state only for
    the trainable partition) must update exactly like the masked full-tree
    step on a float toy model."""
    from visualcla_tpu.train.trainer import (
        make_train_step_subset, merge_params, partition_params,
    )

    lp = add_lora(base_params, r=4, alpha=8, rng=jax.random.PRNGKey(1))
    opt = make_optimizer(learning_rate=5e-3, schedule="const")

    full = jax.jit(make_train_step(cfg, opt, trainable=lora_trainable))
    fs = init_train_state(lp, opt)

    train, frozen = partition_params(lp, lora_trainable)
    sub = jax.jit(make_train_step_subset(cfg, opt, trainable=lora_trainable))
    from visualcla_tpu.train.trainer import TrainState
    ss = TrainState(params=train, opt_state=opt.init(train),
                    step=jnp.int32(0))

    for _ in range(3):
        fs, fm = full(fs, batch)
        ss, sm = sub(ss, frozen, batch)
        np.testing.assert_allclose(float(fm["loss"]), float(sm["loss"]),
                                   rtol=1e-6)
    merged = merge_params(ss.params, frozen)
    for path in (("text", "layers", "q_proj", "lora_B"),
                 ("text", "embed_tokens"),
                 ("resampler", "pooler_w")):
        a, b = fs.params, merged
        for k in path:
            if k not in a:  # tolerate naming differences in small trees
                break
            a, b = a[k], b[k]
        else:
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-6, err_msg=str(path))


def test_subset_step_qlora_int8_base(cfg, base_params, batch):
    """QLoRA: int8 frozen base + float LoRA through the subset step — the
    full-tree step cannot even differentiate an integer carrier; the subset
    step never sees it.  Loss must fall, base must stay bit-identical."""
    from visualcla_tpu.checkpoint.serialize import flatten_tree, unflatten_tree
    from visualcla_tpu.ops.quantization import INT8_TEXT_LEAVES, quantize
    from visualcla_tpu.train.trainer import (
        TrainState, make_train_step_subset, partition_params,
    )

    flat = flatten_tree(base_params["text"])
    q8 = {}
    for k, v in flat.items():
        key = "text/" + k
        # embed/lm_head are modules_to_save — they TRAIN, so they stay
        # float (the QLoRA recipe quantizes only the frozen decoder base)
        if key in INT8_TEXT_LEAVES and k not in ("embed_tokens", "lm_head"):
            q8[k] = quantize(np.asarray(v, np.float32))
        else:
            q8[k] = v
    qparams = dict(base_params)
    qparams["text"] = unflatten_tree(q8)
    lp = add_lora(qparams, r=4, alpha=8, rng=jax.random.PRNGKey(2))
    opt = make_optimizer(learning_rate=5e-3, schedule="const")
    train, frozen = partition_params(lp, lora_trainable)
    step = jax.jit(make_train_step_subset(cfg, opt, trainable=lora_trainable))
    st = TrainState(params=train, opt_state=opt.init(train),
                    step=jnp.int32(0))
    losses = []
    for _ in range(5):
        st, m = step(st, frozen, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    # the quantized base never moved (it lives in the frozen tree)
    node = frozen["text"]["layers"]["q_proj"]["w"]
    assert node["q"].dtype == jnp.int8
