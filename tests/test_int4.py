"""int4 (group-wise s4) weight quantization — the beyond-reference tier.

The reference caps at bitsandbytes int8 (`--load_in_8bit`,
reference scripts/inference/inference.py:24-25); decode on TPU is
weight-bandwidth-bound, so the s4 tier targets ~2x the int8 single-stream
rate.  These tests pin the numerics: grouped quantize/dequant roundtrip,
grouped matmul == dequantized dense matmul, scan-sliceability of the stacked
layout, end-to-end tiny-model closeness, and host-side (numpy) parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.ops.quantization import (
    dequantize,
    device_put_quantized,
    is_grouped,
    is_packed_grouped,
    is_quantized,
    pack_s4_rows,
    q_matmul,
    quantize_grouped,
    quantize_grouped_np,
    quantize_llama_tree,
    quantize_tree,
    unpack_s4_rows,
)


def test_pack_unpack_s4_rows_roundtrip():
    """pack_s4_rows (host/np and jnp) must be the exact inverse of
    unpack_s4_rows — the int4 tier stores packed uint8 carriers (v2,
    contraction-packed deinterleaved halves) because s4 cannot cross the
    axon program boundary (jit args / transfers)."""
    rng = np.random.default_rng(7)
    vals = rng.integers(-8, 8, size=(3, 4, 16, 6)).astype(np.int8)
    packed_np = pack_s4_rows(vals)
    assert packed_np.dtype == np.uint8 and packed_np.shape == (3, 4, 8, 6)
    un = np.asarray(jax.jit(
        lambda p: unpack_s4_rows(p))(jnp.asarray(packed_np)))
    np.testing.assert_array_equal(un, vals)
    np.testing.assert_array_equal(unpack_s4_rows(packed_np), vals)
    packed_j = np.asarray(pack_s4_rows(jnp.asarray(vals)))
    np.testing.assert_array_equal(packed_j, packed_np)
    with pytest.raises(ValueError):
        pack_s4_rows(vals[..., :15, :])  # odd group size


def test_grouped_roundtrip_and_structure():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.05
    wq = quantize_grouped(w, group=16, bits=4)
    assert is_quantized(wq) and is_grouped(wq) and is_packed_grouped(wq)
    assert wq["q"].shape == (4, 8, 48) and wq["q"].dtype == jnp.uint8
    assert wq["scale"].shape == (4, 48)
    deq = np.asarray(dequantize(wq))
    assert deq.shape == w.shape
    # 4-bit symmetric: error bounded by half a quantization step per group
    step = np.asarray(wq["scale"])  # (G, out)
    err = np.abs(deq - w).reshape(4, 16, 48)
    assert np.all(err <= step[:, None, :] * 0.5 + 1e-7)


def test_grouped_matmul_matches_dequantized_dense():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.05
    x = rng.standard_normal((3, 64)).astype(np.float32)
    wq = quantize_grouped(w, group=16, bits=4)
    got = np.asarray(q_matmul(jnp.asarray(x), wq))
    want = x @ np.asarray(dequantize(wq))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grouped_matmul_leading_batch_dims():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 24)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    wq = quantize_grouped(w, group=8, bits=4)
    got = np.asarray(q_matmul(jnp.asarray(x), wq))
    want = x @ np.asarray(dequantize(wq))
    assert got.shape == (2, 5, 24)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_grouped_int8_variant():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((32, 24)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=8, bits=8)
    assert wq["q"].dtype == jnp.int8 and is_grouped(wq)
    assert not is_packed_grouped(wq)  # bits=8 stays unpacked int8

    x = rng.standard_normal((4, 32)).astype(np.float32)
    got = np.asarray(q_matmul(jnp.asarray(x), wq))
    want = x @ np.asarray(dequantize(wq))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stacked_grouped_leaf_survives_scan():
    """The (L, G, gs, out) stacked layout must slice cleanly under lax.scan —
    the decode loop scans the layer dim of every weight leaf."""
    rng = np.random.default_rng(4)
    L = 3
    w = rng.standard_normal((L, 32, 16)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=8, bits=4)
    assert wq["q"].shape == (L, 4, 4, 16)  # v2: gs 8 -> 4 carrier rows
    x0 = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))

    def body(h, p):
        y = q_matmul(h, p)
        return h + jnp.pad(y, ((0, 0), (0, 16))), None

    out, _ = jax.lax.scan(body, x0, wq)
    want = np.asarray(x0)
    for i in range(L):
        sl = {"q": wq["q"][i], "scale": wq["scale"][i]}
        want = want + np.pad(np.asarray(q_matmul(jnp.asarray(want), sl)),
                             ((0, 0), (0, 16)))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-4)


def test_quantize_grouped_np_matches_device():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((32, 24)).astype(np.float32) * 0.1
    host = quantize_grouped_np(w, group=8, bits=4)
    assert host["q"].dtype == np.uint8 and host["bits"] == 4
    dev = device_put_quantized(host)
    ref = quantize_grouped(w, group=8, bits=4)
    assert dev["q"].dtype == jnp.uint8  # packed carrier transfers as-is
    np.testing.assert_array_equal(np.asarray(dev["q"]), np.asarray(ref["q"]))
    np.testing.assert_allclose(np.asarray(dev["scale"]), np.asarray(ref["scale"]))


def test_indivisible_group_raises():
    w = np.zeros((30, 8), np.float32)
    with pytest.raises(ValueError):
        quantize_grouped(w, group=16)
    with pytest.raises(ValueError):
        quantize_grouped_np(w, group=16)


def test_int4_tiny_model_forward_close():
    """quantize_tree(bits=4) on a tiny composite model: logits stay close to
    dense (same bar as the int8 test, wider tolerance for 4 bits)."""
    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.train import train_forward_logits

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(3), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    B, S = 1, 16
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, (B, S)), jnp.int32)
    mask = jnp.ones((B, S), jnp.int32)
    pos = jnp.full((B,), -1, jnp.int32)
    dense = train_forward_logits(params, cfg, ids, mask, pos, None)
    hidden = cfg.text_config.hidden_size
    q = quantize_tree(params, bits=4, group=min(32, hidden))
    quant = train_forward_logits(q, cfg, ids, mask, pos, None)
    err = np.abs(np.asarray(dense) - np.asarray(quant)).max()
    scale = np.abs(np.asarray(dense)).max()
    assert err < 0.25 * scale, (err, scale)


def test_int4_engine_generates():
    """End-to-end: an Engine over an int4 tree prefills and decodes."""
    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.engine.generate import Engine
    from visualcla_tpu.engine.sampling import SamplingConfig
    from visualcla_tpu.models import visualcla as vmod

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    hidden = cfg.text_config.hidden_size
    q = quantize_tree(params, bits=4, group=min(32, hidden))
    eng = Engine(q, cfg, eos_token_id=2, pad_token_id=0,
                 max_seq_len=64, prompt_buckets=(32,), dtype=jnp.float32)
    ids = jnp.asarray([[1, 5, 6, 7]], jnp.int32)
    out = eng.generate(ids, sampling=SamplingConfig.greedy(max_new_tokens=4))
    toks = np.asarray(out.tokens if hasattr(out, "tokens") else out)
    assert toks.size >= 4


def test_load_checkpoint_int4_streamed_and_sharded(tmp_path):
    """quantize='int4' on load: grouped s4 layer matmuls + lm_head, per-row
    int8 embedding, mesh placement keeps group dims unsharded inside gs."""
    from jax.sharding import Mesh

    from visualcla_tpu.checkpoint.serialize import load_checkpoint, save_checkpoint
    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.train import train_forward_logits

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    out = str(tmp_path / "ck")
    save_checkpoint(out, params, cfg, dtype="float32")

    hidden = cfg.text_config.hidden_size
    devices = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, ("data", "model"))
    qparams, cfg2 = load_checkpoint(out, mesh=mesh, quantize="int4",
                                    group=min(8, hidden))
    qp = qparams["text"]["layers"]["q_proj"]
    assert is_grouped(qp) and is_packed_grouped(qp)
    assert qp["q"].dtype == jnp.uint8  # packed s4 carrier (v2)
    assert is_grouped(qparams["text"]["lm_head"])
    emb = qparams["text"]["embed_tokens"]
    assert is_quantized(emb) and not is_grouped(emb)
    assert emb["q"].dtype == jnp.int8

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(4, cfg.text_config.vocab_size, (1, 12)), jnp.int32)
    dense = train_forward_logits(params, cfg, ids, jnp.ones_like(ids),
                                 jnp.full((1,), -1, jnp.int32), None)
    quant = train_forward_logits(qparams, cfg2, ids, jnp.ones_like(ids),
                                 jnp.full((1,), -1, jnp.int32), None)
    err = np.abs(np.asarray(dense) - np.asarray(quant)).max()
    assert err < 0.25 * np.abs(np.asarray(dense)).max()


def test_quantize_llama_tree_int4_layout():
    """bits=4: layer matmuls + lm_head grouped s4; embed stays per-row int8."""
    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    hidden = cfg.text_config.hidden_size
    q = quantize_llama_tree(params["text"], bits=4, group=min(32, hidden))
    assert is_packed_grouped(q["layers"]["q_proj"])
    assert is_grouped(q["layers"]["q_proj"])
    assert is_grouped(q["lm_head"]) and is_packed_grouped(q["lm_head"])
    assert q["embed_tokens"]["q"].dtype == jnp.int8
    assert not is_grouped(q["embed_tokens"])


def test_grouped_matmul_prefill_branch_matches():
    """Past the token-count crossover (T*4 > gs*2) q_matmul switches to
    dequantize-then-dot — the grouped (G, T, out) fp32 partials tensor would
    cost GBs at prefill sizes (code-review round 2).  Both branches must
    agree numerically."""
    rng = np.random.default_rng(3)
    w = rng.standard_normal((64, 48)).astype(np.float32) * 0.05
    wq = quantize_grouped(w, group=16, bits=4)  # gs=16: crossover at T>8
    x_small = rng.standard_normal((4, 64)).astype(np.float32)   # grouped path
    x_large = rng.standard_normal((32, 64)).astype(np.float32)  # dequant path
    want_s = x_small @ np.asarray(dequantize(wq))
    want_l = x_large @ np.asarray(dequantize(wq))
    np.testing.assert_allclose(
        np.asarray(q_matmul(jnp.asarray(x_small), wq)), want_s,
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(q_matmul(jnp.asarray(x_large), wq)), want_l,
        rtol=2e-5, atol=2e-5)


def test_grouped_leaf_tp_specs_keep_group_inner_unsharded():
    """shard_params on a grouped-int4 tree: 'model' must land on the OUT dim
    of q (..., G, gs, out) — never on gs — and q/scale shardings must agree
    (code-review round 2; mirrors checkpoint/serialize.py's streamed rule)."""
    from jax.sharding import Mesh

    from visualcla_tpu.core.config import tiny_visualcla_config
    from visualcla_tpu.models import visualcla as vmod
    from visualcla_tpu.parallel.sharding import shard_params

    cfg = tiny_visualcla_config()
    params = vmod.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    hidden = cfg.text_config.hidden_size
    gs = min(8, hidden)
    params["text"] = quantize_llama_tree(params["text"], bits=4, group=gs)
    devices = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devices, ("data", "model"))
    sharded = shard_params(params, mesh)

    qp = sharded["text"]["layers"]["q_proj"]  # column-parallel (out sharded)
    q_spec = qp["q"].sharding.spec        # (L, G, gs, out)
    s_spec = qp["scale"].sharding.spec    # (L, G, out)
    assert len(q_spec) < 3 or q_spec[2] is None  # gs never sharded
    L, G, gs_, out = qp["q"].shape
    if out % 4 == 0:
        assert tuple(q_spec)[-1] == "model" and tuple(s_spec)[-1] == "model"
    # row-parallel leaf: 'model' on the group dim G for q AND scale alike
    dp = sharded["text"]["layers"]["down_proj"]
    dq_spec = tuple(dp["q"].sharding.spec)
    ds_spec = tuple(dp["scale"].sharding.spec)
    if dp["q"].shape[1] % 4 == 0:
        assert dq_spec[1] == "model" and ds_spec[1] == "model"
    assert len(dq_spec) < 3 or dq_spec[2] is None


def test_int4_pallas_kernel_interpret_matches_xla():
    """The Pallas int4 decode kernel (interpret mode on CPU) must match the
    XLA grouped fallback and the dequantized dense matmul — stacked layer
    selection via scalar prefetch included."""
    from visualcla_tpu.ops.pallas.int4_matmul import int4_matmul
    from visualcla_tpu.ops.quantization import _q_matmul_grouped

    rng = np.random.default_rng(9)
    L, IN, OUT, gs, B = 3, 32, 24, 8, 2
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=gs, bits=4)
    x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    for layer in range(L):
        got = np.asarray(int4_matmul(
            x, wq["q"], wq["scale"], layer, interpret=True))
        sliced = {"q": wq["q"][layer], "scale": wq["scale"][layer]}
        want = np.asarray(_q_matmul_grouped(x, sliced, out_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
        dense = np.asarray(x, np.float32) @ np.asarray(dequantize(sliced))
        np.testing.assert_allclose(got, dense, rtol=2e-2, atol=2e-2)
    # unstacked (lm_head-style) single weight, layer=None
    got = np.asarray(int4_matmul(
        x, wq["q"][1], wq["scale"][1], None, interpret=True))
    want = np.asarray(_q_matmul_grouped(
        x, {"q": wq["q"][1], "scale": wq["scale"][1]},
        out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_int4_pallas_kernel_prefill_sizes_and_unpack_modes():
    """The kernel also serves single-prompt prefill (B up to MAX_TOKENS=256
    tokens — what cut the int4 TTFT), with the adaptive tile budgeting the
    whole-x VMEM block; the two nibble-decode forms agree to f32 rounding
    (the xor form's +8-biased dot accumulates in a different order and its
    -8 correction cancels ~two orders of magnitude, so ~1e-5 absolute)."""
    from visualcla_tpu.ops.pallas.int4_matmul import (
        MAX_TOKENS, _pick_tile, int4_matmul,
    )

    rng = np.random.default_rng(11)
    IN, OUT, gs = 256, 384, 128
    w = rng.standard_normal((IN, OUT)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=gs, bits=4)
    dense = np.asarray(dequantize(wq))
    for B in (176, MAX_TOKENS):
        x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32))
        want = np.asarray(x.astype(jnp.bfloat16).astype(jnp.float32)) @ dense
        ys = {}
        for mode in ("shift", "xor", "msb"):
            ys[mode] = np.asarray(int4_matmul(
                x, wq["q"], wq["scale"], interpret=True, unpack=mode))
            np.testing.assert_allclose(ys[mode], want, rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(ys["shift"], ys["xor"],
                                   rtol=1e-4, atol=1e-4)
        # msb: hi consumed in place as 16*hi with 1/16 on the activations —
        # powers of two, so each product is exact; only the lo-rebias
        # correction differs in accumulation order from "shift".
        np.testing.assert_allclose(ys["shift"], ys["msb"],
                                   rtol=1e-4, atol=1e-4)
    # the 7B down-proj shape at prefill B shrinks the tile to fit the x block
    assert _pick_tile(86, 64, 4096, 256) <= _pick_tile(86, 64, 4096, 1)
    # decode-regime picks are unchanged by the prefill accounting (B <= 8)
    assert _pick_tile(86, 64, 4096, 8) == _pick_tile(86, 64, 4096, 1)


def test_int4_pallas_kernel_scratch_variant():
    """The prefill "scratch" variant (unpack+scale once into a bf16 VMEM
    scratch, one big dot) matches the dequant-dense reference bit-for-bit in
    its numerics class, auto-dispatches above SCRATCH_MIN_TOKENS, and honors
    stacked-layer selection via scalar prefetch."""
    from visualcla_tpu.ops.pallas.int4_matmul import (
        SCRATCH_MIN_TOKENS, int4_matmul,
    )

    rng = np.random.default_rng(13)
    L, IN, OUT, gs = 2, 256, 384, 128
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=gs, bits=4)
    B = 64
    x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32))
    for layer in range(L):
        got = np.asarray(int4_matmul(
            x, wq["q"], wq["scale"], layer, interpret=True,
            variant="scratch"))
        sliced = {"q": wq["q"][layer], "scale": wq["scale"][layer]}
        # same numerics class as the dequant-dense path: f32 dequant
        # rounded once to bf16, bf16 x, f32 accumulate
        dense = np.asarray(
            x.astype(jnp.bfloat16).astype(jnp.float32)
            @ dequantize(sliced, jnp.bfloat16).astype(jnp.float32))
        np.testing.assert_allclose(got, dense, rtol=2e-2, atol=2e-2)
        # auto-dispatch: B >= SCRATCH_MIN_TOKENS with no explicit unpack
        # takes the scratch path — identical output
        assert B >= SCRATCH_MIN_TOKENS
        auto = np.asarray(int4_matmul(
            x, wq["q"], wq["scale"], layer, interpret=True))
        np.testing.assert_array_equal(got, auto)
    # below the crossover the auto path is the per-group decode form
    x1 = x[:1]
    a = np.asarray(int4_matmul(x1, wq["q"], wq["scale"], 0, interpret=True))
    g = np.asarray(int4_matmul(x1, wq["q"], wq["scale"], 0, interpret=True,
                               variant="group"))
    np.testing.assert_array_equal(a, g)


def test_int4_pallas_kernel_tiled_variant_long_prefill():
    """The token-tiled scratch variant (grid (out_tiles, token_tiles), weight
    tile unpacked once per out tile into persistent VMEM scratch) serves
    token counts past MAX_TOKENS — the reference's 2048-context prefill —
    with identical numerics to the whole-x scratch form, auto-dispatches
    above MAX_TOKENS, handles stacked-layer selection, a ragged final token
    tile (padding), and out widths that don't divide the out tile."""
    from visualcla_tpu.ops.pallas.int4_matmul import (
        MAX_TOKENS, _pick_tiles_tiled, int4_matmul,
    )

    rng = np.random.default_rng(17)
    L, IN, OUT, gs = 2, 256, 384, 128
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=gs, bits=4)
    B = MAX_TOKENS + 64
    x = jnp.asarray(rng.standard_normal((B, IN)).astype(np.float32))
    for layer in range(L):
        got = np.asarray(int4_matmul(
            x, wq["q"], wq["scale"], layer, interpret=True,
            variant="tiled", tile=256))
        sliced = {"q": wq["q"][layer], "scale": wq["scale"][layer]}
        dense = np.asarray(
            x.astype(jnp.bfloat16).astype(jnp.float32)
            @ dequantize(sliced, jnp.bfloat16).astype(jnp.float32))
        np.testing.assert_allclose(got, dense, rtol=2e-2, atol=2e-2)
        # auto-dispatch past MAX_TOKENS takes the tiled path
        auto = np.asarray(int4_matmul(
            x, wq["q"], wq["scale"], layer, interpret=True))
        np.testing.assert_allclose(auto, dense, rtol=2e-2, atol=2e-2)
    # ragged token count: pad-and-slice keeps exact rows
    x_rag = x[:MAX_TOKENS + 17]
    got = np.asarray(int4_matmul(
        x_rag, wq["q"], wq["scale"], 0, interpret=True, variant="tiled"))
    assert got.shape == (MAX_TOKENS + 17, OUT)
    full = np.asarray(int4_matmul(
        x, wq["q"], wq["scale"], 0, interpret=True, variant="tiled"))
    np.testing.assert_array_equal(got, full[:MAX_TOKENS + 17])
    # tile planner: 7B shapes fit the VMEM budget with >=128-lane tiles
    for (G, gsh, out) in ((32, 64, 4096), (32, 64, 11008),
                          (86, 64, 4096), (32, 64, 50048)):
        tb, to = _pick_tiles_tiled(G, gsh, out)
        in_dim = 2 * gsh * G
        use = (2 * tb * in_dim * 2 + 2 * G * (gsh + 4) * to
               + 2 * in_dim * to + 2 * 4 * tb * to)
        assert to >= 128 and tb >= 64
        assert use <= 10 * 2**20, (G, gsh, out, tb, to, use)


def test_lazy_stacked_dispatch_matches_sliced():
    """q_matmul on a lazy {"q","scale","layer"} stacked dict (the decode
    loops' deferred slice) must equal slicing first (CPU: XLA fallback)."""
    rng = np.random.default_rng(10)
    L, IN, OUT, gs = 3, 32, 24, 8
    w = rng.standard_normal((L, IN, OUT)).astype(np.float32) * 0.1
    wq = quantize_grouped(w, group=gs, bits=4)
    x = jnp.asarray(rng.standard_normal((2, IN)).astype(np.float32))
    for layer in range(L):
        lazy = {"q": wq["q"], "scale": wq["scale"],
                "layer": jnp.int32(layer)}
        got = np.asarray(q_matmul(x, lazy))
        sliced = {"q": wq["q"][layer], "scale": wq["scale"][layer]}
        want = np.asarray(q_matmul(x, sliced))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
