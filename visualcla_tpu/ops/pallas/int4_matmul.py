"""Pallas grouped-int4 decode matmul for TPU (v5e-tuned).

Replaces the XLA formulations of the int4 weight tier for decode-sized token
counts.  Why a kernel at all: XLA cannot consume 4-bit weights efficiently on
this chip — a plain dot with an s4 RHS measured SLOWER than the same dot with
int8 despite half the HBM bytes (tools/probe_int4.py), and the round-2
grouped dot_general shipped at 47.6 tok/s vs int8's 101.0 at 7B B=1
(BENCH_r02).  Here the packed bytes stream HBM->VMEM untouched (0.5 B/param),
nibbles unpack in VREGs with int32 shifts (Mosaic has no int8 shifts), and
the MXU consumes bf16 halves — in-loop per-site trace means (round 5,
shipped tile): 547-663 GB/s effective weight bandwidth across the 7B
decode shapes, 67-81% of the 819 GB/s chip roofline (BENCHMARKS round-5
closing table; the residual is VPU nibble-unpack compute).

Format (ops/quantization.py "v2"): carrier uint8 (L, G, gs/2, out) where
byte[g, r, o] holds W4[g, r, o] (low nibble) and W4[g, r + gs/2, o] (high);
scale f32 (L, G, out).  The kernel's grid covers output tiles only; the
whole contraction (all G groups) for one tile is a single VMEM block, so the
per-matmul grid is tiny (4-49 programs) and Mosaic pipelines the next tile's
weight DMA behind the current tile's unpack+dot loop.

The LAYER of a stacked weight is selected by the BlockSpec index map from a
scalar-prefetch operand — the caller passes the full (L, G, gs/2, out)
carrier and the traced layer index, so no per-layer slice of the weight is
ever materialized in HBM (a dynamic_index feeding a custom call would copy
0.5 B/param per matmul per decode step).

Replaces: bitsandbytes' quantized-serving role (reference
scripts/inference/inference.py:24-25) at the 4-bit tier the reference lacks.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM plan: double-buffered weight block 2*G*(gs/2)*TO + scale 2*G*TO*4 +
# x (B, G, gs) bf16 (whole-block, shared by every output tile) + out (B, TO)
# f32 + two bf16 dot temps.  Budget leaves ~4 MB of the 16 MB VMEM for
# Mosaic's own scratch (the G=86 down_proj at TO=1024 measured a 22.89M
# scoped-vmem OOM, hence the adaptive tile).  B above decode size (the
# prefill regime, up to MAX_TOKENS) shrinks the tile further: the x block
# and the f32 out/acc now count.
_VMEM_BUDGET = 10 * 2**20

# Token ceiling for the WHOLE-X kernel forms: one x VMEM block.  Past this
# (long prompts, batched prefill) the TILED scratch variant takes over —
# grid (out_tiles, token_tiles) with the token dim minor, so the unpacked
# bf16 weight tile in VMEM scratch is built once per output tile (the qw
# BlockSpec ignores the token index; Mosaic re-fetches nothing) and every
# token tile consumes it with one MXU dot.  Weight HBM traffic stays
# 0.5 B/param for the whole matmul at ANY token count — the dequant-dense
# fallback this replaces wrote+read a full bf16 weight temp (2+2 B/param)
# plus the per-layer carrier slice, measured +49 ms on a 7B S=2048 prefill
# (int4 282.8 ms vs int8 233.4, tools/probe_prefill.py round 5).
MAX_TOKENS = 256


def _pick_tile(G: int, gsh: int, out: int, B: int = 1) -> int:
    import os

    env = os.environ.get("VISUALCLA_INT4_TILE")  # A/B probing override
    if env:
        return min(int(env), ((out + 127) // 128) * 128)
    per_lane = 2 * G * (gsh + 4)  # carrier (1B) + scale (4B), double-buffered
    budget = _VMEM_BUDGET
    if B > 8:  # prefill regime: the x block and f32 out/acc now matter
        budget = max(budget - B * G * 2 * gsh * 2, per_lane * 128)
        per_lane += B * 4 * 2
    to = budget // per_lane
    # tile cap 1024, not the VMEM-maximal 2048 (round-5 end-to-end A/B):
    # at out=4096 a 2048 tile leaves TWO grid steps per call — too few for
    # Mosaic to pipeline the weight DMA behind the unpack+dot — and the
    # per-site trace showed qkv/o at 462 GB/s effective vs gate/up's 550.
    # Capping at 1024 (>=4 steps/call) measured 147.0 vs 133.4 tok/s B1
    # and 855.0 vs 792.8 B8 (tools/probe_decode_tput.py, int4 7B);
    # 512 over-pays grid iteration overhead (142.6 B1).
    to = min(1024, max(128, (to // 128) * 128))
    return min(to, ((out + 127) // 128) * 128)


def _kernel(layer_ref, xs_ref, *rest, n_groups, unpack):
    # xs_ref (B, G, gs) bf16; qw_ref (1, G, gsh, TO) uint8; s_ref (1, G, TO);
    # msb additionally gets xs_hi (B, G, gsh) bf16 and xlo_sum (B, G) f32,
    # PRE-COMPUTED OUTSIDE the kernel: the round-4 in-model A/B measured the
    # in-kernel prep a net loss (129.6 vs 132.1 tok/s B1) because it re-ran
    # per output tile in the slot the weight-DMA wait used to cover; hoisted
    # to XLA it runs once per matmul.
    if unpack == "msb":
        xs_hi_ref, xlo_ref, qw_ref, s_ref, o_ref = rest
    else:
        qw_ref, s_ref, o_ref = rest
    B = xs_ref.shape[0]
    TO = o_ref.shape[-1]
    gsh = qw_ref.shape[2]
    acc = jnp.zeros((B, TO), jnp.float32)
    for g in range(n_groups):  # static unroll: G is 8..86 at 7B shapes
        xg = xs_ref[:, g, :]  # (B, gs) — static index, loop is unrolled
        if unpack == "shift":
            # int32 widen: Mosaic cannot legalize shifts on int8 vregs.  The
            # zero-extended byte sign-extends per nibble: bits 0..3 -> lo,
            # 4..7 -> hi (matches quantization.unpack_s4_rows).
            b = qw_ref[0, g].astype(jnp.int32)  # (gsh, TO)
            lo = jnp.right_shift(jnp.left_shift(b, 28), 28)
            hi = jnp.right_shift(jnp.left_shift(b, 24), 28)
            y = jnp.dot(xg[:, :gsh], lo.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(xg[:, gsh:], hi.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        elif unpack == "msb":
            # Shift-free unpack: v ^ 0x08 adds 8 to the LOW nibble (mod 16)
            # and leaves the high bits alone, so the lo half reads out with
            # one AND (0..15, valid as int8); the HIGH nibble never moves —
            # (u & 0xF0) bitcast to int8 is exactly 16*hi for hi in -8..7
            # (two's complement, low bits zero).  No shift and no int32
            # widen anywhere: the 1/16 rides on the hi activations (exact,
            # prescaled above) and the lo -8 bias folds into the usual
            # per-group correction.  Removes the three full-width int32 VPU
            # passes that made "xor" unpack-bound on the square shapes.
            u = jnp.bitwise_xor(qw_ref[0, g], jnp.uint8(0x08))
            lo_u = jnp.bitwise_and(u, jnp.uint8(0x0F)).astype(jnp.int8)
            hi16 = jax.lax.bitcast_convert_type(
                jnp.bitwise_and(u, jnp.uint8(0xF0)), jnp.int8)
            y = jnp.dot(xg[:, :gsh], lo_u.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(xs_hi_ref[:, g, :], hi16.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            y = y - 8.0 * xlo_ref[:, g][:, None]
        else:  # "xor": excess-8 unpack, bias folded into a correction term.
            # v XOR 8 == v + 8 (mod 16) for a two's-complement nibble, so one
            # uint8 XOR re-biases BOTH nibbles at once; the unsigned halves
            # then split with one AND (stays uint8) and one logical shift
            # (int32 widen only for the hi half).  The MXU consumes
            # (W4 + 8) and the -8 comes back as  -8 * sum(x_g)  per group —
            # exact integer math, two fewer VPU passes per weight byte than
            # the arithmetic-shift form.
            u = jnp.bitwise_xor(qw_ref[0, g], jnp.uint8(0x88))  # (gsh, TO)
            # u8->bf16 is an unsupported Mosaic cast; the 0..15 lo half is
            # value-identical as int8, and s8->bf16 legalizes (the int8-KV
            # flash path relies on it).
            lo_u = jnp.bitwise_and(u, jnp.uint8(0x0F)).astype(jnp.int8)
            hi_u = jnp.right_shift(u.astype(jnp.int32), 4)
            y = jnp.dot(xg[:, :gsh], lo_u.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            y = y + jnp.dot(xg[:, gsh:], hi_u.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            y = y - 8.0 * jnp.sum(xg, axis=-1, dtype=jnp.float32)[:, None]
        acc = acc + y * s_ref[0, g][None, :]
    o_ref[:] = acc


def _unpack_weight_tile(qw_ref, s_ref, w_ref, n_groups):
    """Unpack + scale one (in, TO) weight tile into the bf16 VMEM scratch
    (excess-8 xor nibble decode; f32 dequant rounded once to bf16 — the same
    numerics class as the dequant-dense path this replaces)."""
    gsh = qw_ref.shape[2]
    gs = 2 * gsh
    for g in range(n_groups):  # static unroll
        u = jnp.bitwise_xor(qw_ref[0, g], jnp.uint8(0x88))  # (gsh, TO)
        lo = jnp.bitwise_and(u, jnp.uint8(0x0F)).astype(jnp.int8)
        hi = jnp.right_shift(u.astype(jnp.int32), 4)
        s = s_ref[0, g][None, :]  # (1, TO) f32
        w_ref[g * gs:g * gs + gsh, :] = (
            (lo.astype(jnp.float32) - 8.0) * s).astype(jnp.bfloat16)
        w_ref[g * gs + gsh:(g + 1) * gs, :] = (
            (hi.astype(jnp.float32) - 8.0) * s).astype(jnp.bfloat16)


def _kernel_scratch(layer_ref, xs_ref, qw_ref, s_ref, o_ref, w_ref, *,
                    n_groups):
    """Prefill variant: unpack + scale the weight tile ONCE into a bf16 VMEM
    scratch, then one large MXU dot over the full contraction.

    The decode kernel's per-group accumulate does ~4 VPU passes over a
    (B, TO) f32 accumulator per group (correction + scale + add); at B = 1
    that is nothing, but at prefill token counts it scales with B x G and
    dominates (measured: the decode form at T=128 costs ~2x int8's plain
    dot, the whole int4-vs-int8 TTFT gap).  Here the per-byte unpack work is
    identical but touches only weight-shaped data, and the MXU consumes the
    scratch in one (B, in) @ (in, TO) dot — the same numerics class as the
    dequant-dense path (f32 dequant rounded once to bf16), which this
    replaces at 0.5 B/param HBM traffic instead of 2 full bf16 weight
    temps."""
    _unpack_weight_tile(qw_ref, s_ref, w_ref, n_groups)
    B = xs_ref.shape[0]
    x2d = xs_ref[:].reshape(B, -1)
    o_ref[:] = jnp.dot(x2d, w_ref[:],
                       preferred_element_type=jnp.float32)


def _kernel_scratch_tiled(layer_ref, xs_ref, qw_ref, s_ref, o_ref, w_ref, *,
                          n_groups):
    """Long/batched-prefill variant: grid (out_tiles, token_tiles), token
    minor.  The unpacked bf16 weight tile is built into VMEM scratch once
    per OUTPUT tile (j == 0; the scratch persists across grid steps and the
    qw BlockSpec ignores the token index, so Mosaic neither re-fetches nor
    re-unpacks) and every token tile consumes it with one MXU dot.  Weight
    HBM traffic stays 0.5 B/param at ANY token count, but the X BLOCK is
    re-read once per output tile — so this form wins only where the VMEM
    plan allows wide tiles (qkv/gate-up: end-to-end 7B S=1024 prefill
    146.5 ms vs 184.1 all-dequant) and LOSES on narrow-tile shapes (the
    down_proj at S=2048); the per-shape router
    (ops/quantization.py:_tiled_prefill_wins) models exactly that traffic
    trade, landing S=2048 at 255.1 ms vs 282.8 all-dequant / 302.3
    all-tiled (tools/probe_prefill.py round 5)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _build():
        _unpack_weight_tile(qw_ref, s_ref, w_ref, n_groups)

    TB = xs_ref.shape[0]
    x2d = xs_ref[:].reshape(TB, -1)
    o_ref[:] = jnp.dot(x2d, w_ref[:],
                       preferred_element_type=jnp.float32)


def _pick_tile_scratch(G: int, gsh: int, out: int, B: int) -> int:
    """Tile width for the scratch variant: carrier+scale double-buffered,
    plus the bf16 (in, TO) scratch and f32 (B, TO) out per lane; the (B, in)
    x block is lane-independent and comes off the budget."""
    in_dim = 2 * gsh * G
    budget = _VMEM_BUDGET - B * in_dim * 2  # x block
    per_lane = 2 * G * (gsh + 4) + 2 * in_dim + 4 * B
    to = max(budget, per_lane * 128) // per_lane
    to = min(2048, max(128, (to // 128) * 128))
    return min(to, ((out + 127) // 128) * 128)


def _pick_tiles_tiled(G: int, gsh: int, out: int) -> tuple[int, int]:
    """(token_tile, out_tile) for the tiled scratch variant.  Both the x
    block (varies over j) and the carrier+scale (vary over i) are
    double-buffered by Mosaic; the bf16 (in, TO) scratch and the f32
    (TB, TO) out block complete the plan.  Prefer the largest token tile
    that still leaves a >=128-lane output tile (a wider token tile
    amortizes the per-out-tile scratch rebuild over more MXU work)."""
    in_dim = 2 * gsh * G
    for tb in (512, 256, 128, 64):
        budget = _VMEM_BUDGET - 2 * tb * in_dim * 2  # x, double-buffered
        per_lane = 2 * G * (gsh + 4) + 2 * in_dim + 2 * 4 * tb
        to = budget // per_lane
        to = min(2048, (to // 128) * 128)
        if to >= 128:
            return tb, min(to, ((out + 127) // 128) * 128)
    return 64, 128


# Token count at which the scratch (one-dot) variant takes over from the
# per-group decode form.  The decode form's accumulator work scales with
# B x G; the scratch form pays a fixed bf16 materialization per tile.
# Measured crossover on v5e: decode form wins to B~16, scratch above.
SCRATCH_MIN_TOKENS = 17


def _pick_unpack(in_dim: int, out: int) -> str:
    """Nibble-decode selection.  Round-4 verdict item: the shipped-untested
    "msb" unpack was measured on chip (tools/probe_int4_tile.py, 512
    in-program iters, 2026-08-19).  ISOLATED, msb wins the unpack-bound
    shapes:

      qkv/o   (in  4096, out  4096): msb  84.3 us vs xor 108.3  (-22%)
      gate/up (in  4096, out 11008): msb  94.8 us vs xor  99.3  (-4.5%)
      down    (in 11008, out  4096): xor  98.2 us vs msb 100.5
      lm_head (in  4096, out 50048): xor 210.1 us vs msb 215.6

    IN-MODEL, however, the full 7B bench A/B (bench.py --only-int4, warm,
    same session) measured the per-shape msb/xor mix SLOWER than all-xor —
    B1 129.1-129.6 vs 132.1 tok/s, B8 817-837 vs 858 — the msb form's
    activation prep (xs_hi scale + xlo_sum over the whole x block)
    re-ran per output tile and landed in the shadow the weight-DMA wait
    previously covered.  HOISTING that prep out of the kernel (computed
    once per matmul in XLA, passed as operands) did NOT recover the win:
    re-A/B on chip (2026-08-19) measured hoisted-msb 124.6 tok/s B1 /
    797.0 B8 vs all-xor 132.5 / 846.9 — the two extra VMEM operand
    streams per tile cost more than the saved int32 widen+shift passes.
    The measured end-to-end winner ("xor") is the default;
    VISUALCLA_INT4_UNPACK=msb|shift|xor overrides for probing."""
    import os

    mode = os.environ.get("VISUALCLA_INT4_UNPACK", "auto")
    if mode in ("xor", "msb", "shift"):
        return mode
    return "xor"


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "unpack", "variant"))
def int4_matmul(x, qw, scale, layer=None, *, interpret: bool | None = None,
                tile: int | None = None, unpack: str | None = None,
                variant: str | None = None):
    """x (B, in) @ v2-packed grouped int4 -> (B, out) f32.

    qw uint8 (L, G, gs/2, out) stacked (pass ``layer``) or (G, gs/2, out)
    unstacked (layer=None); scale f32 matches.  B is the token count — any
    size: decode takes the per-group form, short prefill the whole-x scratch
    form, and past MAX_TOKENS the token-tiled scratch form (one weight pass
    at 0.5 B/param regardless of token count).
    ``tile`` overrides the adaptive output-tile width (probing only);
    ``unpack`` picks the in-kernel nibble decode (None = the measured
    per-shape winner, :func:`_pick_unpack`) — "xor" (excess-8) measured
    -28% on the square shapes / -17% per 7B layer vs the "shift"
    arithmetic form on the v5e (tools/probe_int4_tile.py, 2026-08-19);
    "msb" (shift-free: hi nibble consumed in place as 16*hi with the 1/16
    folded into the activations) removes the remaining int32 VPU passes."""
    if qw.ndim == 3:
        qw = qw[None]
        scale = scale[None]
        layer = jnp.int32(0) if layer is None else layer
    B, in_dim = x.shape
    L, G, gsh, out = qw.shape
    gs = 2 * gsh
    if G * gs != in_dim:
        raise ValueError(f"x in_dim {in_dim} != G*gs {G}*{gs} of {qw.shape}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if variant is None:
        import os

        env = os.environ.get("VISUALCLA_INT4_VARIANT")
        if env in ("group", "scratch", "tiled"):
            variant = env  # A/B probing override
        elif B > MAX_TOKENS:
            variant = "tiled"  # long/batched prefill: token-tiled scratch
        else:
            # explicit unpack= pins the per-group form (probing/tests)
            variant = ("scratch" if B >= SCRATCH_MIN_TOKENS and unpack is None
                       else "group")
    if variant not in ("group", "scratch", "tiled"):
        raise ValueError(f"unknown variant {variant!r}")
    if variant == "tiled":
        tb, to = _pick_tiles_tiled(G, gsh, out)
        if tile:
            to = tile
        pad = (-B) % tb
        if pad:  # ragged final token tile: pad x, slice the result
            x = jnp.pad(x, ((0, pad), (0, 0)))
        xs = x.astype(jnp.bfloat16).reshape(-1, G, gs)
        Bp = xs.shape[0]
        y = pl.pallas_call(
            functools.partial(_kernel_scratch_tiled, n_groups=G),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(pl.cdiv(out, to), Bp // tb),
                in_specs=[
                    pl.BlockSpec((tb, G, gs), lambda i, j, l: (j, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, G, gsh, to), lambda i, j, l: (l[0], 0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, G, to), lambda i, j, l: (l[0], 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tb, to), lambda i, j, l: (j, i),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[pltpu.VMEM((in_dim, to), jnp.bfloat16)],
            ),
            out_shape=jax.ShapeDtypeStruct((Bp, out), jnp.float32),
            interpret=interpret,
        )(jnp.asarray(layer, jnp.int32).reshape(1), xs, qw, scale)
        return y[:B] if pad else y
    xs = x.astype(jnp.bfloat16).reshape(B, G, gs)
    if variant == "scratch":
        to = tile or _pick_tile_scratch(G, gsh, out, B)
        kern = functools.partial(_kernel_scratch, n_groups=G)
        scratch = [pltpu.VMEM((in_dim, to), jnp.bfloat16)]
    else:
        to = tile or _pick_tile(G, gsh, out, B)
        if unpack is None:
            unpack = _pick_unpack(in_dim, out)
        if unpack not in ("shift", "xor", "msb"):
            raise ValueError(f"unknown unpack mode {unpack!r}")
        kern = functools.partial(_kernel, n_groups=G, unpack=unpack)
        scratch = []
    grid = (pl.cdiv(out, to),)
    in_specs = [
        pl.BlockSpec((B, G, gs), lambda i, l: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [xs]
    if variant == "group" and unpack == "msb":
        # Hoisted msb prep (once per matmul, fused into the surrounding XLA
        # program): hi-half activations prescaled by 1/16 (exact — undoes the
        # in-place (u & 0xF0) == 16*hi encoding) and the lo-rebias sums.
        in_specs += [
            pl.BlockSpec((B, G, gsh), lambda i, l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, G), lambda i, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [
            xs[:, :, gsh:] * jnp.bfloat16(0.0625),
            jnp.sum(xs[:, :, :gsh].astype(jnp.float32), axis=-1),
        ]
    in_specs += [
        pl.BlockSpec((1, G, gsh, to), lambda i, l: (l[0], 0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, G, to), lambda i, l: (l[0], 0, i),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((B, to), lambda i, l: (0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        ),
        out_shape=jax.ShapeDtypeStruct((B, out), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands, qw, scale)
