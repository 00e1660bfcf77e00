"""Generation engine: jitted multimodal prefill + KV-cached decode.

Replaces HF ``GenerationMixin.generate`` as used by the reference
(modeling_visualcla.py:382-391).  Reference semantics preserved:
- generate() is called with ``inputs_embeds`` so the returned ids contain ONLY
  generated tokens, and processors see only the generated context;
- stop on EOS or max_new_tokens; batch rows that finish early are padded.

Two decode drivers share one jitted step:
- ``generate``: fully-fused ``lax.while_loop`` on device (bench/serving path) —
  zero host round-trips until the loop exits;
- ``stream``: per-token jitted step driven from Python, yielding each token
  (the TPU analog of the reference's Stream/Iteratorize thread+queue,
  modeling_utils.py:404-472 — no threads needed: the generator IS the loop).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VisualCLAConfig
from ..models import llama, visualcla
from .sampling import SamplingConfig, sample_step


def hbm_limit() -> float:
    """Per-chip HBM budget used by the loop-structure fit policies (Engine
    decode, paged step_n, fused beam).  VISUALCLA_HBM_BYTES overrides."""
    import os

    return float(os.environ.get("VISUALCLA_HBM_BYTES", 0)) or (
        16e9 if jax.default_backend() == "tpu" else float("inf")
    )


def pick_bucket(buckets: Tuple[int, ...], n: int) -> int:
    """Smallest bucket >= n (shared by all engines so policies can't drift)."""
    if not buckets:
        raise ValueError(
            "no prompt buckets configured (every bucket exceeded max_seq_len?)"
        )
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"prompt length {n} exceeds max bucket {buckets[-1]}")


@dataclasses.dataclass
class DecodeState:
    """Pytree carried through the decode loop."""

    cache: dict
    kv_valid: jnp.ndarray  # (B, Smax) bool
    cur_slot: jnp.ndarray  # () int32 — next cache slot to write
    positions: jnp.ndarray  # (B,) int32 — next rope position per row
    gen_ids: jnp.ndarray  # (B, T) int32 generated tokens
    gen_len: jnp.ndarray  # () int32 number of decode steps taken
    last_token: jnp.ndarray  # (B,) int32
    finished: jnp.ndarray  # (B,) bool
    key: jax.Array
    mu: jnp.ndarray  # (B,) fp32 mirostat state


jax.tree_util.register_dataclass(
    DecodeState,
    data_fields=[
        "cache", "kv_valid", "cur_slot", "positions", "gen_ids", "gen_len",
        "last_token", "finished", "key", "mu",
    ],
    meta_fields=[],
)


class Engine:
    """Owns the jitted prefill/decode programs for one model + static shapes.

    Prompts are LEFT-padded to a bucket length so the last prompt token always
    sits at the bucket's final slot and decode writes contiguously after it —
    one compiled program per bucket, static shapes everywhere.
    """

    def __init__(
        self,
        params,
        cfg: VisualCLAConfig,
        *,
        eos_token_id: int,
        pad_token_id: int = 0,
        max_seq_len: int = 2048,
        prompt_buckets: Tuple[int, ...] = (128, 256, 512, 1024, 2048),
        dtype=jnp.bfloat16,
        mesh=None,
        kv_quant: str = "none",  # "int8": half the KV cache bytes/bandwidth
    ):
        self.params = params
        self.cfg = cfg
        self.eos_token_id = eos_token_id
        self.pad_token_id = pad_token_id
        self.max_seq_len = max_seq_len
        self.prompt_buckets = tuple(b for b in prompt_buckets if b <= max_seq_len)
        if not self.prompt_buckets:
            raise ValueError(
                f"no prompt bucket <= max_seq_len={max_seq_len} "
                f"(buckets={prompt_buckets})"
            )
        self.dtype = dtype
        if kv_quant not in ("none", "int8"):
            raise ValueError(f"kv_quant must be 'none' or 'int8', got {kv_quant!r}")
        self.kv_quant = kv_quant
        self.mesh = mesh  # when set, KV cache is sharded (batch on 'data',
        # kv heads on 'model') and GSPMD propagates TP from the param shardings
        from ..utils.profiling import PhaseTimer

        self.timer = PhaseTimer()  # per-phase prefill/decode timings

        # Jitted programs run under an attention-mesh SCOPE (not a process
        # global set at construction): the flash kernel shard_maps over this
        # engine's mesh — or runs single-device when mesh is None — even when
        # meshed and unmeshed engines coexist in one process.  Indivisible
        # head/batch counts fall back to dense-XLA attention, which GSPMD
        # partitions itself.
        self._prefill = self._scoped(jax.jit(
            self._prefill_impl, static_argnames=("sampling",), donate_argnames=("cache",)
        ))
        self._embed = self._scoped(jax.jit(self._embed_impl))
        self._prefill_from_embeds = self._scoped(jax.jit(
            self._prefill_from_embeds_impl, static_argnames=("sampling",),
            donate_argnames=("cache",)))
        self._decode_step = self._scoped(jax.jit(
            self._decode_step_impl, static_argnames=("sampling",), donate_argnames=("state",)
        ))
        self._decode_loop_flat = self._scoped(jax.jit(
            self._decode_loop_impl,
            static_argnames=("sampling",),
            donate_argnames=("state",),
        ))
        self._decode_loop_nested = self._scoped(jax.jit(
            self._decode_loop_nested_impl,
            static_argnames=("sampling",),
            donate_argnames=("state",),
        ))
        self._params_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree.leaves(params)
        )

    def _scoped(self, fn):
        """Wrap a jitted program so tracing sees this engine's mesh."""
        from ..ops.attention import attention_mesh_scope

        @functools.wraps(fn)
        def wrapped(*a, **kw):
            with attention_mesh_scope(self.mesh):
                return fn(*a, **kw)

        return wrapped

    def _decode_loop(self, params, state: DecodeState, sampling, max_steps):
        """Fused decode: pick the loop structure by HBM fit.

        The NESTED loop (while over steps, layer scan inside) is ~15% faster
        per step — XLA pipelines the scan's weight slices — but at batch >= 4
        XLA pins relayouted q/k/v_proj copies (~3/16 of the stacked weight
        bytes).  The FLAT loop (one while over step x layer) pays only a
        ~0.38GB lm_head relayout.  Measured on v5e
        (tools/probe_fused_loop.py): L16/B8 bf16 nested 634 vs flat 556
        tok/s; full-size bf16 B8 only COMPILES flat.  The 4.2x-cache formula
        below empirically matches the measured fits at the sizes we run
        (cache and qkv bytes track each other there);
        VISUALCLA_DECODE_LOOP=flat|nested pins."""
        import os

        impl = os.environ.get("VISUALCLA_DECODE_LOOP")
        if impl not in ("flat", "nested"):
            cache_bytes = sum(
                int(np.prod(x.shape)) * x.dtype.itemsize
                for x in jax.tree.leaves(state.cache)
            )
            limit = hbm_limit()
            # int8-KV caches carry 4 leaves + in-loop dequant transients;
            # measured: 7B bf16 weights + int8 KV at B8 OOMs nested even
            # though the 4.2x estimate said it fit — be conservative there
            mult = 8.0 if "k_scale" in state.cache else 4.2
            need = self._params_bytes + mult * cache_bytes + 0.5e9
            impl = "nested" if need < limit else "flat"
        fn = (self._decode_loop_nested if impl == "nested"
              else self._decode_loop_flat)
        return fn(params, state, sampling, max_steps)

    # -- bucket / padding ---------------------------------------------------

    def bucket_len(self, prompt_len: int) -> int:
        return pick_bucket(self.prompt_buckets, prompt_len)

    def pad_prompt(self, input_ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Left-pad (B, S) prompt ids to a bucket.  Returns (padded_ids, mask).

        Caller-provided LEADING pads (id == pad_token_id) are honored: their
        mask is 0, so positions (cumsum of mask - 1) and kv validity treat the
        row as starting at its first real token — batched uneven-length
        prompts decode like their single-row equivalents."""
        B, S = input_ids.shape
        L = self.bucket_len(S)
        ids = np.full((B, L), self.pad_token_id, np.int32)
        mask = np.zeros((B, L), np.int32)
        ids[:, L - S :] = input_ids
        mask[:, L - S :] = 1
        real = input_ids != self.pad_token_id
        lead = np.where(real.any(axis=1), real.argmax(axis=1), S)  # (B,)
        mask[np.arange(L)[None, :] < (L - S + lead)[:, None]] = 0
        return ids, mask

    # -- jitted impls ---------------------------------------------------------

    def _embed_impl(self, params, input_ids, img_start_pos, pixel_values):
        """Stage 1 of the SPLIT prefill: ViT encode + resampler + splice.
        Its own jitted program so the B>=2 multimodal prefill never builds
        the one combined graph this deployment's compile helper rejects
        (bench.py round-4 note; DEVNOTES roadmap) — the text tower's stage
        2 then takes precomputed embeds."""
        return visualcla.multimodal_embeds(
            params, self.cfg, input_ids, img_start_pos, pixel_values)

    def _prefill_impl(
        self, params, input_ids, attention_mask, img_start_pos, pixel_values,
        cache, key, sampling: SamplingConfig,
    ):
        embeds = visualcla.multimodal_embeds(
            params, self.cfg, input_ids, img_start_pos, pixel_values)
        return self._prefill_core(params, embeds, attention_mask, cache, key,
                                  sampling)

    def _prefill_from_embeds_impl(self, params, embeds, attention_mask,
                                  cache, key, sampling: SamplingConfig):
        """Stage 2 of the split prefill: text tower from precomputed embeds
        (same math as _prefill_impl — the splice is associative with the
        program boundary)."""
        return self._prefill_core(params, embeds, attention_mask, cache, key,
                                  sampling)

    def _prefill_core(
        self, params, embeds, attention_mask, cache, key,
        sampling: SamplingConfig,
    ):
        cfg = self.cfg
        B, S = embeds.shape[:2]
        Smax = cache["k"].shape[3]
        positions = jnp.maximum(jnp.cumsum(attention_mask, axis=-1) - 1, 0).astype(jnp.int32)
        kv_valid = jnp.concatenate(
            [attention_mask.astype(bool), jnp.zeros((B, Smax - S), bool)], axis=-1
        )
        # CP: with a 'seq' mesh axis, prefill attention rides the ICI ring
        # (parallel/ring.py) — long prompts shard over devices instead of
        # hitting one chip's memory/attention ceiling
        ring_axis = (
            "seq" if (self.mesh is not None and "seq" in self.mesh.axis_names
                      and S % self.mesh.shape["seq"] == 0)
            else None
        )
        hidden, cache = llama.forward(
            params["text"], cfg.text_config, embeds, positions, cache,
            kv_valid, jnp.int32(0), ring_axis=ring_axis,
        )
        last_logits = llama.logits(params["text"], hidden[:, -1:, :])[:, 0]  # (B, V)

        T = sampling.max_new_tokens
        gen_ids = jnp.zeros((B, T), jnp.int32)
        gen_len = jnp.int32(0)
        key, sub = jax.random.split(key)
        mu = jnp.full((B,), 2.0 * sampling.mirostat_tau, jnp.float32)
        token, mu = sample_step(last_logits, gen_ids, jnp.zeros((B,), jnp.int32), sub, mu, sampling)
        gen_ids = gen_ids.at[:, 0].set(token)
        finished = token == self.eos_token_id
        state = DecodeState(
            cache=cache,
            kv_valid=kv_valid,
            cur_slot=jnp.int32(S),
            positions=positions[:, -1] + 1,
            gen_ids=gen_ids,
            gen_len=jnp.int32(1),
            last_token=token,
            finished=finished,
            key=key,
            mu=mu,
        )
        return state

    def _sample_tail(self, state: DecodeState, cache, kv_valid, step_logits,
                     sampling: SamplingConfig) -> DecodeState:
        """Shared post-forward step finalization: sample the next token and
        advance slot/position/eos bookkeeping."""
        B = state.last_token.shape[0]
        key, sub = jax.random.split(state.key)
        gen_len_b = jnp.full((B,), state.gen_len, jnp.int32)
        token, mu = sample_step(step_logits, state.gen_ids, gen_len_b, sub,
                                state.mu, sampling)
        # finished rows keep emitting pad (HF pads finished rows)
        token = jnp.where(state.finished, jnp.int32(self.pad_token_id), token)
        gen_ids = state.gen_ids.at[:, state.gen_len].set(token)
        finished = state.finished | (token == self.eos_token_id)
        return DecodeState(
            cache=cache,
            kv_valid=kv_valid,
            cur_slot=state.cur_slot + 1,
            positions=state.positions + 1,
            gen_ids=gen_ids,
            gen_len=state.gen_len + 1,
            last_token=token,
            finished=finished,
            key=key,
            mu=mu,
        )

    def _decode_step_impl(self, params, state: DecodeState,
                          sampling: SamplingConfig):
        cfg = self.cfg
        embeds = llama.embed(params["text"], state.last_token[:, None])
        kv_valid = state.kv_valid.at[:, state.cur_slot].set(True)
        # VISUALCLA_NESTED_UNROLL=1 unrolls the layer scan: every weight
        # slice becomes a STATIC lax.slice (no dynamic_index relayout — the
        # q/k/v relayout copies are what push the nested bf16 B>=2 program
        # past HBM, see _decode_loop docstring / DEVNOTES third window).
        import os

        unroll = os.environ.get("VISUALCLA_NESTED_UNROLL", "") == "1"
        hidden, cache = llama.forward(
            params["text"], cfg.text_config, embeds,
            state.positions[:, None], state.cache, kv_valid, state.cur_slot,
            unroll=unroll,
        )
        step_logits = llama.logits(params["text"], hidden)[:, 0]
        return self._sample_tail(state, cache, kv_valid, step_logits, sampling)

    def _decode_loop_impl(self, params, state: DecodeState,
                          sampling: SamplingConfig, max_steps):
        """Fused decode until ``max_steps`` TOTAL generated tokens (dynamic
        bound: one compile serves full generates and chunked streaming).

        FLATTENED iteration space: ONE while_loop over (step x layer), layer
        index ``li`` in the carry, with embed/rope at li == 0 and
        norm+logits+sampling at li == L-1 under lax.cond.  A nested layer
        scan inside the decode while_loop at batch >= 4 makes XLA pin
        RELAYOUTED copies of the stacked q/k/v projections (~3/16 of the
        weight bytes: 3GB at 7B — root-caused from the fused-beam OOM dump,
        DEVNOTES round 2) — at 7B bf16 batch 8 that pushed the program past
        the 16GB chip.  Flat, the only extra is a ~0.38GB lm_head relayout,
        and the cache lives in exactly one loop carry updated in place (same
        structure as the single-step program, whose temp is ~0)."""
        text = params["text"]
        tcfg = self.cfg.text_config
        L = jax.tree.leaves(text["layers"])[0].shape[0]
        Smax = state.kv_valid.shape[1]
        max_steps = jnp.asarray(max_steps, jnp.int32)
        B = state.last_token.shape[0]
        H = tcfg.hidden_size
        if getattr(tcfg, "hidden_act", "silu") == "silu":
            act = jax.nn.silu
        else:
            from ..ops.activations import ACT2FN

            act = ACT2FN[tcfg.hidden_act]

        from ..ops import quantization as qz

        rest_leaves, packed_leaves = qz.split_stacked_grouped(text["layers"])

        def slice_layer(li):
            # packed-int4 leaves stay stacked: the Pallas kernel selects the
            # layer's blocks via scalar prefetch; slicing here would copy the
            # carrier per layer per step (qz.split_stacked_grouped)
            p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0,
                                                       keepdims=False),
                rest_leaves,
            )
            return {**p, **qz.attach_layer(packed_leaves, li)}

        def cond(carry):
            s, h, li = carry
            step_ok = (
                (s.gen_len < max_steps)
                & ~jnp.all(s.finished)
                & (s.cur_slot < Smax)
            )
            return (li != 0) | step_ok  # stop only at step boundaries

        def body(carry):
            s, h, li = carry
            # (hand-rolled next-layer weight prefetch was tried here and
            # measured WORSE — 275 vs 556 tok/s at L16/B8: carrying the
            # slice defeats XLA's own scheduling; keep the plain slice)
            p_l = slice_layer(li)

            # step start: embed the last token, open its kv slot
            def start(s, h):
                return (
                    dataclasses.replace(
                        s, kv_valid=s.kv_valid.at[:, s.cur_slot].set(True)),
                    llama.embed(text, s.last_token[:, None]).astype(h.dtype),
                )

            s, h = jax.lax.cond(li == 0, start, lambda s, h: (s, h), s, h)
            from ..ops.rope import rope_table

            cos, sin = rope_table(s.positions[:, None], tcfg.head_dim,
                                  tcfg.rope_theta)
            h, cache = llama.layer_forward(
                p_l, tcfg, h, cos, sin, s.cache, s.kv_valid, s.cur_slot, li,
                act=act,
            )
            s = dataclasses.replace(s, cache=cache)

            # step end: final norm + logits + sample
            def finish(s):
                from ..ops.norms import rms_norm

                hidden = rms_norm(h, text["final_norm"], tcfg.rms_norm_eps)
                step_logits = llama.logits(text, hidden)[:, 0]
                return self._sample_tail(s, s.cache, s.kv_valid, step_logits,
                                         sampling)

            s = jax.lax.cond(li == L - 1, finish, lambda s: s, s)
            return s, h, (li + 1) % L

        h0 = jnp.zeros((B, 1, H), self.dtype)
        state, _, _ = jax.lax.while_loop(
            cond, body, (state, h0, jnp.int32(0)))
        return state

    def _decode_loop_nested_impl(self, params, state: DecodeState,
                                 sampling: SamplingConfig, max_steps):
        """Nested-loop variant (while over steps, layer scan inside via
        _decode_step_impl).  ~15% faster per step than flat (XLA pipelines
        the scan's weight-slice DMAs) but at batch >= 4 XLA pins relayouted
        q/k/v_proj copies (~3/16 of weight bytes), so it only fits when that
        overhead fits HBM; _decode_loop picks per shape."""
        Smax = state.kv_valid.shape[1]
        max_steps = jnp.asarray(max_steps, jnp.int32)

        def cond(s: DecodeState):
            return (
                (s.gen_len < max_steps)
                & ~jnp.all(s.finished)
                & (s.cur_slot < Smax)
            )

        def body(s: DecodeState):
            return self._decode_step_impl(params, s, sampling)

        return jax.lax.while_loop(cond, body, state)

    # -- public API -----------------------------------------------------------

    def start(
        self,
        input_ids: np.ndarray,  # (B, S) int
        pixel_values: Optional[np.ndarray],  # (B, 3, H, W) or None
        img_start_pos: Optional[np.ndarray],  # (B,) or None
        sampling: SamplingConfig,
        seed: int = 0,
        extra_slots: int = 0,
    ) -> DecodeState:
        """Run prefill (+ first sampled token).  Returns device DecodeState.

        The KV cache is ``max_seq_len`` slots, grown (in 256-slot steps, to
        bound compile variants) when prompt bucket + max_new_tokens needs more —
        otherwise a prompt landing in the top bucket would silently leave no
        decode room.  ``extra_slots`` requests additional headroom (speculative
        verify chunks)."""
        input_ids = np.asarray(input_ids, np.int32)
        B, S = input_ids.shape
        padded, mask = self.pad_prompt(input_ids)
        offset = padded.shape[1] - S
        if img_start_pos is None:
            img_pos = np.full((B,), -1, np.int32)
        else:
            img_pos = np.where(
                np.asarray(img_start_pos) < 0, -1, np.asarray(img_start_pos) + offset
            ).astype(np.int32)
            visualcla.check_img_start_pos(
                img_pos, self.cfg.num_image_tokens, padded.shape[1]
            )
        if pixel_values is not None:
            pixel_values = jnp.asarray(pixel_values, self.dtype)
        need = padded.shape[1] + sampling.max_new_tokens + extra_slots
        cache_len = max(self.max_seq_len, need)
        # ALWAYS align the cache's slot dim to the flash kernel's kv block:
        # a non-multiple cache (e.g. max_seq_len=1000) would be whole-cache
        # padded inside every stacked-cache flash read — an L-layer cache
        # copy per layer per decode step (_flash_stacked pads to the block).
        # Rounding up only allocates a few spare slots; decode stops are
        # governed by max_new_tokens/kv_valid, not the cache size.
        cache_len = -(-cache_len // 256) * 256
        cache = llama.init_kv_cache(
            self.cfg.text_config, B, cache_len, self.dtype, kv_quant=self.kv_quant
        )
        if self.mesh is not None:
            from jax.sharding import NamedSharding

            from ..parallel import sharding as shd

            specs = shd.kv_cache_specs()
            cache = {
                k: jax.device_put(
                    v, NamedSharding(self.mesh, shd._valid_spec(specs[k], v.shape, self.mesh))
                )
                for k, v in cache.items()
            }
        key = jax.random.PRNGKey(seed)
        if self._split_prefill(B, pixel_values):
            # TWO-STAGE multimodal prefill: vision encode+splice and text
            # forward as separate programs.  The combined B>=2 image+text
            # prefill graph is the one this deployment's compile helper
            # deterministically rejects (bench.py round-4 note) — batch
            # eval (apps/evaluate.py) and the B8 bench run THIS path on
            # the real chip instead of sidestepping prefill entirely.
            embeds = self._embed(
                self.params, jnp.asarray(padded), jnp.asarray(img_pos),
                pixel_values)
            return self._prefill_from_embeds(
                self.params, embeds, jnp.asarray(mask), cache, key, sampling)
        return self._prefill(
            self.params, jnp.asarray(padded), jnp.asarray(mask),
            jnp.asarray(img_pos), pixel_values, cache, key, sampling,
        )

    @staticmethod
    def _split_prefill(B: int, pixel_values) -> bool:
        """Two-stage prefill policy: on a real TPU, batched multimodal
        prefills split (the fused graph never compiles through the tunnel
        helper at B>=2 — measured, not assumed); single-row and text-only
        prefills keep the fused single program.  VISUALCLA_PREFILL_SPLIT=0/1
        pins either way (A/B probing)."""
        import os

        env = os.environ.get("VISUALCLA_PREFILL_SPLIT")
        if env in ("0", "1"):
            return env == "1"
        return (pixel_values is not None and B >= 2
                and jax.default_backend() == "tpu")

    def generate(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        img_start_pos: Optional[np.ndarray] = None,
        sampling: Optional[SamplingConfig] = None,
        seed: int = 0,
    ) -> np.ndarray:
        """Blocking generate.  Returns (B, <=max_new_tokens) generated ids, truncated
        at EOS per the HF contract (EOS included, then pads stripped by decode)."""
        sampling = sampling or SamplingConfig.greedy()
        with self.timer.phase("prefill") as p:
            state = self.start(input_ids, pixel_values, img_start_pos, sampling, seed)
            p["sync_on"] = state.last_token
        with self.timer.phase("decode"):
            state = self._decode_loop(
                self.params, state, sampling, sampling.max_new_tokens
            )
            gen_len = int(state.gen_len)
        from ..utils.profiling import GLOBAL_COUNTERS

        GLOBAL_COUNTERS.add("generated_tokens", gen_len * state.gen_ids.shape[0])
        GLOBAL_COUNTERS.add("requests", state.gen_ids.shape[0])
        return np.asarray(state.gen_ids)[:, :gen_len]

    def stream(
        self,
        input_ids: np.ndarray,
        pixel_values: Optional[np.ndarray] = None,
        img_start_pos: Optional[np.ndarray] = None,
        sampling: Optional[SamplingConfig] = None,
        seed: int = 0,
        chunk_size: int = 1,
    ) -> Iterator[np.ndarray]:
        """Yield the (B,) token ids of each decode step as they are produced.

        ``chunk_size > 1`` decodes that many tokens per device dispatch (the
        fused loop with a dynamic bound) and yields them individually —
        amortizing host/tunnel round trips while preserving the per-token
        streaming surface."""
        sampling = sampling or SamplingConfig.greedy()
        state = self.start(input_ids, pixel_values, img_start_pos, sampling, seed)
        yield np.asarray(state.last_token)
        while (
            int(state.gen_len) < sampling.max_new_tokens
            and not bool(np.all(np.asarray(state.finished)))
            and int(state.cur_slot) < state.kv_valid.shape[1]
        ):
            if chunk_size <= 1:
                state = self._decode_step(self.params, state, sampling)
                yield np.asarray(state.last_token)
            else:
                start_len = int(state.gen_len)
                target = min(start_len + chunk_size, sampling.max_new_tokens)
                state = self._decode_loop(self.params, state, sampling, target)
                new_len = int(state.gen_len)
                chunk = np.asarray(state.gen_ids[:, start_len:new_len])
                for j in range(chunk.shape[1]):
                    yield chunk[:, j]
