"""Paged-KV continuous-batching engine.

Same scheduling surface as ``engine/server.py`` (Scheduler drives prefill_row /
step / snapshot / collect_row), but KV lives in a global block pool:

- ``(L, num_blocks, BS, Nkv*hd)`` pools (kernel operand order) + host-side
  free-list allocator;
- per-row block tables (host numpy, shipped per step — bytes, not megabytes);
- decode attention via the Pallas paged kernel (scalar-prefetched tables);
- prefill runs the normal contiguous forward into a scratch cache, then
  scatters the prompt's KV blocks into the pool.

A row's memory cost is ceil(len/BS) blocks, so the pool admits however many
requests fit by TOKENS, not by rows×max_seq — e.g. a 16-token and a 2000-token
conversation together cost 1 + 32 blocks instead of 2×max_seq stripes.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import VisualCLAConfig
from ..models import llama, visualcla
from ..ops.linear import linear
from ..ops.norms import rms_norm
from ..ops.pallas.paged_attention import paged_append_attention
from ..ops.rope import apply_rope, rope_table
from .sampling import SamplingConfig, sample_step, sample_step_rowwise

logger = logging.getLogger(__name__)


def init_pools(cfg, num_blocks: int, block_size: int, dtype=jnp.bfloat16,
               kv_quant: str = "none"):
    """-> (k_pool, v_pool, k_scales|None, v_scales|None).

    Pools are stored in KERNEL OPERAND ORDER ``(L, NB, BS, Nkv*hd)`` — a
    ``(..., Nkv, hd)`` layout would need a physical relayout (TPU tiling) at
    every kernel call, breaking the in-place alias (measured 2x 1GB HLO
    temps per decode step at 7B)."""
    L, Nkv, hd = cfg.num_hidden_layers, cfg.num_key_value_heads, cfg.head_dim
    shape = (L, num_blocks, block_size, Nkv * hd)
    if kv_quant == "int8":
        sshape = (L, num_blocks, block_size, Nkv)
        return (jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32))
    return jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), None, None


from ..ops.quantization import quantize_kv  # noqa: E402  (shared with llama cache)


def _paged_append(q, kn, vn, kp, vp, tables, lens, blk, off, layer,
                  ksn=None, vsn=None, ks=None, vs=None):
    """Dispatch the fused append+attend kernel over the multi-layer pool;
    under a registered attention mesh, shard_map over 'model' (kv heads are
    embarrassingly parallel; the pools stay sharded and aliased in place).
    The pool's lane dim (Nkv*hd) shards contiguously = whole kv-head
    groups, matching the (B, Nkv, hd) new-token sharding."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..ops import attention as attn_mod
    from ..parallel.sharding import MODEL

    mesh = attn_mod.current_attention_mesh()
    B, N, H = q.shape
    Nkv = kn.shape[1]
    if mesh is not None and MODEL in mesh.shape:
        n_model = mesh.shape[MODEL]
        if n_model > 1 and N % n_model == 0 and Nkv % n_model == 0:
            qs = P(None, MODEL, None)
            new_s = P(None, MODEL, None)
            pool_s = P(None, None, None, MODEL)
            scale_s = P(None, None, None, MODEL)
            nscale_s = P(None, MODEL)
            rep = P()
            if ks is None:
                fn = shard_map(
                    lambda q_, kn_, vn_, kp_, vp_, t_, l_, b_, o_, lay_:
                        paged_append_attention(
                            q_, kn_, vn_, kp_, vp_, t_, l_, b_, o_, lay_)[:3],
                    mesh=mesh,
                    in_specs=(qs, new_s, new_s, pool_s, pool_s, rep, rep,
                              rep, rep, rep),
                    out_specs=(qs, pool_s, pool_s),
                    check_vma=False,
                )
                o, kp, vp = fn(q, kn, vn, kp, vp, tables, lens, blk, off,
                               layer)
                return o, kp, vp, None, None
            fn = shard_map(
                lambda q_, kn_, vn_, kp_, vp_, t_, l_, b_, o_, lay_, ksn_,
                vsn_, ks_, vs_: paged_append_attention(
                    q_, kn_, vn_, kp_, vp_, t_, l_, b_, o_, lay_,
                    ksn_, vsn_, ks_, vs_),
                mesh=mesh,
                in_specs=(qs, new_s, new_s, pool_s, pool_s, rep, rep, rep,
                          rep, rep, nscale_s, nscale_s, scale_s, scale_s),
                out_specs=(qs, pool_s, pool_s, scale_s, scale_s),
                check_vma=False,
            )
            return fn(q, kn, vn, kp, vp, tables, lens, blk, off, layer,
                      ksn, vsn, ks, vs)
    return paged_append_attention(q, kn, vn, kp, vp, tables, lens, blk, off,
                                  layer, ksn, vsn, ks, vs)


def _act_fn(cfg):
    if getattr(cfg, "hidden_act", "silu") == "silu":
        return jax.nn.silu
    from ..ops.activations import ACT2FN

    return ACT2FN[cfg.hidden_act]


def paged_layer_step(p, cfg, h, cos, sin, kp, vp, ks, vs, tables, lens,
                     blk, off, l, act):
    """One decoder layer over the paged pool for a single new token.  The KV
    append rides INSIDE the attention kernel (input_output_aliases) — this
    body never slices or scatters the (L, NB, BS, Nkv*hd) pool, which cost
    ~16 ms/step of XLA copy traffic at 7B B=8.  Shared by the nested
    (scan-over-layers) and flat (step x layer while) loop structures."""
    B = h.shape[0]
    N, Nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    x = rms_norm(h, p["input_norm"], cfg.rms_norm_eps)
    q = linear(x, p["q_proj"]).reshape(B, 1, N, hd)
    k = linear(x, p["k_proj"]).reshape(B, 1, Nkv, hd)
    v = linear(x, p["v_proj"]).reshape(B, 1, Nkv, hd)
    q, k = apply_rope(q, k, cos, sin)
    if ks is not None:
        kq, ksc = quantize_kv(k[:, 0])
        vq, vsc = quantize_kv(v[:, 0])
        attn, kp, vp, ks, vs = _paged_append(
            q[:, 0], kq, vq, kp, vp, tables, lens, blk, off, l,
            ksc, vsc, ks, vs,
        )
    else:
        attn, kp, vp, _, _ = _paged_append(
            q[:, 0], k[:, 0].astype(kp.dtype), v[:, 0].astype(vp.dtype),
            kp, vp, tables, lens, blk, off, l,
        )  # attn: (B, N, hd)
    h = h + linear(attn.reshape(B, 1, N * hd), p["o_proj"])
    x2 = rms_norm(h, p["post_norm"], cfg.rms_norm_eps)
    gate = act(linear(x2, p["gate_proj"])) * linear(x2, p["up_proj"])
    h = h + linear(gate, p["down_proj"])
    return h, kp, vp, ks, vs


def paged_decode_forward(
    params,
    cfg,
    embeds: jnp.ndarray,  # (B, 1, H)
    positions: jnp.ndarray,  # (B,) int32 rope positions
    k_pool: jnp.ndarray,  # (L, NB, BS, Nkv*hd) — bf16/f32 or int8
    v_pool: jnp.ndarray,
    tables: jnp.ndarray,  # (B, max_blocks) int32
    blk: jnp.ndarray,  # (B,) int32 — pool block holding the new token
    off: jnp.ndarray,  # (B,) int32 — offset inside that block
    lens: jnp.ndarray,  # (B,) int32 — context length INCLUDING the new token
    k_scales=None,  # (L, NB, BS, Nkv) f32 when the pool is int8
    v_scales=None,
):
    """One decode step over the paged pool.
    Returns (hidden (B,1,H), k_pool, v_pool, k_scales, v_scales)."""
    hd = cfg.head_dim
    cos, sin = rope_table(positions[:, None], hd, cfg.rope_theta)
    act = _act_fn(cfg)

    from ..ops import quantization as qz

    rest_leaves, packed_leaves = qz.split_stacked_grouped(params["layers"])

    def layer(carry, xs):
        h, kp, vp, ks, vs = carry
        p, l = xs
        # packed-int4 leaves re-enter as lazy stacked dicts (see
        # qz.split_stacked_grouped) instead of scan-sliced copies
        p = {**p, **qz.attach_layer(packed_leaves, l)}
        h, kp, vp, ks, vs = paged_layer_step(
            p, cfg, h, cos, sin, kp, vp, ks, vs, tables, lens, blk, off, l,
            act)
        return (h, kp, vp, ks, vs), None

    L = cfg.num_hidden_layers
    (h, k_pool, v_pool, k_scales, v_scales), _ = jax.lax.scan(
        layer, (embeds, k_pool, v_pool, k_scales, v_scales),
        (rest_leaves, jnp.arange(L, dtype=jnp.int32)),
    )
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    return h, k_pool, v_pool, k_scales, v_scales


@dataclasses.dataclass
class PagedState:
    """Device-side pytree for the paged pool."""

    k_pool: jnp.ndarray
    v_pool: jnp.ndarray
    k_scales: object  # (L, NB, BS, Nkv) f32 or None (int8 KV quantization)
    v_scales: object
    last_token: jnp.ndarray  # (B,)
    positions: jnp.ndarray  # (B,)
    gen_ids: jnp.ndarray  # (B, T)
    gen_len: jnp.ndarray  # (B,)
    all_ids: jnp.ndarray  # (B, Smax) — prompt + generated token history per
    #   row (valid length = positions+1); the speculative draft source
    max_len: jnp.ndarray  # (B,)
    active: jnp.ndarray  # (B,) bool
    finished: jnp.ndarray  # (B,) bool
    mu: jnp.ndarray
    temp: jnp.ndarray  # (B,) per-request sampling knobs
    top_p: jnp.ndarray
    rep_pen: jnp.ndarray
    do_sample: jnp.ndarray  # (B,) bool
    tfs: jnp.ndarray  # (B,) fp32 (1.0 = off)
    top_a: jnp.ndarray  # (B,) fp32 (0.0 = off)
    miro: jnp.ndarray  # (B,) bool — mirostat-2 rows
    miro_tau: jnp.ndarray  # (B,) fp32
    miro_eta: jnp.ndarray  # (B,) fp32
    top_k: jnp.ndarray  # (B,) int32 (0 = off)
    ngram: jnp.ndarray  # (B,) int32 no_repeat_ngram_size (0 = off)
    key: jax.Array


jax.tree_util.register_dataclass(
    PagedState,
    data_fields=["k_pool", "v_pool", "k_scales", "v_scales", "last_token",
                 "positions", "gen_ids", "gen_len", "all_ids", "max_len",
                 "active", "finished", "mu", "temp", "top_p", "rep_pen",
                 "do_sample", "tfs", "top_a", "miro", "miro_tau", "miro_eta",
                 "top_k", "ngram", "key"],
    meta_fields=[],
)


class PagedServingEngine:
    """Block-paged pool engine; duck-type compatible with server.Scheduler."""

    def __init__(
        self,
        params,
        cfg: VisualCLAConfig,
        *,
        eos_token_id: int,
        pad_token_id: int,
        pool_size: int = 8,  # concurrent rows
        block_size: int = 64,
        num_blocks: int = 256,  # total KV budget = num_blocks * block_size tokens
        max_seq_len: int = 2048,
        max_new_tokens_cap: int = 1024,
        prompt_buckets=(128, 256, 512, 1024),
        sampling: Optional[SamplingConfig] = None,
        dtype=jnp.bfloat16,
        kv_quant: str = "none",  # "int8": halve KV pool bytes (per-token scales)
        seed: int = 0,
        mesh=None,  # TP: pools shard kv heads on 'model'; params via GSPMD
        spec_k: int = 0,  # >0: per-row prompt-lookup speculative decoding
        #   (engine/paged_spec.py) — draft spec_k tokens, verify in one
        #   (B, k+1) forward; greedy rows token-identical to plain stepping
        spec_max_active: int | None = None,  # Scheduler uses spec dispatches
        #   only at or below this occupancy (verify compute scales with
        #   B*(k+1); decode stops being weight-bound as the pool fills).
        #   None = auto by tier from the measured cost ratios
        #   (BENCHMARKS round 5): int8 4 (ratio <=1.4 there), int4 2
        #   (its verify matmuls leave the weight-bound regime sooner —
        #   ratio 1.9 already at pool 4)
        spec_max_ngram: int = 3,
    ):
        self.params = params
        self.cfg = cfg
        self.mesh = mesh  # applied as a trace-time scope around jitted calls
        self.kv_quant = kv_quant
        self.eos = eos_token_id
        self.pad = pad_token_id
        self.B = pool_size
        self.BS = block_size
        self.NB = num_blocks
        self.Smax = max_seq_len
        self.T = max_new_tokens_cap
        self.max_blocks = (max_seq_len + block_size - 1) // block_size
        self.prompt_buckets = tuple(b for b in prompt_buckets if b <= max_seq_len)
        bad = [b for b in self.prompt_buckets if b % block_size]
        if bad:
            raise ValueError(
                f"prompt buckets {bad} are not multiples of "
                f"block_size={block_size} (prefill scatters whole blocks)"
            )
        from .server import _check_serving_sampling

        self.sampling = _check_serving_sampling(sampling or SamplingConfig())
        self.dtype = dtype

        # host allocator: block 0 is the dummy target for unused table slots
        self._free: List[int] = list(range(num_blocks - 1, 0, -1))
        self.tables = np.zeros((self.B, self.max_blocks), np.int32)
        self.row_blocks: List[List[int]] = [[] for _ in range(self.B)]
        self.ctx_len = np.zeros((self.B,), np.int32)
        # host mirrors of the run mask (avoid a device round trip per step):
        # active is host-driven; finished lags one snapshot, which only delays
        # parking a finished row by one harmless step
        self._host_active = np.zeros((self.B,), bool)
        self._host_finished = np.zeros((self.B,), bool)

        text = cfg.text_config
        k_pool, v_pool, k_scales, v_scales = init_pools(
            text, num_blocks, block_size, dtype, kv_quant
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.sharding import MODEL

            if text.num_key_value_heads % mesh.shape.get(MODEL, 1) == 0:
                pool_s = NamedSharding(mesh, P(None, None, None, MODEL))
                scale_s = NamedSharding(mesh, P(None, None, None, MODEL))
                k_pool = jax.device_put(k_pool, pool_s)
                v_pool = jax.device_put(v_pool, pool_s)
                if k_scales is not None:
                    k_scales = jax.device_put(k_scales, scale_s)
                    v_scales = jax.device_put(v_scales, scale_s)
        B, T = self.B, self.T
        self._state = PagedState(
            k_pool=k_pool, v_pool=v_pool, k_scales=k_scales, v_scales=v_scales,
            last_token=jnp.zeros((B,), jnp.int32),
            positions=jnp.zeros((B,), jnp.int32),
            gen_ids=jnp.zeros((B, T), jnp.int32),
            gen_len=jnp.zeros((B,), jnp.int32),
            all_ids=jnp.zeros((B, max_seq_len), jnp.int32),
            max_len=jnp.zeros((B,), jnp.int32),
            active=jnp.zeros((B,), bool),
            finished=jnp.zeros((B,), bool),
            mu=jnp.full((B,), 2.0 * self.sampling.mirostat_tau, jnp.float32),
            temp=jnp.full((B,), self.sampling.temperature, jnp.float32),
            top_p=jnp.full((B,), self.sampling.top_p, jnp.float32),
            rep_pen=jnp.full((B,), self.sampling.repetition_penalty, jnp.float32),
            do_sample=jnp.full((B,), self.sampling.do_sample, bool),
            tfs=jnp.full((B,), self.sampling.tfs, jnp.float32),
            top_a=jnp.full((B,), self.sampling.top_a, jnp.float32),
            miro=jnp.full((B,), self.sampling.mirostat_mode == 2, bool),
            miro_tau=jnp.full((B,), self.sampling.mirostat_tau, jnp.float32),
            miro_eta=jnp.full((B,), self.sampling.mirostat_eta, jnp.float32),
            top_k=jnp.full((B,), self.sampling.top_k, jnp.int32),
            ngram=jnp.full((B,), self.sampling.no_repeat_ngram_size,
                           jnp.int32),
            key=jax.random.PRNGKey(seed),
        )
        # mesh is applied as a trace-time SCOPE around each jitted call (see
        # Engine._scoped) so engines with different meshes can coexist
        from ..ops.attention import attention_mesh_scope

        def scoped(fn):
            @functools.wraps(fn)
            def wrapped(*a, **kw):
                with attention_mesh_scope(self.mesh):
                    return fn(*a, **kw)

            return wrapped

        self._prefill = scoped(jax.jit(
            self._prefill_impl, static_argnames=("sampling",),
            donate_argnames=("state",)))
        self._step = scoped(jax.jit(
            self._step_impl, static_argnames=("sampling",),
            donate_argnames=("state",)))
        self._step_n = scoped(jax.jit(
            self._step_n_impl, static_argnames=("sampling",),
            donate_argnames=("state",)))
        self._step_n_flat = scoped(jax.jit(
            self._step_n_flat_impl, static_argnames=("sampling",),
            donate_argnames=("state",)))
        # chunked-prefill programs (begin_prefill / PendingPrefill)
        self._embed = scoped(jax.jit(self._embed_impl))
        self._chunk = scoped(jax.jit(
            self._chunk_impl, static_argnames=("chunk",),
            donate_argnames=("scratch",)))
        # NOTE: scratch is NOT donated here — its (L, 1, Nkv, Lb, hd) buffers
        # can never alias an output of this program (the pools have different
        # shapes and hidden is tiny), so donating them only produced XLA's
        # "donated buffers were not usable" warning (the float32[L,1,Nkv,Lb,hd]
        # pair in MULTICHIP_r02).  _chunk keeps its scratch donation: there the
        # scratch IS returned and aliases in place.
        self._finish_chunked = scoped(jax.jit(
            self._finish_chunked_impl, static_argnames=("sampling",),
            donate_argnames=("state",)))
        self.spec_k = int(spec_k)
        if self.spec_k > 0 and mesh is not None:
            # the Sq-token verify kernel has no shard_map dispatch yet (the
            # single-token append kernel does — _paged_append); running it
            # over TP-sharded pools would hand pallas_call to GSPMD.  Fail
            # loudly rather than produce a silently-replicated program.
            raise NotImplementedError(
                "speculative decoding (spec_k>0) is single-chip-first: the "
                "verify kernel has no TP shard_map path yet — run the paged "
                "pool unmeshed or set spec_k=0 under a mesh")
        if spec_max_active is None:
            from ..ops.quantization import is_packed_grouped

            int4 = any(
                isinstance(x, dict) and is_packed_grouped(x)
                for x in jax.tree.leaves(
                    params, is_leaf=lambda n: isinstance(n, dict)
                    and "q" in n))
            spec_max_active = 2 if int4 else 4
        self.spec_max_active = int(spec_max_active)
        self.spec_max_ngram = int(spec_max_ngram)
        if self.spec_k > 0:
            self._spec_step_n = scoped(jax.jit(
                self._spec_step_n_impl, static_argnames=("sampling", "k"),
                donate_argnames=("state",)))
        self._params_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in jax.tree.leaves(params))

    # -- allocator -------------------------------------------------------------

    def can_admit(self, prompt_len: int) -> bool:
        """Worst-case block need for this prompt (mirrors prefill_row's
        allocation exactly, incl. bucket padding) vs the free pool."""
        try:
            L = self.bucket_len(prompt_len)
        except ValueError:
            return False  # longer than the largest bucket — never admissible
        nb_prompt = (L + self.BS - 1) // self.BS
        nb_total = (prompt_len + self.T + 1 + self.BS - 1) // self.BS
        # decode stops at Smax (hit_cap), so no row ever uses more blocks
        need = min(max(nb_total, nb_prompt), self.max_blocks)
        return len(self._free) >= need

    def _alloc_blocks(self, row: int, n: int) -> List[int]:
        if len(self._free) < n:
            raise RuntimeError("KV block pool exhausted")
        blocks = [self._free.pop() for _ in range(n)]
        self.row_blocks[row].extend(blocks)
        tb = self.row_blocks[row]
        self.tables[row, :] = 0
        self.tables[row, : len(tb)] = tb
        return blocks

    def _free_row(self, row: int) -> None:
        self._free.extend(self.row_blocks[row])
        self.row_blocks[row] = []
        self.tables[row, :] = 0
        self.ctx_len[row] = 0

    # -- jitted impls ------------------------------------------------------------

    def _scatter_scratch(self, state: PagedState, scratch, block_ids, nb):
        """Scatter a contiguous scratch cache's prompt KV into the pool.
        The scratch is stored heads-major (L, 1, Nkv, S, hd) — see
        llama.init_kv_cache — so bring slots back before blocking:
        -> (L, S, Nkv, hd) -> (L, nb, BS, ...); the final reshape folds
        (Nkv, hd) into the pool's kernel-order Nkv*hd lane dim (a
        once-per-admission relayout of prompt-sized data)."""
        L = self.cfg.text_config.num_hidden_layers
        Nkv, hd = scratch["k"].shape[2], scratch["k"].shape[4]
        k_blocks = scratch["k"][:, 0].transpose(0, 2, 1, 3).reshape(
            L, nb, self.BS, Nkv, hd)
        v_blocks = scratch["v"][:, 0].transpose(0, 2, 1, 3).reshape(
            L, nb, self.BS, Nkv, hd)
        if state.k_scales is not None:  # int8 KV: quantize the prompt blocks
            kq, ksc = quantize_kv(k_blocks)
            vq, vsc = quantize_kv(v_blocks)
            return dataclasses.replace(
                state,
                k_pool=state.k_pool.at[:, block_ids].set(
                    kq.reshape(L, nb, self.BS, Nkv * hd)),
                v_pool=state.v_pool.at[:, block_ids].set(
                    vq.reshape(L, nb, self.BS, Nkv * hd)),
                k_scales=state.k_scales.at[:, block_ids].set(ksc),
                v_scales=state.v_scales.at[:, block_ids].set(vsc),
            )
        return dataclasses.replace(
            state,
            k_pool=state.k_pool.at[:, block_ids].set(
                k_blocks.reshape(L, nb, self.BS, Nkv * hd)),
            v_pool=state.v_pool.at[:, block_ids].set(
                v_blocks.reshape(L, nb, self.BS, Nkv * hd)),
        )

    def _admit_row(self, params, state: PagedState, row, hidden_last,
                   last_idx, max_new_tokens, knobs,
                   sampling: SamplingConfig, ids=None) -> PagedState:
        """Sample the first token from the last REAL prompt position's hidden
        and activate the row (shared by the one-shot and chunked prefills).
        ``ids`` (1, L) right-padded prompt seeds the row's ``all_ids`` token
        history (the speculative draft source)."""
        from .server import _admit_knob_kwargs

        last_logits = llama.logits(params["text"], hidden_last)[:, 0]
        key, sub = jax.random.split(state.key)
        token, mu_row = sample_step_rowwise(
            last_logits, jnp.zeros((1, self.T), jnp.int32),
            jnp.zeros((1,), jnp.int32), sub, sampling,
            **_admit_knob_kwargs(knobs, 2.0 * knobs[7:8]),
        )
        tok = token[0]
        all_ids = state.all_ids
        if ids is not None:
            # prompt history [0, last_idx], first token at last_idx+1
            all_ids = jax.lax.dynamic_update_slice(
                all_ids, ids.astype(jnp.int32), (row, jnp.int32(0)))
            all_ids = all_ids.at[
                row, jnp.minimum(last_idx.astype(jnp.int32) + 1,
                                 self.Smax - 1)].set(tok)
        return dataclasses.replace(
            state,
            all_ids=all_ids,
            last_token=state.last_token.at[row].set(tok),
            positions=state.positions.at[row].set(last_idx.astype(jnp.int32) + 1),
            gen_ids=jax.lax.dynamic_update_index_in_dim(
                state.gen_ids, jnp.zeros((self.T,), jnp.int32).at[0].set(tok),
                row, axis=0,
            ),
            gen_len=state.gen_len.at[row].set(1),
            max_len=state.max_len.at[row].set(max_new_tokens),
            active=state.active.at[row].set(True),
            # the admission itself commits token 1 — a max_new_tokens=1
            # request is already complete (pre-round-5 this overshot to 2)
            finished=state.finished.at[row].set(
                (tok == self.eos) | (max_new_tokens <= 1)),
            mu=state.mu.at[row].set(mu_row[0]),
            temp=state.temp.at[row].set(knobs[0]),
            top_p=state.top_p.at[row].set(knobs[1]),
            rep_pen=state.rep_pen.at[row].set(knobs[2]),
            do_sample=state.do_sample.at[row].set(knobs[3] > 0.5),
            tfs=state.tfs.at[row].set(knobs[4]),
            top_a=state.top_a.at[row].set(knobs[5]),
            miro=state.miro.at[row].set(knobs[6] > 1.5),
            miro_tau=state.miro_tau.at[row].set(knobs[7]),
            miro_eta=state.miro_eta.at[row].set(knobs[8]),
            top_k=state.top_k.at[row].set(knobs[9].astype(jnp.int32)),
            ngram=state.ngram.at[row].set(knobs[10].astype(jnp.int32)),
            key=key,
        )

    def _prefill_impl(self, params, state: PagedState, row, input_ids,
                      attention_mask, img_start_pos, pixel_values,
                      block_ids, max_new_tokens, knobs, sampling: SamplingConfig):
        """Contiguous prompt forward into a scratch cache, then block scatter."""
        cfg = self.cfg
        S = input_ids.shape[1]
        nb = S // self.BS  # S is always a bucket multiple of BS

        embeds = visualcla.multimodal_embeds(
            params, cfg, input_ids, img_start_pos, pixel_values
        )
        positions = jnp.maximum(jnp.cumsum(attention_mask, -1) - 1, 0).astype(jnp.int32)
        scratch = llama.init_kv_cache(cfg.text_config, 1, S, self.dtype)
        kv_valid = attention_mask.astype(bool)
        hidden, scratch = llama.forward(
            params["text"], cfg.text_config, embeds, positions, scratch,
            kv_valid, jnp.int32(0),
        )
        state = self._scatter_scratch(state, scratch, block_ids, nb)

        # prompts are RIGHT-padded here: sample from the last REAL token
        last_idx = jnp.sum(attention_mask, axis=-1) - 1  # (1,)
        hidden_last = jnp.take_along_axis(
            hidden, last_idx[:, None, None].astype(jnp.int32), axis=1
        )  # (1, 1, H)
        return self._admit_row(params, state, row, hidden_last, last_idx[0],
                               max_new_tokens, knobs, sampling, ids=input_ids)

    # -- chunked prefill (admission interleaved with decode) ------------------

    def _embed_impl(self, params, input_ids, img_start_pos, pixel_values):
        """One-shot prompt embedding (ViT encode + splice) for chunked
        admission; the text-tower chunks then slice it."""
        return visualcla.multimodal_embeds(
            params, self.cfg, input_ids, img_start_pos, pixel_values)

    def _chunk_impl(self, params, scratch, embeds, positions, mask, c0,
                    chunk: int):
        """One text-tower chunk of a chunked prefill: slice ``chunk`` tokens
        at ``c0`` out of the full prompt embedding and forward them, writing
        their KV into the persistent scratch at slot ``c0``.  kv_valid =
        real slots < c0+chunk: a query at slot j only sees kv <= j among the
        valid, so this is EXACTLY the slot set the one-shot prefill's query
        saw — chunk attention == one-shot attention, bit for bit in exact
        arithmetic.  One program per (bucket, chunk) pair; ``c0`` is traced."""
        L = embeds.shape[1]
        emb = jax.lax.dynamic_slice_in_dim(embeds, c0, chunk, axis=1)
        pos = jax.lax.dynamic_slice_in_dim(positions, c0, chunk, axis=1)
        kv_valid = mask.astype(bool) & (jnp.arange(L)[None, :] < c0 + chunk)
        hidden, scratch = llama.forward(
            params["text"], self.cfg.text_config, emb, pos, scratch,
            kv_valid, c0,
        )
        return hidden, scratch

    def _finish_chunked_impl(self, params, state: PagedState, scratch,
                             hidden_chunk, last_idx_in_chunk, last_idx, row,
                             block_ids, max_new_tokens, knobs,
                             sampling: SamplingConfig, ids=None):
        """Scatter the fully-written scratch into the pool and activate the
        row, sampling from the chunk that held the last real token."""
        nb = scratch["k"].shape[3] // self.BS
        state = self._scatter_scratch(state, scratch, block_ids, nb)
        hidden_last = jnp.take_along_axis(
            hidden_chunk, last_idx_in_chunk[None, None, None].astype(jnp.int32),
            axis=1)  # (1, 1, H)
        return self._admit_row(params, state, row, hidden_last, last_idx,
                               max_new_tokens, knobs, sampling, ids=ids)

    def begin_prefill(self, row: int, input_ids: np.ndarray, pixel_values,
                      img_start_pos, max_new_tokens: int,
                      overrides: dict | None = None,
                      chunk: int = 256) -> "PendingPrefill":
        """Start a CHUNKED admission: the prompt is processed ``chunk`` tokens
        per device dispatch (vLLM-style chunked prefill), so the scheduler can
        interleave decode steps for running rows between chunks instead of
        stalling them for the whole prompt forward.  Call ``.step()`` on the
        returned object until it reports done; tokens are identical to
        ``prefill_row`` (same math, same slot causality, different program
        shapes).  Blocks are reserved up front exactly like ``prefill_row``;
        ``abort()`` rolls the allocator back."""
        return PendingPrefill(self, row, input_ids, pixel_values,
                              img_start_pos, max_new_tokens, overrides, chunk)


    def _append_meta(self, state: PagedState, tables, lens):
        """(run, blk, off, lens_attn) for the step appending at ``lens``-1.
        Parked rows write into dummy block 0 (harmless: block 0 is never
        referenced by any live table entry) and attend over length 1."""
        B = self.B
        run = state.active & ~state.finished
        new_slot = lens - 1
        blk_idx = new_slot // self.BS
        blk = tables[jnp.arange(B), blk_idx]
        off = new_slot % self.BS
        blk = jnp.where(run, blk, 0)
        return run, blk, off, jnp.where(run, lens, 1)

    def _finish_step(self, state: PagedState, run, lens, step_logits,
                     sampling: SamplingConfig) -> PagedState:
        """Sample + bookkeeping tail shared by the single-step program and
        the flat fused loop.  ``state`` already carries the updated pools."""
        from .server import _rowwise_knob_kwargs

        B = self.B
        key, sub = jax.random.split(state.key)
        token, new_mu = sample_step_rowwise(
            step_logits, state.gen_ids, state.gen_len, sub, sampling,
            **_rowwise_knob_kwargs(state),
        )
        new_mu = jnp.where(run, new_mu, state.mu)
        token = jnp.where(run, token, jnp.int32(self.pad))
        idx = jnp.minimum(state.gen_len, self.T - 1)
        vals = jnp.where(run, token, state.gen_ids[jnp.arange(B), idx])
        gen_ids = state.gen_ids.at[jnp.arange(B), idx].set(vals)
        gen_len = state.gen_len + run.astype(jnp.int32)
        # token history (speculative draft source): next free index is
        # positions+1 (invariant: valid length == positions+1)
        aidx = jnp.minimum(state.positions + 1, self.Smax - 1)
        avals = jnp.where(run & (state.positions + 1 < self.Smax), token,
                          state.all_ids[jnp.arange(B), aidx])
        all_ids = state.all_ids.at[jnp.arange(B), aidx].set(avals)
        hit_eos = run & (token == self.eos)
        hit_cap = run & (
            (gen_len >= state.max_len) | (lens + 1 >= self.Smax)
        )
        return dataclasses.replace(
            state,
            last_token=jnp.where(run, token, state.last_token),
            positions=state.positions + run.astype(jnp.int32),
            gen_ids=gen_ids, gen_len=gen_len, all_ids=all_ids,
            finished=state.finished | hit_eos | hit_cap,
            mu=new_mu,
            key=key,
        )

    def _step_impl(self, params, state: PagedState, tables, lens,
                   sampling: SamplingConfig):
        """One decode step for all rows.  ``lens`` includes the new token."""
        cfg = self.cfg
        run, blk, off, lens_attn = self._append_meta(state, tables, lens)
        embeds = llama.embed(params["text"], state.last_token[:, None])
        hidden, k_pool, v_pool, k_scales, v_scales = paged_decode_forward(
            params["text"], cfg.text_config, embeds, state.positions,
            state.k_pool, state.v_pool, tables, blk, off, lens_attn,
            state.k_scales, state.v_scales,
        )
        step_logits = llama.logits(params["text"], hidden)[:, 0]
        state = dataclasses.replace(
            state, k_pool=k_pool, v_pool=v_pool, k_scales=k_scales,
            v_scales=v_scales)
        return self._finish_step(state, run, lens, step_logits, sampling)

    # -- host-side pool management (Scheduler-compatible) -----------------------

    def bucket_len(self, n: int) -> int:
        from .generate import pick_bucket

        try:
            return pick_bucket(self.prompt_buckets, n)
        except ValueError:
            # overflow path: block-size-quantized synthetic bucket (right-pad
            # design tolerates L == Smax; decode stops at Smax via hit_cap)
            L = -(-n // self.BS) * self.BS
            if L <= self.Smax:
                return L
            raise

    def _prepare_admission(self, row: int, input_ids, img_start_pos,
                           pixel_values, max_new_tokens: int):
        """Shared one-shot/chunked admission prep: RIGHT-pad to the bucket
        (slots 0..S-1 hold the prompt, pads sit beyond ctx_len), normalize
        the image marker, reserve every block the request can touch.
        -> (ids, mask, img_pos, pixel_values, blocks, nb_prompt, S, L)."""
        input_ids = np.asarray(input_ids).reshape(-1)
        S = len(input_ids)
        L = self.bucket_len(S)
        ids = np.full((1, L), self.pad, np.int32)
        mask = np.zeros((1, L), np.int32)
        ids[0, :S] = input_ids
        mask[0, :S] = 1
        if img_start_pos is not None and np.ndim(img_start_pos) > 0:
            # multi-image admission: (K,) marker positions paired with
            # (1, K, 3, H, W) pixel_values (the (B, K) splice,
            # models/visualcla.py multimodal_embeds)
            img_pos = np.asarray(img_start_pos, np.int32).reshape(1, -1)
        else:
            img_pos = np.asarray(
                [-1 if img_start_pos is None or img_start_pos < 0
                 else img_start_pos],
                np.int32,
            )
        visualcla.check_img_start_pos(img_pos, self.cfg.num_image_tokens, L)
        if pixel_values is not None:
            pixel_values = jnp.asarray(pixel_values, self.dtype)
            if img_pos.ndim == 2 and pixel_values.ndim == 4:
                pixel_values = pixel_values[None]  # (1, K, 3, H, W)
        self._free_row(row)
        # blocks for the whole padded prompt + headroom for decode
        nb_prompt = L // self.BS if L % self.BS == 0 else L // self.BS + 1
        total_tokens = S + min(max_new_tokens, self.T) + 1
        nb_total = (total_tokens + self.BS - 1) // self.BS
        # decode stops at Smax (hit_cap), and the row's table holds at most
        # max_blocks entries — never allocate past either
        nb_total = min(max(nb_total, nb_prompt), self.max_blocks)
        blocks = self._alloc_blocks(row, nb_total)
        return ids, mask, img_pos, pixel_values, blocks, nb_prompt, S, L

    def prefill_row(self, row: int, input_ids: np.ndarray,
                    pixel_values, img_start_pos, max_new_tokens: int,
                    overrides: dict | None = None) -> None:
        ids, mask, img_pos, pixel_values, blocks, nb_prompt, S, L = (
            self._prepare_admission(row, input_ids, img_start_pos,
                                    pixel_values, max_new_tokens))
        self.ctx_len[row] = S
        self._host_active[row] = True
        self._host_finished[row] = False
        from .server import sampling_knobs

        knobs = sampling_knobs(self.sampling, overrides)
        try:
            self._state = self._prefill(
                self.params, self._state, jnp.int32(row), jnp.asarray(ids),
                jnp.asarray(mask), jnp.asarray(img_pos), pixel_values,
                jnp.asarray(blocks[:nb_prompt], jnp.int32),
                jnp.int32(min(max_new_tokens, self.T)), knobs, self.sampling,
            )
        except Exception:
            # roll back the host allocator so a failed prefill (bad input,
            # compile error on a new bucket) doesn't leak pool blocks or
            # leave a dead row marked active
            self._free_row(row)
            self.ctx_len[row] = 0
            self._host_active[row] = False
            raise

    def _step_n_impl(self, params, state: PagedState, tables, lens,
                     sampling: SamplingConfig, n):
        """Up to ``n`` fused decode steps in one dispatch (NESTED structure:
        while over steps, layer scan inside).  Valid because
        prefill reserves EVERY block a request can touch up front
        (prefill_row allocates nb_total), so the device can advance ``lens``
        itself — no host allocator call is needed mid-chunk.  Stops early
        when any row finishes so retirement/streaming isn't delayed."""
        n = jnp.asarray(n, jnp.int32)
        finished0 = state.finished  # only rows finishing DURING the chunk
        # stop it (pre-existing finished rows are awaiting collection)

        def cond(c):
            s, lens, i = c
            run = s.active & ~s.finished
            newly_done = s.finished & ~finished0
            return (i < n) & jnp.any(run) & ~jnp.any(newly_done)

        def body(c):
            s, lens, i = c
            run = s.active & ~s.finished
            lens = lens + run.astype(jnp.int32)
            return self._step_impl(params, s, tables, lens, sampling), lens, i + 1

        state, lens, _ = jax.lax.while_loop(
            cond, body, (state, lens, jnp.int32(0)))
        return state, lens

    def _step_n_flat_impl(self, params, state: PagedState, tables, lens,
                          sampling: SamplingConfig, n):
        """Flat fused multi-step decode: ONE while over (step x layer), layer
        index in the carry, step-boundary work under lax.cond.  Same
        rationale as Engine._decode_loop_impl: a layer scan nested inside
        the decode while pins RELAYOUTED copies of the stacked q/k/v
        projections (2x 1GB at 7B bf16 — OOM dump, DEVNOTES round 2); flat
        pays only a ~0.39GB lm_head relayout, so full-size bf16 B=8 serving
        chunks compile on a 16GB chip."""
        cfg = self.cfg.text_config
        text = params["text"]
        L = cfg.num_hidden_layers
        n = jnp.asarray(n, jnp.int32)
        finished0 = state.finished
        act = _act_fn(cfg)

        from ..ops import quantization as qz

        rest_leaves, packed_leaves = qz.split_stacked_grouped(text["layers"])

        def slice_layer(li):
            # packed-int4 leaves stay stacked (lazy layer index) — see
            # qz.split_stacked_grouped
            p = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, li, 0,
                                                       keepdims=False),
                rest_leaves)
            return {**p, **qz.attach_layer(packed_leaves, li)}

        def cond(c):
            s, lens, h, meta, i, li = c
            run = s.active & ~s.finished
            newly_done = s.finished & ~finished0
            step_ok = (i < n) & jnp.any(run) & ~jnp.any(newly_done)
            return (li != 0) | step_ok  # stop only at step boundaries

        def body(c):
            s, lens, h, meta, i, li = c

            def start(s, lens, h, meta):
                run = s.active & ~s.finished
                lens2 = lens + run.astype(jnp.int32)
                # positions are constant within a step: rope rides the meta
                # carry instead of being recomputed on all L layer iterations
                meta = self._append_meta(s, tables, lens2) + rope_table(
                    s.positions[:, None], cfg.head_dim, cfg.rope_theta)
                return s, lens2, llama.embed(
                    text, s.last_token[:, None]).astype(h.dtype), meta

            s, lens, h, meta = jax.lax.cond(
                li == 0, start,
                lambda s, lens, h, meta: (s, lens, h, meta),
                s, lens, h, meta)
            run, blk, off, lens_attn, cos, sin = meta
            p_l = slice_layer(li)
            h, kp, vp, ks, vs = paged_layer_step(
                p_l, cfg, h, cos, sin, s.k_pool, s.v_pool,
                s.k_scales, s.v_scales, tables, lens_attn, blk, off, li, act)
            s = dataclasses.replace(
                s, k_pool=kp, v_pool=vp, k_scales=ks, v_scales=vs)

            def finish(s, i):
                hidden = rms_norm(h, text["final_norm"], cfg.rms_norm_eps)
                step_logits = llama.logits(text, hidden)[:, 0]
                return (self._finish_step(s, run, lens, step_logits,
                                          sampling), i + 1)

            s, i = jax.lax.cond(li == L - 1, finish,
                                lambda s, i: (s, i), s, i)
            return s, lens, h, meta, i, (li + 1) % L

        h0 = llama.embed(text, state.last_token[:, None])
        meta0 = self._append_meta(state, tables, lens) + rope_table(
            state.positions[:, None], cfg.head_dim, cfg.rope_theta)
        state, lens, _, _, _, _ = jax.lax.while_loop(
            cond, body,
            (state, lens, h0, meta0, jnp.int32(0), jnp.int32(0)))
        return state, lens

    # -- speculative decoding inside the pool (engine/paged_spec.py) ----------

    def _spec_finish(self, state: PagedState, run, lens, logits, drafts,
                     sampling: SamplingConfig, k: int) -> tuple:
        """Acceptance + bookkeeping for one verify step.

        logits (B, k+1, V) from the verify forward; drafts (B, k).  Greedy
        rows (spec_eligible) commit the longest draft prefix matching the
        model's own argmax chain plus one model token; every other running
        row commits exactly ONE token from logits[:, 0] via the same
        rowwise sampler as the plain step.  Returns (state, new lens)."""
        from .server import _rowwise_knob_kwargs
        from .paged_spec import spec_eligible

        B, Sq = self.B, k + 1
        jj = jnp.arange(Sq, dtype=jnp.int32)[None, :]
        lf = logits.astype(jnp.float32)
        p = jnp.argmax(lf, axis=-1).astype(jnp.int32)  # (B, Sq) argmax chain
        key, sub = jax.random.split(state.key)
        tok0, new_mu = sample_step_rowwise(
            lf[:, 0], state.gen_ids, state.gen_len, sub, sampling,
            **_rowwise_knob_kwargs(state),
        )
        clean = spec_eligible(state)
        # leading draft/argmax matches: draft[j] must equal the model's
        # prediction AT the previous position (p[:, j])
        match = (drafts == p[:, :k]).astype(jnp.int32)
        # leading-match count (jnp.sum mirrors numpy's promote-to-default-int
        # under x64 test mode — pin int32 for the while-loop carry)
        a = jnp.sum(jnp.cumprod(match, axis=1), axis=1,
                    dtype=jnp.int32)  # (B,) in [0, k]
        n_new = jnp.where(clean, a + 1, 1)
        # caps: never commit past max_new_tokens or the pool's Smax (the
        # plain step's hit_cap bounds, applied before the commit instead of
        # after so multi-token steps can't overshoot)
        cap = jnp.maximum(jnp.minimum(state.max_len - state.gen_len,
                                      self.Smax - 1 - lens), 1)
        n_allowed = jnp.minimum(n_new, cap)
        toks = jnp.where(clean[:, None], p,
                         jnp.broadcast_to(tok0[:, None], (B, Sq)))
        # truncate at the first committed EOS (it is committed, like the
        # plain step commits its EOS token, then the row finishes)
        eos_pos = jnp.min(
            jnp.where(toks == self.eos, jnp.broadcast_to(jj, (B, Sq)), Sq),
            axis=1)
        n_commit = jnp.minimum(n_allowed, eos_pos + 1)
        n_commit = jnp.where(run, n_commit, 0)
        commit = jj < n_commit[:, None]  # (B, Sq)
        gidx = jnp.minimum(state.gen_len[:, None] + jj, self.T - 1)
        rows = jnp.arange(B)[:, None]
        cur = jnp.take_along_axis(state.gen_ids, gidx, axis=1)
        gen_ids = state.gen_ids.at[rows, gidx].set(
            jnp.where(commit, toks, cur))
        gen_len = state.gen_len + n_commit
        apos = state.positions[:, None] + 1 + jj
        aidx = jnp.minimum(apos, self.Smax - 1)
        cura = jnp.take_along_axis(state.all_ids, aidx, axis=1)
        all_ids = state.all_ids.at[rows, aidx].set(
            jnp.where(commit & (apos < self.Smax), toks, cura))
        last = toks[jnp.arange(B), jnp.maximum(n_commit - 1, 0)]
        lens2 = lens + n_commit
        hit_eos = run & (eos_pos < n_commit)
        hit_cap = run & ((gen_len >= state.max_len)
                         | (lens2 + 1 >= self.Smax))
        state = dataclasses.replace(
            state,
            last_token=jnp.where(run, last, state.last_token),
            positions=state.positions + n_commit,
            gen_ids=gen_ids, gen_len=gen_len, all_ids=all_ids,
            finished=state.finished | hit_eos | hit_cap,
            mu=jnp.where(run, new_mu, state.mu),
            key=key,
        )
        return state, lens2

    def _spec_step_n_impl(self, params, state: PagedState, tables, lens,
                          sampling: SamplingConfig, n, k: int):
        """Up to ``n`` fused SPECULATIVE decode iterations: draft k tokens
        per row from its token history, verify all rows in one (B, k+1)
        forward, commit per-row accepted prefixes.  Same early-exit contract
        as _step_n_impl.  ``lens`` is the committed context per row (the
        pre-increment convention of step()/step_n())."""
        from .paged_spec import draft_all_rows, paged_verify_forward

        cfg = self.cfg.text_config
        text = params["text"]
        act = _act_fn(cfg)
        n = jnp.asarray(n, jnp.int32)
        finished0 = state.finished

        def cond(c):
            s, lens, i = c
            run = s.active & ~s.finished
            newly_done = s.finished & ~finished0
            return (i < n) & jnp.any(run) & ~jnp.any(newly_done)

        def body(c):
            s, lens, i = c
            run = s.active & ~s.finished
            drafts = draft_all_rows(s.all_ids, s.positions + 1, k,
                                    self.spec_max_ngram)  # (B, k)
            toks_in = jnp.concatenate([s.last_token[:, None], drafts], axis=1)
            embeds = llama.embed(text, toks_in)
            pos = s.positions[:, None] + jnp.arange(k + 1,
                                                    dtype=jnp.int32)[None, :]
            hidden, kp, vp, ks, vs = paged_verify_forward(
                text, cfg, embeds, pos, s.k_pool, s.v_pool,
                s.k_scales, s.v_scales, tables, lens, run, self.BS, act)
            logits = llama.logits(text, hidden)  # (B, k+1, V)
            s = dataclasses.replace(
                s, k_pool=kp, v_pool=vp, k_scales=ks, v_scales=vs)
            s, lens = self._spec_finish(s, run, lens, logits, drafts,
                                        sampling, k)
            return s, lens, i + 1

        state, lens, _ = jax.lax.while_loop(
            cond, body, (state, lens, jnp.int32(0)))
        return state, lens

    def spec_step_n(self, n: int) -> None:
        """Fused speculative multi-iteration decode (requires spec_k > 0);
        each iteration commits 1..spec_k+1 tokens per running row."""
        self._state, lens = self._spec_step_n(
            self.params, self._state, self._snap(self.tables),
            self._snap(self.ctx_len), self.sampling, n, self.spec_k,
        )
        self.ctx_len = np.asarray(jax.device_get(lens)).copy()

    def _pick_chunk_loop(self) -> str:
        """'nested' (~15% faster per step: XLA pipelines the scan's weight
        slices) when params + the nested loop's relayouted q/k/v copies
        (~3/16 of stacked-weight bytes) + pools fit HBM, else 'flat'.
        VISUALCLA_PAGED_LOOP=flat|nested pins."""
        import os

        impl = os.environ.get("VISUALCLA_PAGED_LOOP")
        if impl in ("flat", "nested"):
            return impl
        from .generate import hbm_limit

        limit = hbm_limit()
        pool_bytes = sum(
            int(np.prod(x.shape)) * x.dtype.itemsize
            for x in (self._state.k_pool, self._state.v_pool))
        if self._state.k_scales is not None:
            pool_bytes += 2 * self._state.k_scales.size * 4
        need = self._params_bytes * (1 + 3 / 16) + pool_bytes + 0.5e9
        return "nested" if need < limit else "flat"

    @staticmethod
    def _snap(host_arr: np.ndarray) -> jnp.ndarray:
        """Device view of a host-MUTATED numpy array via a private copy.

        ``jnp.asarray(self.tables)`` on the CPU backend is ZERO-COPY: the
        device array aliases the live numpy buffer, and the next host-side
        allocator mutation (``self.ctx_len[run] += 1``, ``self.tables[row]=0``)
        races the still-executing async step that reads it — reproduced as
        run-to-run token flips in the CPU test suite (the round-2 "wrong
        numerics" flake).  Snapshotting into a fresh buffer the host never
        touches again makes any later zero-copy aliasing safe.  On TPU the
        transfer always copies, so this costs nothing there."""
        return jnp.asarray(np.array(host_arr))

    def step(self) -> None:
        run = self._host_active & ~self._host_finished
        self.ctx_len[run] += 1  # the token being appended this step
        self._state = self._step(
            self.params, self._state, self._snap(self.tables),
            self._snap(self.ctx_len), self.sampling,
        )

    def step_n(self, n: int) -> None:
        """Fused multi-step decode; syncs the host ctx_len after the chunk.
        Loop structure (nested scan vs flat step x layer) picked by HBM fit
        — see _pick_chunk_loop."""
        fn = (self._step_n if self._pick_chunk_loop() == "nested"
              else self._step_n_flat)
        self._state, lens = fn(
            self.params, self._state, self._snap(self.tables),
            self._snap(self.ctx_len), self.sampling, n,
        )
        self.ctx_len = np.asarray(jax.device_get(lens)).copy()

    def snapshot(self):
        from .server import _pack_control, _unpack_control

        s = self._state
        snap = _unpack_control(jax.device_get(_pack_control(
            s.last_token, s.gen_len, s.active, s.finished, s.gen_ids)))
        self._host_finished = snap["finished"].copy()
        return snap

    def release_row(self, row: int) -> None:
        """Free a finished row without any device fetch (see
        server.ServingEngine.release_row): deactivate on device, return its
        KV blocks to the host allocator."""
        self.release_rows([row])

    def release_rows(self, rows) -> None:
        """Batched no-fetch release (one device update for the whole wave)."""
        rows = list(rows)
        idx = jnp.asarray(rows, jnp.int32)
        self._state = dataclasses.replace(
            self._state,
            active=self._state.active.at[idx].set(False),
            finished=self._state.finished.at[idx].set(False),
        )
        for row in rows:
            self._host_active[row] = False
            self._host_finished[row] = False
            self._free_row(row)

    def collect_row(self, row: int) -> np.ndarray:
        gen_len = int(jax.device_get(self._state.gen_len[row]))
        ids = np.asarray(jax.device_get(self._state.gen_ids[row, :gen_len]))
        self.release_row(row)
        return ids

    def num_active(self) -> int:
        return int(jax.device_get(jnp.sum(self._state.active)))



class PendingPrefill:
    """Host state machine for one chunked admission (see begin_prefill).

    Stages per ``step()`` call (each one bounded device dispatch):
      0. embed: ViT encode + multimodal splice over the whole padded prompt;
      1..n: text-tower chunk forwards into the persistent scratch cache;
      n+1 (fused into the last chunk's step): scatter scratch -> pool blocks,
        sample the first token, activate the row.
    The row stays PARKED (device active=False, host flags unset) until the
    finish step, so decode/snapshot/collect never observe a half-admitted row.
    """

    def __init__(self, eng: "PagedServingEngine", row, input_ids, pixel_values,
                 img_start_pos, max_new_tokens, overrides, chunk):
        from .server import sampling_knobs

        self.eng = eng
        self.row = int(row)
        (ids, mask, img_pos, pixel_values, self.blocks, self.nb_prompt,
         S, L) = eng._prepare_admission(row, input_ids, img_start_pos,
                                        pixel_values, max_new_tokens)
        BS = eng.BS
        chunk = max(BS, (int(chunk) // BS) * BS)
        chunk = min(chunk, L)  # a window must fit the padded bucket
        # Chunk START slots.  Each window is exactly ``chunk`` wide (static
        # shape); the LAST window is shifted LEFT so it ends at the bucket
        # edge instead of being silently clamped by dynamic_slice (an
        # inconsistent clamp would misalign write_slot vs the sliced tokens
        # and break slot causality).  A shifted window re-forwards already-
        # processed slots — their recomputed KV is value-identical, so the
        # overwrite is a no-op and every query still sees exactly the
        # kv slots <= its own slot.
        n_chunks = -(-S // chunk)
        self.starts = [min(i * chunk, L - chunk) for i in range(n_chunks)]
        self.n_chunks = n_chunks
        self.S, self.L, self.chunk = S, L, chunk
        self.i = 0
        self.ids, self.mask, self.img_pos = ids, mask, img_pos
        self.pixel_values = pixel_values
        self.max_new = min(max_new_tokens, eng.T)
        self.knobs = sampling_knobs(eng.sampling, overrides)
        self.done = False
        self._embeds = None
        self._positions = None
        self._scratch = None
        self._hidden = None

    def step(self) -> bool:
        """Run the next bounded stage; True once the row is live."""
        eng = self.eng
        if self.done:
            return True
        try:
            if self._embeds is None:
                self._embeds = eng._embed(
                    eng.params, jnp.asarray(self.ids),
                    jnp.asarray(self.img_pos), self.pixel_values)
                self._positions = jnp.asarray(np.maximum(
                    np.cumsum(self.mask, -1) - 1, 0).astype(np.int32))
                self._mask_dev = jnp.asarray(self.mask)
                self._scratch = llama.init_kv_cache(
                    eng.cfg.text_config, 1, self.L, eng.dtype)
                return False
            if self.i < self.n_chunks:
                hidden, self._scratch = eng._chunk(
                    eng.params, self._scratch, self._embeds, self._positions,
                    self._mask_dev, jnp.int32(self.starts[self.i]), self.chunk)
                self.i += 1
                if self.i == self.n_chunks:
                    self._hidden = hidden  # the chunk holding slot S-1
                return False
            eng._state = eng._finish_chunked(
                eng.params, eng._state, self._scratch, self._hidden,
                jnp.int32(self.S - 1 - self.starts[-1]), jnp.int32(self.S - 1),
                jnp.int32(self.row),
                jnp.asarray(self.blocks[: self.nb_prompt], jnp.int32),
                jnp.int32(self.max_new), self.knobs, eng.sampling,
                ids=jnp.asarray(self.ids),
            )
            eng.ctx_len[self.row] = self.S
            eng._host_active[self.row] = True
            eng._host_finished[self.row] = False
            self.done = True
            self._scratch = self._embeds = self._hidden = None
            return True
        except Exception:
            self.abort()
            raise

    def abort(self) -> None:
        """Roll the host allocator back (failed/cancelled admission)."""
        if not self.done:
            eng = self.eng
            eng._free_row(self.row)
            eng.ctx_len[self.row] = 0
            eng._host_active[self.row] = False
            self._scratch = self._embeds = self._hidden = None
            self.done = True

