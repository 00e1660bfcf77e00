"""Continuous-batching equivalence: pool decode == single-stream decode."""
import queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.engine.generate import Engine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.engine.server import (
    Request,
    Scheduler,
    ServingEngine,
    generate_sync,
)
from visualcla_tpu.models import visualcla as vmod

EOS, PAD = 2, 0


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_visualcla_config(vocab_size=96)
    # float64 params: batched vs single matmul accumulation orders can differ
    # at f32 — x64 keeps greedy argmax deterministic across both paths
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float64)
    single = Engine(
        params, cfg, eos_token_id=EOS, pad_token_id=PAD,
        max_seq_len=96, prompt_buckets=(32,), dtype=jnp.float64,
    )
    pool = ServingEngine(
        params, cfg, eos_token_id=EOS, pad_token_id=PAD,
        pool_size=3, max_seq_len=96, max_new_tokens_cap=16,
        prompt_buckets=(32,), sampling=SamplingConfig.greedy(max_new_tokens=16),
        dtype=jnp.float64,
    )
    return cfg, params, single, pool


def prompts(cfg, n=3):
    rng = np.random.default_rng(7)
    out = []
    for i in range(n):
        S = int(rng.integers(6, 20))
        ids = rng.integers(4, 90, size=(S,)).astype(np.int32)
        out.append(ids)
    return out


def test_pool_matches_single_stream(setup):
    cfg, params, single, pool = setup
    sampling = SamplingConfig.greedy(max_new_tokens=10)
    ps = prompts(cfg)

    expected = [
        single.generate(p[None], None, None, sampling)[0] for p in ps
    ]

    sched = Scheduler(pool)
    try:
        got = [
            generate_sync(sched, p, max_new_tokens=10, timeout=300) for p in ps
        ]
    finally:
        sched.stop()
    for e, g in zip(expected, got):
        e = np.asarray(e)
        # single-stream pads finished rows; trim at EOS for comparison
        def trim(x):
            x = list(np.asarray(x))
            return x[: x.index(EOS) + 1] if EOS in x else x

        assert trim(e) == trim(g), (e, g)


def test_per_request_sampling_overrides(setup):
    """Rows carry their own knobs: a greedy row and a hot-sampling row decode
    together; the greedy row must match the single-stream greedy output."""
    cfg, params, single, pool = setup
    ps = prompts(2)
    want_greedy = single.generate(
        ps[0][None], None, None, SamplingConfig.greedy(max_new_tokens=8)
    )[0]

    sched = Scheduler(pool)
    try:
        q_greedy, q_hot = queue.Queue(), queue.Queue()
        sched.submit(Request(
            input_ids=ps[1], pixel_values=None, img_start_pos=None,
            max_new_tokens=8, out=q_hot,
            sampling_overrides={"do_sample": True, "temperature": 1.5,
                                "top_p": 1.0},
        ))
        sched.submit(Request(
            input_ids=ps[0], pixel_values=None, img_start_pos=None,
            max_new_tokens=8, out=q_greedy,
            sampling_overrides={"do_sample": False},
        ))
        outs = {}
        for name, q_ in (("hot", q_hot), ("greedy", q_greedy)):
            while True:
                kind, payload = q_.get(timeout=300)
                if kind == "done":
                    outs[name] = payload
                    break
    finally:
        sched.stop()

    def trim(x):
        x = list(np.asarray(x))
        return x[: x.index(EOS) + 1] if EOS in x else x

    assert trim(outs["greedy"]) == trim(want_greedy)
    assert len(outs["hot"]) >= 1


def test_scheduler_isolates_bad_requests(setup):
    """An overlong prompt errors its own request; the pool keeps serving."""
    cfg, params, single, pool = setup
    sched = Scheduler(pool)
    try:
        too_long = np.ones((200,), np.int32)  # > max bucket (32)
        with pytest.raises(RuntimeError):
            generate_sync(sched, too_long, max_new_tokens=4, timeout=120)
        ok = prompts(1)[0]
        out = generate_sync(sched, ok, max_new_tokens=4, timeout=300)
        assert len(out) >= 1
    finally:
        sched.stop()


def test_pool_interleaves_requests(setup):
    """Submit concurrently; rows must finish and free independently."""
    cfg, params, single, pool = setup
    ps = prompts(cfg, n=5)  # more requests than pool rows (3)
    sched = Scheduler(pool)
    try:
        qs = []
        for p in ps:
            q_ = queue.Queue()
            sched.submit(Request(
                input_ids=p, pixel_values=None, img_start_pos=None,
                max_new_tokens=6, out=q_,
            ))
            qs.append(q_)
        outs = []
        for q_ in qs:
            while True:
                kind, payload = q_.get(timeout=300)
                if kind == "done":
                    outs.append(payload)
                    break
    finally:
        sched.stop()
    assert len(outs) == 5
    assert all(1 <= len(o) <= 6 for o in outs)


def test_scheduler_streams_every_token_including_first(setup):
    """Regression: the prefill-sampled first token must arrive as a ('token',
    id) event; the token stream must equal the final ids exactly."""
    cfg, params, single, pool = setup
    sched = Scheduler(pool, poll_interval=0.001)
    try:
        q: queue.Queue = queue.Queue()
        ids = prompts(cfg, 1)[0]
        sched.submit(Request(
            input_ids=ids, pixel_values=None, img_start_pos=None,
            max_new_tokens=8, out=q,
        ))
        streamed, done = [], None
        while done is None:
            kind, payload = q.get(timeout=120)
            if kind == "token":
                streamed.append(int(payload))
            elif kind == "done":
                done = list(payload)
            else:
                raise AssertionError(payload)
        assert streamed == done, (streamed, done)
    finally:
        sched.stop()


def test_batched_uneven_prompts_match_single_rows(setup):
    """Regression: caller left-pads in a batched prompt are masked out, so
    each row decodes exactly like its own B=1 run."""
    cfg, params, single, _ = setup
    ps = prompts(cfg, 2)
    smp = SamplingConfig.greedy(max_new_tokens=8)
    solo = [single.generate(p[None, :], sampling=smp)[0] for p in ps]
    L = max(len(p) for p in ps)
    batch = np.full((2, L), PAD, np.int32)
    for i, p in enumerate(ps):
        batch[i, L - len(p):] = p
    both = single.generate(batch, sampling=smp)
    for i in range(2):
        a = list(solo[i])
        b = list(both[i])[: len(solo[i])]
        assert a == b, (i, a, b)


def test_step_n_matches_single_steps(setup):
    """A fused step_n chunk produces exactly the tokens of n single steps
    (and stops early when a row finishes)."""
    cfg, params, single, paged = setup
    from visualcla_tpu.engine.server import ServingEngine

    def run(use_chunk):
        eng = ServingEngine(
            params, cfg, eos_token_id=EOS, pad_token_id=PAD, pool_size=2,
            max_seq_len=96, max_new_tokens_cap=12,
            sampling=SamplingConfig.greedy(max_new_tokens=12),
            dtype=jnp.float64,
        )
        ps = prompts(2)
        for r, p in enumerate(ps):
            eng.prefill_row(r, p, None, None, 12)
        for _ in range(12):
            if use_chunk:
                eng.step_n(4)
            else:
                eng.step()
        snap = eng.snapshot()

        def trim(x):
            x = list(np.asarray(x))
            return x[: x.index(EOS) + 1] if EOS in x else x

        return [trim(snap["gen_ids"][r][: snap["gen_len"][r]])
                for r in range(2)]

    assert run(False) == run(True)


def test_scheduler_chunks_while_pool_full(setup):
    """With more requests queued than pool rows, the scheduler must keep
    using fused step_n chunks (a full pool can't admit, so single-stepping
    would only add dispatch overhead) — and still drain every request."""
    cfg, params, single, paged = setup
    eng = ServingEngine(
        params, cfg, eos_token_id=EOS, pad_token_id=PAD, pool_size=2,
        max_seq_len=96, max_new_tokens_cap=8, prompt_buckets=(32,),
        sampling=SamplingConfig.greedy(max_new_tokens=8),
        dtype=jnp.float64,
    )
    sched = Scheduler(eng, step_chunk=4)
    calls = []  # (kind, n_rows, queue_nonempty) at dispatch time
    real_step_n, real_step = eng.step_n, eng.step
    eng.step_n = lambda n: (
        calls.append(("chunk", len(sched._rows), not sched.requests.empty())),
        real_step_n(n))[1]
    eng.step = lambda: (
        calls.append(("single", len(sched._rows), not sched.requests.empty())),
        real_step())[1]
    ps = prompts(cfg, n=5)
    qs = []
    try:
        for p in ps:
            q: queue.Queue = queue.Queue()
            sched.submit(Request(input_ids=p, pixel_values=None,
                                 img_start_pos=None, max_new_tokens=8, out=q))
            qs.append(q)
        for q in qs:
            while True:
                kind, payload = q.get(timeout=300)
                if kind == "done":
                    break
                assert kind != "error", payload
    finally:
        sched.stop()
    # the gate: whenever the pool was full, dispatch was a fused chunk
    full_pool = [c for c in calls if c[1] >= 2]
    assert full_pool, calls
    assert all(c[0] == "chunk" for c in full_pool), calls
    # and at least one chunk ran while requests were still waiting
    assert any(c[0] == "chunk" and c[2] for c in calls), calls


def test_per_request_top_k_and_ngram(setup):
    """VERDICT r3 item 6: /chat-level requests overriding top_k and
    no_repeat_ngram_size must be honored per row (the pool default here is
    greedy with top_k=0 / ngram=0, so only the override can produce these
    behaviors).

    - ngram: a greedy request with no_repeat_ngram_size=2 must token-match
      the single-stream Engine running the STATIC ngram processor.
    - top_k: a sampled request with top_k=1 (temp=1, top_p=1, no penalties)
      is deterministic argmax — it must token-match plain greedy.
    """
    import dataclasses as dc

    cfg, params, single, pool = setup
    ps = prompts(cfg)

    want_ngram = single.generate(
        ps[0][None], None, None,
        dc.replace(SamplingConfig.greedy(max_new_tokens=8),
                   no_repeat_ngram_size=2),
    )[0]
    want_greedy = single.generate(
        ps[1][None], None, None, SamplingConfig.greedy(max_new_tokens=8)
    )[0]

    sched = Scheduler(pool)
    try:
        q_ngram, q_topk = queue.Queue(), queue.Queue()
        sched.submit(Request(
            input_ids=ps[0], pixel_values=None, img_start_pos=None,
            max_new_tokens=8, out=q_ngram,
            sampling_overrides={"do_sample": False,
                                "no_repeat_ngram_size": 2},
        ))
        sched.submit(Request(
            input_ids=ps[1], pixel_values=None, img_start_pos=None,
            max_new_tokens=8, out=q_topk,
            sampling_overrides={"do_sample": True, "top_k": 1,
                                "temperature": 1.0, "top_p": 1.0,
                                "repetition_penalty": 1.0},
        ))
        outs = {}
        for name, q_ in (("ngram", q_ngram), ("topk", q_topk)):
            while True:
                kind, payload = q_.get(timeout=300)
                if kind == "done":
                    outs[name] = payload
                    break
    finally:
        sched.stop()

    def trim(x):
        x = list(np.asarray(x))
        return x[: x.index(EOS) + 1] if EOS in x else x

    assert trim(outs["ngram"]) == trim(want_ngram)
    assert trim(outs["topk"]) == trim(want_greedy)


def test_pack_control_round_trip():
    """snapshot()'s one-fetch packing must round-trip every control field
    bit-exactly (the five fields used to be five tunnel fetches)."""
    from visualcla_tpu.engine.server import _pack_control, _unpack_control

    rng = np.random.default_rng(3)
    B, T = 5, 7
    last_token = jnp.asarray(rng.integers(0, 90, B), jnp.int32)
    gen_len = jnp.asarray(rng.integers(0, T, B), jnp.int32)
    active = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    finished = jnp.asarray(rng.integers(0, 2, B).astype(bool))
    gen_ids = jnp.asarray(rng.integers(0, 90, (B, T)), jnp.int32)

    snap = _unpack_control(
        jax.device_get(_pack_control(last_token, gen_len, active, finished,
                                     gen_ids)))
    np.testing.assert_array_equal(snap["last_token"], np.asarray(last_token))
    np.testing.assert_array_equal(snap["gen_len"], np.asarray(gen_len))
    np.testing.assert_array_equal(snap["active"], np.asarray(active))
    np.testing.assert_array_equal(snap["finished"], np.asarray(finished))
    np.testing.assert_array_equal(snap["gen_ids"], np.asarray(gen_ids))
    assert snap["active"].dtype == bool and snap["finished"].dtype == bool


def test_release_rows_batched_matches_sequential(setup):
    """The fetch-free batched release must clear exactly the released rows'
    flags (and their kv_valid) and leave every other row untouched."""
    import copy
    import dataclasses

    _, _, _, pool = setup
    base = pool._state
    on = dataclasses.replace(
        base,
        active=jnp.ones_like(base.active),
        finished=jnp.ones_like(base.finished),
        kv_valid=jnp.ones_like(base.kv_valid),
    )

    pool._state = on
    pool.release_rows([0, 2])
    batched = pool._state

    pool._state = on
    pool.release_row(0)
    pool.release_row(2)
    seq = pool._state

    for name in ("active", "finished", "kv_valid"):
        np.testing.assert_array_equal(np.asarray(getattr(batched, name)),
                                      np.asarray(getattr(seq, name)))
    assert not bool(batched.active[0]) and not bool(batched.active[2])
    assert bool(batched.active[1])
    assert bool(np.asarray(batched.kv_valid[1]).any())
    assert not bool(np.asarray(batched.kv_valid[0]).any())
    pool._state = base  # restore for other tests sharing the fixture
