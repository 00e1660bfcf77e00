"""Speculative decoding inside the paged pool (engine/paged_spec.py).

The contract: a paged engine with spec_k > 0 produces EXACTLY the tokens
the plain engine produces for greedy rows (acceptance is checked against
the model's own argmax chain, so a wrong draft can never change output),
commits exactly one identically-sampled token per iteration for rows with
live sampling knobs, and respects eos / max_new_tokens mid-acceptance.
"""
import dataclasses
import queue as q_mod

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visualcla_tpu.core.config import tiny_visualcla_config
from visualcla_tpu.engine.paged import PagedServingEngine
from visualcla_tpu.engine.sampling import SamplingConfig
from visualcla_tpu.engine.server import Request, Scheduler, generate_sync
from visualcla_tpu.models import visualcla as vmod

EOS, PAD = 2, 0


def make_engine(params, cfg, spec_k=0, kv_quant="none", pool=3):
    return PagedServingEngine(
        params, cfg, eos_token_id=EOS, pad_token_id=PAD,
        pool_size=pool, block_size=16, num_blocks=8 * pool,
        max_seq_len=96, max_new_tokens_cap=24, prompt_buckets=(32,),
        sampling=SamplingConfig.greedy(max_new_tokens=24), dtype=jnp.float64,
        kv_quant=kv_quant, spec_k=spec_k, spec_max_active=pool,
    )


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_visualcla_config(vocab_size=96)
    params = vmod.init_params(jax.random.PRNGKey(0), cfg, jnp.float64)
    return cfg, params


def prompts(n=4):
    rng = np.random.default_rng(11)
    out = [rng.integers(4, 90, size=(int(rng.integers(6, 24)),)).astype(np.int32)
           for _ in range(n - 1)]
    # a highly repetitive prompt: the n-gram drafter finds matches, so the
    # accept path (not just the reject path) is exercised
    out.append(np.array([7, 8, 9, 7, 8, 9, 7, 8, 9, 7, 8], np.int32))
    return out


def trim(x):
    x = list(np.asarray(x))
    return x[: x.index(EOS) + 1] if EOS in x else x


def run_all(eng, ps, max_new=12, overrides=None):
    sched = Scheduler(eng)
    try:
        return [generate_sync(sched, p, max_new_tokens=max_new, timeout=300,
                              sampling_overrides=overrides) for p in ps]
    finally:
        sched.stop()


def test_spec_greedy_identical_to_plain(setup):
    cfg, params = setup
    plain = make_engine(params, cfg, spec_k=0)
    spec = make_engine(params, cfg, spec_k=3)
    ps = prompts()
    expected = run_all(plain, ps)
    got = run_all(spec, ps)
    for e, g in zip(expected, got):
        assert trim(e) == trim(g), (list(np.asarray(e)), list(np.asarray(g)))
    # pool fully recycled
    assert len(spec._free) == 8 * 3 - 1


def test_spec_dispatches_used_and_tokens_identical_concurrent(setup):
    """Concurrent saturation: all rows in flight, spec dispatches happen,
    every output matches the plain engine's."""
    cfg, params = setup
    plain = make_engine(params, cfg, spec_k=0)
    spec = make_engine(params, cfg, spec_k=3)
    ps = prompts(6)
    expected = run_all(plain, ps)
    sched = Scheduler(spec)
    try:
        queues = []
        for p in ps:
            q_ = q_mod.Queue()
            sched.submit(Request(input_ids=p, pixel_values=None,
                                 img_start_pos=None, max_new_tokens=12,
                                 out=q_))
            queues.append(q_)
        got = []
        for q_ in queues:
            while True:
                kind, payload = q_.get(timeout=300)
                if kind == "done":
                    got.append(payload)
                    break
                if kind == "error":
                    raise RuntimeError(payload)
        stats = sched.stats()
    finally:
        sched.stop()
    assert stats["spec_dispatches"] > 0
    for e, g in zip(expected, got):
        assert trim(e) == trim(g)


def test_spec_sampled_rows_one_token_per_iter(setup):
    """do_sample rows fall back to one sampler-exact token per iteration —
    same PRNG stream as the plain path is NOT guaranteed (different program)
    but output must be valid and lengths honored."""
    cfg, params = setup
    spec = make_engine(params, cfg, spec_k=3)
    ps = prompts(3)
    outs = run_all(spec, ps, max_new=9,
                   overrides={"do_sample": True, "temperature": 0.8,
                              "top_p": 0.9})
    for o in outs:
        assert 1 <= len(o) <= 9
        assert all(0 <= t < 96 for t in np.asarray(o))


def test_spec_int8_kv_matches_plain_int8_kv(setup):
    cfg, params = setup
    plain = make_engine(params, cfg, spec_k=0, kv_quant="int8")
    spec = make_engine(params, cfg, spec_k=2, kv_quant="int8")
    ps = prompts()
    expected = run_all(plain, ps)
    got = run_all(spec, ps)
    for e, g in zip(expected, got):
        assert trim(e) == trim(g)


def test_spec_max_new_never_overshoot(setup):
    """Neither the spec engine nor the plain engine may exceed
    max_new_tokens (the plain pool overshot at max_new=1 pre-round-5: the
    admission commits token 1 but never checked the cap)."""
    cfg, params = setup
    for k in (0, 4):
        eng = make_engine(params, cfg, spec_k=k)
        for max_new in (1, 2, 5):
            outs = run_all(eng, prompts(3), max_new=max_new)
            for o in outs:
                assert len(o) <= max_new, (k, max_new, list(np.asarray(o)))


def test_spec_finish_acceptance_unit(setup):
    """_spec_finish acceptance math on synthetic logits: leading-match
    acceptance, eos truncation, and the sampled-row single-token path."""
    cfg, params = setup
    eng = make_engine(params, cfg, spec_k=3)
    st = eng._state
    B, V, k = eng.B, 96, 3
    # row 0: greedy, argmax chain [10, 11, 12, 13]; drafts [11, 12, 99->wrong]
    # => a = 2, commits [10, 11, 12, 13][:3+?]  (a+1 = 3 tokens: 10, 11, 12)
    # wait: tokens committed are p[0..a] = [10, 11, 12] and the chain len 3.
    logits = np.full((B, k + 1, V), -10.0, np.float32)
    chain0 = [10, 11, 12, 13]
    for j, t in enumerate(chain0):
        logits[0, j, t] = 10.0
    chain1 = [20, EOS, 21, 22]  # row 1: eos at j=1 -> commits [20, EOS], done
    for j, t in enumerate(chain1):
        logits[1, j, t] = 10.0
    chain2 = [30, 31, 32, 33]
    for j, t in enumerate(chain2):
        logits[2, j, t] = 10.0
    # draft[j] is the CANDIDATE token t_{j+1}, accepted iff it equals the
    # model's prediction p[j] (the argmax after consuming t_0..t_j)
    drafts = np.array([[10, 11, 50],   # matches p[0], p[1]; wrong at j=2
                       [20, EOS, 21],  # matches the chain fully
                       [30, 31, 32]], np.int32)  # full match
    st = dataclasses.replace(
        st,
        active=jnp.array([True, True, True]),
        finished=jnp.array([False, False, False]),
        gen_len=jnp.array([1, 1, 1], jnp.int32),
        max_len=jnp.array([10, 10, 3], jnp.int32),  # row 2 capped at 3
        positions=jnp.array([5, 5, 5], jnp.int32),
        last_token=jnp.array([9, 19, 29], jnp.int32),
    )
    run = st.active & ~st.finished
    lens = jnp.array([6, 6, 6], jnp.int32)
    out, lens2 = eng._spec_finish(
        st, run, lens, jnp.asarray(logits), jnp.asarray(drafts),
        eng.sampling, k)
    gen_ids = np.asarray(out.gen_ids)
    gen_len = np.asarray(out.gen_len)
    finished = np.asarray(out.finished)
    # row 0: a=2 -> 3 tokens [10, 11, 12]
    assert gen_len[0] == 4 and list(gen_ids[0, 1:4]) == [10, 11, 12]
    assert not finished[0]
    # row 1: full match but eos at j=1 truncates -> [20, EOS], finished
    assert gen_len[1] == 3 and list(gen_ids[1, 1:3]) == [20, EOS]
    assert finished[1]
    # row 2: full match (4 tokens) but max_len=3 caps at 2 more -> [30, 31]
    assert gen_len[2] == 3 and list(gen_ids[2, 1:3]) == [30, 31]
    assert finished[2]
    assert list(np.asarray(lens2)) == [9, 8, 8]
    # positions advanced by n_commit; last_token is the last committed
    assert list(np.asarray(out.positions)) == [8, 7, 7]
    assert list(np.asarray(out.last_token)) == [12, EOS, 31]


def test_draft_all_rows_vmap(setup):
    from visualcla_tpu.engine.paged_spec import draft_all_rows

    all_ids = jnp.asarray(np.array([
        [5, 6, 7, 5, 6, 0, 0, 0],   # ...5 6 7 5 6 -> next: 7 5
        [1, 2, 3, 4, 5, 6, 7, 8],   # no repeat -> fallback (last token)
    ], np.int32))
    lens = jnp.asarray(np.array([5, 8], np.int32))
    d = np.asarray(draft_all_rows(all_ids, lens, 2, 3))
    assert list(d[0]) == [7, 5]
    assert list(d[1]) == [8, 8]
