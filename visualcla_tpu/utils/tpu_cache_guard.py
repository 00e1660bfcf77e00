"""Known-answer canary for the TPU-side persistent compile cache.

The CPU cache poisoning seen in rounds 2-3 (utils/cpu_cache_guard.py) was a
host-flavor problem, but the TPU bench path has the same blind spot in
principle: ``~/.cache/visualcla_jax`` feeds every driver bench through the
axon tunnel, and a stale or corrupted serialized executable would skew the
recorded numbers with no detection — the bench would happily time a program
that computes garbage.

Defense (round-3 verdict item 8): at bench start, run ONE small jitted
program through the persistent cache that exercises the op classes whose
miscompilation bit us on CPU (gather, scatter-add, transcendentals, a
highest-precision dot) and compare against a NumPy float64 reference.  A
mismatch means the cache served a bad artifact: wipe the directory, clear
jax's in-memory executable caches, recompile cold, and re-verify.  If the
cold recompile STILL disagrees, the problem is not the cache and the bench
must not report numbers — raise.
"""
from __future__ import annotations

import logging
import os
import shutil

logger = logging.getLogger(__name__)

# Relative-error gate: the canary sums are computed at f32 with
# HIGHEST-precision dots on device vs float64 NumPy on host.  Healthy runs
# measure ~1e-7..1e-6; a wrong-codegen artifact is off by orders of
# magnitude (the round-2 CPU poisoning produced entirely different values).
_RTOL = 1e-3


def _canary_values():
    import numpy as np

    rng = np.random.default_rng(20260819)
    a = rng.standard_normal((64, 128)).astype(np.float32)
    b = rng.standard_normal((64, 128)).astype(np.float32)
    idx = rng.integers(0, 64, size=(64,)).astype(np.int32)
    ref_g = a[idx]
    ref_s = np.zeros_like(a, dtype=np.float64)
    np.add.at(ref_s, idx, b.astype(np.float64))
    ref = (
        float(ref_s.sum()),
        float((np.tanh(a.astype(np.float64)) + np.exp(-np.abs(b, dtype=np.float64))).sum()),
        float((ref_g.astype(np.float64) @ b.astype(np.float64).T).sum()),
    )
    return a, b, idx, ref


def canary_ok() -> bool:
    """Run the known-answer program through the active compile cache."""
    import jax
    import jax.numpy as jnp

    a, b, idx, ref = _canary_values()

    @jax.jit
    def prog(a, b, idx):
        g = a[idx]  # gather
        s = jnp.zeros_like(a).at[idx].add(b)  # scatter-add
        t = jnp.tanh(a) + jnp.exp(-jnp.abs(b))  # transcendentals
        d = jax.lax.dot_general(
            g, b, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # MXU at f32 passes
        return jnp.stack([jnp.sum(s), jnp.sum(t), jnp.sum(d)])

    got = [float(v) for v in jax.device_get(prog(a, b, idx))]
    for g, r in zip(got, ref):
        if abs(g - r) > _RTOL * max(1.0, abs(r)):
            logger.error("TPU cache canary mismatch: got %r want %r", got, ref)
            return False
    return True


def ensure_clean_tpu_cache(cache_dir: str) -> None:
    """Verify the persistent cache with the canary; wipe and recompile on
    mismatch; raise if even a cold compile disagrees (bench must not report
    numbers from a backend that miscomputes)."""
    import jax

    if canary_ok():
        return
    logger.warning("TPU compile cache failed the canary — wiping %s",
                   cache_dir)
    try:
        shutil.rmtree(cache_dir)
        os.makedirs(cache_dir, exist_ok=True)
    except OSError as e:
        logger.warning("could not wipe %s: %s", cache_dir, e)
    jax.clear_caches()
    if not canary_ok():
        raise RuntimeError(
            "TPU known-answer canary still fails after a cold recompile — "
            "the backend (not the cache) is miscomputing; refusing to "
            "report benchmark numbers"
        )
