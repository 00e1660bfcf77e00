"""Guard against poisoned XLA:CPU persistent-compile-cache artifacts.

XLA:CPU AOT executables bake in LLVM target features chosen from the host CPU
*model identity* (family/model/stepping select e.g. ``+prefer-no-gather`` /
``+prefer-no-scatter`` on Sapphire Rapids), not just the ISA flag set.  Loading
an artifact compiled on a different VM flavor can therefore silently
mis-execute ("Machine type used for XLA:CPU compilation doesn't match the
machine type for execution ... could lead to execution errors such as SIGILL")
— observed in round 2 as a test computing wrong NUMERICS with no exception.

Two defenses, both used by tests/conftest.py:

1. :func:`machine_fingerprint` — cache-dir key covering vendor/family/model/
   model-name/stepping/flags plus the jax+jaxlib versions, so two VM flavors
   with identical cpuinfo *flags* but different model/stepping (the round-2
   hole) get distinct caches, and a jax upgrade rolls the cache.
2. :func:`canary_ok` / :func:`ensure_clean_cache` — a known-answer program
   exercising the codegen paths the target features change (gather, scatter,
   transcendentals, vectorized float math), run through the persistent cache
   at session start.  A wrong answer means the cache served a stale AOT
   artifact: wipe the directory, clear jax's in-memory executable caches, and
   re-verify from a cold compile.
"""
from __future__ import annotations

import hashlib
import logging
import os
import platform
import shutil

logger = logging.getLogger(__name__)

_CPUINFO_KEYS = ("vendor_id", "cpu family", "model", "model name",
                 "stepping", "flags")


def machine_fingerprint(cpuinfo_path: str = "/proc/cpuinfo") -> str:
    """10-hex-char host fingerprint for keying XLA:CPU AOT cache directories."""
    import jax
    import jaxlib

    parts = [platform.machine(), jax.__version__, jaxlib.__version__]
    try:
        with open(cpuinfo_path) as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in _CPUINFO_KEYS and key not in seen:
                    seen.add(key)
                    parts.append(line.strip())
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:10]


def canary_ok() -> bool:
    """Compile+run a known-answer program through the active compile cache.

    The program deliberately mixes a gather, a scatter-add, and transcendental
    vector math — the op classes whose codegen differs under the LLVM target
    features that poisoned-cache loads get wrong.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    def prog(x, idx):
        g = jnp.take(x, idx, axis=0)
        s = jnp.zeros((8, x.shape[1]), x.dtype).at[idx % 8].add(g)
        return jnp.sum(jnp.sin(s) * 1.5 + s * s, axis=1)

    x = np.linspace(-2.0, 2.0, 64 * 16, dtype=np.float32).reshape(64, 16)
    idx = ((np.arange(32) * 7) % 64).astype(np.int32)
    try:
        got = np.asarray(jax.jit(prog)(x, idx))
    except Exception:  # SIGILL escapes python; anything catchable = poisoned
        logger.exception("compile-cache canary raised")
        return False
    g = x[idx]
    s = np.zeros((8, 16), np.float32)
    np.add.at(s, idx % 8, g)
    want = np.sum(np.sin(s) * 1.5 + s * s, axis=1)
    return bool(np.allclose(got, want, rtol=1e-4, atol=1e-5))


def ensure_clean_cache(cache_dir: str) -> None:
    """Run the canary; on failure wipe ``cache_dir`` and re-verify cold.

    Must be called *after* ``jax_compilation_cache_dir`` points at
    ``cache_dir``.  Raises if even a cold compile computes the wrong answer
    (a real codegen bug, not a cache problem).
    """
    if canary_ok():
        return
    import jax

    logger.error(
        "XLA:CPU compile-cache canary FAILED — wiping stale cache at %s "
        "(AOT artifact from a different VM flavor)", cache_dir)
    shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
    jax.clear_caches()
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    if not canary_ok():
        raise RuntimeError(
            "compile-cache canary still failing after a cache wipe — "
            "XLA:CPU is mis-executing on this host independent of caching")
