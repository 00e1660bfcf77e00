"""Persistent XLA compilation cache setup.

Compiles through the axon TPU tunnel cost ~1-2 min per program; the persistent
cache makes every repeat run (bench re-runs, driver compile-checks, serving
restarts) near-instant.  Call early, before the first jit execution.
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get(
    "VISUALCLA_JAX_CACHE", os.path.expanduser("~/.cache/visualcla_jax")
)


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    import jax

    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        logger.warning("could not enable the persistent compile cache: %s", e)


def enable_cpu_compilation_cache(base_dir: str = DEFAULT_CACHE_DIR) -> None:
    """Persistent compile cache for a process pinned to the CPU backend.

    XLA:CPU AOT artifacts bake in LLVM target features of the *compiling*
    host (see utils/cpu_cache_guard.py) — a shared cache dir silently
    mis-executes when the VM flavor changes, so CPU processes get a dir keyed
    by the host fingerprint plus a known-answer canary that wipes a stale
    cache.  TPU processes keep :func:`enable_compilation_cache`'s shared dir
    (their artifacts target the chip, not the host, and tunnel compiles are
    the expensive thing the shared cache exists for).

    Call AFTER ``jax.config.update("jax_platforms", "cpu")``.
    """
    from . import cpu_cache_guard

    try:
        d = base_dir.rstrip("/") + "_cpu-" + cpu_cache_guard.machine_fingerprint()
        enable_compilation_cache(d)
        cpu_cache_guard.ensure_clean_cache(d)
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        logger.warning("could not enable the CPU compile cache: %s", e)
