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
