"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-idiomatic analog of a fake-NCCL backend (SURVEY.md §4): sharding
tests run against a virtual 8-device CPU mesh via
``--xla_force_host_platform_device_count``.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Guard against jitted closures baking big arrays in as CONSTANTS (a fused
# beam-search closure once captured the full 13.8GB weight tree — the compile
# request then ships the weights!).  Warn at 64MB; pytest.ini escalates the
# warning to an error.
os.environ.setdefault("JAX_CAPTURED_CONSTANTS_WARN_BYTES", str(64 * 2**20))
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# x64 on: parity tests run both stacks in double precision so that "math is
# identical" shows up as ~1e-9 agreement instead of fp32 accumulation noise.
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
# The env var alone is not honored when a TPU plugin (axon) is installed; the
# config update forces the virtual 8-device CPU backend for the test session.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the CPU test programs: this single-core
# environment is compile-dominated, so repeat suite runs drop from ~24 min
# cold to a fraction warm.  XLA:CPU AOT artifacts bake in host-model-specific
# LLVM target features; loading one compiled on a different VM flavor
# silently computes wrong NUMERICS (reproduced in the round-2 judge run).
# Defense is two-layer (utils/cpu_cache_guard.py): the cache dir is keyed by
# CPU model identity + jax/jaxlib versions, AND a session-start probe that
# (a) runs a known-answer canary and (b) compares the loaded artifact's LLVM
# compile-feature signature against this host's own — round 3 found two
# flavors with IDENTICAL /proc/cpuinfo whose artifacts differ (one bakes
# +prefer-no-gather/+prefer-no-scatter), so fingerprinting alone cannot
# discriminate; a foreign signature wipes the dir.
from visualcla_tpu.utils import cpu_cache_guard  # noqa: E402

_cache_dir = os.path.expanduser(
    "~/.cache/visualcla_jax_cpu_tests_"
    + cpu_cache_guard.machine_fingerprint())
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
cpu_cache_guard.ensure_clean_cache(_cache_dir)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
