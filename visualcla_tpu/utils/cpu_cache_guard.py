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

Round-3 hardening: the fingerprint alone is NOT sufficient — two VM flavors
observed in this fleet share identical ``/proc/cpuinfo`` (same model name,
stepping, flags) yet LLVM bakes ``+prefer-no-gather``/``+prefer-no-scatter``
into AOT artifacts on one and not the other, so the same fingerprint dir
crosses flavors and the mismatch re-appeared in a round-3 dryrun.  Two facts
measured in this environment shape the defense:

- The loader's complaint fires even for SELF-compiled artifacts on the
  complaining flavor (the tuning features are never in its host-feature
  list), so message *presence* proves nothing.
- The complaint's ``Compile machine features: [...]`` list is a faithful
  flavor signature of whichever host compiled the artifact.

:func:`ensure_clean_cache` therefore establishes this host's own compile-
feature signature once (compile + reload the canary in a scratch dir,
capturing fd 2 — C++ logs bypass ``sys.stderr``), then probes the real cache
dir the same way: a loaded artifact whose signature differs from the local
one was compiled by a different flavor → wipe.  The canary artifact is
force-persisted (bypassing ``jax_persistent_cache_min_compile_time_secs``)
so every dir this code writes carries a load-probeable sentinel.
"""
from __future__ import annotations

import contextlib
import hashlib
import logging
import os
import platform
import re
import shutil
import tempfile

logger = logging.getLogger(__name__)

# XLA:CPU's load-time complaint (cpu_aot_loader.cc) carries the compiling
# host's full LLVM feature string — the flavor signature we compare.
_COMPILE_FEATURES_RE = re.compile(r"Compile machine features: \[([^\]]*)\]")

# Marks a dir as written under the signature-probing guard; bump to force a
# one-time wipe of dirs whose artifacts the current scheme can't attribute.
_SENTINEL_NAME = "GUARD_SENTINEL"
_SENTINEL_VERSION = "v3-signature"

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


@contextlib.contextmanager
def _fd2_capture():
    """Tee-free fd-2 capture: C++ (absl) log lines bypass sys.stderr, so the
    only way to see cpu_aot_loader's complaint in-process is dup2 the fd."""
    saved = os.dup(2)
    out = {"text": ""}
    try:
        with tempfile.TemporaryFile(mode="w+b") as tf:
            os.dup2(tf.fileno(), 2)
            try:
                yield out
            finally:
                os.dup2(saved, 2)
                tf.seek(0)
                out["text"] = tf.read().decode("utf-8", "replace")
    finally:
        os.close(saved)


def parse_compile_features(text: str) -> str | None:
    """First ``Compile machine features`` list in captured loader output,
    or None when no complaint was printed (fresh compile, or a flavor whose
    artifacts load silently)."""
    m = _COMPILE_FEATURES_RE.search(text)
    return m.group(1) if m else None


@contextlib.contextmanager
def _force_persist():
    """Temporarily persist every compile so the canary lands in the dir."""
    import jax

    knobs = {"jax_persistent_cache_min_compile_time_secs": 0.0,
             "jax_persistent_cache_min_entry_size_bytes": 0}
    prev = {k: getattr(jax.config, k) for k in knobs}
    for k, v in knobs.items():
        jax.config.update(k, v)
    try:
        yield
    finally:
        for k, v in prev.items():
            jax.config.update(k, v)


def _canary_probe() -> tuple[bool, str | None]:
    """One canary run through the active persistent cache.

    Returns ``(numerics_ok, loaded_signature)`` where ``loaded_signature`` is
    the compile-feature string of whatever AOT artifact the load served (None
    when nothing complained — fresh compile or a silent flavor).  Each call
    builds a fresh jit closure, so an artifact already in the dir is loaded
    rather than hit in the in-memory executable cache.
    """
    with _force_persist():
        with _fd2_capture() as cap:
            ok = canary_ok()
    text = cap["text"]
    # Non-loader noise that landed on fd 2 during the probe still belongs to
    # the user (warnings, our own logging if it targets stderr).
    kept = "\n".join(ln for ln in text.splitlines()
                     if "cpu_aot_loader" not in ln)
    if kept.strip():
        os.write(2, (kept + "\n").encode())
    return ok, parse_compile_features(text)


_local_signature: dict[str, str | None] = {}


def local_compile_signature() -> str | None:
    """This host's own LLVM compile-feature signature (cached per process).

    Compile the canary cold into a scratch dir, then reload it: if the
    loader complains about its OWN artifact (observed on flavors where LLVM
    adds tuning features like ``+prefer-no-gather``), the complaint carries
    exactly this host's signature.  Silence means this flavor's artifacts
    load cleanly, signature None.
    """
    if "sig" in _local_signature:
        return _local_signature["sig"]
    import jax
    from jax._src import compilation_cache as _cc

    prev_dir = jax.config.jax_compilation_cache_dir
    scratch = tempfile.mkdtemp(prefix="visualcla_canary_scratch_")
    try:
        jax.config.update("jax_compilation_cache_dir", scratch)
        _cc.reset_cache()
        _canary_probe()          # cold: compiles + persists
        _, sig = _canary_probe()  # warm: loads own artifact -> local signature
    finally:
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        _cc.reset_cache()
        shutil.rmtree(scratch, ignore_errors=True)
    _local_signature["sig"] = sig
    return sig


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
    """Probe the cache dir; on poisoning evidence wipe it and re-verify.

    Poisoning evidence is EITHER a wrong known answer OR a loaded canary
    artifact whose compile-feature signature differs from this host's own
    (:func:`local_compile_signature`) — i.e. the dir was written by a
    different VM flavor.  A foreign artifact often still computes the canary
    correctly while other programs in the same dir mis-execute; the whole dir
    was written by one flavor, so one foreign signature condemns it all.
    Must be called *after* ``jax_compilation_cache_dir`` points at
    ``cache_dir``.  Raises if even a cold compile computes the wrong answer
    (a real codegen bug, not a cache problem).
    """
    def listing() -> set[str]:
        try:
            return set(os.listdir(cache_dir))
        except OSError:
            return set()

    # One-time upgrade wipe: a nonempty dir without the guard sentinel was
    # written before the signature scheme (its canary entry, if any, was not
    # force-persisted) — its artifacts can't be attributed to a flavor.
    sentinel = os.path.join(cache_dir, _SENTINEL_NAME)
    try:
        with open(sentinel) as f:
            sentinel_version = f.read().strip()
    except OSError:
        sentinel_version = None
    if listing() and sentinel_version != _SENTINEL_VERSION:
        logger.warning(
            "compile-cache dir %s predates the guard sentinel — wiping once",
            cache_dir)
        shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
    with open(sentinel, "w") as f:
        f.write(_SENTINEL_VERSION + "\n")

    local_sig = local_compile_signature()
    before = listing()
    ok, loaded_sig = _canary_probe()
    # New files in the dir mean the canary COMPILED fresh (always clean);
    # an unchanged dir means it LOADED an existing artifact, whose signature
    # must match this host's own (both may be None on silent flavors).
    loaded = listing() == before and bool(before)
    foreign = loaded and loaded_sig != local_sig
    if ok and not foreign:
        return
    import jax

    logger.error(
        "XLA:CPU compile-cache canary FAILED (%s) — wiping stale cache at %s "
        "(AOT artifacts from a different VM flavor)",
        "wrong numerics" if not ok else "foreign compile-feature signature",
        cache_dir)
    shutil.rmtree(cache_dir, ignore_errors=True)
    os.makedirs(cache_dir, exist_ok=True)
    with open(sentinel, "w") as f:
        f.write(_SENTINEL_VERSION + "\n")
    jax.clear_caches()
    from jax._src import compilation_cache as _cc

    _cc.reset_cache()
    ok, loaded_sig = _canary_probe()
    if not ok:
        raise RuntimeError(
            "compile-cache canary still failing after a cache wipe — "
            "XLA:CPU is mis-executing on this host independent of caching")
    if loaded_sig is not None and loaded_sig != local_sig:
        # A fresh compile can't be foreign; belt-and-braces only.
        logger.error("foreign signature reported even after a cache wipe")
