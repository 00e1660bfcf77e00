"""TPU bench-cache canary (utils/tpu_cache_guard.py) — the known-answer
program must agree with the NumPy f64 reference on a healthy backend, and
the guard must raise when the canary persistently fails."""
import numpy as np
import pytest

from visualcla_tpu.utils import tpu_cache_guard as g


def test_canary_passes_on_healthy_backend():
    assert g.canary_ok()


def test_reference_values_are_finite_and_stable():
    a, b, idx, ref = g._canary_values()
    a2, b2, idx2, ref2 = g._canary_values()
    assert ref == ref2  # deterministic seed
    assert all(np.isfinite(r) for r in ref)
    np.testing.assert_array_equal(idx, idx2)


def test_guard_raises_when_canary_persistently_fails(monkeypatch, tmp_path):
    monkeypatch.setattr(g, "canary_ok", lambda: False)
    with pytest.raises(RuntimeError, match="refusing to report"):
        g.ensure_clean_tpu_cache(str(tmp_path / "cache"))


def test_guard_noop_when_canary_passes(tmp_path):
    # must not touch the dir at all on a healthy pass
    d = tmp_path / "cache"
    d.mkdir()
    sentinel = d / "artifact"
    sentinel.write_text("x")
    g.ensure_clean_tpu_cache(str(d))
    assert sentinel.exists()
