"""Profiling utils tests."""
import time

import numpy as np

from visualcla_tpu.utils.profiling import Counters, PhaseTimer


def test_phase_timer_accumulates():
    t = PhaseTimer()
    for _ in range(3):
        with t.phase("work"):
            time.sleep(0.01)
    s = t.summary()
    assert s["work"]["count"] == 3
    assert s["work"]["total_s"] >= 0.03
    assert s["work"]["p50_ms"] >= 10
    t.reset()
    assert t.summary() == {}


def test_phase_timer_sync_on_device_value():
    import jax.numpy as jnp

    t = PhaseTimer()
    with t.phase("jit", sync_on=jnp.ones((4,)) * 2):
        pass
    assert t.summary()["jit"]["count"] == 1


def test_counters_thread_safe():
    import threading

    c = Counters()

    def bump():
        for _ in range(1000):
            c.add("tokens")

    ts = [threading.Thread(target=bump) for _ in range(4)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert c.get("tokens") == 4000
    assert c.snapshot() == {"tokens": 4000}
