"""Capture + aggregate a device trace of any jitted step on the axon TPU.

jax.profiler works under the tunnel (DEVNOTES round-2 fifth window): a trace
of the 7B B=8 int8 paged step exposed in ONE capture what three rounds of
ablation probes missed (per-matmul bf16 dequant temps, loop-invariant weight
relayout copies, the always-on sampling sorts).  This tool packages that
workflow:

  # trace N decode steps of the flagship engine and print the op-time table
  python tools/trace_analyze.py [--quant int8|int4|bf16] [--steps 4] [--b8]

  # or analyze an existing perfetto trace dir/file
  python tools/trace_analyze.py --parse /tmp/trace_dir

Aggregates "X" (complete) events by name on the device track, prints total
device time per op-name bucket (fusion names collapse to their root), so
copies/relayouts/transposes stand out vs the matmul floor.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(path: str, top: int = 30) -> None:
    """Aggregate a perfetto json(.gz) trace: device-pid 'X' events by name."""
    if os.path.isdir(path):
        cands = sorted(
            glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                      recursive=True),
            key=os.path.getmtime,
        )
        if not cands:
            raise SystemExit(f"no *.trace.json.gz under {path}")
        path = cands[-1]
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data

    # device tracks: process names containing TPU/device (axon names vary);
    # fall back to every pid if none matches
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if re.search(r"tpu|device|/device:", n, re.I)}

    per_op = collections.Counter()
    per_op_n = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        # collapse fusion suffixes: 'fusion.1234' -> 'fusion',
        # 'copy.62' -> 'copy', keep dotted hlo roots readable
        name = re.sub(r"[.\d]+$", "", e["name"]) or e["name"]
        per_op[name] += e["dur"]
        per_op_n[name] += 1
        total += e["dur"]
    if not per_op:
        raise SystemExit("no device 'X' events found (wrong pid filter?)")
    print(f"# {path}")
    print(f"# device total: {total / 1e3:.3f} ms over {sum(per_op_n.values())} events")
    print(f"{'op':<44} {'ms':>10} {'%':>6} {'count':>7}")
    for name, dur in per_op.most_common(top):
        print(f"{name:<44} {dur / 1e3:>10.3f} {100 * dur / total:>5.1f}% "
              f"{per_op_n[name]:>7}")


def trace_decode(quant: str, steps: int, b8: bool, out_dir: str) -> str:
    """Run + trace `steps` chained decode steps of the flagship engine."""
    import jax
    import numpy as np

    import bench  # repo-root bench.py: engine builders shared with the bench

    engine, cfg = bench.build_engine(384, quant)
    from visualcla_tpu.engine.sampling import SamplingConfig

    if b8:
        engine8, s8, fresh_state, _ = bench.batch8_setup(engine, cfg)
        st = fresh_state()
        step = lambda s: engine8._decode_step(engine8.params, s, s8)  # noqa: E731
    else:
        rng = np.random.default_rng(0)
        ids = rng.integers(5, 30000, size=(1, 100)).astype(np.int32)
        pix = rng.standard_normal((1, 3, 224, 224)).astype(np.float32)
        sampling = SamplingConfig.greedy(max_new_tokens=steps + 2)
        st = engine.start(ids, pix, np.full((1,), 2, np.int32), sampling)
        step = lambda s: engine._decode_step(engine.params, s, sampling)  # noqa: E731

    st = step(st)  # compile outside the trace
    bench._sync(st.last_token)
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        st = step(st)
    bench._sync(st.last_token)
    jax.profiler.stop_trace()
    return out_dir


def main() -> None:
    if "--parse" in sys.argv:
        parse_trace(sys.argv[sys.argv.index("--parse") + 1])
        return
    quant = "int8"
    if "--quant" in sys.argv:
        quant = sys.argv[sys.argv.index("--quant") + 1]
    steps = 4
    if "--steps" in sys.argv:
        steps = int(sys.argv[sys.argv.index("--steps") + 1])
    out = f"/tmp/visualcla_trace_{quant}{'_b8' if '--b8' in sys.argv else ''}"
    trace_decode(quant, steps, "--b8" in sys.argv, out)
    parse_trace(out)


if __name__ == "__main__":
    main()
