"""Profile the 256^3 BiMocq step: aggregate device leaf events from a
jax.profiler trace (per-op timings through the tunnel lie; the trace's
device-pid leaf events are the honest accounting — PERF.md)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=256, steps=2):
    from bench import build

    solver = build(n)
    state = solver.init_state()
    state = solver.step(state)  # compile
    _ = float(state.cfl)
    trace_dir = "/tmp/gfs_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            state = solver.step(state)
        _ = float(state.cfl)

    traces = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    ev_by_name = defaultdict(float)
    total = 0.0
    for t in traces:
        with gzip.open(t, "rt") as f:
            data = json.load(f)
        # find device pids (TensorCore)
        dev_pids = {
            m["pid"] for m in data["traceEvents"]
            if m.get("ph") == "M" and m.get("name") == "process_name"
            and ("TPU" in str(m["args"].get("name", "")) or "/device" in str(m["args"].get("name", "")))
        }
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and e.get("pid") in dev_pids and e.get("tid") is not None:
                name = e.get("name", "?")
                dur = e.get("dur", 0) / 1e3 / steps  # ms per step
                ev_by_name[name] += dur
                total += dur
    print(f"total device time: {total:.1f} ms/step over {len(traces)} trace files")
    for name, ms in sorted(ev_by_name.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{ms:9.2f} ms  {100*ms/max(total,1e-9):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main(int(os.environ.get("PROF_N", "256")), int(os.environ.get("PROF_STEPS", "2")))
