"""Per-phase timing + logging harness — the TPU analogue of the reference's
cudaEvent wall-clock ("[Bimocq GPU Time: X ms]", BimocqGPUSolver.cpp:110-126;
timer GPU_Advection.h:228-247) and its colored per-frame console logs.
`jax.profiler` traces can be layered on via `trace_dir`.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

GREEN = "\033[32m"
YELLOW = "\033[33m"
BLUE = "\033[34m"
RED = "\033[31m"
RESET = "\033[0m"


@dataclass
class FrameTimer:
    """Accumulates per-phase wall times with block_until_ready fencing."""

    phases: Dict[str, float] = field(default_factory=dict)
    history: List[float] = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str, *fence):
        t0 = time.perf_counter()
        yield
        for x in fence:
            jax.block_until_ready(x)
        self.phases[name] = self.phases.get(name, 0.0) + time.perf_counter() - t0

    def time_step(self, step_fn, state, *args):
        t0 = time.perf_counter()
        out = step_fn(state, *args)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        dt_ms = (time.perf_counter() - t0) * 1e3
        self.history.append(dt_ms)
        return out, dt_ms

    def report(self, frame: int, extras: Optional[dict] = None) -> str:
        ms = self.history[-1] if self.history else 0.0
        msg = f"[Bimocq TPU Time: {ms:.2f}ms ]"
        if extras:
            for k, v in extras.items():
                msg += f" {k}={v}"
        return msg


@contextlib.contextmanager
def profiler_trace(trace_dir: Optional[str]):
    """Optional jax.profiler trace around a region (SURVEY.md §5 tracing)."""
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
