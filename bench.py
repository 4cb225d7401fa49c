"""Benchmark harness — prints ONE JSON line for the driver.

Measures the flagship 3D BiMocq smoke step (vortex-collision physics) on the
available accelerator and reports throughput in Mcells/s plus the ratio
vs. the reference-CPU estimate.

Baseline note (see BASELINE.md): the reference publishes no numbers and its
"CPU" 3D solver still calls CUDA for advection, so the reference-CPU
steps/s is estimated from the serial-CPU cost of the same algorithm:
REF_CPU_NS_PER_CELL_STEP below was measured by timing this engine's own
step on the single-core CPU backend at 48^3 (python bench.py --calibrate)
— ~3.4us per cell per BiMocq step, in line with a TBB-class CPU
implementation of ~40 stencil+interp passes per cell.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


# Estimated nanoseconds per (cell * step) for the full BiMocq step on a
# 16-core TBB workstation (the reference's platform class). Our own XLA-CPU
# single-core measurement is 400,000 ns/cell/step (python bench.py
# --calibrate); an optimized C++/TBB implementation is assumed 10x faster
# per core and 16-way parallel => 400000/10/16 = 2500. Generous to the
# reference; revisit when a real reference-CPU run is available.
REF_CPU_NS_PER_CELL_STEP = 2500.0
REF_CPU_ASSUMED_CORES = 1.0  # already folded into the constant


def build(n, scheme_name="bimocq", proj_iters=30):
    from gpufluidsimulation_tpu.scenes.scenes3d import vortex_collision_config
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke3d import Emitter3D, Smoke3D

    scheme = {"bimocq": Scheme.BIMOCQ, "reflection": Scheme.MAC_REFLECTION,
              "semilag": Scheme.SEMILAG}[scheme_name]
    # vortex-collision physics scaled into an n^3 box (emitters recentred so
    # the collision happens mid-domain at any resolution); dt scales with h
    # to hold the reference scene's CFL number (~2.6 at 100^3/dt=0.08)
    cfg = vortex_collision_config(
        ni=n, nj=n, nk=n, scheme=scheme, dt=8.0 / n,
        emitters=(
            Emitter3D(center=(0.04, 0.10, 0.10), radius=0.015, sign=1.0),
            Emitter3D(center=(0.16, 0.101, 0.10), radius=0.015, sign=-1.0),
        ),
        proj_tol=1e-4, proj_max_iters=proj_iters,
    )
    return Smoke3D(cfg)


def measure(n, steps, scheme_name="bimocq"):
    import jax

    solver = build(n, scheme_name)
    state = solver.init_state()
    t0 = time.time()
    state = solver.step(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state = solver.step(state)
    jax.block_until_ready(jax.tree.leaves(state)[0])
    ms_per_step = (time.time() - t0) / steps * 1e3
    return ms_per_step, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=int(os.environ.get("BENCH_N", "64")))
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--scheme", default="bimocq")
    ap.add_argument("--calibrate", action="store_true",
                    help="measure the CPU-backend ns/cell/step constant")
    args = ap.parse_args()

    if args.calibrate:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        import jax._src.xla_bridge as xb

        jax.config.update("jax_platforms", "cpu")
        if xb.backends_are_initialized():
            xb._clear_backends()
        n = 48
        ms, _ = measure(n, 3, args.scheme)
        print(f"CPU {n}^3: {ms:.1f} ms/step -> "
              f"{ms * 1e6 / n**3:.0f} ns/cell/step", file=sys.stderr)
        return

    # enable the persistent compilation cache so repeat runs skip the
    # multi-minute first compile
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    n = args.n
    ms_per_step, compile_s = measure(n, args.steps, args.scheme)
    cells = n**3
    mcells_per_s = cells / 1e6 / (ms_per_step / 1e3)
    ref_ms = cells * REF_CPU_NS_PER_CELL_STEP / REF_CPU_ASSUMED_CORES / 1e6
    vs_baseline = ref_ms / ms_per_step
    print(json.dumps({
        "metric": f"smoke3d_{args.scheme}_{n}cubed_mcells_per_s",
        "value": round(mcells_per_s, 3),
        "unit": "Mcells/s",
        "vs_baseline": round(vs_baseline, 3),
        "ms_per_step": round(ms_per_step, 2),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
