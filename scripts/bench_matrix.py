"""Benchmark the FULL scheme/scene matrix on the accelerator (VERDICT r1
item 3: every scheme the README advertises gets a measured TPU number, not
just the flagship 256^3 BiMocq config).

Rows:
  3D at 256^3: BIMOCQ, MAC_REFLECTION (the reference's default scheme,
      main.cpp:51), SEMILAG, MACCORMACK — vortex-collision scene;
  3D at the reference's DEFAULT grid 100x200x200 (main.cpp:31-40), dt=0.08:
      BIMOCQ + MAC_REFLECTION;
  3D moving-obstacle (masked projection) at 128^3 and 192^3;
  2D at 256^2 Taylor vortex (example 0): all 8 schemes, ms/frame.

Writes BENCHMATRIX_r{N}.json at the repo root (list of row dicts) and
prints each row as it lands.

Usage: python scripts/bench_matrix.py [--round 2] [--steps 6] [--quick]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp
    float(jnp.max(jnp.abs(x)))


def bench_3d(scheme_name, n=None, shape=None, steps=6, scene="vortex"):
    import jax
    import jax.numpy as jnp

    from gpufluidsimulation_tpu.scenes import scenes3d
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke3d import Smoke3D

    scheme = {"bimocq": Scheme.BIMOCQ, "reflection": Scheme.MAC_REFLECTION,
              "semilag": Scheme.SEMILAG, "maccormack": Scheme.MACCORMACK}[
                  scheme_name]
    if scene == "vortex":
        from bench import build

        if shape is not None:
            ni, nj, nk = shape
            cfg = scenes3d.vortex_collision_config(
                ni=ni, nj=nj, nk=nk, scheme=scheme, dt=0.08,
                proj_tol=1e-4, proj_max_iters=30)
            solver = Smoke3D(cfg)
        else:
            solver = build(n, scheme_name)
            ni = nj = nk = n
    else:  # moving obstacle (masked projection)
        # scene-default dt (1.6/n: CFL ~1-3 on the developed plume — the
        # old 8/n drove CFL past 20 by frame 10 and with it the r2 rows'
        # contract violations) and scene-default engine mode
        cfg = scenes3d.moving_obstacle_config(
            ni=n, nj=n, nk=n, scheme=scheme,
            proj_tol=1e-4, proj_max_iters=40)
        solver = Smoke3D(cfg)
        ni = nj = nk = n

    state = solver.init_state()
    t0 = time.time()
    state = solver.step(state)
    _sync(state.rho)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(steps):
        state = solver.step(state)
    _sync(state.rho)
    ms = (time.time() - t0) / steps * 1e3
    cells = ni * nj * nk
    return dict(
        dim=3, scene=scene, scheme=scheme_name, grid=f"{ni}x{nj}x{nk}",
        ms_per_step=round(ms, 2),
        mcells_per_s=round(cells / 1e6 / (ms / 1e3), 2),
        compile_s=round(compile_s, 1),
        overflow=int(getattr(state, "interp_overflow", 0)),
    )


def bench_2d(scheme_id, frames=10):
    import jax
    import jax.numpy as jnp

    from gpufluidsimulation_tpu.scenes import scenes2d
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D

    scheme = Scheme(scheme_id)
    scene = scenes2d.make_scene_2d(0, scheme)  # 256^2 Taylor vortex
    solver = Smoke2D(scene.cfg)
    state = solver.init_state()
    state = scene.init(solver, state)
    if scheme in (Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC):
        state = solver.sample_particles_from_grid(state)
    dt = scene.dt
    t0 = time.time()
    state = solver.step(state, dt)
    _sync(state.rho)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(frames):
        state = solver.step(state, dt)
    _sync(state.rho)
    ms = (time.time() - t0) / frames * 1e3
    return dict(
        dim=2, scene="taylor", scheme=scheme.name.lower(), grid="256x256",
        ms_per_frame=round(ms, 2), compile_s=round(compile_s, 1),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--quick", action="store_true",
                    help="only the 256^3 3D rows")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    rows = []

    def add(fn, *a, **kw):
        try:
            row = fn(*a, **kw)
        except Exception as e:  # record the failure, keep benching
            row = dict(error=f"{type(e).__name__}: {e}"[:300],
                       call=f"{fn.__name__} {a} {kw}")
        rows.append(row)
        print(json.dumps(row), flush=True)

    for s in ("bimocq", "reflection", "semilag", "maccormack"):
        add(bench_3d, s, n=256, steps=args.steps)
    if not args.quick:
        # the reference's default scene size (bimocq3D/main.cpp:31-40)
        for s in ("bimocq", "reflection"):
            add(bench_3d, s, shape=(100, 200, 200), steps=args.steps)
        # masked projection (moving obstacle)
        for n in (128, 192):
            add(bench_3d, "bimocq", n=n, steps=args.steps, scene="obstacle")
        for sid in range(8):
            add(bench_2d, sid)

    path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"BENCHMATRIX_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(dict(device=str(jax.devices()[0]), rows=rows), f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
