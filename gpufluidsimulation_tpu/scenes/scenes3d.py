"""3D scenes — the vortex-ring collision example of bimocq3D/main.cpp:27-80.

Two counter-propagating sphere emitters (radius 0.015) at (0.04, 0.2, 0.2)
and (0.16, 0.201, 0.2) — note the deliberate 0.001 y-asymmetry — emitting
density 1, temperature 50, with theta-modulated x-velocity +-0.06(1+0.01cos8θ)
for the first 10 frames (Emitter ctor args at main.cpp:76-77, analytic GPU
emission at BimocqGPUSolver.cpp:387-390).
"""

from __future__ import annotations

from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke3d import (
    Boundary3D,
    Emitter3D,
    Smoke3D,
    Smoke3DConfig,
)


def vortex_collision_config(
    ni: int = 100,
    nj: int = 200,
    nk: int = 200,
    scheme: Scheme = Scheme.MAC_REFLECTION,  # default at main.cpp:51
    dt: float = 0.08,
    **overrides,
) -> Smoke3DConfig:
    base = dict(
        ni=ni, nj=nj, nk=nk, L=0.2, dt=dt, scheme=scheme,
        viscosity=1e-6,          # main.cpp:44
        blend_coeff=1.0,         # main.cpp:47
        alpha=0.0, beta=0.0,     # smoke_rise = smoke_drop = 0 (main.cpp:42-43)
        emitters=(
            Emitter3D(center=(0.04, 0.2, 0.2), radius=0.015, density=1.0,
                      temperature=50.0, sign=1.0, emit_frames=10),
            Emitter3D(center=(0.16, 0.201, 0.2), radius=0.015, density=1.0,
                      temperature=50.0, sign=-1.0, emit_frames=10),
        ),
    )
    base.update(overrides)
    return Smoke3DConfig(**base)


def make_vortex_collision(scheme: Scheme = Scheme.MAC_REFLECTION, **overrides):
    cfg = vortex_collision_config(scheme=scheme, **overrides)
    solver = Smoke3D(cfg)
    return solver, solver.init_state()


def moving_obstacle_config(
    ni: int = 64,
    nj: int = 128,
    nk: int = 128,
    scheme: Scheme = Scheme.BIMOCQ,
    dt: float | None = None,
    **overrides,
) -> Smoke3DConfig:
    """A plume emitter + a rigid sphere sweeping through it — the moving
    `Boundary` workflow of the reference (BimocqSolver.h:61-80,
    updateBoundary/blendBoundary/clearBoundary) as a ready scene; the
    obstacle oscillates across the plume with a closed-form trans(frame).

    dt defaults to 1.6/ni: the sustained buoyant plume accelerates
    without bound early on (continuous emitter + buoyancy), so the vortex
    scene's 8/ni dt drove CFL past 20 by frame 10 — no displacement
    budget absorbs a 20-cell/frame map jump at a solid boundary, and the
    physics at that CFL is mush for every scheme (the reference's own
    default scene runs CFL ~2.6; the r2 obstacle rows' contract
    violations were exactly this). 1.6/ni holds the developed flow at
    CFL ~1-3: measured 0 violations over 30 frames at 128^3 with the
    standard Rr=2 reach (GFS_INTERP_RR=3 remains the escape hatch for
    rougher obstacle configs)."""
    if dt is None:
        dt = 1.6 / ni
    L = 0.2
    h = L / ni
    ly = nj * h
    lz = nk * h

    def sweep(frame):
        import jax.numpy as jnp

        # back and forth across the plume, period ~120 frames
        return (0.0, 0.0, 0.125 * lz * jnp.sin(2.0 * jnp.pi * frame / 120.0))

    base = dict(
        ni=ni, nj=nj, nk=nk, L=L, dt=dt, scheme=scheme,
        viscosity=1e-6, blend_coeff=1.0,
        alpha=0.1, beta=0.02,    # buoyant plume
        emitters=(
            Emitter3D(center=(0.5 * L, 0.12 * ly, 0.5 * lz), radius=0.1 * L,
                      density=1.0, temperature=50.0, sign=1.0,
                      emit_frames=10**9),
        ),
        boundaries=(
            Boundary3D(center=(0.5 * L, 0.5 * ly, 0.5 * lz), radius=0.12 * L,
                       trans=sweep),
        ),
    )
    base.update(overrides)
    return Smoke3DConfig(**base)


def make_moving_obstacle(scheme: Scheme = Scheme.BIMOCQ, **overrides):
    cfg = moving_obstacle_config(scheme=scheme, **overrides)
    solver = Smoke3D(cfg)
    return solver, solver.init_state()


SCENES_3D = {0: make_vortex_collision, 1: make_moving_obstacle}


TOTAL_FRAMES = 300  # main.cpp:34
