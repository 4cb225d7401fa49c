"""2D canonical scenes — every argv example of bimocq2D/main.cpp:40-223,
parameter-for-parameter.

Scene inits that need a stream-function solve (Taylor vortex, leapfrog) run
the same Poisson stack as the simulation (setInitVelocity,
BimocqSolver2D.cpp:1858-1976 — "scene init itself exercises the Poisson
stack", SURVEY.md §3.4).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from gpufluidsimulation_tpu.core.grids import Grid2D
from gpufluidsimulation_tpu.ops import poisson
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D, Smoke2DConfig
from gpufluidsimulation_tpu.utils.tree import fresh_buffers


def _solve_stream_function(grid: Grid2D, curl_nodes):
    """psi from node vorticity: solve (1/h^2-scaled) Dirichlet Poisson, then
    u = d(psi)/dy, v = -d(psi)/dx (setInitVelocity, cpp:1935-1974).

    The reference solves (1/h^2) L psi = omega; with our unscaled L the
    solution differs by h^2, compensated in the face differences below.
    """
    ni, nj = grid.ni, grid.nj
    h = grid.h
    rhs = curl_nodes[:ni, :nj]  # node curl sampled at cell indices (:1941)
    ctx = poisson.MGContext((ni, nj), "dirichlet")
    psi_unscaled, _, _, _ = poisson.mgpcg(jnp.asarray(rhs), ctx, tol=1e-6, max_iters=400)
    # psi_ref = h^2 * psi_unscaled; u = dpsi_ref/dy / h = dpsi_unscaled * h
    psi = jnp.zeros((ni + 1, nj + 1), jnp.float32).at[:ni, :nj].set(psi_unscaled)
    u = (psi[: ni + 1, 1 : nj + 1] - psi[: ni + 1, :nj]) * h
    v = -(psi[1 : ni + 1, : nj + 1] - psi[:ni, : nj + 1]) * h
    return u, v


def _gaussian_vortex_pair_curl(grid, distance):
    """Taylor-vortex pair curl (cpp:1921-1934)."""
    ni, nj = grid.ni, grid.nj
    x = np.arange(ni + 1)[:, None] * grid.h - math.pi
    y = np.arange(nj + 1)[None, :] * grid.h - math.pi
    r0 = (x + 0.5 * distance) ** 2 + y**2
    r1 = (x - 0.5 * distance) ** 2 + y**2
    curl = (1.0 / 0.3) * (2.0 - r0 / 0.09) * np.exp(0.5 * (1.0 - r0 / 0.09))
    curl += (1.0 / 0.3) * (2.0 - r1 / 0.09) * np.exp(0.5 * (1.0 - r1 / 0.09))
    return curl.astype(np.float32)


def init_taylor_vortex(solver: Smoke2D, state, distance=0.81):
    curl = _gaussian_vortex_pair_curl(solver.grid, distance)
    u, v = _solve_stream_function(solver.grid, curl)
    return fresh_buffers(state.replace(
        u=u, v=v, u_init=u, v_init=v, u_origin=u, v_origin=v
    )), float(np.abs(curl).max())


def init_leapfrog(solver: Smoke2D, state, dist_a=1.5, dist_b=3.0,
                  rho_h=math.pi - 1.6, rho_w=0.3):
    """setInitLeapFrog (cpp:2000-2084): four Gaussian vortices + a smoke strip."""
    grid = solver.grid
    ni, nj = grid.ni, grid.nj
    a = 0.02
    x = np.arange(ni + 1)[:, None] * grid.h - math.pi
    y = np.arange(nj + 1)[None, :] * grid.h - math.pi
    curl = np.zeros((ni + 1, nj + 1), np.float32)
    # vortices at (+-dist/2, -2) with alternating signs (cpp:2010-2021)
    for cx, sgn in ((-0.5 * dist_a, 1.0), (0.5 * dist_a, -1.0),
                    (-0.5 * dist_b, 1.0), (0.5 * dist_b, -1.0)):
        r2 = (x - cx) ** 2 + (y + 2.0) ** 2
        curl += sgn * (1000.0 / (2.0 * math.pi)) * np.exp(-0.5 * r2 / (a * a))
    u, v = _solve_stream_function(grid, jnp.asarray(curl))
    xc = (np.arange(ni)[:, None] + 0.5) * grid.h
    yc = (np.arange(nj)[None, :] + 0.5) * grid.h
    strip = (
        (yc > rho_h - rho_w) & (yc < rho_h + rho_w)
        & (xc > rho_w) & (xc < 2 * math.pi - rho_w)
    )
    rho = jnp.asarray(np.broadcast_to(strip, (ni, nj)).astype(np.float32))
    return fresh_buffers(state.replace(
        u=u, v=v, u_init=u, v_init=v, u_origin=u, v_origin=v,
        rho=rho, rho_init=rho, rho_orig=rho,
    )), float(np.abs(curl).max())


def init_rayleigh_taylor(solver: Smoke2D, state, layer_height):
    """setInitReyleighTaylor (cpp:1978-1998): heavy fluid (rho) above the
    perturbed interface, light fluid (T) below."""
    grid = solver.grid
    ni, nj = grid.ni, grid.nj
    x = (np.arange(ni)[:, None] + 0.5) * grid.h
    y = (np.arange(nj)[None, :] + 0.5) * grid.h
    perturb = layer_height + 0.05 * np.cos(10 * math.pi * x)
    heavy = (y >= perturb).astype(np.float32)
    light = 1.0 - heavy
    rho = jnp.asarray(np.broadcast_to(heavy, (ni, nj)))
    T = jnp.asarray(np.broadcast_to(light, (ni, nj)))
    return fresh_buffers(state.replace(rho=rho, rho_init=rho, rho_orig=rho, T=T, T_init=T, T_orig=T))


def init_zalesak(solver: Smoke2D, state):
    """setInitZalesak (cpp:2086-2130): slotted-disk SDF in rho + rigid
    rotation (period 628s)."""
    grid = solver.grid
    ni, nj = grid.ni, grid.nj
    h = grid.h
    r = 0.1 * ni * h
    cx, cy = 0.5 * ni * h, 0.65 * ni * h
    width, height = 0.04 * ni * h, 0.20 * ni * h
    rx, ry = 0.5 * ni * h, 0.6 * ni * h

    x = (np.arange(ni)[:, None] + 0.5) * h
    y = (np.arange(nj)[None, :] + 0.5) * h
    circle = np.sqrt((x - cx) ** 2 + (y - cy) ** 2) - r
    px = np.abs(x - rx) - 0.5 * width
    py = np.abs(y - ry) - 0.5 * height
    outside = np.sqrt(np.maximum(px, 0) ** 2 + np.maximum(py, 0) ** 2)
    rect = outside + np.minimum(np.maximum(px, py), 0.0)
    sdf = np.maximum(circle, -rect).astype(np.float32)
    sdf = np.broadcast_to(sdf, (ni, nj)).astype(np.float32)

    xu = np.arange(ni + 1)[:, None] * h
    yu = (np.arange(nj)[None, :] + 0.5) * h
    u = np.broadcast_to(math.pi * (0.5 * ni * h - yu) / 314.0, (ni + 1, nj))
    xv = (np.arange(ni)[:, None] + 0.5) * h
    yv = np.arange(nj + 1)[None, :] * h
    v = np.broadcast_to(math.pi * (xv - 0.5 * ni * h) / 314.0, (ni, nj + 1))
    u = jnp.asarray(u.astype(np.float32))
    v = jnp.asarray(v.astype(np.float32))
    rho = jnp.asarray(sdf)
    return fresh_buffers(state.replace(
        rho=rho, rho_init=rho, rho_orig=rho,
        u=u, v=v, u_init=u, v_init=v, u_origin=u, v_origin=v,
    ))


def init_vortex_box(solver: Smoke2D, state):
    """setInitVortexBox (cpp:2132-2172): circle SDF + normalized single vortex."""
    grid = solver.grid
    ni, nj = grid.ni, grid.nj
    h = grid.h
    r = 0.15 * ni * h
    cx, cy = 0.5 * ni * h, 0.75 * ni * h
    x = (np.arange(ni)[:, None] + 0.5) * h
    y = (np.arange(nj)[None, :] + 0.5) * h
    sdf = (np.sqrt((x - cx) ** 2 + (y - cy) ** 2) - r).astype(np.float32)
    sdf = np.broadcast_to(sdf, (ni, nj)).astype(np.float32)
    xn = x / (ni * h)
    yn = y / (nj * h)
    tmp_x = -2.0 * np.sin(math.pi * xn) ** 2 * np.sin(math.pi * yn) * np.cos(math.pi * yn)
    tmp_y = 2.0 * np.sin(math.pi * xn) * np.cos(math.pi * xn) * np.sin(math.pi * yn) ** 2
    normalize = float(np.sqrt(tmp_x**2 + tmp_y**2).max())

    xu = np.arange(ni + 1)[:, None] * h / (ni * h)
    yu = (np.arange(nj)[None, :] + 0.5) * h / (nj * h)
    u = -2.0 * np.sin(math.pi * xu) ** 2 * np.sin(math.pi * yu) * np.cos(math.pi * yu)
    u = np.broadcast_to(u / normalize, (ni + 1, nj)).astype(np.float32)
    xv = (np.arange(ni)[:, None] + 0.5) * h / (ni * h)
    yv = np.arange(nj + 1)[None, :] * h / (nj * h)
    v = 2.0 * np.sin(math.pi * xv) * np.cos(math.pi * xv) * np.sin(math.pi * yv) ** 2
    v = np.broadcast_to(v / normalize, (ni, nj + 1)).astype(np.float32)
    rho = jnp.asarray(sdf)
    return fresh_buffers(state.replace(rho=rho, rho_init=rho, rho_orig=rho,
                         u=jnp.asarray(u), v=jnp.asarray(v)))


# ---------------------------------------------------------------------------
# Scene registry: argv example id -> (config factory, init, frame policy)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Scene2D:
    name: str
    cfg: Smoke2DConfig
    init: Callable  # (solver, state) -> state (and optionally extras)
    dt: Optional[float]        # fixed dt, or None for CFL-driven substepping
    cfl_number: Optional[float]
    frame_dt: Optional[float]  # outer frame duration for CFL-driven scenes
    total_frames: int
    output: str                # 'vorticity' | 'density' | 'levelset'


def make_scene_2d(example: int, scheme: Scheme) -> Scene2D:
    """Replicates the example table of bimocq2D/main.cpp:40-223."""
    if example == 0:
        cfg = Smoke2DConfig(ni=256, nj=256, L=2 * math.pi, scheme=scheme,
                            blend_coeff=1.0, pure_neumann=False)
        return Scene2D("2D_Taylor_vortex", cfg,
                       lambda s, st: init_taylor_vortex(s, st, 0.81)[0],
                       dt=0.025, cfl_number=None, frame_dt=None,
                       total_frames=300, output="vorticity")
    if example == 1:
        cfg = Smoke2DConfig(ni=256, nj=256, L=2 * math.pi, scheme=scheme,
                            blend_coeff=1.0, pure_neumann=False)

        def _init(s, st):
            st, _ = init_leapfrog(s, st)
            u, v = st.u, st.v
            from gpufluidsimulation_tpu.solvers.smoke2d import apply_velocity_boundary
            u, v = apply_velocity_boundary(s.grid, u, v)
            return st.replace(u=u, v=v)

        return Scene2D("2D_Leapfrog", cfg, _init, dt=0.025, cfl_number=None,
                       frame_dt=None, total_frames=2000, output="vorticity")
    if example == 2:
        cfg = Smoke2DConfig(ni=256, nj=1280, L=0.2, scheme=scheme,
                            blend_coeff=1.0, pure_neumann=True,
                            alpha=0.2, beta=0.05)
        layer = 0.5 * 0.2 * 1280 / 256
        return Scene2D("2D_RayleighTaylor", cfg,
                       lambda s, st: init_rayleigh_taylor(s, st, layer),
                       dt=0.01, cfl_number=None, frame_dt=None,
                       total_frames=1000, output="density")
    if example == 3:
        cfg = Smoke2DConfig(ni=200, nj=200, L=1.0, scheme=scheme,
                            blend_coeff=1.0, pure_neumann=True,
                            advect_levelset=True)
        if scheme in (Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC):
            raise ValueError("Simulation scheme for levelset is not supported")
        return Scene2D("2D_Zalesak", cfg, lambda s, st: init_zalesak(s, st),
                       dt=None, cfl_number=0.75, frame_dt=2.0,
                       total_frames=315, output="levelset")
    if example == 4:
        cfg = Smoke2DConfig(ni=512, nj=512, L=1.0, scheme=scheme,
                            blend_coeff=1.0, pure_neumann=True,
                            advect_levelset=True)
        if scheme in (Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC):
            raise ValueError("Simulation scheme for levelset is not supported")
        return Scene2D("2D_VortexBox", cfg, lambda s, st: init_vortex_box(s, st),
                       dt=None, cfl_number=0.5, frame_dt=0.01,
                       total_frames=500, output="levelset")
    raise ValueError(f"unknown 2D example {example}")


SCENES_2D: Dict[int, str] = {
    0: "2D_Taylor_vortex",
    1: "2D_Leapfrog",
    2: "2D_RayleighTaylor",
    3: "2D_Zalesak",
    4: "2D_VortexBox",
}
