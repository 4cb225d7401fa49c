import numpy as np
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.ops import poisson
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke3d import (
    Boundary3D,
    Emitter3D,
    Smoke3D,
    Smoke3DConfig,
)


def test_masked_projection_respects_solid(rng):
    ni = nj = nk = 16
    flags = np.zeros((ni, nj, nk), np.int32)
    flags[:1] = flags[-1:] = poisson.SOLID
    flags[:, :1] = poisson.SOLID
    flags[:, -1:] = poisson.AIR
    flags[:, :, :1] = flags[:, :, -1:] = poisson.SOLID
    # solid ball in the middle
    ii, jj, kk = np.meshgrid(*[np.arange(16)] * 3, indexing="ij")
    ball = (ii - 8) ** 2 + (jj - 8) ** 2 + (kk - 8) ** 2 < 9
    flags[ball] = poisson.OBJECT

    u = rng.standard_normal((ni + 1, nj, nk)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1, nk)).astype(np.float32)
    w = rng.standard_normal((ni, nj, nk + 1)).astype(np.float32)
    us = jnp.zeros_like(jnp.asarray(u))
    vs = jnp.zeros_like(jnp.asarray(v))
    ws = jnp.zeros_like(jnp.asarray(w))
    ctx = poisson.MGContext((ni, nj, nk), "dirichlet")
    u2, v2, w2, p, iters, res, _ = poisson.project_masked_3d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
        jnp.asarray(flags), us, vs, ws, ctx, tol=1e-6, max_iters=300,
    )
    u2, v2, w2 = np.asarray(u2), np.asarray(v2), np.asarray(w2)
    div = (u2[1:] - u2[:-1]) + (v2[:, 1:] - v2[:, :-1]) + (w2[:, :, 1:] - w2[:, :, :-1])
    fluid = flags == poisson.FLUID
    assert np.abs(div[fluid]).max() < 1e-4, np.abs(div[fluid]).max()
    # faces adjacent to the solid ball carry the (zero) solid velocity
    solid = (flags == poisson.SOLID) | (flags == poisson.OBJECT)
    face_solid_u = np.zeros_like(u2, bool)
    face_solid_u[1:][solid] = True
    face_solid_u[:-1][solid] = True
    assert np.abs(u2[face_solid_u]).max() == 0.0


@pytest.mark.slow
def test_bimocq_with_moving_boundary_runs():
    cfg = Smoke3DConfig(
        ni=16, nj=16, nk=16, L=0.2, dt=0.02, scheme=Scheme.BIMOCQ,
        viscosity=0.0, proj_tol=1e-4, proj_max_iters=60,
        emitters=(Emitter3D(center=(0.04, 0.1, 0.1), radius=0.03, sign=1.0),),
        boundaries=(Boundary3D(center=(0.14, 0.1, 0.1), radius=0.03,
                               velocity=(0.0, 0.0, 0.0)),),
    )
    solver = Smoke3D(cfg)
    s = solver.init_state()
    for _ in range(3):
        s = solver.step(s)
    rho = np.asarray(s.rho)
    assert np.all(np.isfinite(rho))
    # density cleared inside the obstacle
    g = solver.grid
    x, y, z = [np.asarray(c) for c in g.node_coords("c")]
    inside = np.sqrt((x - 0.14) ** 2 + (y - 0.1) ** 2 + (z - 0.1) ** 2) < 0.025
    assert np.abs(rho[inside]).max() < 1e-5
    # velocity inside the static obstacle is (approximately) zero
    u = np.asarray(s.u)
    xu, yu, zu = [np.asarray(c) for c in g.node_coords("u")]
    inside_u = np.sqrt((xu - 0.14) ** 2 + (yu - 0.1) ** 2 + (zu - 0.1) ** 2) < 0.02
    assert np.abs(u[inside_u]).max() < 1e-5


def test_masked_preconditioner_iteration_count(rng):
    """The boundary-aware MG preconditioner must keep CG iteration counts
    low even with a ~30%-solid domain (VERDICT round-1 item 6: an unmasked
    preconditioner stops resembling the operator there)."""
    ni = nj = nk = 24
    flags = np.zeros((ni, nj, nk), np.int32)
    flags[:1] = flags[-1:] = poisson.SOLID
    flags[:, :1] = poisson.SOLID
    flags[:, -1:] = poisson.AIR
    flags[:, :, :1] = flags[:, :, -1:] = poisson.SOLID
    # big solid block: ~30% of the interior
    flags[6:18, 6:18, 6:18] = poisson.OBJECT

    u = rng.standard_normal((ni + 1, nj, nk)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1, nk)).astype(np.float32)
    w = rng.standard_normal((ni, nj, nk + 1)).astype(np.float32)
    zeros = lambda a: jnp.zeros_like(jnp.asarray(a))
    ctx = poisson.MGContext((ni, nj, nk), "dirichlet")
    u2, v2, w2, p, iters, res, _ = poisson.project_masked_3d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
        jnp.asarray(flags), zeros(u), zeros(v), zeros(w),
        ctx, tol=1e-5, max_iters=100,
    )
    div = (np.asarray(u2)[1:] - np.asarray(u2)[:-1]) \
        + (np.asarray(v2)[:, 1:] - np.asarray(v2)[:, :-1]) \
        + (np.asarray(w2)[:, :, 1:] - np.asarray(w2)[:, :, :-1])
    fluid = flags == poisson.FLUID
    assert np.abs(div[fluid]).max() < 1e-3
    # pinned: masked-MG preconditioning converges in few iterations
    assert int(iters) <= 30, int(iters)


@pytest.mark.slow
def test_moving_obstacle_scene_runs():
    """The packaged plume + sweeping-sphere scene (scenes3d.SCENES_3D[1])."""
    from gpufluidsimulation_tpu.scenes.scenes3d import make_moving_obstacle

    solver, s = make_moving_obstacle(ni=16, nj=16, nk=16, dt=0.02,
                                     viscosity=0.0, proj_max_iters=40)
    for _ in range(2):
        s = solver.step(s)
    assert np.all(np.isfinite(np.asarray(s.rho)))
    assert float(np.asarray(s.rho).max()) > 0.5  # plume emitting
