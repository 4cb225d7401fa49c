"""Direct spectral Poisson solver (ops/spectral.py) vs the matrix-free
operator and the MG-PCG reference path."""

import numpy as np
import pytest

import jax.numpy as jnp

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.ops import poisson, spectral


@pytest.mark.parametrize("bc", ["dirichlet", "neumann"])
@pytest.mark.parametrize("shape", [(17, 12, 9), (24, 24, 24)])
def test_spectral_solves_the_operator_3d(rng, bc, shape):
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    if bc == "neumann":
        b = b - jnp.mean(b)
    p = spectral.get_context(shape, bc).solve(b)
    rel = float(jnp.max(jnp.abs(b - poisson.laplacian(p, bc)))
                / jnp.max(jnp.abs(b)))
    assert rel < 2e-5, rel


@pytest.mark.parametrize("bc", ["dirichlet", "neumann"])
def test_spectral_solves_the_operator_2d(rng, bc):
    shape = (13, 8)
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    if bc == "neumann":
        b = b - jnp.mean(b)
    p = spectral.get_context(shape, bc).solve(b)
    rel = float(jnp.max(jnp.abs(b - poisson.laplacian(p, bc)))
                / jnp.max(jnp.abs(b)))
    assert rel < 2e-5, rel


@pytest.mark.parametrize("bc", ["dirichlet", "neumann"])
def test_spectral_matches_mgpcg(rng, bc):
    """Same solution as the iterative path converged tight (up to the
    Neumann nullspace constant, removed by mean subtraction)."""
    shape = (16, 16, 16)
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    if bc == "neumann":
        b = b - jnp.mean(b)
    ps = spectral.get_context(shape, bc).solve(b)
    ctx = poisson.MGContext(shape, bc)
    pi, iters, res, _ = poisson.mgpcg(b, ctx, tol=1e-8, max_iters=200)
    if bc == "neumann":
        ps = ps - jnp.mean(ps)
        pi = pi - jnp.mean(pi)
    scale = float(jnp.max(jnp.abs(pi)))
    assert float(jnp.max(jnp.abs(ps - pi))) < 1e-5 * max(scale, 1.0)


def test_spectral_neumann_projects_nullspace(rng):
    """Adding a constant to the rhs (an incompatible nullspace component)
    must not change the solution — the reference's mean-subtraction."""
    shape = (12, 10, 8)
    ctx = spectral.get_context(shape, "neumann")
    b = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    b = b - jnp.mean(b)
    p0 = ctx.solve(b)
    p1 = ctx.solve(b + 3.7)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("bc", ["dirichlet", "neumann"])
def test_project_3d_spectral_gate_zeroes_divergence(rng, bc):
    shape = (16, 12, 8)
    u = jnp.asarray(rng.standard_normal((shape[0] + 1,) + shape[1:])
                    .astype(np.float32))
    v = jnp.asarray(rng.standard_normal(
        (shape[0], shape[1] + 1, shape[2])).astype(np.float32))
    w = jnp.asarray(rng.standard_normal(shape[:2] + (shape[2] + 1,))
                    .astype(np.float32))
    ctx = poisson.MGContext(shape, bc)
    config.set_spectral_poisson(True)
    try:
        u2, v2, w2, p, iters, res, hist = poisson.project_3d(u, v, w, ctx)
    finally:
        config.set_spectral_poisson(None)
    assert int(iters) == 1
    assert float(res) < 2e-5
    assert float(hist[0]) == pytest.approx(float(res))
    div = poisson.divergence_3d(u2, v2, w2)
    if bc == "neumann":
        div = div - jnp.mean(div)
    scale = float(jnp.max(jnp.abs(poisson.divergence_3d(u, v, w))))
    assert float(jnp.max(jnp.abs(div))) < 5e-5 * scale


@pytest.mark.parametrize("bc", ["dirichlet", "neumann"])
def test_project_2d_refinement_reaches_reference_tol(rng, bc):
    """The 2D reference solves to 1e-6 (BimocqSolver2D.cpp:367); the f32
    direct solve alone leaves ~5e-5, so the tol-gated iterative-refinement
    pass must engage and square it below 1e-6."""
    shape = (96, 64)
    u = jnp.asarray(rng.standard_normal((shape[0] + 1, shape[1]))
                    .astype(np.float32))
    v = jnp.asarray(rng.standard_normal((shape[0], shape[1] + 1))
                    .astype(np.float32))
    ctx = poisson.MGContext(shape, bc)
    config.set_spectral_poisson(True)
    try:
        u2, v2, p, iters, res = poisson.project_2d(u, v, ctx, tol=1e-6)
    finally:
        config.set_spectral_poisson(None)
    assert float(res) < 1e-6, float(res)
    assert int(iters) in (1, 2)


def test_bimocq_step_drift_spectral_vs_mgpcg():
    """A few full BiMocq steps with the spectral projection must stay
    within solver-exit noise of the MG-PCG path (the production-default
    TPU config vs the CPU test default)."""
    from gpufluidsimulation_tpu.scenes.scenes3d import vortex_collision_config
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke3d import Emitter3D, Smoke3D

    n = 16
    cfg = vortex_collision_config(
        ni=n, nj=n, nk=n, scheme=Scheme.BIMOCQ, dt=8.0 / n,
        emitters=(Emitter3D(center=(0.04, 0.10, 0.10), radius=0.03,
                            sign=1.0),),
        viscosity=0.0, proj_tol=1e-8, proj_max_iters=200,
    )
    solver = Smoke3D(cfg)

    def run(spectral_on):
        config.set_spectral_poisson(spectral_on)
        try:
            s = solver.init_state()
            for _ in range(4):
                s = solver.step(s)
        finally:
            config.set_spectral_poisson(None)
        return s

    sa = run(False)
    sb = run(True)
    for name in ("u", "v", "w", "rho"):
        a = np.asarray(getattr(sa, name))
        b = np.asarray(getattr(sb, name))
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() < 2e-4 * scale, name
