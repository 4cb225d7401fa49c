import numpy as np
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.ops import poisson
from tests import oracles


def test_laplacian_neumann_matches_oracle(rng):
    p = rng.standard_normal((7, 6, 5)).astype(np.float32)
    got = np.asarray(poisson.laplacian(jnp.asarray(p), "neumann"))
    want = oracles.laplacian_neumann(p)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_laplacian_dirichlet_constant_field():
    # For a constant field, dirichlet Laplacian is nonzero only on the border.
    p = jnp.ones((6, 6))
    lap = np.asarray(poisson.laplacian(p, "dirichlet"))
    assert np.all(lap[1:-1, 1:-1] == 0)
    assert lap[0, 3] == 1.0  # one ghost neighbor lost
    assert lap[0, 0] == 2.0


@pytest.mark.parametrize("bc", ["neumann", "dirichlet"])
def test_mgpcg_solves_poisson_3d(rng, bc):
    shape = (24, 24, 24)
    b = rng.standard_normal(shape).astype(np.float32)
    ctx = poisson.MGContext(shape, bc)
    p, iters, res, hist = poisson.mgpcg(jnp.asarray(b), ctx, tol=1e-5, max_iters=100)
    b_eff = b - b.mean() if bc == "neumann" else b
    r = b_eff - np.asarray(poisson.laplacian(p, bc))
    if bc == "neumann":
        r = r - r.mean()
    rel = np.max(np.abs(r)) / np.max(np.abs(b_eff))
    assert rel < 2e-5, (rel, int(iters))
    assert int(iters) < 60


def test_mgpcg_is_fast_converging(rng):
    # MG preconditioning should need far fewer iterations than plain CG.
    shape = (32, 32)
    b = rng.standard_normal(shape).astype(np.float32)
    ctx = poisson.MGContext(shape, "dirichlet")
    _, iters_mg, _, _ = poisson.mgpcg(jnp.asarray(b), ctx, tol=1e-5, max_iters=200)
    _, iters_cg, _ = poisson.cg(jnp.asarray(b), "dirichlet", tol=1e-5, max_iters=400)
    assert int(iters_mg) * 3 < int(iters_cg), (int(iters_mg), int(iters_cg))


@pytest.mark.parametrize("bc", ["neumann", "dirichlet"])
def test_projection_removes_divergence_3d(rng, bc):
    ni, nj, nk = 16, 12, 14
    u = rng.standard_normal((ni + 1, nj, nk)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1, nk)).astype(np.float32)
    w = rng.standard_normal((ni, nj, nk + 1)).astype(np.float32)
    if bc == "neumann":
        # closed box: no net flux (zero normal velocity at walls)
        u[0] = u[-1] = 0
        v[:, 0] = v[:, -1] = 0
        w[:, :, 0] = w[:, :, -1] = 0
    ctx = poisson.MGContext((ni, nj, nk), bc)
    u2, v2, w2, p, iters, res, _ = poisson.project_3d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w), ctx, tol=1e-6, max_iters=200
    )
    div = oracles.divergence_3d(np.asarray(u2), np.asarray(v2), np.asarray(w2))
    div0 = oracles.divergence_3d(u, v, w)
    assert np.max(np.abs(div)) < 5e-5 * np.max(np.abs(div0))


def test_projection_removes_divergence_2d(rng):
    ni, nj = 32, 24
    u = rng.standard_normal((ni + 1, nj)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1)).astype(np.float32)
    u[0] = u[-1] = 0
    v[:, 0] = v[:, -1] = 0
    ctx = poisson.MGContext((ni, nj), "neumann")
    u2, v2, p, iters, res = poisson.project_2d(
        jnp.asarray(u), jnp.asarray(v), ctx, tol=1e-6, max_iters=300
    )
    div = (np.asarray(u2)[1:] - np.asarray(u2)[:-1]) + (
        np.asarray(v2)[:, 1:] - np.asarray(v2)[:, :-1]
    )
    div0 = (u[1:] - u[:-1]) + (v[:, 1:] - v[:, :-1])
    assert np.max(np.abs(div)) < 5e-5 * np.max(np.abs(div0))


def test_pcg_polynomial_preconditioner(rng):
    """PCG with the k-step polynomial preconditioner (the MIC(0)-PCG role,
    utils/pcg_solver.h) must beat plain CG on iterations and solve to tol."""
    shape = (24, 24, 24)
    b = rng.standard_normal(shape).astype(np.float32)
    p, it_p, res = poisson.pcg(jnp.asarray(b), "dirichlet", tol=1e-5,
                               max_iters=400)
    _, it_c, _ = poisson.cg(jnp.asarray(b), "dirichlet", tol=1e-5,
                            max_iters=400)
    assert float(res) <= 1e-5
    assert int(it_p) < int(it_c), (int(it_p), int(it_c))
    r = b - np.asarray(poisson.laplacian(p, "dirichlet"))
    assert np.abs(r).max() / np.abs(b).max() < 2e-5
