"""MIC(0)-PCG (ops/pcg.py) — the PCGSolver role of utils/pcg_solver.h.

The reference never wires PCGSolver into a solver (AMG-PCG is the
production path); these tests pin the rebuild's counterpart to the same
contract: correct solutions of the flags-defined Poisson system and a
preconditioner that actually accelerates CG.
"""
import numpy as np
import pytest

from gpufluidsimulation_tpu.ops import pcg
from gpufluidsimulation_tpu.ops.poisson import AIR, FLUID, OBJECT, SOLID


def _flags_box(shape, open_top=False, obstacle=None):
    f = np.full(shape, FLUID, np.int32)
    f[0], f[-1] = SOLID, SOLID
    f[:, 0], f[:, -1] = SOLID, (AIR if open_top else SOLID)
    if len(shape) == 3:
        f[:, :, 0], f[:, :, -1] = SOLID, SOLID
    if obstacle:
        f[obstacle] = OBJECT
    return f


def _dense_matrix(flags):
    """Dense assembly of the same operator for a direct-solve oracle."""
    n = flags.size
    idx = np.arange(n).reshape(flags.shape)
    A = np.zeros((n, n))
    diag, offs = pcg._neighbor_arrays(flags)
    fluid = flags == FLUID
    A[idx[~fluid], idx[~fluid]] = 1.0
    A[idx[fluid], idx[fluid]] = diag[fluid]
    for ax, off in enumerate(offs):
        lo = [slice(None)] * flags.ndim
        hi = [slice(None)] * flags.ndim
        lo[ax] = slice(None, -1)
        hi[ax] = slice(1, None)
        lo, hi = tuple(lo), tuple(hi)
        m = off[lo] != 0
        A[idx[lo][m], idx[hi][m]] = -1.0
        A[idx[hi][m], idx[lo][m]] = -1.0
    return A


@pytest.mark.parametrize("open_top", [False, True])
def test_mic0_pcg_matches_direct_solve(open_top):
    rng = np.random.default_rng(3)
    flags = _flags_box((10, 10, 10), open_top=open_top,
                       obstacle=np.s_[4:6, 4:6, 4:6])
    fluid = flags == FLUID
    rhs = np.where(fluid, rng.standard_normal(flags.shape), 0.0)
    if not open_top:
        rhs -= rhs[fluid].mean() * fluid  # pure-Neumann compatibility

    solver = pcg.PCGSolver()
    solver.set_solver_parameters(tolerance_factor=1e-10, max_iterations=200)
    x, res, iters, ok = solver.solve(flags, rhs)
    assert ok, (res, iters)

    A = _dense_matrix(flags)
    xd = np.linalg.lstsq(A, rhs.ravel(), rcond=None)[0].reshape(flags.shape)
    # compare through the operator (nullspace-insensitive)
    np.testing.assert_allclose(
        pcg.apply_poisson(x, flags), pcg.apply_poisson(xd, flags),
        atol=1e-7)


def test_mic0_accelerates_cg():
    """MIC(0) must beat unpreconditioned CG in iteration count (the point
    of pcg_solver.h's factor_modified_incomplete_cholesky0)."""
    rng = np.random.default_rng(7)
    flags = _flags_box((12, 12, 12), open_top=True)
    fluid = flags == FLUID
    rhs = np.where(fluid, rng.standard_normal(flags.shape), 0.0)

    solver = pcg.PCGSolver()
    solver.set_solver_parameters(tolerance_factor=1e-8, max_iterations=300)
    _, _, iters_mic, ok = solver.solve(flags, rhs)
    assert ok

    # plain CG on the same operator
    r = rhs.copy()
    x = np.zeros_like(r)
    s = r.copy()
    rho = float(np.sum(r * r))
    tol = 1e-8 * np.max(np.abs(r))
    iters_plain = 300
    for it in range(1, 301):
        az = pcg.apply_poisson(s, flags)
        alpha = rho / float(np.sum(s * az))
        x += alpha * s
        r -= alpha * az
        if np.max(np.abs(r)) <= tol:
            iters_plain = it
            break
        rho_new = float(np.sum(r * r))
        s = r + (rho_new / rho) * s
        rho = rho_new
    assert iters_mic < iters_plain, (iters_mic, iters_plain)


def test_mic0_2d():
    """The same machinery covers 2D flags grids (pcg_solver.h is
    dimension-agnostic via SparseMatrix)."""
    rng = np.random.default_rng(11)
    flags = _flags_box((16, 16), open_top=True)
    fluid = flags == FLUID
    rhs = np.where(fluid, rng.standard_normal(flags.shape), 0.0)
    solver = pcg.PCGSolver()
    solver.set_solver_parameters(tolerance_factor=1e-9, max_iterations=200)
    x, res, iters, ok = solver.solve(flags, rhs)
    assert ok
    r = rhs - pcg.apply_poisson(x, flags)
    assert np.max(np.abs(np.where(fluid, r, 0.0))) <= 1e-9 * np.max(np.abs(rhs))
