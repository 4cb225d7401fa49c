"""Binned-sort particle transfers (round-5): bin_sort + sorted
segment_sum splats must reproduce the scatter-add splats to fp roundoff,
and the sorted tap streams must actually be monotone and in-bounds for
every lattice (the correctness precondition of indices_are_sorted)."""

import jax.numpy as jnp
import numpy as np

from gpufluidsimulation_tpu.core.grids import Grid2D
from gpufluidsimulation_tpu.solvers import particles as part


def _state(g, P=5000, seed=0):
    rng = np.random.default_rng(seed)
    h = g.h

    def col(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    # the splat contract: positions inside the reference advance clamp
    # band [h, (n-1)h] (cpp:1486) — both in-step call sites guarantee it
    pos = np.stack([rng.uniform(h, (g.ni - 1) * h, P),
                    rng.uniform(h, (g.nj - 1) * h, P)], -1)
    return part.ParticleState(
        pos=jnp.asarray(pos.astype(np.float32)),
        vel=col(P, 2), rho=col(P), T=col(P),
        C_x=col(P, 4), C_y=col(P, 4), C_rho=col(P, 4), C_T=col(P, 4),
    )


def test_sorted_taps_monotone_and_in_bounds():
    g = Grid2D(24, 40, 1.0 / 24)
    ps = part.bin_sort(g, _state(g))
    for shape, off, name in ((g.shape_u, g.OFF_U, "u"),
                             (g.shape_v, g.OFF_V, "v"),
                             (g.shape_c, g.OFF_C, "c")):
        for flat, w, ii, jj in part._sorted_taps(shape, ps.pos, g.h, off):
            f = np.asarray(flat)
            assert np.all(np.diff(f) >= 0), name
            assert f.min() >= 0 and f.max() < shape[0] * shape[1], name


def test_sorted_splats_match_scatter():
    g = Grid2D(24, 40, 1.0 / 24)
    p = _state(g)
    ps = part.bin_sort(g, p)
    a = part.p2g_flip(g, p, sorted_bins=False)
    b = part.p2g_flip(g, ps, sorted_bins=True)
    for x, y in zip(a, b):
        m = max(float(jnp.abs(x).max()), 1.0)
        assert float(jnp.abs(x - y).max()) <= 1e-4 * m
    for order in ("apic", "polypic"):
        a = part.p2g_poly(g, p, order, sorted_bins=False)
        b = part.p2g_poly(g, ps, order, sorted_bins=True)
        for x, y in zip(a, b):
            m = max(float(jnp.abs(x).max()), 1.0)
            assert float(jnp.abs(x - y).max()) <= 1e-4 * m


def test_bin_sort_is_permutation():
    g = Grid2D(24, 40, 1.0 / 24)
    p = _state(g)
    ps = part.bin_sort(g, p)
    assert np.isclose(float(jnp.sum(p.rho)), float(jnp.sum(ps.rho)),
                      rtol=1e-5)
    a = np.sort(np.asarray(p.pos[:, 0]))
    b = np.sort(np.asarray(ps.pos[:, 0]))
    np.testing.assert_array_equal(a, b)
