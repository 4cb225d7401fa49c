"""Dense-binned particle path (solvers/particles_dense.py): the
static-shift window form must reproduce the flat gather/scatter path —
same formulas, different summation order — and the overflow/escape
contract must fire when its preconditions are violated."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.core import interp
from gpufluidsimulation_tpu.core.grids import Grid2D
from gpufluidsimulation_tpu.solvers import particles as part
from gpufluidsimulation_tpu.solvers import particles_dense as pdense
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D, Smoke2DConfig


def _state(g, P=4000, seed=0):
    rng = np.random.default_rng(seed)
    h = g.h
    pos = np.stack([rng.uniform(h, (g.ni - 1) * h, P),
                    rng.uniform(h, (g.nj - 1) * h, P)], -1)

    def col(*shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    return part.ParticleState(
        pos=jnp.asarray(pos.astype(np.float32)),
        vel=col(P, 2), rho=col(P), T=col(P),
        C_x=col(P, 4), C_y=col(P, 4), C_rho=col(P, 4), C_T=col(P, 4))


def _fields(g, seed=1):
    rng = np.random.default_rng(seed)

    def f(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    return f(g.shape_u), f(g.shape_v), f(g.shape_c), f(g.shape_c)


def test_pack_unpack_roundtrip():
    g = Grid2D(16, 24, 1.0 / 16)
    p = _state(g, P=900)
    meta = pdense.BinMeta(g, p.pos, K=64)
    assert int(meta.overflow) == 0
    (xd,) = meta.pack([p.pos[:, 0]])
    (back,) = meta.unpack([xd])
    np.testing.assert_allclose(np.asarray(back), np.asarray(p.pos[:, 0]),
                               rtol=0, atol=0)
    # multi-channel columns survive too
    (Cd,) = meta.pack([p.C_x])
    (Cback,) = meta.unpack([Cd])
    np.testing.assert_array_equal(np.asarray(Cback), np.asarray(p.C_x))


def test_bin_overflow_counted():
    g = Grid2D(16, 16, 1.0 / 16)
    pos = jnp.full((50, 2), 3.3 * g.h)  # all in one cell
    meta = pdense.BinMeta(g, pos, K=8)
    assert int(meta.overflow) == 50 - 8


def test_g2p_matches_flat():
    g = Grid2D(16, 24, 1.0 / 16)
    p = _state(g)
    u, v, rho, T = _fields(g)
    meta = pdense.BinMeta(g, p.pos, K=64)
    pxd, pyd = meta.pack([p.pos[:, 0], p.pos[:, 1]])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta.valid)
    (ud,), (vd,), (rd, Td) = pdense.g2p_dense(g, pxd, pyd, [u], [v],
                                              [rho, T])
    uf, vf, rf, Tf = meta.unpack([ud, vd, rd, Td])
    ue, ve, re, Te = part.g2p_sample(g, u, v, rho, T, p.pos)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ue), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(ve), atol=2e-5)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(re), atol=2e-5)
    np.testing.assert_allclose(np.asarray(Tf), np.asarray(Te), atol=2e-5)


def test_p2g_flip_matches_flat():
    g = Grid2D(16, 24, 1.0 / 16)
    p = _state(g)
    meta = pdense.BinMeta(g, p.pos, K=64)
    pxd, pyd, vud, vvd, rhod, Td = meta.pack(
        [p.pos[:, 0], p.pos[:, 1], p.vel[:, 0], p.vel[:, 1], p.rho, p.T])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta.valid)
    got = pdense.p2g_flip_dense(g, pxd, pyd, vud, vvd, rhod, Td, meta.valid)
    want = part.p2g_flip(g, p)
    for a, b, name in zip(got, want, "uvrT"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=name)


@pytest.mark.parametrize("order", ["apic", "polypic"])
def test_p2g_poly_matches_flat(order):
    g = Grid2D(16, 24, 1.0 / 16)
    p = _state(g)
    meta = pdense.BinMeta(g, p.pos, K=64)
    pxd, pyd, Cxd, Cyd, Crd, CTd = meta.pack(
        [p.pos[:, 0], p.pos[:, 1], p.C_x, p.C_y, p.C_rho, p.C_T])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta.valid)
    got = pdense.p2g_poly_dense(g, pxd, pyd, Cxd, Cyd, Crd, CTd, order,
                                meta.valid)
    want = part.p2g_poly(g, p, order)
    for a, b, name in zip(got, want, "uvrT"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5,
                                   err_msg=name)


def test_update_cp_matches_flat():
    g = Grid2D(16, 24, 1.0 / 16)
    p = _state(g)
    u, v, rho, T = _fields(g)
    meta = pdense.BinMeta(g, p.pos, K=64)
    pxd, pyd = meta.pack([p.pos[:, 0], p.pos[:, 1]])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta.valid)
    Cs = pdense.update_cp_dense(g, pxd, pyd, u, v, rho, T)
    flat = meta.unpack(list(Cs))
    want = part.update_cp_all(g, p, u, v, rho, T)
    for a, b, name in zip(flat, (want.C_x, want.C_y, want.C_rho, want.C_T),
                          ("C_x", "C_y", "C_rho", "C_T")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3,
                                   err_msg=name)


def test_mac_velocity_dense_matches_exact_with_bands():
    """Window MAC sampling = exact gather form incl. the zero-out-of-band
    semantic at positions that leave the domain (RK3 midpoints)."""
    g = Grid2D(16, 24, 1.0 / 16)
    rng = np.random.default_rng(3)
    P = 3000
    # home positions in-domain; sample positions pushed up to 2 cells off
    home = np.stack([rng.uniform(g.h, (g.ni - 1) * g.h, P),
                     rng.uniform(g.h, (g.nj - 1) * g.h, P)], -1)
    samp = home + rng.uniform(-2 * g.h, 2 * g.h, (P, 2))
    u, v, _, _ = _fields(g)
    meta = pdense.BinMeta(g, jnp.asarray(home.astype(np.float32)), K=64)
    sx, sy = meta.pack([jnp.asarray(samp[:, 0].astype(np.float32)),
                        jnp.asarray(samp[:, 1].astype(np.float32))])
    hx, hy = pdense.home_center_fill(g, sx, sy, meta.valid)
    ud, vd, esc = pdense.mac_velocity_dense(u, v, hx, hy, g.h, R=3)
    assert int(esc) == 0
    uf, vf = meta.unpack([ud, vd])
    ue, ve = interp.mac_velocity_2d(
        u, v, jnp.asarray(samp[:, 0].astype(np.float32)),
        jnp.asarray(samp[:, 1].astype(np.float32)), g.h)
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ue), atol=2e-5)
    np.testing.assert_allclose(np.asarray(vf), np.asarray(ve), atol=2e-5)


def test_escape_counted_beyond_window():
    g = Grid2D(16, 24, 1.0 / 16)
    rng = np.random.default_rng(4)
    P = 200
    home = np.stack([rng.uniform(6 * g.h, 10 * g.h, P),
                     rng.uniform(6 * g.h, 10 * g.h, P)], -1)
    samp = home + 5 * g.h  # 5 cells off: outside R=3, still in-domain
    u, v, _, _ = _fields(g)
    meta = pdense.BinMeta(g, jnp.asarray(home.astype(np.float32)), K=64)
    sx, sy = meta.pack([jnp.asarray(samp[:, 0].astype(np.float32)),
                        jnp.asarray(samp[:, 1].astype(np.float32))])
    sx, sy = pdense.home_center_fill(g, sx, sy, meta.valid)
    _, _, esc = pdense.mac_velocity_dense(u, v, sx, sy, g.h, R=3)
    assert int(esc) > 0


def _small_cfg(scheme):
    return Smoke2DConfig(ni=32, nj=32, L=2 * np.pi, scheme=scheme,
                         particles_per_cell_axis=2, proj_tol=1e-6,
                         proj_max_iters=200, alpha=0.1, beta=0.05)


def _taylor_like_init(solver, s):
    g = solver.grid
    x = (jnp.arange(g.ni + 1)[:, None]) * g.h
    y = (jnp.arange(g.nj)[None, :] + 0.5) * g.h
    u = 0.3 * jnp.sin(x) * jnp.cos(y)
    x2 = (jnp.arange(g.ni)[:, None] + 0.5) * g.h
    y2 = (jnp.arange(g.nj + 1)[None, :]) * g.h
    v = -0.3 * jnp.cos(x2) * jnp.sin(y2)
    xc = (jnp.arange(g.ni)[:, None] + 0.5) * g.h
    yc = (jnp.arange(g.nj)[None, :] + 0.5) * g.h
    rho = jnp.exp(-((xc - np.pi) ** 2 + (yc - np.pi) ** 2))
    s = s.replace(u=u.astype(jnp.float32), v=v.astype(jnp.float32),
                  rho=rho.astype(jnp.float32),
                  T=0.5 * rho.astype(jnp.float32))
    return solver.sample_particles_from_grid(s)


@pytest.mark.parametrize("scheme",
                         [Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC])
def test_dense_step_matches_flat_step(scheme):
    """3 full frames: dense path == flat path on grid fields (particle
    arrays differ only by ordering in the flat path's bin_sort)."""
    dt = 0.02

    def run(dense):
        # default K (2x seeded) so the overflow SIDECAR path is exercised:
        # a few cells exceed K by frame 3 and must be handled exactly
        config.set_particle_dense(dense)
        try:
            solver = Smoke2D(_small_cfg(scheme))
            s = _taylor_like_init(solver, solver.init_state())
            for _ in range(3):
                s = solver.step(s, dt)
            return s
        finally:
            config.set_particle_dense(None)

    sd = run(True)
    sf = run(False)
    assert int(sd.interp_overflow) == 0
    for name in ("u", "v", "rho", "T"):
        a = np.asarray(getattr(sd, name))
        b = np.asarray(getattr(sf, name))
        np.testing.assert_allclose(a, b, atol=5e-4, err_msg=name)
    # particle multisets agree: compare position-sorted columns
    pa = np.asarray(sd.particles.pos)
    pb = np.asarray(sf.particles.pos)
    ka = np.lexsort((pa[:, 1], pa[:, 0]))
    kb = np.lexsort((pb[:, 1], pb[:, 0]))
    np.testing.assert_allclose(pa[ka], pb[kb], atol=5e-4)
    np.testing.assert_allclose(np.asarray(sd.particles.rho)[ka],
                               np.asarray(sf.particles.rho)[kb], atol=5e-3)


def test_dense_step_overflow_contract_fires():
    """Pathological state (every particle in one cell, overflow far past
    the sidecar budget) must be COUNTED, not silently dropped."""
    config.set_particle_dense(True)
    config.set_particle_side(64)
    try:
        solver = Smoke2D(_small_cfg(Scheme.FLIP))
        s = _taylor_like_init(solver, solver.init_state())
        p = s.particles
        s = s.replace(particles=p.replace(
            pos=jnp.full_like(p.pos, 5.5 * solver.grid.h)))
        s = solver.step(s, 0.02)
        assert int(s.interp_overflow) > 0
    finally:
        config.set_particle_dense(None)
        config.set_particle_side(8192)
