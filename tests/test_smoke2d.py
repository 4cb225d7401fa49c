import numpy as np
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D, Smoke2DConfig
from gpufluidsimulation_tpu.scenes import scenes2d


def small_cfg(scheme, **kw):
    defaults = dict(ni=32, nj=32, L=2 * np.pi, blend_coeff=1.0,
                    particles_per_cell_axis=2, pure_neumann=False,
                    proj_tol=1e-6, proj_max_iters=200)
    defaults.update(kw)
    return Smoke2DConfig(scheme=scheme, **defaults)


def _vortex_state(solver):
    state = solver.init_state()
    state, _ = scenes2d.init_taylor_vortex(solver, state, distance=0.81)
    return state


@pytest.mark.parametrize(
    "scheme",
    [Scheme.SEMILAG, Scheme.MACCORMACK, Scheme.BFECC, Scheme.MAC_REFLECTION,
     Scheme.BIMOCQ],
)
def test_grid_schemes_step(scheme):
    solver = Smoke2D(small_cfg(scheme))
    s = _vortex_state(solver)
    e0 = float(jnp.sum(s.u**2) + jnp.sum(s.v**2))
    for _ in range(3):
        s = solver.step(s, 0.025)
    u, v = np.asarray(s.u), np.asarray(s.v)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v))
    e1 = float(np.sum(u**2) + np.sum(v**2))
    # advection+projection should roughly preserve kinetic energy over 3 steps
    assert 0.3 * e0 < e1 < 1.5 * e0, (e0, e1)
    # interior divergence is projected out
    div = (u[1:] - u[:-1]) + (v[:, 1:] - v[:, :-1])
    assert np.abs(div[2:-2, 2:-2]).max() < 1e-3 * max(np.abs(u).max(), 1e-9)
    assert int(s.frame) == 3


@pytest.mark.parametrize("scheme", [Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC])
def test_particle_schemes_step(scheme):
    solver = Smoke2D(small_cfg(scheme))
    s = _vortex_state(solver)
    s = solver.sample_particles_from_grid(s)
    # particles picked up the grid velocity
    assert float(jnp.abs(s.particles.vel).max()) > 1e-3
    for _ in range(2):
        s = solver.step(s, 0.025)
    assert np.all(np.isfinite(np.asarray(s.u)))
    assert np.all(np.isfinite(np.asarray(s.particles.pos)))
    # particles stayed in the domain clamp band
    pos = np.asarray(s.particles.pos)
    h = solver.grid.h
    assert pos[:, 0].min() >= h - 1e-5
    assert pos[:, 0].max() <= (solver.grid.ni - 1) * h + 1e-5


def test_bimocq_preserves_vortex_better_than_semilag():
    """The headline claim of the method: BiMocq keeps more kinetic energy of
    the Taylor vortex than plain semi-Lagrangian (the example-0 comparison)."""
    dt = 0.025
    energies = {}
    for scheme in (Scheme.SEMILAG, Scheme.BIMOCQ):
        solver = Smoke2D(small_cfg(scheme))
        s = _vortex_state(solver)
        for _ in range(8):
            s = solver.step(s, dt)
        u, v = np.asarray(s.u), np.asarray(s.v)
        energies[scheme] = float(np.sum(u**2) + np.sum(v**2))
    assert energies[Scheme.BIMOCQ] > energies[Scheme.SEMILAG]


def test_zalesak_levelset_mode():
    scene = scenes2d.make_scene_2d(3, Scheme.SEMILAG)
    cfg = Smoke2DConfig(ni=24, nj=24, L=1.0, scheme=Scheme.SEMILAG,
                        pure_neumann=True, advect_levelset=True)
    solver = Smoke2D(cfg)
    s = solver.init_state()
    s = scenes2d.init_zalesak(solver, s)
    sdf0 = np.asarray(s.rho)
    area0 = (sdf0 < 0).sum()
    for _ in range(4):
        s = solver.step(s, 0.5)
    sdf = np.asarray(s.rho)
    assert np.all(np.isfinite(sdf))
    area = (sdf < 0).sum()
    # rigid rotation: area approximately preserved (coarse grid -> loose tol)
    assert abs(area - area0) <= 0.5 * area0 + 2


def test_scene_registry_matches_reference_parameters():
    sc = scenes2d.make_scene_2d(0, Scheme.BIMOCQ)
    assert sc.cfg.ni == 256 and sc.cfg.nj == 256 and sc.dt == 0.025
    sc = scenes2d.make_scene_2d(2, Scheme.SEMILAG)
    assert sc.cfg.nj == 1280 and sc.cfg.pure_neumann
    assert sc.cfg.alpha == 0.2 and sc.cfg.beta == 0.05
    with pytest.raises(ValueError):
        scenes2d.make_scene_2d(3, Scheme.FLIP)
