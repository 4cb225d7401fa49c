import numpy as np
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.solvers.smoke3d import (
    Emitter3D,
    Smoke3D,
    Smoke3DConfig,
)
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from tests import oracles


def tiny_cfg(scheme, **kw):
    # 16^3 @ L=0.2 mirrors the vortex-collision scene geometry scaled down
    defaults = dict(
        ni=16, nj=16, nk=16, L=0.2, dt=0.02,
        viscosity=0.0,
        emitters=(
            Emitter3D(center=(0.04, 0.1, 0.1), radius=0.03, sign=1.0),
            Emitter3D(center=(0.16, 0.101, 0.1), radius=0.03, sign=-1.0),
        ),
        proj_tol=1e-5, proj_max_iters=60,
    )
    defaults.update(kw)
    return Smoke3DConfig(scheme=scheme, **defaults)


@pytest.mark.parametrize(
    "scheme",
    [Scheme.SEMILAG, Scheme.MACCORMACK, Scheme.MAC_REFLECTION, Scheme.BIMOCQ],
)
def test_step_runs_and_is_divergence_free(scheme):
    solver = Smoke3D(tiny_cfg(scheme))
    s = solver.init_state()
    for _ in range(3):
        s = solver.step(s)
    u, v, w = np.asarray(s.u), np.asarray(s.v), np.asarray(s.w)
    rho = np.asarray(s.rho)
    assert np.all(np.isfinite(u)) and np.all(np.isfinite(v)) and np.all(np.isfinite(w))
    assert np.all(np.isfinite(rho))
    # emitters deposited density
    assert rho.max() > 0.5
    # velocity got kicked by the emitters
    assert np.abs(u).max() > 1e-3
    # projection leaves low divergence relative to velocity scale
    div = oracles.divergence_3d(u, v, w)
    assert np.abs(div).max() < 5e-3 * max(np.abs(u).max(), 1e-6)
    assert int(s.frame) == 3


def test_bimocq_reinit_counters_advance():
    solver = Smoke3D(tiny_cfg(Scheme.BIMOCQ))
    s = solver.init_state()
    s = solver.step(s)
    # frame 0 triggers both deadlines (counters start at -11/-31)
    assert int(s.vel_last_reinit) == 0
    assert int(s.scalar_last_reinit) == 0
    assert int(s.vel_map.reinit_count) == 1
    assert int(s.scalar_map.reinit_count) == 1
    for _ in range(2):
        s = solver.step(s)
    assert int(s.frame) == 3


def test_bimocq_adaptive_mode_compiles():
    solver = Smoke3D(tiny_cfg(Scheme.BIMOCQ, reinit_mode="adaptive"))
    s = solver.init_state()
    s = solver.step(s)
    assert np.all(np.isfinite(np.asarray(s.u)))


def test_bimocq_density_stays_bounded():
    solver = Smoke3D(tiny_cfg(Scheme.BIMOCQ))
    s = solver.init_state()
    for _ in range(5):
        s = solver.step(s)
    rho = np.asarray(s.rho)
    # emission value is 1.0; advection + compensation must not blow up
    assert rho.max() < 1.5
    assert rho.min() > -0.5
