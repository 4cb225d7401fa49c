"""Per-solver EngineMode: two solvers with DIFFERENT engine modes coexist
in one process without cross-talk (VERDICT r1 item 10 — engine mode lives
in the config dataclass, scoped around each trace, not in mutable module
globals)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.scenes.scenes3d import vortex_collision_config
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke3d import Emitter3D, Smoke3D


def _cfg(n, mode):
    return vortex_collision_config(
        ni=n, nj=n, nk=n, scheme=Scheme.BIMOCQ, dt=8.0 / n,
        emitters=(Emitter3D(center=(0.1, 0.1, 0.1), radius=0.03, sign=1.0),),
        proj_tol=1e-4, proj_max_iters=40, engine_mode=mode,
    )


def test_two_solvers_different_modes_coexist():
    n = 16
    # solver A: iterative MG-PCG projection; solver B: direct spectral.
    # On the CPU test backend both default OFF — B's mode must win inside
    # ITS trace only, while A keeps the iterative path.
    a = Smoke3D(_cfg(n, config.EngineMode(spectral_poisson=False)))
    b = Smoke3D(_cfg(n, config.EngineMode(spectral_poisson=True)))

    sa, sb = a.init_state(), b.init_state()
    # interleave: would shear under global-toggle designs where whichever
    # solver traced last leaks its knobs into the other's (re)trace
    for _ in range(3):
        sa = a.step(sa)
        sb = b.step(sb)

    # the spectral path reports a residual-history trace of length<=2
    # (direct solve + optional refinement); MG-PCG iterates
    iters_a, iters_b = int(sa.proj_iters), int(sb.proj_iters)
    assert iters_b <= 2, f"solver B did not run spectral (iters={iters_b})"
    assert iters_a > 2, f"solver A leaked B's spectral mode (iters={iters_a})"

    # both engines solve the same physics: fields agree closely
    np.testing.assert_allclose(np.asarray(sa.rho), np.asarray(sb.rho),
                               atol=5e-4)
    assert np.all(np.isfinite(np.asarray(sa.u)))
    assert np.all(np.isfinite(np.asarray(sb.u)))


def test_mode_scope_restores_defaults():
    before = config.use_spectral_poisson()
    with config.engine_mode_scope(config.EngineMode(spectral_poisson=not before)):
        assert config.use_spectral_poisson() is (not before)
        # nesting: inner scope overrides outer, pops cleanly
        with config.engine_mode_scope(config.EngineMode(spectral_poisson=before)):
            assert config.use_spectral_poisson() is before
        assert config.use_spectral_poisson() is (not before)
    assert config.use_spectral_poisson() is before


def test_mode_interp_rr_scopes():
    base = config.interp_rr()
    with config.engine_mode_scope(config.EngineMode(interp_rr=base + 2)):
        assert config.interp_rr() == base + 2
    assert config.interp_rr() == base


def test_sharded_sampling_force_off_sentinel():
    # () within a scope forces sharded sampling OFF even if process state
    # has it on (used by parallel.sharding to pin the mode per mesh-step)
    config.set_sharded_sampling("fake_mesh", 4)
    try:
        with config.engine_mode_scope(config.EngineMode(sharded_sampling=())):
            assert config.sharded_sampling() is None
        assert config.sharded_sampling() == ("fake_mesh", 4)
    finally:
        config.set_sharded_sampling(None)
