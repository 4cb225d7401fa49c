import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.ops import poisson
from gpufluidsimulation_tpu.parallel import halo
from gpufluidsimulation_tpu.parallel.sharding import make_mesh, shard_state, sharded_step


def test_eight_virtual_devices_available():
    assert len(jax.devices()) >= 8
    assert jax.devices()[0].platform == "cpu"


@pytest.mark.parametrize("bc", ["neumann", "dirichlet"])
def test_sharded_laplacian_matches_single_device(rng, bc):
    mesh = make_mesh(8)
    p = rng.standard_normal((6, 6, 16)).astype(np.float32)
    want = np.asarray(poisson.laplacian(jnp.asarray(p), bc))
    got = np.asarray(halo.laplacian_sharded(jnp.asarray(p), mesh, bc))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sharded_jacobi_matches_single_device(rng):
    mesh = make_mesh(4)
    shape = (6, 6, 8)
    b = rng.standard_normal(shape).astype(np.float32)
    diag = np.asarray(poisson._diag(shape, "dirichlet"))
    x0 = np.zeros(shape, np.float32)
    want = np.asarray(
        poisson.jacobi_smooth(jnp.asarray(x0), jnp.asarray(b), "dirichlet",
                              jnp.asarray(diag), iters=5)
    )
    got = np.asarray(
        halo.jacobi_smooth_sharded(jnp.asarray(x0), jnp.asarray(b), mesh,
                                   "dirichlet", jnp.asarray(diag), iters=5)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_bimocq_step_matches_single_device():
    """Full BiMocq step on an 8-virtual-device z-sharded mesh == the
    single-device step (VERDICT round-1 item 7). Uses the halo-smoothed
    sharded projection (ShardedMGContext)."""
    from gpufluidsimulation_tpu.scenes.scenes3d import vortex_collision_config
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke3d import Emitter3D, Smoke3D

    cfg = vortex_collision_config(
        ni=16, nj=16, nk=16, scheme=Scheme.BIMOCQ, dt=0.01,
        emitters=(Emitter3D(center=(0.05, 0.1, 0.1), radius=0.03, sign=1.0),),
        viscosity=0.0, proj_tol=1e-6, proj_max_iters=60,
    )
    solver = Smoke3D(cfg)

    # single-device reference
    s0 = solver.init_state()
    for _ in range(2):
        s0 = solver.step(s0)

    # sharded run (halo-smoothed projection)
    mesh = make_mesh(8)
    step = sharded_step(solver, mesh, halo_smoother=True)
    s1 = shard_state(solver.init_state(), mesh)
    for _ in range(2):
        s1 = step(s1)

    assert len(s1.u.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(s1.u), np.asarray(s0.u),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.rho), np.asarray(s0.rho),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(s1.vel_map.bwd), np.asarray(s0.vel_map.bwd),
                               rtol=1e-5, atol=1e-6)
