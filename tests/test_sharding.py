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
