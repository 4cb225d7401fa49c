import numpy as np
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.ops import poisson
from gpufluidsimulation_tpu.ops.pallas_kernels import rbgs_smooth


@pytest.mark.parametrize("bc", ["neumann", "dirichlet"])
def test_rbgs_reduces_residual(rng, bc):
    shape = (16, 16, 16)
    b = rng.standard_normal(shape).astype(np.float32)
    if bc == "neumann":
        b = b - b.mean()
    diag = jnp.asarray(poisson._diag(shape, bc))
    x = rbgs_smooth(jnp.zeros(shape, jnp.float32), jnp.asarray(b), diag,
                    bc=bc, iters=20, interpret=True)
    r = np.asarray(b) - np.asarray(poisson.laplacian(x, bc))
    if bc == "neumann":
        r = r - r.mean()
    assert np.abs(r).max() < 0.7 * np.abs(b).max()


def test_rbgs_is_gauss_seidel_exact_small():
    # 1 sweep on a tiny dirichlet problem must match a hand-rolled GS update
    shape = (4, 4, 4)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(shape).astype(np.float32)
    diag = np.asarray(poisson._diag(shape, "dirichlet"))
    got = np.asarray(
        rbgs_smooth(jnp.zeros(shape, jnp.float32), jnp.asarray(b),
                    jnp.asarray(diag), bc="dirichlet", iters=1, interpret=True)
    )

    x = np.zeros(shape, np.float32)
    ii, jj, kk = np.meshgrid(*[np.arange(4)] * 3, indexing="ij")
    red = (ii + jj + kk) % 2 == 0

    def nbr(x):
        out = np.zeros_like(x)
        for axis in range(3):
            pad = [(0, 0)] * 3
            pad[axis] = (1, 1)
            pp = np.pad(x, pad)
            sl_lo = [slice(None)] * 3
            sl_hi = [slice(None)] * 3
            sl_lo[axis] = slice(0, -2)
            sl_hi[axis] = slice(2, None)
            out += pp[tuple(sl_lo)] + pp[tuple(sl_hi)]
        return out

    x = np.where(red, (nbr(x) + b) / diag, x)
    x = np.where(~red, (nbr(x) + b) / diag, x)
    np.testing.assert_allclose(got, x, rtol=1e-5, atol=1e-6)
