import numpy as np
import jax.numpy as jnp

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.bimocq import mapping as mp
from gpufluidsimulation_tpu.core.grids import Grid3D


def test_prefilter_matches_exact_volume_average(rng):
    """The fast path's source prefilter must reproduce the reference's
    9-point volume-averaged pull-back to O(h^2) for a smooth field and a
    near-identity map (the distortion-limited regime BiMocq maintains)."""
    grid = Grid3D(24, 24, 24, 1.0 / 24)
    h = grid.h
    x, y, z = grid.node_coords("c")
    # smooth field + smoothly perturbed backward map (<= 1.2 cells)
    field = jnp.sin(4 * x) * jnp.cos(3 * y) + 0.5 * jnp.sin(5 * z)
    bwd = jnp.stack([
        x + 1.2 * h * jnp.sin(2 * x) * jnp.cos(z),
        y + 0.8 * h * jnp.cos(2 * y),
        z + 1.0 * h * jnp.sin(x + y),
    ])

    try:
        config.set_fast_interp(False)
        exact = np.asarray(
            mp.advect_with_map_3d(grid, "c", field, field, bwd)
        )
        config.set_fast_interp(True)
        # fast-interp True on CPU routes sample3_lattice to the Pallas
        # kernel; force gather sampling but keep the prefilter by testing
        # the prefilter directly:
        config.set_fast_interp(False)
        filtered = mp.volume_prefilter_3d(field)

        from gpufluidsimulation_tpu.core import interp

        def ev(px, py, pz):
            mx, my, mz = mp._map_sample_3d(grid, bwd, px, py, pz, 1.0, 1.0)
            return interp.sample3(filtered, mx, my, mz, h, grid.OFF_C)

        px, py, pz = grid.node_coords("c")
        approx = np.asarray(ev(px, py, pz))
    finally:
        config.set_fast_interp(None)

    inner = np.s_[4:-4, 4:-4, 4:-4]
    scale = np.abs(exact[inner]).max()
    err = np.abs(approx[inner] - exact[inner]).max() / scale
    # O(h^2) agreement: both are second-order smoothings of the same pullback
    assert err < 0.02, err


def test_prefilter_preserves_constants():
    f = jnp.full((8, 8, 8), 3.25)
    out = np.asarray(mp.volume_prefilter_3d(f))
    np.testing.assert_allclose(out, 3.25, rtol=1e-6)
