import numpy as np
import jax.numpy as jnp

from gpufluidsimulation_tpu.core.grids import Grid2D, Grid3D
from gpufluidsimulation_tpu.ops import advect
from tests import oracles


def _vel3(grid, fn_u, fn_v, fn_w):
    xu, yu, zu = [np.asarray(a) for a in grid.node_coords("u")]
    xv, yv, zv = [np.asarray(a) for a in grid.node_coords("v")]
    xw, yw, zw = [np.asarray(a) for a in grid.node_coords("w")]
    return (
        fn_u(xu, yu, zu).astype(np.float32),
        fn_v(xv, yv, zv).astype(np.float32),
        fn_w(xw, yw, zw).astype(np.float32),
    )


def test_trace3d_matches_oracle(rng):
    grid = Grid3D(8, 8, 8, 0.125)
    u, v, w = _vel3(
        grid,
        lambda x, y, z: np.sin(2 * x) * np.cos(y),
        lambda x, y, z: np.cos(x + z),
        lambda x, y, z: 0.3 * np.sin(y * 3),
    )
    pts = rng.uniform(2 * grid.h, 6 * grid.h, size=(10, 3)).astype(np.float32)
    cfldt, dt = 0.03, 0.1
    gx, gy, gz = advect.trace_3d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w), grid.h, cfldt, dt,
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]),
    )
    for n, p in enumerate(pts):
        want = oracles.trace_3d(u, v, w, grid.h, cfldt, dt, p)
        got = np.array([float(gx[n]), float(gy[n]), float(gz[n])])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_trace3d_negative_dt(rng):
    grid = Grid3D(8, 8, 8, 0.125)
    u, v, w = _vel3(
        grid,
        lambda x, y, z: np.ones_like(x),
        lambda x, y, z: np.zeros_like(x),
        lambda x, y, z: np.zeros_like(x),
    )
    p = np.array([0.5, 0.5, 0.5], np.float32)
    gx, gy, gz = advect.trace_3d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w), grid.h, 0.05, -0.2,
        jnp.asarray(p[:1] * 1.0), jnp.asarray(p[1:2]), jnp.asarray(p[2:]),
    )
    # uniform u=1, backtrace by 0.2
    np.testing.assert_allclose(float(gx[0]), 0.3, atol=1e-4)
    np.testing.assert_allclose(float(gy[0]), 0.5, atol=1e-5)


def test_semilag_translates_blob_3d():
    grid = Grid3D(16, 16, 16, 1.0 / 16)
    u = jnp.ones(grid.shape_u) * 0.5
    v = jnp.zeros(grid.shape_v)
    w = jnp.zeros(grid.shape_w)
    x, y, z = grid.node_coords("c")
    blob = jnp.exp(-(((x - 0.4) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2) / 0.01))
    dt = 0.2  # displacement 0.1 = 1.6 cells
    out = advect.semilag_3d(grid, "c", blob, u, v, w, cfldt=0.05, dt=-dt)
    x0 = np.asarray(x)[:, 8, 8]
    prof_in = np.asarray(blob)[:, 8, 8]
    prof_out = np.asarray(out)[:, 8, 8]
    # center of mass moved by ~ +0.1 in x
    com_in = (x0 * prof_in).sum() / prof_in.sum()
    com_out = (x0 * prof_out).sum() / prof_out.sum()
    np.testing.assert_allclose(com_out - com_in, 0.1, atol=0.01)


def test_maccormack_2d_is_higher_order_than_semilag():
    grid = Grid2D(48, 48, 2 * np.pi / 48)
    # rigid rotation around the domain center
    xc, yc = grid.node_coords("c")
    xu, yu = grid.node_coords("u")
    xv, yv = grid.node_coords("v")
    cx = cy = np.pi
    u = -(np.asarray(yu) - cy) * 0.3
    v = (np.asarray(xv) - cx) * 0.3
    blob = np.exp(
        -((np.asarray(xc) - cx - 1.2) ** 2 + (np.asarray(yc) - cy) ** 2) / 0.3
    ).astype(np.float32)
    u, v = jnp.asarray(u.astype(np.float32)), jnp.asarray(v.astype(np.float32))
    f_sl = jnp.asarray(blob)
    f_mc = jnp.asarray(blob)
    dt = 0.1
    for _ in range(10):
        f_sl = advect.semilag_2d(grid, "c", f_sl, u, v, None, 0.05, dt)
        f_mc = advect.maccormack_2d(grid, "c", f_mc, u, v, 0.05, dt)
    # after rotating, compare against analytically rotated blob
    theta = 0.3 * dt * 10
    rx = cx + 1.2 * np.cos(theta)
    ry = cy + 1.2 * np.sin(theta)
    ref = np.exp(-((np.asarray(xc) - rx) ** 2 + (np.asarray(yc) - ry) ** 2) / 0.3)
    err_sl = np.abs(np.asarray(f_sl) - ref).mean()
    err_mc = np.abs(np.asarray(f_mc) - ref).mean()
    assert err_mc < err_sl


def test_clamp_extrema_neighborhood():
    before = jnp.zeros((6, 6, 6)).at[3, 3, 3].set(1.0)
    after = jnp.zeros((6, 6, 6)).at[3, 3, 3].set(5.0).at[1, 1, 1].set(-2.0)
    out = np.asarray(advect.clamp_extrema_neighborhood(before, after))
    assert out[3, 3, 3] == 1.0  # clamped to neighborhood max
    assert out[1, 1, 1] == 0.0  # clamped to neighborhood min


def test_dmc_backward_map_uniform_velocity():
    grid = Grid3D(12, 12, 12, 1.0 / 12)
    u = jnp.ones(grid.shape_u) * 0.3
    v = jnp.zeros(grid.shape_v)
    w = jnp.zeros(grid.shape_w)
    x, y, z = grid.node_coords("c")
    maps = advect.update_backward_map_3d(
        grid, u, v, w, (x, y, z), cfldt=jnp.float32(0.05), dt=jnp.float32(0.1)
    )
    # backward map should point 0.03 upstream in x for interior cells
    got = np.asarray(maps[0])[4:8, 6, 6] - np.asarray(x)[4:8, 6, 6]
    np.testing.assert_allclose(got, -0.03, atol=2e-3)
    # y/z map unchanged
    np.testing.assert_allclose(np.asarray(maps[1]), np.asarray(y), atol=1e-5)


def test_dmc_identity_substep_matches_generic():
    """dmc_backward_identity_3d (the gather-free peel of the first DMC
    substep in per-frame-reinit mode) == dmc_backward_step_3d applied to
    the identity map: sampling the identity with boundedAt clamping is
    exactly a clip to the lattice-value range [0, (n-1)h]. The second case
    drives band nodes PAST the lattice edge (3-cell displacement) so the
    clip bounds themselves are pinned — a [0.5h, (n-0.5)h] center-range
    clip would be 0.5h wrong there."""
    grid = Grid3D(16, 16, 16, 1.0 / 16)
    i = np.arange(17)[:, None, None]
    j = np.arange(17)[None, :, None]
    k = np.arange(17)[None, None, :]
    u = jnp.asarray(np.broadcast_to(
        np.sin(2 * np.pi * j[:, :16] / 16) * np.cos(2 * np.pi * k[..., :16] / 16),
        (17, 16, 16)).astype(np.float32))
    v = jnp.asarray(np.broadcast_to(
        np.cos(2 * np.pi * i[:16] / 16) * np.sin(2 * np.pi * k[..., :16] / 16),
        (16, 17, 16)).astype(np.float32))
    w = jnp.asarray(np.broadcast_to(
        np.sin(2 * np.pi * i[:16] / 16) * np.cos(2 * np.pi * j[:, :16] / 16),
        (16, 16, 17)).astype(np.float32))
    x, y, z = grid.node_coords("c")
    for uu, vv, ww, sub in [
        (u, v, w, 0.04),                      # smooth, ~0.64 cells
        (jnp.ones_like(u), jnp.ones_like(v) * -1.0, jnp.ones_like(w),
         3.0 / 16),                           # uniform, 3 cells: clips
    ]:
        want = advect.dmc_backward_step_3d(grid, uu, vv, ww, x, y, z, sub)
        got = advect.dmc_backward_identity_3d(grid, uu, vv, ww, sub)
        for g_, w_ in zip(got, want):
            np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                       rtol=1e-5, atol=1e-6)


def test_update_backward_from_identity_matches_unpeeled():
    """update_backward_map_3d(from_identity=True) == the unpeeled march on
    identity input maps, on the FAST path (interpret mode) where the peel
    is actually active — including a velocity strong enough to push band
    nodes past the lattice edge in substep 1."""
    from gpufluidsimulation_tpu import config

    grid = Grid3D(16, 16, 128, 1.0 / 16)
    # 2.24-cell substep-1 displacement (within the Rr+0.5 = 2.5 contract)
    # pushes band nodes i=2 past the lattice edge: exercises the clip
    u = jnp.ones(grid.shape_u) * 1.4
    v = jnp.ones(grid.shape_v) * -1.4
    w = jnp.zeros(grid.shape_w)
    x, y, z = grid.node_coords("c")
    kw = dict(cfldt=jnp.float32(0.1), dt=jnp.float32(0.25))
    config.set_fast_interp(True)
    config.set_interp_interpret(True)
    try:
        want = advect.update_backward_map_3d(grid, u, v, w, (x, y, z), **kw)
        got = advect.update_backward_map_3d(grid, u, v, w, (x, y, z),
                                            from_identity=True, **kw)
    finally:
        config.set_fast_interp(None)
        config.set_interp_interpret(False)
    for g_, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=1e-5, atol=1e-6)


def test_semilag_and_maccormack_multi_match_per_field(rng):
    """semilag_multi_3d / maccormack_multi_3d (one shared trace for all
    same-kind fields) must be bit-identical to the per-field forms."""
    n = 12
    grid = Grid3D(n, n, n, 1.0 / n)
    u = jnp.asarray(rng.standard_normal(grid.shape_u).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.standard_normal(grid.shape_v).astype(np.float32)) * 0.3
    w = jnp.asarray(rng.standard_normal(grid.shape_w).astype(np.float32)) * 0.3
    rho = jnp.asarray(rng.random(grid.shape_c).astype(np.float32))
    T = jnp.asarray(rng.random(grid.shape_c).astype(np.float32)) * 50
    cfldt, dt = jnp.float32(0.05), jnp.float32(0.12)

    a = advect.semilag_3d(grid, "c", rho, u, v, w, cfldt, -dt)
    b = advect.semilag_3d(grid, "c", T, u, v, w, cfldt, -dt)
    ma, mb = advect.semilag_multi_3d(grid, "c", [rho, T], u, v, w, cfldt, -dt)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(ma))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(mb))

    a = advect.maccormack_3d(grid, "c", rho, u, v, w, cfldt, dt)
    b = advect.maccormack_3d(grid, "c", T, u, v, w, cfldt, dt)
    ma, mb = advect.maccormack_multi_3d(grid, "c", [rho, T], u, v, w,
                                        cfldt, dt)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(ma))
    np.testing.assert_array_equal(np.asarray(b), np.asarray(mb))
