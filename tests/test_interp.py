import numpy as np
import jax.numpy as jnp

from gpufluidsimulation_tpu.core import interp
from tests import oracles


def test_sample2_matches_oracle(rng):
    h = 0.1
    field = rng.standard_normal((9, 7)).astype(np.float32)
    pts = rng.uniform(-0.2, 1.0, size=(50, 2)).astype(np.float32)
    off = (0.5, 0.5)
    got = np.asarray(
        interp.sample2(jnp.asarray(field), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), h, off)
    )
    want = np.array([oracles.sample2(field, p[0], p[1], h, off) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sample3_matches_oracle(rng):
    h = 0.25
    field = rng.standard_normal((6, 5, 7)).astype(np.float32)
    pts = rng.uniform(-0.3, 1.8, size=(40, 3)).astype(np.float32)
    off = (-0.5, 0.0, 0.0)
    got = np.asarray(
        interp.sample3(
            jnp.asarray(field),
            jnp.asarray(pts[:, 0]),
            jnp.asarray(pts[:, 1]),
            jnp.asarray(pts[:, 2]),
            h,
            off,
        )
    )
    want = np.array([oracles.sample3(field, *p, h, off) for p in pts])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mac_velocity_2d_zero_outside(rng):
    h = 0.5
    ni, nj = 8, 6
    u = rng.standard_normal((ni + 1, nj)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1)).astype(np.float32)
    pts = rng.uniform(-1.0, 5.0, size=(60, 2)).astype(np.float32)
    us, vs = interp.mac_velocity_2d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), h
    )
    for n, p in enumerate(pts):
        wu, wv = oracles.mac_velocity_2d(u, v, p[0], p[1], h)
        np.testing.assert_allclose(float(us[n]), wu, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(vs[n]), wv, rtol=1e-5, atol=1e-5)


def test_mac_velocity_3d(rng):
    h = 0.2
    ni, nj, nk = 5, 6, 4
    u = rng.standard_normal((ni + 1, nj, nk)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1, nk)).astype(np.float32)
    w = rng.standard_normal((ni, nj, nk + 1)).astype(np.float32)
    pts = rng.uniform(h, (min(ni, nj, nk) - 1) * h, size=(30, 3)).astype(np.float32)
    us, vs, ws = interp.mac_velocity_3d(
        jnp.asarray(u), jnp.asarray(v), jnp.asarray(w),
        jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]), jnp.asarray(pts[:, 2]), h,
    )
    for n, p in enumerate(pts):
        wu, wv, ww = oracles.mac_velocity_3d(u, v, w, *p, h)
        np.testing.assert_allclose(float(us[n]), wu, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(vs[n]), wv, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(ws[n]), ww, rtol=1e-4, atol=1e-5)


def test_sample3_cubic_reproduces_cubics(rng):
    """Tricubic sampling (buffer3Df::sample_cubic parity) is exact on
    tri-cubic polynomials away from the boundary and interpolates nodes."""
    h = 0.1
    n = 12
    i = np.arange(n)[:, None, None] * np.ones((1, n, n))
    j = np.arange(n)[None, :, None] * np.ones((n, 1, n))
    k = np.arange(n)[None, None, :] * np.ones((n, n, 1))
    field = (0.02 * i**3 - 0.05 * j**2 * i + 0.3 * k + 0.1 * j
             - 0.01 * k**3).astype(np.float32)
    fj = jnp.asarray(field)
    # sample at off-lattice points in the interior
    pts = rng.uniform(2.0, n - 3.0, size=(3, 50)).astype(np.float32)
    px, py, pz = (jnp.asarray(pts[0] * h), jnp.asarray(pts[1] * h),
                  jnp.asarray(pts[2] * h))
    got = np.asarray(interp.sample3_cubic(fj, px, py, pz, h, (0, 0, 0)))
    want = (0.02 * pts[0]**3 - 0.05 * pts[1]**2 * pts[0] + 0.3 * pts[2]
            + 0.1 * pts[1] - 0.01 * pts[2]**3)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_sample3_separable_matches_exact_far_outside(rng):
    """Voxel-SDF lookup geometry: a small grid sampled on a uniformly
    shifted large lattice, most nodes far outside the grid. The separable
    lookup must match exact clamped sample3 everywhere — the windowed fast
    path would return 0.0 for far-outside nodes, misclassifying them as
    inside (sd <= 0) when used for SDF boundary/emitter flags."""
    gvals = jnp.asarray(rng.normal(size=(10, 12, 9)).astype(np.float32) + 2.0)
    h = 0.01
    n = (24, 20, 28)
    pos = (0.083, -0.021, 0.147)  # shifts the lattice well past the grid
    xs = ((np.arange(n[0]) + 0.5) * h - pos[0]).astype(np.float32)
    ys = ((np.arange(n[1]) + 0.5) * h - pos[1]).astype(np.float32)
    zs = ((np.arange(n[2]) + 0.5) * h - pos[2]).astype(np.float32)
    dx = jnp.asarray(np.broadcast_to(xs[:, None, None], n))
    dy = jnp.asarray(np.broadcast_to(ys[None, :, None], n))
    dz = jnp.asarray(np.broadcast_to(zs[None, None, :], n))
    got = np.asarray(interp.sample3_separable(gvals, dx, dy, dz, h))
    want = np.asarray(interp.sample3(gvals, dx, dy, dz, h, (0.0, 0.0, 0.0)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert got.min() > 0.0  # far-outside nodes clamp to (positive) edge SDF
