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


def test_dual_volume_sampling_matches_postmap_corners(rng):
    """The dual-kernel windowed sample (0.5*prod(g) + 0.5*prod(hat)) must
    equal the 9-point blend evaluated directly at the MAPPED position:
    0.5*mean_c trilerp(src, pos + c) + 0.5*trilerp(src, pos) — the
    separable identity the kernel exploits. Interior positions (no window
    clipping) so both forms are renormalization-free."""
    import jax.numpy as jnp

    from gpufluidsimulation_tpu.core import interp
    from gpufluidsimulation_tpu.ops import interp_fast

    n, nz, h = 16, 128, 0.1
    shape = (n, n, nz)
    src = jnp.asarray(rng.random(shape).astype(np.float32))
    # interior positions with sub-cell jitter, ~1.2 cells clear of edges
    px = (jnp.arange(n)[:, None, None] * jnp.ones(shape)).astype(jnp.float32)
    py = (jnp.arange(n)[None, :, None] * jnp.ones(shape)).astype(jnp.float32)
    pz = (jnp.arange(nz)[None, None, :] * jnp.ones(shape)).astype(jnp.float32)
    jx = jnp.asarray(rng.uniform(-0.45, 0.45, shape).astype(np.float32))
    jy = jnp.asarray(rng.uniform(-0.45, 0.45, shape).astype(np.float32))
    jz = jnp.asarray(rng.uniform(-0.45, 0.45, shape).astype(np.float32))
    px = jnp.clip(px + jx, 1.3, n - 2.3) * h
    py = jnp.clip(py + jy, 1.3, n - 2.3) * h
    pz = jnp.clip(pz + jz, 1.3, nz - 2.3) * h
    off = (0.0, 0.0, 0.0)

    got = interp_fast.sample3_fast(src, px, py, pz, h, off, Rr=2,
                                   interpret=True, dual=True)
    # the multi-channel wrapper must route dual identically (it once
    # dropped the flag before its kernel partial — a silent plain-trilerp)
    got_multi = interp_fast.sample3_multi(
        src[None], px, py, pz, h, (off,), Rr=2, interpret=True, dual=True)[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(got_multi))

    corners = [(dx, dy, dz) for dx in (-0.25, 0.25) for dy in (-0.25, 0.25)
               for dz in (-0.25, 0.25)]
    acc = 0.0
    for dx, dy, dz in corners:
        acc = acc + interp.sample3(src, px + dx * h, py + dy * h,
                                   pz + dz * h, h, off)
    want = 0.5 * acc / 8.0 + 0.5 * interp.sample3(src, px, py, pz, h, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def _exact_vol9(grid, kind, field, maps, clo, chi):
    """Reference: the exact-path 9-position composition (every corner
    mapped through the map's trilinear interpolation, then sampled with
    boundedAt gathers) — mirrors mapping._volume_eval_3d's exact branch."""
    from gpufluidsimulation_tpu.core import interp

    h = grid.h
    px, py, pz = grid.node_coords(kind)
    off = grid.off_of(kind)
    vals = []
    for dx, dy, dz in list(mp._VOL3) + [(0.0, 0.0, 0.0)]:
        mx, my, mz = mp._map_sample_3d(
            grid, maps, px + dx * h, py + dy * h, pz + dz * h, clo, chi)
        vals.append(interp.sample3(field, mx, my, mz, h, off))
    acc = vals[0]
    for v in vals[1:8]:
        acc = acc + v
    return 0.5 * (acc / 8.0) + 0.5 * vals[8]


def test_vol9_matches_exact_composition(rng):
    """sample3_vol9 (one launch, in-kernel mapped corners) must equal the
    exact 9-position composition to f32 association tolerance — on cell AND
    staggered lattices, including domain-edge nodes (clamped positions)."""
    from gpufluidsimulation_tpu.ops import interp_fast

    grid = Grid3D(24, 24, 24, 1.0 / 24)
    h = grid.h
    x, y, z = grid.node_coords("c")
    bwd = jnp.stack([
        x + 1.1 * h * jnp.sin(2 * x) * jnp.cos(z),
        y + 0.8 * h * jnp.cos(2 * y) * jnp.sin(x),
        z + 1.0 * h * jnp.sin(x + y),
    ])
    gn = (grid.ni, grid.nj, grid.nk)

    try:
        config.set_fast_interp(False)  # exact reference path
        for kind, (clo, chi) in (("c", (1.0, 1.0)), ("u", (0.0, 0.0)),
                                 ("w", (1.0, 1.0))):
            field = jnp.asarray(
                rng.random(getattr(grid, f"shape_{kind}")).astype(np.float32))
            want = np.asarray(
                _exact_vol9(grid, kind, field, bwd, clo, chi))
            got = np.asarray(interp_fast.sample3_vol9(
                field[None], bwd, grid.dim_of(kind), h, gn, clo, chi,
                Rr=2, interpret=True, tol=0.0)[0])
            # staggered kinds: the last face plane is zero-padded when it
            # exceeds the cell block lattice (outside every band guard)
            n0 = min(want.shape[0], 24 if grid.dim_of(kind)[0] else 99)
            np.testing.assert_allclose(
                got[:n0], want[:n0], rtol=3e-5, atol=3e-6,
                err_msg=f"kind={kind}")
    finally:
        config.set_fast_interp(None)


def test_vol9_counts_truncations(rng):
    """Corner samples whose taps escape the static tile must clamp +
    renormalize AND be counted exactly into OVERFLOW_SINK."""
    from gpufluidsimulation_tpu.ops import interp_fast

    grid = Grid3D(24, 24, 24, 1.0 / 24)
    h = grid.h
    x, y, z = grid.node_coords("c")
    # displacement jump of ~8 cells across half of one block: blows the
    # per-block residual budget (Rr=2)
    jump = jnp.where(x > 0.5, 8.0 * h, 0.0)
    bwd = jnp.stack([jnp.clip(x + jump, 0.0, grid.ni * h), y, z])
    field = jnp.asarray(rng.random(grid.shape_c).astype(np.float32))
    with interp_fast.overflow_sink() as counts:
        interp_fast.sample3_vol9(
            field[None], bwd, (0, 0, 0), h, (24, 24, 24), 1.0, 1.0,
            Rr=2, interpret=True)
    assert int(sum(counts)) > 0


def test_vol9_code2_fallback_matches_exact(rng):
    """Value-test the third predicated region (code==2: union taps exceed
    the static tile but stay inside the window — the per-corner
    roll-adaptive fallback). A z-displacement varying +-2.2 cells across
    the block makes the block z-union ~6 taps > nt=4, forcing code 2 at
    tol=0; the values must still match the exact composition."""
    from gpufluidsimulation_tpu.ops import interp_fast

    grid = Grid3D(24, 24, 24, 1.0 / 24)
    h = grid.h
    x, y, z = grid.node_coords("c")
    bwd = jnp.stack([
        x + 0.6 * h * jnp.sin(2 * x),
        y + 0.5 * h * jnp.cos(2 * y),
        # rough z map: +-2.2-cell displacement across the (one) z block
        z + 2.2 * h * jnp.sin(5.0 * z + x),
    ])
    gn = (grid.ni, grid.nj, grid.nk)
    field = jnp.asarray(rng.random(grid.shape_c).astype(np.float32))

    try:
        config.set_fast_interp(False)
        want = np.asarray(_exact_vol9(grid, "c", field, bwd, 1.0, 1.0))
        got = np.asarray(interp_fast.sample3_vol9(
            field[None], bwd, (0, 0, 0), h, gn, 1.0, 1.0,
            Rr=2, interpret=True, tol=0.0)[0])

        # confirm the routing actually lands in code 2 (the fallback, not
        # the static tile): recompute the prepass codes directly
        Rr, P = 2, 4
        BY = interp_fast._by(2)
        out_shape = (interp_fast._ceil(24, interp_fast.BX),
                     interp_fast._ceil(24, BY), interp_fast._ceil(24, 128))
        bz = interp_fast._vol9_bz(out_shape[2])
        nb = (out_shape[0] // interp_fast.BX, out_shape[1] // BY,
              out_shape[2] // bz)
        _, dev_blk = interp_fast.vol9_map_stats(bwd, h, gn, Rr=Rr)
        p1 = mp.map_at_lattice_3d(grid, bwd, "c", 1.0, 1.0)
        gx, gy, gz = (p1[0] / h, p1[1] / h, p1[2] / h)
        gx, gy, gz = interp_fast._pad_positions_rim(gx, gy, gz, P, BY)
        fs = interp_fast.pad_fields(field[None], gn, Rr).shape[1:]
        _, codes, _, _ = interp_fast._origins_vol9(
            (gx, gy, gz), field[None], dev_blk, (0, 0, 0), (1.0, 1.0),
            gn, fs, Rr=Rr, P=P, nb=nb, tol=0.0,
            nt=interp_fast._vol9_nt(Rr), out_shape=out_shape, band=None)
        assert (np.asarray(codes) == 2).any(), "map did not trigger code 2"
    finally:
        config.set_fast_interp(None)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)


def test_vol9_step_level_matches_exact(rng):
    """STEP-LEVEL vol9 test (round-3 verdict Weak #2): the fused
    advect+compensate chain of bimocq_advect_3d under the production vol9
    mode must match the exact-gather chain to f32 association tolerance
    when the fixup is exact-everywhere (tol=0), and to the adaptive bound
    at the production tolerance. Uses a staggered kind (v) — the y window
    alignment defect this test pins lived ONLY on y-staggered lattices."""
    from gpufluidsimulation_tpu.ops import interp_fast

    grid = Grid3D(24, 24, 24, 1.0 / 24)
    h = grid.h
    x, y, z = grid.node_coords("c")
    bwd = jnp.stack([
        x + 1.1 * h * jnp.sin(2 * x) * jnp.cos(z),
        y + 0.9 * h * jnp.cos(2 * y) * jnp.sin(x),
        z + 1.8 * h * jnp.sin(4.0 * z + y),
    ])
    fwd = jnp.stack([
        x - 1.0 * h * jnp.sin(2 * x) * jnp.cos(z),
        y - 0.9 * h * jnp.cos(2 * y) * jnp.sin(x),
        z - 1.7 * h * jnp.sin(4.0 * z + y),
    ])

    for kind in ("v", "c"):
        shape = getattr(grid, f"shape_{kind}")
        init = jnp.asarray(rng.random(shape).astype(np.float32))
        cur = jnp.asarray(rng.random(shape).astype(np.float32))

        with config.engine_mode_scope(config.EngineMode(fast_interp=False)):
            xarr = mp.advect_with_map_3d(grid, kind, cur, init, bwd)
            want = np.asarray(
                mp.compensate_3d(grid, kind, xarr, init, fwd, bwd))

        emode = config.EngineMode(fast_interp=True, interp_interpret=True,
                                  volume_vol9=True, volume_dual=True)
        old_tol = interp_fast._VOL9_TOL
        try:
            interp_fast._VOL9_TOL = 0.0
            with config.engine_mode_scope(emode):
                (got,) = mp.bimocq_advect_3d(
                    grid, kind, [cur], [init], [None], bwd, None, fwd, None)
        finally:
            interp_fast._VOL9_TOL = old_tol
        got = np.asarray(got)
        dim = grid.dim_of(kind)
        inner = tuple(slice(2 + d, -3) for d in dim)
        np.testing.assert_allclose(got[inner], want[inner], rtol=5e-5,
                                   atol=5e-6, err_msg=f"kind={kind} tol=0")

        # production adaptive tolerance: dual blocks may deviate from the
        # exact composition by ~tol * max|f| (first-order bound; allow 5x)
        with config.engine_mode_scope(emode):
            (gota,) = mp.bimocq_advect_3d(
                grid, kind, [cur], [init], [None], bwd, None, fwd, None)
        gota = np.asarray(gota)
        bound = 5.0 * interp_fast._VOL9_TOL * float(np.abs(init).max()) + 5e-6
        assert np.abs(gota[inner] - want[inner]).max() < bound, (
            kind, np.abs(gota[inner] - want[inner]).max(), bound)


def test_vol9_adaptive_dual_branch_matches_dual(rng):
    """With tol=inf every fitting block takes the always-on dual branch —
    the result must match the standalone dual evaluation (the separable
    post-map corner identity) to fp-association tolerance."""
    from gpufluidsimulation_tpu.ops import interp_fast

    grid = Grid3D(24, 24, 24, 1.0 / 24)
    h = grid.h
    x, y, z = grid.node_coords("c")
    bwd = jnp.stack([
        x + 0.9 * h * jnp.sin(2 * x), y + 0.7 * h * jnp.cos(2 * y),
        z + 0.8 * h * jnp.sin(x + y)])
    field = jnp.asarray(rng.random(grid.shape_c).astype(np.float32))
    got = np.asarray(interp_fast.sample3_vol9(
        field[None], bwd, (0, 0, 0), h, (24, 24, 24), 1.0, 1.0,
        Rr=2, interpret=True, tol=1e9)[0])

    config.set_fast_interp(False)
    try:
        p1 = mp.map_at_lattice_3d(grid, bwd, "c", 1.0, 1.0)
        config.set_fast_interp(True)
        want = np.asarray(interp_fast.sample3_fast(
            field, p1[0], p1[1], p1[2], h, (0.0, 0.0, 0.0), Rr=2,
            interpret=True, dual=True))
    finally:
        config.set_fast_interp(None)
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-6)
