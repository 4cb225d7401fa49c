import numpy as np
import jax.numpy as jnp
import pytest

from gpufluidsimulation_tpu.core import interp
from gpufluidsimulation_tpu.ops import interp_fast


def _positions(shape, h, off, rng, max_disp_cells, lam=8.0):
    """Smooth bounded displacement field around each lattice site;
    wavelengths long relative to the block so in-block variation stays
    within the kernel's residual budget (the bounded-smoothness contract)."""
    nx, ny, nz = shape
    i = np.arange(nx)[:, None, None]
    j = np.arange(ny)[None, :, None]
    k = np.arange(nz)[None, None, :]
    phase = rng.uniform(0, 2 * np.pi, size=3)
    d = max_disp_cells * np.stack([
        np.broadcast_to(
            np.sin(2 * np.pi * i / (lam * nx) + phase[0])
            * np.cos(2 * np.pi * k / (lam * nz)), shape),
        np.broadcast_to(np.cos(2 * np.pi * j / (lam * ny) + phase[1]), shape),
        np.broadcast_to(
            np.sin(2 * np.pi * (i + j) / (lam * (nx + ny)) + phase[2]), shape),
    ])
    px = (i + off[0] + d[0]) * h
    py = (j + off[1] + d[1]) * h
    pz = (k + off[2] + d[2]) * h
    return (np.broadcast_to(px, shape).astype(np.float32),
            np.broadcast_to(py, shape).astype(np.float32),
            np.broadcast_to(pz, shape).astype(np.float32))


@pytest.mark.parametrize("shape", [
    (16, 16, 128),
    (17, 16, 130),   # non-multiple shapes exercise padding
])
def test_sample3_fast_matches_gather(rng, shape):
    h = 0.1
    off = (0.0, -0.5, 0.0)
    field = rng.standard_normal(shape).astype(np.float32)
    px, py, pz = _positions(shape, h, off, rng, max_disp_cells=1.5)
    want = np.asarray(interp.sample3(jnp.asarray(field), jnp.asarray(px),
                                     jnp.asarray(py), jnp.asarray(pz), h, off))
    got = np.asarray(interp_fast.sample3_fast(
        jnp.asarray(field), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        h, off, Rr=2, Rz=3, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sample3_fast_mismatched_field_shape(rng):
    """Sampling a staggered field (ni+1 extent) on the cell lattice."""
    shape = (16, 16, 128)
    fshape = (17, 16, 128)
    h = 0.2
    off = (-0.5, 0.0, 0.0)
    field = rng.standard_normal(fshape).astype(np.float32)
    px, py, pz = _positions(shape, h, (0, 0, 0), rng, max_disp_cells=1.0)
    want = np.asarray(interp.sample3(jnp.asarray(field), jnp.asarray(px),
                                     jnp.asarray(py), jnp.asarray(pz), h, off))
    got = np.asarray(interp_fast.sample3_fast(
        jnp.asarray(field), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        h, off, Rr=2, Rz=3, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_sample3_fast_large_smooth_displacement(rng):
    # multi-cell displacement with a wall-tapered envelope (real flows have
    # zero normal velocity at walls): block mean-centering absorbs the bulk
    shape = (32, 16, 128)
    h = 0.05
    off = (0.0, 0.0, 0.0)
    field = rng.standard_normal(shape).astype(np.float32)
    px, py, pz = _positions(shape, h, off, rng, max_disp_cells=3.0)
    i = np.arange(shape[0])[:, None, None]
    env = np.broadcast_to(np.sin(np.pi * (i + 0.5) / shape[0]), shape)
    node = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                indexing="ij")).astype(np.float32)
    px = ((node[0] + (px / h - node[0]) * env) * h).astype(np.float32)
    py = ((node[1] + (py / h - node[1]) * env) * h).astype(np.float32)
    pz = ((node[2] + (pz / h - node[2]) * env) * h).astype(np.float32)
    px = np.clip(px, h, (shape[0] - 1) * h)
    py = np.clip(py, h, (shape[1] - 1) * h)
    pz = np.clip(pz, h, (shape[2] - 1) * h)
    over = int(interp_fast.residual_overflow(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), h, off,
        Rr=3, Rz=4))
    assert over == 0
    want = np.asarray(interp.sample3(jnp.asarray(field), jnp.asarray(px),
                                     jnp.asarray(py), jnp.asarray(pz), h, off))
    got = np.asarray(interp_fast.sample3_fast(
        jnp.asarray(field), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        h, off, Rr=3, Rz=4, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_residual_overflow_detects_violations(rng):
    shape = (8, 8, 128)
    h = 1.0
    # random (non-smooth) x displacement of up to 6 cells -> overflows Rr=2
    i = np.arange(8)[:, None, None] * h
    px = (np.broadcast_to(i, shape)
          + rng.uniform(-6, 6, shape)).astype(np.float32)
    py = np.broadcast_to(np.arange(8)[None, :, None] * h, shape).astype(np.float32)
    pz = np.broadcast_to(np.arange(128)[None, None, :] * h, shape).astype(np.float32)
    over = int(interp_fast.residual_overflow(
        jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), h, (0, 0, 0),
        Rr=2, Rz=3))
    assert over > 0


def test_overflow_sink_counts_launch_violations(rng):
    """Every windowed-sampler launch traced under overflow_sink reports its
    violating-block count as a free byproduct of the _origins prepass —
    the per-frame contract monitor wired into the BiMocq step."""
    shape = (16, 16, 128)
    h = 1.0
    field = rng.random(shape).astype(np.float32)
    node = np.stack(np.meshgrid(*[np.arange(s) for s in shape],
                                indexing="ij")).astype(np.float32)

    def run(px, py, pz):
        with interp_fast.overflow_sink() as counts:
            interp_fast.sample3_fast(
                jnp.asarray(field), jnp.asarray(px), jnp.asarray(py),
                jnp.asarray(pz), h, (0, 0, 0), Rr=2, interpret=True)
        assert len(counts) == 1
        return int(counts[0])

    # smooth small displacement: in contract -> zero
    ok = [np.clip((n + 0.8) * h, h, (s - 1) * h).astype(np.float32)
          for n, s in zip(node, shape)]
    assert run(*ok) == 0
    # non-smooth x displacement up to 6 cells: blocks must overflow Rr=2
    px = np.clip(node[0] + rng.uniform(-6, 6, shape), 1,
                 shape[0] - 1).astype(np.float32) * h
    assert run(px, ok[1], ok[2]) > 0
    # sink inactive: nothing recorded, sampling still works
    assert interp_fast.OVERFLOW_SINK is None


def test_minmax3_fast_matches_gather(rng):
    shape = (16, 16, 128)
    h = 0.1
    off = (0.0, 0.0, 0.0)
    field = rng.standard_normal(shape).astype(np.float32)
    px, py, pz = _positions(shape, h, off, rng, max_disp_cells=1.5)
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    i0 = np.floor(gx).astype(np.int32)
    j0 = np.floor(gy).astype(np.int32)
    k0 = np.floor(gz).astype(np.int32)
    want_mn = np.full(shape, np.inf, np.float32)
    want_mx = np.full(shape, -np.inf, np.float32)
    for a in (0, 1):
        for b in (0, 1):
            for c in (0, 1):
                ii = np.clip(i0 + a, 0, shape[0] - 1)
                jj = np.clip(j0 + b, 0, shape[1] - 1)
                kk = np.clip(k0 + c, 0, shape[2] - 1)
                v = field[ii, jj, kk]
                want_mn = np.minimum(want_mn, v)
                want_mx = np.maximum(want_mx, v)
    from gpufluidsimulation_tpu.ops import interp_fast as fi

    mn, mx = fi.minmax3_fast(jnp.asarray(field), jnp.asarray(px),
                             jnp.asarray(py), jnp.asarray(pz), h, off,
                             Rr=2, interpret=True)
    # interior only: clamped corners at the rim differ from window-edge cells
    inner = np.s_[2:-2, 2:-2, 2:-2]
    np.testing.assert_allclose(np.asarray(mn)[inner], want_mn[inner], atol=1e-6)
    np.testing.assert_allclose(np.asarray(mx)[inner], want_mx[inner], atol=1e-6)


def test_volume_prefilter_fast_matches_xla(rng):
    """Pallas windowed prefilter == the XLA separable form, incl. edges."""
    from gpufluidsimulation_tpu.bimocq import mapping as mp

    for shape in ((16, 16, 128), (17, 19, 130)):
        f = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        want = np.asarray(mp.volume_prefilter_3d(f))  # XLA path (fast off)
        got = np.asarray(interp_fast.volume_prefilter_fast(f, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("nz", [128, 256])
def test_trace_rk3_fused_matches_exact(rng, nz):
    """The fused 3-stage RK3 substep kernel == the exact-gather substepped
    trace (trace_3d's two paths agree under the bounded-CFL contract).
    nz=256 exercises the 256-lane z-block geometry (one pow2 rebase roll,
    512-lane windows); nz=128 the 3-tile 384 form."""
    from gpufluidsimulation_tpu.core import interp as ci
    from gpufluidsimulation_tpu.ops import advect

    n = 16
    h = 0.1
    shape_u = (n + 1, n, nz)
    shape_v = (n, n + 1, nz)
    shape_w = (n, n, nz + 1)
    # smooth solenoidal-ish velocity, max |v| ~ 1
    i = np.arange(n + 1)[:, None, None]
    j = np.arange(n + 1)[None, :, None]
    k = np.arange(nz + 1)[None, None, :]
    u = np.broadcast_to(
        np.sin(2 * np.pi * j[:, :n, :] / n) * np.cos(2 * np.pi * k[..., :nz] / nz),
        shape_u).astype(np.float32)
    v = np.broadcast_to(
        np.cos(2 * np.pi * i[:n] / n) * np.sin(2 * np.pi * k[..., :nz] / nz),
        shape_v).astype(np.float32)
    w = np.broadcast_to(
        np.sin(2 * np.pi * i[:n] / n) * np.cos(2 * np.pi * j[:, :n + 1 - 1, :] / n),
        shape_w).astype(np.float32)
    u, v, w = jnp.asarray(u), jnp.asarray(v), jnp.asarray(w)

    # trace the cell-center lattice backwards by ~2.5 CFL substeps
    px = jnp.broadcast_to(jnp.asarray((np.arange(n) + 0.5) * h)[:, None, None],
                          (n, n, nz)).astype(jnp.float32)
    py = jnp.broadcast_to(jnp.asarray((np.arange(n) + 0.5) * h)[None, :, None],
                          (n, n, nz)).astype(jnp.float32)
    pz = jnp.broadcast_to(jnp.asarray((np.arange(nz) + 0.5) * h)[None, None, :],
                          (n, n, nz)).astype(jnp.float32)
    maxvel = 1.0
    cfldt = h / maxvel
    dt = -2.5 * cfldt

    # exact oracle: the gather-path substepped trace
    def step(sdt, p):
        return advect.trace_rk3_3d(u, v, w, h, sdt, *p, packed=None)

    want = advect._substepped(step, cfldt, dt, (px, py, pz))

    packed = jnp.stack([
        jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
        jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
        jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
    ])
    packed = interp_fast.pad_fields(packed, px.shape, 2)
    got = interp_fast.trace_rk3_fused(
        packed, px, py, pz, h, cfldt, dt, ci._MAC_OFFS, (n, n, nz),
        Rr=2, interpret=True,
    )
    for g, wnt in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                   rtol=1e-4, atol=2e-4 * h)


@pytest.mark.slow
def test_pullback_multi_matches_per_kind(rng):
    """bimocq_advect_multi_3d (fused pull-back kernel, positions computed
    in-kernel) == the per-kind bimocq_advect_3d fast path."""
    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.bimocq import mapping as mp
    from gpufluidsimulation_tpu.core.grids import Grid3D

    n = 16
    nz = 128
    h = 0.1
    g = Grid3D(n, n, nz, h)

    def fld(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32))

    cur = [fld(g.shape_u), fld(g.shape_v), fld(g.shape_w)]
    init = [fld(g.shape_u), fld(g.shape_v), fld(g.shape_w)]
    prev = [fld(g.shape_u), fld(g.shape_v), fld(g.shape_w)]
    ident = mp.identity_map_3d(g)
    px, py, pz = g.node_coords("c")
    wob = 0.4 * h
    bwd = ident + wob * jnp.stack([
        jnp.sin(px * 31.0), jnp.cos(py * 29.0), jnp.sin(pz * 7.0)])
    fwd = ident - wob * jnp.stack([
        jnp.cos(px * 17.0), jnp.sin(py * 23.0), jnp.cos(pz * 11.0)])
    bwd_prev = ident + 0.5 * wob * jnp.stack([
        jnp.cos(px * 13.0), jnp.cos(py * 19.0), jnp.sin(pz * 5.0)])
    blend = jnp.float32(0.7)

    prev_fast = config._FORCED
    prev_int = config.interp_interpret()
    config.set_fast_interp(True)
    config.set_interp_interpret(True)
    # the parked fused pull-back kernel implements the PREFILTER volume
    # form — pin it so the per-kind reference chain doesn't run dual
    config.set_volume_dual(False)
    try:
        want = []
        for kind, c, i, p in zip(("u", "v", "w"), cur, init, prev):
            (o,) = mp.bimocq_advect_3d(
                g, kind, [c], [i], [p], bwd, bwd_prev, fwd, blend)
            want.append(o)
        got = mp.bimocq_advect_multi_3d(
            g, ("u", "v", "w"), cur, init, prev, bwd, bwd_prev, fwd, blend)
    finally:
        config.set_fast_interp(prev_fast)
        config.set_interp_interpret(prev_int)
        config.set_volume_dual(True)
    for gk, wk in zip(got, want):
        np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("nz", [128, 256])
def test_dmc_substep_fused_matches_exact(rng, nz):
    """The fused DMC substep kernel == the exact-gather dmc_backward_step_3d
    (upwind select, exponential step, map gather, interior band); nz covers
    both z-block geometries (384/128 and 512/256)."""
    from gpufluidsimulation_tpu.core.grids import Grid3D
    from gpufluidsimulation_tpu.ops import advect

    n = 16
    h = 0.1
    g = Grid3D(n, n, nz, h)
    i = np.arange(n + 1)[:, None, None]
    j = np.arange(n + 1)[None, :, None]
    k = np.arange(nz + 1)[None, None, :]
    u = jnp.asarray(np.broadcast_to(
        np.sin(2 * np.pi * j[:, :n, :] / n) * np.cos(2 * np.pi * k[..., :nz] / nz),
        (n + 1, n, nz)).astype(np.float32))
    v = jnp.asarray(np.broadcast_to(
        np.cos(2 * np.pi * i[:n] / n) * np.sin(2 * np.pi * k[..., :nz] / nz),
        (n, n + 1, nz)).astype(np.float32))
    w = jnp.asarray(np.broadcast_to(
        np.sin(2 * np.pi * i[:n] / n) * np.cos(2 * np.pi * j[:, :n, :] / n),
        (n, n, nz + 1)).astype(np.float32))
    # a gently-perturbed identity map
    px, py, pz = g.node_coords("c")
    mx = px + 0.3 * h * jnp.sin(px / (n * h) * 2 * np.pi)
    my = py + 0.2 * h * jnp.cos(py / (n * h) * 2 * np.pi)
    mz = pz + 0.25 * h * jnp.sin(pz / (nz * h) * 2 * np.pi)
    sub = 0.08  # ~0.8 of a CFL substep at max|v|~1

    want = advect.dmc_backward_step_3d(g, u, v, w, mx, my, mz, sub)

    packed = jnp.stack([
        jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
        jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
        jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
    ])
    packed = interp_fast.pad_fields(packed, g.shape_c, 2)
    got = interp_fast.dmc_substep_fast(
        packed, jnp.stack([mx, my, mz]), sub, h, (n, n, nz),
        Rr=2, interpret=True,
    )
    for ch, wnt in enumerate(want):
        np.testing.assert_allclose(np.asarray(got[ch]), np.asarray(wnt),
                                   rtol=5e-5, atol=5e-5 * h)


def test_sample3_multi_matches_per_channel(rng):
    shape = (16, 16, 128)
    h = 0.1
    fields = rng.standard_normal((3,) + shape).astype(np.float32)
    px, py, pz = _positions(shape, h, (0, 0, 0), rng, max_disp_cells=1.2)
    offs = ((-0.5, 0.0, 0.0), (0.0, -0.5, 0.0), (0.0, 0.0, -0.5))
    got = np.asarray(interp_fast.sample3_multi(
        jnp.asarray(fields), jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz),
        h, offs, Rr=2, interpret=True))
    for ch in range(3):
        want = np.asarray(interp.sample3(
            jnp.asarray(fields[ch]), jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(pz), h, offs[ch]))
        np.testing.assert_allclose(got[ch], want, rtol=1e-3, atol=1e-4)


def test_sample3_fast_large_z_base_shift(rng):
    """Blocks whose mean z displacement spans multiple 128-lane tiles
    exercise the dynamic tile-origin + pow2 roll-decomposition rebase (the
    round-1 kernel's single 384-lane dynamic roll miscompiled natively for
    any nonzero z base shift)."""
    shape = (16, 16, 256)
    h = 0.1
    off = (0.0, 0.0, 0.0)
    field = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    i = np.arange(shape[0])[:, None, None]
    j = np.arange(shape[1])[None, :, None]
    k = np.arange(shape[2])[None, None, :]
    dz = np.broadcast_to(90.0 * np.sin((i + j) / 1200 + k / 20000), shape)
    px = jnp.asarray(((i + 0.0 * j + 0.0 * k) * h).astype(np.float32)
                     + jnp.zeros(shape, jnp.float32))
    py = jnp.asarray(((j + 0.0 * i + 0.0 * k) * h).astype(np.float32)
                     + jnp.zeros(shape, jnp.float32))
    pz = jnp.asarray(((k + dz) * h).astype(np.float32)
                     + jnp.zeros(shape, jnp.float32))
    assert int(interp_fast.residual_overflow(px, py, pz, h, off, Rr=2)) == 0
    want = interp.sample3(field, px, py, pz, h, off)
    got = interp_fast.sample3_fast(field, px, py, pz, h, off, Rr=2,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_x_adaptive_taps_bit_identical():
    """GFS_INTERP_XNX (per-block static x-tap subranges via lax.switch) is
    bit-identical to the static-W form — skipped taps have zero hat
    weight."""
    import numpy as np
    import jax.numpy as jnp

    from gpufluidsimulation_tpu.ops import interp_fast

    rng = np.random.default_rng(5)
    n = 24
    h = 1.0 / n
    f = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    ii, jj, kk = np.meshgrid(*(np.arange(n),) * 3, indexing="ij")
    px = jnp.asarray((ii + 1.2 * np.sin(jj / 5)) * h, jnp.float32)
    py = jnp.asarray((jj + 0.9 * np.cos(kk / 7)) * h, jnp.float32)
    pz = jnp.asarray((kk + 0.7 * np.sin(ii / 9)) * h, jnp.float32)
    old = interp_fast.X_NX
    try:
        interp_fast.X_NX = None
        ref = interp_fast.sample3_fast(f, px, py, pz, h, (0, 0, 0),
                                       interpret=True, adaptive=True)
        interp_fast.X_NX = 3
        got = interp_fast.sample3_fast(f, px, py, pz, h, (0, 0, 0),
                                       interpret=True, adaptive=True)
    finally:
        interp_fast.X_NX = old
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_sample3_multi_padded_covering_extent_pack(rng):
    """A pack keyed to a LARGER (covering) out_shape must sample
    identically to the exact-extent pack — the contract smoke3d._vel_pack
    and update_mapping_3d's shared pack rely on (one union pack serves
    every lattice kind's trace)."""
    shape = (16, 16, 128)
    h = 0.1
    offs = ((0.0, 0.0, 0.0),)
    field = rng.standard_normal((1,) + shape).astype(np.float32)
    px, py, pz = _positions(shape, h, offs[0], rng, max_disp_cells=1.5)
    args = (jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz), h, offs)
    exact_pack = interp_fast.pad_fields(jnp.asarray(field), shape, 2)
    union_pack = interp_fast.pad_fields(
        jnp.asarray(field), (shape[0] + 1, shape[1] + 1, shape[2] + 1), 2)
    want = np.asarray(interp_fast.sample3_multi_padded(
        exact_pack, *args, Rr=2, interpret=True))
    got = np.asarray(interp_fast.sample3_multi_padded(
        union_pack, *args, Rr=2, interpret=True))
    np.testing.assert_allclose(got, want, rtol=0, atol=0)  # bit-identical


@pytest.mark.slow
def test_sample3_fast_property_random_geometry():
    """Property test: randomized field/lattice shapes, staggered offsets and
    contract-respecting smooth displacements — the windowed kernel must
    match the exact clamped gather on every draw (interpret mode). Guards
    the origin/rebase/padding index math against geometry edge cases the
    fixed-shape tests don't reach (x/y/z extents off block multiples,
    mismatched field-vs-lattice extents, nonzero staggered offsets)."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=12, deadline=None)
    @given(
        nx=st.integers(9, 34), ny=st.integers(9, 34),
        nz=st.sampled_from([96, 128, 130, 160]),
        dfx=st.integers(0, 1), dfy=st.integers(0, 1), dfz=st.integers(0, 1),
        offi=st.sampled_from([0.0, -0.5]),
        seed=st.integers(0, 2**31 - 1),
        disp=st.floats(0.2, 2.2),
    )
    def check(nx, ny, nz, dfx, dfy, dfz, offi, seed, disp):
        r = np.random.default_rng(seed)
        shape = (nx, ny, nz)
        fshape = (nx + dfx, ny + dfy, nz + dfz)
        h = 0.07
        off = (offi, 0.0, offi)
        field = r.standard_normal(fshape).astype(np.float32)
        px, py, pz = _positions(shape, h, off, r, max_disp_cells=disp)
        want = np.asarray(interp.sample3(
            jnp.asarray(field), jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(pz), h, off))
        got = np.asarray(interp_fast.sample3_fast(
            jnp.asarray(field), jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(pz), h, off, Rr=2, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    check()


@pytest.mark.slow
def test_trace_rk3_fused_property_random_geometry():
    """Property test for the fused RK3 trace: randomized x/y extents (off
    block multiples), velocity phases and substep fractions vs the
    exact-gather substepped trace. Guards the padded-position carry, the
    world clamp and the per-substep origin math across geometries."""
    from hypothesis import given, settings, strategies as st

    from gpufluidsimulation_tpu.core import interp as ci
    from gpufluidsimulation_tpu.ops import advect

    @settings(max_examples=6, deadline=None)
    @given(
        nx=st.integers(9, 33), ny=st.integers(9, 33),
        phase=st.floats(0.0, 6.28),
        subs=st.floats(0.3, 2.7),
        sgn=st.sampled_from([-1.0, 1.0]),
    )
    def check(nx, ny, phase, subs, sgn):
        nz, h = 128, 0.1
        i = np.arange(nx + 1)[:, None, None]
        j = np.arange(ny + 1)[None, :, None]
        k = np.arange(nz + 1)[None, None, :]
        u = np.broadcast_to(
            np.sin(2 * np.pi * j[:, :ny, :] / ny + phase)
            * np.cos(2 * np.pi * k[..., :nz] / nz),
            (nx + 1, ny, nz)).astype(np.float32)
        v = np.broadcast_to(
            np.cos(2 * np.pi * i[:nx] / nx + phase)
            * np.sin(2 * np.pi * k[..., :nz] / nz),
            (nx, ny + 1, nz)).astype(np.float32)
        w = np.broadcast_to(
            np.sin(2 * np.pi * i[:nx] / nx)
            * np.cos(2 * np.pi * j[:, :ny, :] / ny + phase),
            (nx, ny, nz + 1)).astype(np.float32)
        u, v, w = jnp.asarray(u), jnp.asarray(v), jnp.asarray(w)
        px = jnp.broadcast_to(
            jnp.asarray((np.arange(nx) + 0.5) * h)[:, None, None],
            (nx, ny, nz)).astype(jnp.float32)
        py = jnp.broadcast_to(
            jnp.asarray((np.arange(ny) + 0.5) * h)[None, :, None],
            (nx, ny, nz)).astype(jnp.float32)
        pz = jnp.broadcast_to(
            jnp.asarray((np.arange(nz) + 0.5) * h)[None, None, :],
            (nx, ny, nz)).astype(jnp.float32)
        cfldt = h  # max |v| ~ 1
        dt = sgn * subs * cfldt

        def step(sdt, p):
            return advect.trace_rk3_3d(u, v, w, h, sdt, *p, packed=None)

        want = advect._substepped(step, cfldt, dt, (px, py, pz))
        packed = jnp.stack([
            jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
            jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
            jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
        ])
        packed = interp_fast.pad_fields(packed, px.shape, 2)
        got = interp_fast.trace_rk3_fused(
            packed, px, py, pz, h, cfldt, dt, ci._MAC_OFFS, (nx, ny, nz),
            Rr=2, interpret=True,
        )
        for g, wnt in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(wnt),
                                       rtol=1e-4, atol=2e-4 * h)

    check()


@pytest.mark.slow
def test_bimocq_pullback_property_random_geometry():
    """Property test for the fused BiMocq pull-back pipeline
    (mapping.bimocq_advect_3d fast path: prefilter + static map-at-lattice
    positions + multi-channel window sampling + bands + clamp) against an
    exact-gather replica of the SAME prefilter math, at randomized
    off-block-multiple shapes and staggered kinds."""
    from hypothesis import given, settings, strategies as st

    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.bimocq import mapping as mp
    from gpufluidsimulation_tpu.core.grids import Grid3D
    from gpufluidsimulation_tpu.ops import advect

    def exact_replica(g, kind, cur, init, bwd, fwd):
        """bimocq_advect_3d's prefilter branch with exact sample3 gathers."""
        dim = g.dim_of(kind)
        off = g.off_of(kind)
        shape = cur.shape
        band_adv = mp._band3(shape, (2 + dim[0], 2 + dim[1], 2 + dim[2]),
                             (3, 3, 3))
        band_c = mp._band3(shape, (1 + dim[0], 1 + dim[1], 1 + dim[2]),
                           (2, 2, 2))
        p1 = mp.map_at_lattice_3d(g, bwd, kind, 1.0, 1.0)
        a = interp.sample3(mp.volume_prefilter_3d(init), *p1, g.h, off)
        a = jnp.where(band_adv, a, cur)
        p3 = mp.map_at_lattice_3d(g, fwd, kind, 0.0, 0.0)
        e = interp.sample3(mp.volume_prefilter_3d(a), *p3, g.h, off)
        e = jnp.where(band_c, e - init, 0.0)
        p4 = mp.map_at_lattice_3d(g, bwd, kind, 0.0, 0.0)
        c = interp.sample3(mp.volume_prefilter_3d(e), *p4, g.h, off)
        return advect.clamp_extrema_neighborhood(
            a, jnp.where(band_c, a - 0.5 * c, a))

    @settings(max_examples=5, deadline=None)
    @given(
        nx=st.integers(10, 30), ny=st.integers(10, 30),
        kind=st.sampled_from(["c", "u", "v", "w"]),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(nx, ny, kind, seed):
        r = np.random.default_rng(seed)
        nz, h = 128, 1.0 / 32
        g = Grid3D(nx, ny, nz, h)
        shape = {"c": (nx, ny, nz), "u": (nx + 1, ny, nz),
                 "v": (nx, ny + 1, nz), "w": (nx, ny, nz + 1)}[kind]
        cur = jnp.asarray(r.standard_normal(shape).astype(np.float32))
        init = jnp.asarray(r.standard_normal(shape).astype(np.float32))
        ident = mp.identity_map_3d(g)
        # smooth sub-cell perturbations of the identity maps (the
        # distortion-limited regime the contract assumes)
        x, y, z = g.node_coords("c")
        L = (nx * h, ny * h, nz * h)
        pert = lambda s: 0.4 * h * jnp.sin(
            2 * np.pi * (x / L[0] + s) ) * jnp.cos(2 * np.pi * (z / L[2] - s))
        bwd = jnp.stack([ident[0] + pert(0.1), ident[1] - pert(0.25),
                         ident[2] + pert(0.4)])
        fwd = jnp.stack([ident[0] - pert(0.3), ident[1] + pert(0.15),
                         ident[2] - pert(0.05)])
        want = np.asarray(exact_replica(g, kind, cur, init, bwd, fwd))
        config.set_fast_interp(True)
        config.set_interp_interpret(True)
        config.set_volume_dual(False)  # the replica implements prefilter
        try:
            (got,) = mp.bimocq_advect_3d(g, kind, [cur], [init], [cur],
                                         bwd, None, fwd, None)
        finally:
            config.set_fast_interp(None)
            config.set_interp_interpret(False)
            config.set_volume_dual(True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4,
                                   atol=2e-4)

    check()


def test_dmc_substep_property_random_geometry():
    """Property test for the fused DMC substep at randomized
    off-block-multiple extents (static window origins + ceil-padded output
    + rim slicing take a different path than the dynamic-origin samplers)."""
    from hypothesis import given, settings, strategies as st

    from gpufluidsimulation_tpu.core.grids import Grid3D
    from gpufluidsimulation_tpu.ops import advect

    @settings(max_examples=6, deadline=None)
    @given(
        nx=st.integers(10, 34), ny=st.integers(10, 34),
        phase=st.floats(0.0, 6.28),
        sub=st.floats(0.02, 0.09),
        seed=st.integers(0, 2**31 - 1),
    )
    def check(nx, ny, phase, sub, seed):
        r = np.random.default_rng(seed)
        nz, h = 128, 0.1
        g = Grid3D(nx, ny, nz, h)
        i = np.arange(nx + 1)[:, None, None]
        j = np.arange(ny + 1)[None, :, None]
        k = np.arange(nz + 1)[None, None, :]
        u = jnp.asarray(np.broadcast_to(
            np.sin(2 * np.pi * j[:, :ny, :] / ny + phase)
            * np.cos(2 * np.pi * k[..., :nz] / nz),
            (nx + 1, ny, nz)).astype(np.float32))
        v = jnp.asarray(np.broadcast_to(
            np.cos(2 * np.pi * i[:nx] / nx + phase)
            * np.sin(2 * np.pi * k[..., :nz] / nz),
            (nx, ny + 1, nz)).astype(np.float32))
        w = jnp.asarray(np.broadcast_to(
            np.sin(2 * np.pi * i[:nx] / nx + phase)
            * np.cos(2 * np.pi * j[:, :ny, :] / ny),
            (nx, ny, nz + 1)).astype(np.float32))
        px, py, pz = g.node_coords("c")
        mx = px + 0.3 * h * jnp.sin(px / (nx * h) * 2 * np.pi + phase)
        my = py + 0.2 * h * jnp.cos(py / (ny * h) * 2 * np.pi)
        mz = pz + 0.25 * h * jnp.sin(pz / (nz * h) * 2 * np.pi)

        want = advect.dmc_backward_step_3d(g, u, v, w, mx, my, mz, sub)
        packed = jnp.stack([
            jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
            jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
            jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
        ])
        packed = interp_fast.pad_fields(packed, g.shape_c, 2)
        got = interp_fast.dmc_substep_fast(
            packed, jnp.stack([mx, my, mz]), sub, h, (nx, ny, nz),
            Rr=2, interpret=True,
        )
        # tolerance note: the kernel is bit-identical to the displacement
        # form (dmc_displacements_3d), but the generic step evaluates
        # velocities by gather instead of static stencils; near the
        # |du| ~ 1e-4*h exp/euler threshold the f32 cancellation in
        # 1-exp(-q) (the reference's own formula, GPU_kernel.cu:190-199)
        # amplifies that last-ulp difference by vel/du <= 1e-2*|vel| cells.
        # 0.025 cells of slack covers it; geometry bugs are 10-100x larger.
        for ch, wnt in enumerate(want):
            np.testing.assert_allclose(np.asarray(got[ch]), np.asarray(wnt),
                                       rtol=5e-5, atol=2.5e-2 * h)

    check()


def test_minmax3_fast_property_random_geometry():
    """Property test for the windowed min/max kernel (the MacCormack clamp
    bound lookup) at randomized extents/offsets vs the exact 8-corner
    min/max of the clamped gather."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=6, deadline=None)
    @given(
        nx=st.integers(9, 33), ny=st.integers(9, 33),
        offi=st.sampled_from([0.0, -0.5]),
        seed=st.integers(0, 2**31 - 1),
        disp=st.floats(0.2, 2.2),
    )
    def check(nx, ny, offi, seed, disp):
        r = np.random.default_rng(seed)
        shape = (nx, ny, 128)
        h = 0.07
        off = (offi, 0.0, offi)
        field = r.standard_normal(shape).astype(np.float32)
        px, py, pz = _positions(shape, h, off, r, max_disp_cells=disp)
        gx = px / h - off[0]
        gy = py / h - off[1]
        gz = pz / h - off[2]
        # corner set of the clamped gather: each corner index clipped from
        # the UNCLIPPED floor (clip(floor), clip(floor+1)) — clipping the
        # base first would invent a {0,1} pair for positions left of the
        # domain where the reference gather degenerates to {0,0}
        i0u = np.floor(gx).astype(int)
        j0u = np.floor(gy).astype(int)
        k0u = np.floor(gz).astype(int)
        i0 = np.clip(i0u, 0, shape[0] - 1)
        j0 = np.clip(j0u, 0, shape[1] - 1)
        k0 = np.clip(k0u, 0, shape[2] - 1)
        i1 = np.clip(i0u + 1, 0, shape[0] - 1)
        j1 = np.clip(j0u + 1, 0, shape[1] - 1)
        k1 = np.clip(k0u + 1, 0, shape[2] - 1)
        corners = np.stack([
            field[a, b, c]
            for a in (i0, i1) for b in (j0, j1) for c in (k0, k1)
        ])
        wmin, wmax = corners.min(0), corners.max(0)
        mn, mx = interp_fast.minmax3_fast(
            jnp.asarray(field), jnp.asarray(px), jnp.asarray(py),
            jnp.asarray(pz), h, off, Rr=2, interpret=True)
        # interior only, as in test_minmax3_fast_matches_gather: clamped
        # corners at the rim differ from window-edge cells by design (the
        # MacCormack guard bands exclude those cells in production).
        # Also exclude positions within an f32 ulp of a lattice plane in
        # the kernel's PADDED coordinates (g + P or g + FRONT_Z): the far
        # corner's hat weight quantizes to exactly 0 there and the kernel
        # drops it from the min/max corner set — a documented edge of the
        # weight-as-mask form (O(1e-5) effect on interpolated VALUES, but
        # binary for corner membership).
        P = 4.0
        onplane = np.zeros(shape, bool)
        for g, pad in ((gx, P), (gy, P), (gz, float(interp_fast.FRONT_Z))):
            gp = (g + pad).astype(np.float32)
            onplane |= np.abs(gp - np.round(gp)) < 1e-4
        inner = np.zeros(shape, bool)
        inner[2:-2, 2:-2, 2:-2] = True
        keep = inner & ~onplane
        assert keep.sum() > 0.5 * inner.sum()
        np.testing.assert_allclose(np.asarray(mn)[keep], wmin[keep],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(mx)[keep], wmax[keep],
                                   rtol=0, atol=1e-6)

    check()


@pytest.mark.slow
def test_sample2_fast_matches_gather(rng):
    """The 2D lift (sample2_fast): 2D fields on the 3D window machinery via
    a singleton/batched x plane, vs the exact bilinear gather."""
    for shape in [(256, 256), (9, 33), (64, 100)]:
        h = 0.1
        off = (0.5, 0.5)
        field = rng.standard_normal(shape).astype(np.float32)
        node = np.stack(np.meshgrid(*[np.arange(s, dtype=np.float32)
                                      for s in shape], indexing="ij"))
        px = ((node[0] + off[0] + 1.8 * np.cos(0.2 * node[1])) * h
              ).astype(np.float32)
        py = ((node[1] + off[1] + 2.2 * np.sin(0.15 * node[0])) * h
              ).astype(np.float32)
        want = np.asarray(interp.sample2(
            jnp.asarray(field), jnp.asarray(px), jnp.asarray(py), h, off))
        got = np.asarray(interp_fast.sample2_fast(
            jnp.asarray(field), jnp.asarray(px), jnp.asarray(py), h, off,
            interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
        # batched 5-point volume-stencil form (B, ni, nj)
        offs5 = np.array([[-0.25, -0.25], [0.25, -0.25], [-0.25, 0.25],
                          [0.25, 0.25], [0.0, 0.0]], np.float32) * h
        pxb = (px[None] + offs5[:, 0, None, None]).astype(np.float32)
        pyb = (py[None] + offs5[:, 1, None, None]).astype(np.float32)
        wantb = np.asarray(interp.sample2(
            jnp.asarray(field), jnp.asarray(pxb), jnp.asarray(pyb), h, off))
        gotb = np.asarray(interp_fast.sample2_fast(
            jnp.asarray(field), jnp.asarray(pxb), jnp.asarray(pyb), h, off,
            interpret=True))
        np.testing.assert_allclose(gotb, wantb, rtol=1e-3, atol=1e-4)


def test_mac2_fast_matches_exact(rng):
    """mac2_fast: windowed MAC sampling + the zero-out-of-band mask ==
    interp.mac_velocity_2d (incl. its NOT-clamped early-return zeros)."""
    ni, nj = 32, 24
    h = 0.05
    u = rng.standard_normal((ni + 1, nj)).astype(np.float32)
    v = rng.standard_normal((ni, nj + 1)).astype(np.float32)
    node = np.stack(np.meshgrid(np.arange(ni, dtype=np.float32),
                                np.arange(nj, dtype=np.float32),
                                indexing="ij"))
    # smooth, contract-compliant displacement (in-block variation < Rr+0.5)
    # whose rim rows still cross the u/v validity bands (the +-1.8-cell
    # reach past lattice 23/31 exercises the zero mask)
    px = ((node[0] + 0.5 + 1.8 * np.cos(0.06 * node[1])) * h).astype(np.float32)
    py = ((node[1] + 0.5 + 1.8 * np.sin(0.07 * node[0])) * h).astype(np.float32)
    wu, wv = interp.mac_velocity_2d(jnp.asarray(u), jnp.asarray(v),
                                    jnp.asarray(px), jnp.asarray(py), h)
    gu, gv = interp_fast.mac2_fast(jnp.asarray(u), jnp.asarray(v),
                                   jnp.asarray(px), jnp.asarray(py), h,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(gu), np.asarray(wu),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=1e-3, atol=1e-4)
    # the zero-out-of-band semantics were actually exercised
    assert (np.asarray(wu) == 0).any() and (np.asarray(wv) == 0).any()


def test_trace_rk3_fused_identity_peel_matches_regular(rng):
    """The identity-start peel (static-origin kernel, precomputed stage-1
    velocity, no position arrays) must reproduce the regular fused trace
    bit-closely when the input positions ARE the identity lattice — the
    per-frame-reinit forward-map march (smoke3d reinit_mode='always').
    Covers block-multiple and rim geometries."""
    from gpufluidsimulation_tpu.core import interp as ci

    for (ni, nj, nk) in [(16, 16, 128), (24, 18, 130)]:
        h = 0.2 / ni
        u = jnp.asarray(rng.normal(0, 1, (ni + 1, nj, nk)).astype(np.float32))
        v = jnp.asarray(rng.normal(0, 1, (ni, nj + 1, nk)).astype(np.float32))
        w = jnp.asarray(rng.normal(0, 1, (ni, nj, nk + 1)).astype(np.float32))
        ii = jnp.arange(ni, dtype=jnp.float32) * h
        jj = jnp.arange(nj, dtype=jnp.float32) * h
        kk = jnp.arange(nk, dtype=jnp.float32) * h
        px = jnp.broadcast_to(ii[:, None, None], (ni, nj, nk))
        py = jnp.broadcast_to(jj[None, :, None], (ni, nj, nk))
        pz = jnp.broadcast_to(kk[None, None, :], (ni, nj, nk))
        packed = interp.mac_pack_3d(u, v, w, (ni, nj, nk))
        if packed is None:  # CPU default: force the fast-path pack
            packed = jnp.stack([
                jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
                jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
                jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
            ])
            packed = interp_fast.pad_fields(packed, (ni, nj, nk), 2)
        maxv = max(float(jnp.max(jnp.abs(f))) for f in (u, v, w))
        cfldt = h / maxv
        dt = 2.5 * cfldt  # 3 substeps: peel + 2 regular
        k1 = jnp.stack([0.5 * (u[:-1] + u[1:]),
                        0.5 * (v[:, :-1] + v[:, 1:]),
                        0.5 * (w[:, :, :-1] + w[:, :, 1:])])
        a = interp_fast.trace_rk3_fused(
            packed, px, py, pz, h, cfldt, dt, ci._MAC_OFFS, (ni, nj, nk),
            Rr=2, interpret=True)
        b = interp_fast.trace_rk3_fused(
            packed, px, py, pz, h, cfldt, dt, ci._MAC_OFFS, (ni, nj, nk),
            Rr=2, interpret=True, from_identity=True, k1=k1)
        for ch in range(3):
            # f32 ulp accumulation on O(1.6) world coords over 3 substeps
            # measures ~1.3e-6; semantics bugs overshoot by orders
            np.testing.assert_allclose(np.asarray(a[ch]), np.asarray(b[ch]),
                                       rtol=0, atol=5e-6)


def test_mac_pack_union_lattice_finite(rng):
    """Regression: the fused stack+pad mac_pack lowering miscompiled on
    TPU at union-lattice shapes (257^3 -> one garbage 128-lane z tile in
    every row, ~30M infs on device; reflection/semilag/maccormack packs).
    The per-channel single-pad form must be finite AND carry the exact
    edge-replication semantics everywhere."""
    import jax

    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.core import interp

    n = 24
    u = jnp.asarray(rng.standard_normal((n + 1, n, n)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((n, n + 1, n)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((n, n, n + 1)).astype(np.float32))
    config.set_fast_interp(True)
    try:
        for out_shape in [(n + 1, n + 1, n + 1), (n, n, n)]:
            packed = jax.jit(lambda u, v, w, s=out_shape:
                             interp.mac_pack_3d(u, v, w, s))(u, v, w)
            assert bool(jnp.isfinite(packed).all()), out_shape
            # reference semantics: stack the inner edge-padded channels,
            # then outer edge-pad (the pre-fix two-stage form)
            from gpufluidsimulation_tpu.ops import interp_fast

            stacked = jnp.stack([
                jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
                jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
                jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
            ])
            want = interp_fast.pad_fields(stacked, out_shape, 2)
            np.testing.assert_array_equal(np.asarray(packed),
                                          np.asarray(want))
    finally:
        config.set_fast_interp(None)
