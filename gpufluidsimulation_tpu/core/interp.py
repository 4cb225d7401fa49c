"""Staggered bilinear/trilinear samplers — the gather core of the engine.

TPU-native design: positions are whole-grid coordinate arrays; each sample is
one XLA gather over a flattened field (4 corners in 2D / 8 in 3D fused into a
single `take` with a stacked index tensor), which XLA fuses with the
surrounding arithmetic. Per-corner index clamping reproduces the reference's
`boundedAt` semantics (include/array2.h) and is a no-op when positions are
pre-clamped as the 3D kernels guarantee (GPU_kernel.cu:43-62, 87-88).

Reference parity notes:
* sample2  <-> BimocqSolver2D::sampleField      (bimocq2D/BimocqSolver2D.cpp:2328-2334)
* sample3  <-> sample_buffer                    (bimocq3D/GPU_kernel.cu:43-62)
* mac_velocity_2d <-> BimocqSolver2D::getVelocity (zero outside valid band,
  bimocq2D/BimocqSolver2D.cpp:2307-2325)
* mac_velocity_3d <-> getVelocity               (bimocq3D/GPU_kernel.cu:64-72)
"""

from __future__ import annotations

import jax.numpy as jnp


def _gather2(field, i, j):
    """Gather field[i, j] with per-index clamping; one fused XLA gather."""
    nx, ny = field.shape
    ic = jnp.clip(i, 0, nx - 1)
    jc = jnp.clip(j, 0, ny - 1)
    return jnp.take(field.reshape(-1), ic * ny + jc)


def _gather4_2d(field, i0, j0):
    """Fetch the 4 bilinear corners with one gather (cf. _gather8_3d)."""
    nx, ny = field.shape
    ia = jnp.clip(i0, 0, nx - 1)
    ib = jnp.clip(i0 + 1, 0, nx - 1)
    ja = jnp.clip(j0, 0, ny - 1)
    jb = jnp.clip(j0 + 1, 0, ny - 1)
    idx = jnp.stack([ia * ny + ja, ib * ny + ja, ia * ny + jb, ib * ny + jb])
    return jnp.take(field.reshape(-1), idx)


def _gather3(field, i, j, k):
    nx, ny, nz = field.shape
    ic = jnp.clip(i, 0, nx - 1)
    jc = jnp.clip(j, 0, ny - 1)
    kc = jnp.clip(k, 0, nz - 1)
    return jnp.take(field.reshape(-1), (ic * ny + jc) * nz + kc)


def _gather8_3d(field, i0, j0, k0):
    """Fetch the 8 cell corners (i0|i0+1, j0|j0+1, k0|k0+1) with ONE XLA
    gather: the corner axis is folded into the index tensor so the whole
    trilinear stencil costs a single HBM gather pass instead of eight."""
    nx, ny, nz = field.shape
    ia = jnp.clip(i0, 0, nx - 1)
    ib = jnp.clip(i0 + 1, 0, nx - 1)
    ja = jnp.clip(j0, 0, ny - 1)
    jb = jnp.clip(j0 + 1, 0, ny - 1)
    ka = jnp.clip(k0, 0, nz - 1)
    kb = jnp.clip(k0 + 1, 0, nz - 1)
    idx = jnp.stack(
        [
            (ia * ny + ja) * nz + ka,
            (ib * ny + ja) * nz + ka,
            (ia * ny + jb) * nz + ka,
            (ib * ny + jb) * nz + ka,
            (ia * ny + ja) * nz + kb,
            (ib * ny + ja) * nz + kb,
            (ia * ny + jb) * nz + kb,
            (ib * ny + jb) * nz + kb,
        ]
    )
    vals = jnp.take(field.reshape(-1), idx)
    return vals  # shape (8, *i0.shape)


def sample2(field, px, py, h, off):
    """Bilinear sample of `field` at world positions (px, py).

    `off` is the field's sampling offset in units of h: the sample lattice is
    x = (i + off_x)*h. Corner indices are clamped individually (boundedAt).
    """
    gx = px / h - off[0]
    gy = py / h - off[1]
    i0 = jnp.floor(gx)
    j0 = jnp.floor(gy)
    fx = gx - i0
    fy = gy - j0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)

    v00, v10, v01, v11 = _gather4_2d(field, i0, j0)
    return (
        (1 - fy) * ((1 - fx) * v00 + fx * v10)
        + fy * ((1 - fx) * v01 + fx * v11)
    )


def sample3(field, px, py, pz, h, off):
    """Trilinear sample at world positions; 3D convention (lattice (i+off)*h).

    Note the 3D reference expresses offsets as *world* subtraction
    (samplepos = pos - off_world, GPU_kernel.cu:45); off here equals
    off_world/h, so e.g. the u-field uses off = (-0.5, 0, 0).
    """
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    i0 = jnp.floor(gx)
    j0 = jnp.floor(gy)
    k0 = jnp.floor(gz)
    fx = gx - i0
    fy = gy - j0
    fz = gz - k0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    k0 = k0.astype(jnp.int32)

    v000, v100, v010, v110, v001, v101, v011, v111 = _gather8_3d(field, i0, j0, k0)

    # triLerp corner order of GPU_kernel.cu:27-41: a blends x, b blends y, c z.
    c00 = (1 - fx) * v000 + fx * v100
    c10 = (1 - fx) * v010 + fx * v110
    c01 = (1 - fx) * v001 + fx * v101
    c11 = (1 - fx) * v011 + fx * v111
    c0 = (1 - fy) * c00 + fy * c10
    c1 = (1 - fy) * c01 + fy * c11
    return (1 - fz) * c0 + fz * c1


def sample3_separable(field, dx, dy, dz, h):
    """Trilinear lookup of a voxel grid at a uniformly shifted lattice:
    the world offsets dx/dy/dz each vary only along their own axis (SDF
    boundary/emitter lookups, where every node of a regular lattice is
    shifted by one -pos). Exact clamped (boundedAt) semantics of sample3
    via axis-separable clipped `take`s — O(axis) index work instead of a
    3D gather (seconds at 256^3 on TPU), and none of the windowed
    kernel's bounded-displacement contract, which a whole-domain-offset
    lookup violates by construction (the fast path would return 0 for
    nodes far outside the voxel grid, misclassifying them as inside)."""
    xs = dx[:, 0, 0] / h
    ys = dy[0, :, 0] / h
    zs = dz[0, 0, :] / h
    out = field

    def lerp_axis(arr, g, axis, n):
        i0 = jnp.floor(g)
        f = (g - i0).astype(arr.dtype)
        i0 = i0.astype(jnp.int32)
        a0 = jnp.take(arr, jnp.clip(i0, 0, n - 1), axis=axis)
        a1 = jnp.take(arr, jnp.clip(i0 + 1, 0, n - 1), axis=axis)
        shape = [1, 1, 1]
        shape[axis] = f.shape[0]
        f = f.reshape(shape)
        return a0 * (1 - f) + a1 * f

    out = lerp_axis(out, xs, 0, field.shape[0])
    out = lerp_axis(out, ys, 1, field.shape[1])
    out = lerp_axis(out, zs, 2, field.shape[2])
    return out


def sample3_lattice(field, px, py, pz, h, off, values=False):
    """Trilinear sampling for full-lattice position arrays: routes to the
    gather-free windowed kernel (ops/interp_fast.py) on TPU, the exact
    gather form elsewhere. Callers guarantee element (i,j,k) samples near
    lattice site (i,j,k) with smooth bounded displacement.

    `values=True` marks the sampled array as FIELD VALUES (density, T,
    velocity) rather than map coordinates — only those may ride the bf16
    window knob (config.interp_window_dtype); map windows always stay f32
    (their absolute-coordinate bf16 ulp would be ~1 cell)."""
    from gpufluidsimulation_tpu import config

    if px.ndim == 3 and config.use_fast_interp():
        from gpufluidsimulation_tpu.ops import interp_fast

        return interp_fast.sample3_fast(
            field, px, py, pz, h, off,
            Rr=config.interp_rr(), Rz=config.interp_rz(),
            interpret=config.interp_interpret(),
            dtype=config.interp_window_dtype() if values else None,
        )
    return sample3(field, px, py, pz, h, off)


def sample2_lattice(field, px, py, h, off, values=False):
    """2D counterpart of sample3_lattice: full-lattice (or small-batched
    full-lattice) position arrays route to the lifted windowed kernel
    (interp_fast.sample2_fast) on TPU, the exact gather elsewhere."""
    from gpufluidsimulation_tpu import config

    if px.ndim in (2, 3) and config.use_fast_interp():
        from gpufluidsimulation_tpu.ops import interp_fast

        return interp_fast.sample2_fast(
            field, px, py, h, off,
            Rr=config.interp_rr(), interpret=config.interp_interpret(),
            dtype=config.interp_window_dtype() if values else None,
        )
    return sample2(field, px, py, h, off)


def mac_velocity_2d_lattice(u, v, px, py, h):
    """mac_velocity_2d for full-lattice position arrays — windowed kernel
    on TPU with the zero-out-of-band mask applied after sampling."""
    from gpufluidsimulation_tpu import config

    if px.ndim in (2, 3) and config.use_fast_interp():
        from gpufluidsimulation_tpu.ops import interp_fast

        return interp_fast.mac2_fast(
            u, v, px, py, h,
            Rr=config.interp_rr(), interpret=config.interp_interpret(),
        )
    return mac_velocity_2d(u, v, px, py, h)


def mac_velocity_2d(u, v, px, py, h):
    """Sample the 2D MAC velocity; returns (u, v) arrays shaped like px.

    Faithful to BimocqSolver2D::getVelocity: out-of-band samples return 0
    (NOT clamped), bands: u valid for i in [0, ni-1], j in [0, nj-2];
    v valid for i in [0, ni-2], j in [0, nj-1] (ni x nj = cell counts).
    """
    ni = v.shape[0]
    nj = u.shape[1]

    gx = px / h
    gy = py / h - 0.5
    i0 = jnp.floor(gx)
    j0 = jnp.floor(gy)
    fx = gx - i0
    fy = gy - j0
    i0i = i0.astype(jnp.int32)
    j0i = j0.astype(jnp.int32)
    valid_u = (i0 >= 0) & (i0 <= ni - 1) & (j0 >= 0) & (j0 <= nj - 2)
    u00 = _gather2(u, i0i, j0i)
    u10 = _gather2(u, i0i + 1, j0i)
    u01 = _gather2(u, i0i, j0i + 1)
    u11 = _gather2(u, i0i + 1, j0i + 1)
    us = (1 - fy) * ((1 - fx) * u00 + fx * u10) + fy * ((1 - fx) * u01 + fx * u11)
    us = jnp.where(valid_u, us, 0.0)

    gx = px / h - 0.5
    gy = py / h
    i0 = jnp.floor(gx)
    j0 = jnp.floor(gy)
    fx = gx - i0
    fy = gy - j0
    i0i = i0.astype(jnp.int32)
    j0i = j0.astype(jnp.int32)
    valid_v = (i0 >= 0) & (i0 <= ni - 2) & (j0 >= 0) & (j0 <= nj - 1)
    v00 = _gather2(v, i0i, j0i)
    v10 = _gather2(v, i0i + 1, j0i)
    v01 = _gather2(v, i0i, j0i + 1)
    v11 = _gather2(v, i0i + 1, j0i + 1)
    vs = (1 - fy) * ((1 - fx) * v00 + fx * v10) + fy * ((1 - fx) * v01 + fx * v11)
    vs = jnp.where(valid_v, vs, 0.0)
    return us, vs


_MAC_OFFS = ((-0.5, 0.0, 0.0), (0.0, -0.5, 0.0), (0.0, 0.0, -0.5))


def mac_pack_3d(u, v, w, out_shape):
    """Pre-pack the MAC triplet for repeated window sampling onto
    `out_shape` lattices (the CFL-substepped trace loops sample the SAME
    velocity up to ~9x per step — pad once instead of per call). Returns
    None on the exact-gather path."""
    from gpufluidsimulation_tpu import config

    if not config.use_fast_interp():
        return None
    from gpufluidsimulation_tpu.ops import interp_fast

    # Each channel is edge-padded DIRECTLY to the final window-safe extent
    # in one jnp.pad, then stacked. Semantically identical to the previous
    # stack-then-pad_fields form (edge replication composes), but (a) 3x
    # faster at 256^3 (36 -> 12 ms: one materialization instead of two),
    # and (b) it sidesteps a REAL XLA/TPU miscompile: the fused
    # pad+concatenate+pad chain at union-lattice shapes (e.g. 257^3 ->
    # (3,280,280,640)) emitted one garbage 128-lane z tile in EVERY row
    # (~30M inf values on device, reproduced with jit(mac_pack_3d) alone;
    # the identical ops split across two jits are clean). That pack feeds
    # every reflection/semilag/maccormack trace. Regression-tested by
    # tests/test_interp_fast.py::test_mac_pack_union_lattice_finite.
    dtype = config.interp_window_dtype()
    Rr = config.interp_rr()
    P = Rr + 2
    BY = interp_fast._by(Rr)
    sp = (u.shape[0], v.shape[1], w.shape[2])  # stacked spatial extents
    Z = interp_fast._ceil(out_shape[2], 128)
    xpad = P + max(0, interp_fast._ceil(out_shape[0], interp_fast.BX)
                   - sp[0])
    ypad = max(P + max(0, interp_fast._ceil(out_shape[1], BY) - sp[1]),
               interp_fast.WY_WIN - sp[1] + 1)
    ypad += (-(P + sp[1] + ypad)) % 8
    zpad = (Z + 256) - interp_fast.FRONT_Z - sp[2]

    def one(f, ex, ey, ez):
        if dtype is not None and f.dtype != dtype:
            f = f.astype(dtype)
        return jnp.pad(f, ((P, xpad + ex), (P, ypad + ey),
                           (interp_fast.FRONT_Z, zpad + ez)), mode="edge")

    # ex/ey/ez: the face plane each staggered channel lacks on the union
    # lattice (the old inner (0,1) edge pads), folded into the outer pad
    return jnp.stack([
        one(u, u.shape[0] - sp[0], 1, 1),
        one(v, 1, v.shape[1] - sp[1], 1),
        one(w, 1, 1, w.shape[2] - sp[2]),
    ])


def mac_velocity_3d(u, v, w, px, py, pz, h, packed=None):
    """Sample the 3D MAC velocity at world positions (GPU_kernel.cu:64-72).

    Fast path: the three staggered components are edge-padded to a common
    shape and sampled by ONE multi-channel window kernel (shared DMA/launch;
    edge replication matches boundedAt clamping). Pass `packed` from
    mac_pack_3d to skip the padding."""
    from gpufluidsimulation_tpu import config

    if px.ndim == 3 and config.use_fast_interp():
        from gpufluidsimulation_tpu.ops import interp_fast

        if packed is not None:
            out = interp_fast.sample3_multi_padded(
                packed, px, py, pz, h, _MAC_OFFS,
                Rr=config.interp_rr(), interpret=config.interp_interpret(),
            )
            return out[0], out[1], out[2]
        packed = jnp.stack([
            jnp.pad(u, ((0, 0), (0, 1), (0, 1)), mode="edge"),
            jnp.pad(v, ((0, 1), (0, 0), (0, 1)), mode="edge"),
            jnp.pad(w, ((0, 1), (0, 1), (0, 0)), mode="edge"),
        ])
        out = interp_fast.sample3_multi(
            packed, px, py, pz, h, _MAC_OFFS,
            Rr=config.interp_rr(), interpret=config.interp_interpret(),
            dtype=config.interp_window_dtype(),
        )
        return out[0], out[1], out[2]
    us = sample3_lattice(u, px, py, pz, h, (-0.5, 0.0, 0.0), values=True)
    vs = sample3_lattice(v, px, py, pz, h, (0.0, -0.5, 0.0), values=True)
    ws = sample3_lattice(w, px, py, pz, h, (0.0, 0.0, -0.5), values=True)
    return us, vs, ws


def _cubic_weights(f):
    """Cubic interpolation weights (cubic_interp_weights, utils/util.h:354-361)."""
    f2 = f * f
    f3 = f2 * f
    wm = -(1.0 / 3.0) * f + 0.5 * f2 - (1.0 / 6.0) * f3
    w0 = 1.0 - f2 + 0.5 * (f3 - f)
    w1 = f + 0.5 * (f2 - f3)
    w2 = (1.0 / 6.0) * (f3 - f)
    return wm, w0, w1, w2


def sample3_cubic(field, px, py, pz, h, off):
    """Tricubic sample (buffer3Df::sample_cubic, fluid_buffer3D.h:237-309):
    separable 4-tap cubic per axis over the 64-point neighborhood, corner
    indices clamped (boundedAt). The reference declares this but never
    calls it from the 3D solver hot path — provided for API parity and
    high-order resampling/diagnostics."""
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    i0 = jnp.floor(gx)
    j0 = jnp.floor(gy)
    k0 = jnp.floor(gz)
    fx = gx - i0
    fy = gy - j0
    fz = gz - k0
    i0 = i0.astype(jnp.int32)
    j0 = j0.astype(jnp.int32)
    k0 = k0.astype(jnp.int32)
    wx = _cubic_weights(fx)
    wy = _cubic_weights(fy)
    wz = _cubic_weights(fz)
    out = jnp.zeros_like(gx)
    for dk, wk in zip((-1, 0, 1, 2), wz):
        acc_y = jnp.zeros_like(gx)
        for dj, wj in zip((-1, 0, 1, 2), wy):
            acc_x = jnp.zeros_like(gx)
            for di, wi in zip((-1, 0, 1, 2), wx):
                acc_x = acc_x + wi * _gather3(field, i0 + di, j0 + dj, k0 + dk)
            acc_y = acc_y + wj * acc_x
        out = out + wk * acc_y
    return out


def mac_velocity_at_c_3d(u, v, w):
    """MAC velocity at the 3D cell-center lattice (x = i*h) — a static
    face average, no interpolation kernel needed: the u sample at a center
    lands exactly between faces i and i+1 (getVelocity at lattice points,
    GPU_kernel.cu:64-72)."""
    uc = 0.5 * (u[:-1, :, :] + u[1:, :, :])
    vc = 0.5 * (v[:, :-1, :] + v[:, 1:, :])
    wc = 0.5 * (w[:, :, :-1] + w[:, :, 1:])
    return uc, vc, wc


def clamp_pos_2d(px, py, h, ni, nj, eps=1.0):
    """Clamp world positions to [eps*h, L - eps*h] (clampPos, solver2D.h:128-132)."""
    return (
        jnp.clip(px, eps * h, ni * h - eps * h),
        jnp.clip(py, eps * h, nj * h - eps * h),
    )


def clamp_pos_3d(px, py, pz, h, ni, nj, nk, lo=1.0, hi=1.0):
    """Clamp to [lo*h, L - hi*h] per axis (GPU_kernel.cu:87-88, 281, 419)."""
    return (
        jnp.clip(px, lo * h, ni * h - hi * h),
        jnp.clip(py, lo * h, nj * h - hi * h),
        jnp.clip(pz, lo * h, nk * h - hi * h),
    )
