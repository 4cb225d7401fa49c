"""Particle transfer schemes (FLIP / APIC / PolyPIC) for the 2D solver.

TPU-native re-design of the particle machinery in BimocqSolver2D
(bimocq2D/BimocqSolver2D.cpp:1476-1715, CmapParticles at
BimocqSolver2D.h:43-124): the reference splats particles to the grid with a
*serial* CPU loop; here the splat is a vectorized scatter-add
(`zeros.at[idx].add(w*val)`) — XLA's sorted-scatter handles collisions — and
every per-particle quantity is a flat (P,) array column in a pytree.

Kernel: tent/hat b-spline w(r) = max(0, 1-|r|) per axis (CmapParticles::kernel).
PolyPIC carries full bilinear polynomial coefficients (c0 + c1 dx + c2 dy +
c3 dx dy); APIC drops the dx*dy term (BimocqSolver2D.cpp:1636-1637).

Deviation: the reference's FLIP splat forgets to normalize rho/T by the
accumulated weights (cpp:1546-1547 divide u,v only) — an evident defect we do
not reproduce; all splats are weight-normalized here.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from gpufluidsimulation_tpu.core import interp


@flax.struct.dataclass
class ParticleState:
    pos: jnp.ndarray   # (P, 2) world positions
    vel: jnp.ndarray   # (P, 2)
    rho: jnp.ndarray   # (P,)
    T: jnp.ndarray     # (P,)
    C_x: jnp.ndarray   # (P, 4) bilinear poly coeffs for u
    C_y: jnp.ndarray   # (P, 4)
    C_rho: jnp.ndarray
    C_T: jnp.ndarray


def seed_particles(grid, N: int) -> ParticleState:
    """N x N particles per cell on a regular sub-lattice
    (seedParticles, BimocqSolver2D.cpp:1833-1856)."""
    h = grid.h
    ni, nj = grid.ni, grid.nj
    i = jnp.arange(ni, dtype=jnp.float32)
    j = jnp.arange(nj, dtype=jnp.float32)
    sub = (jnp.arange(N, dtype=jnp.float32) / N + 1.0 / (2 * N))
    # position (i + sub_a, j + sub_b) * h for all combinations
    X = (i[:, None, None, None] + sub[None, None, :, None]) * h
    Y = (j[None, :, None, None] + sub[None, None, None, :]) * h
    pos = jnp.stack(
        [jnp.broadcast_to(X, (ni, nj, N, N)).reshape(-1),
         jnp.broadcast_to(Y, (ni, nj, N, N)).reshape(-1)], axis=-1
    )
    P = pos.shape[0]
    zeros4 = jnp.zeros((P, 4), jnp.float32)
    return ParticleState(
        pos=pos,
        vel=jnp.zeros((P, 2), jnp.float32),
        rho=jnp.zeros((P,), jnp.float32),
        T=jnp.zeros((P,), jnp.float32),
        C_x=zeros4, C_y=zeros4, C_rho=zeros4, C_T=zeros4,
    )


def _hat(r):
    return jnp.maximum(0.0, 1.0 - jnp.abs(r))


# ---------------------------------------------------------------------------
# Binned-sort transfer path (round-5): ONE particle sort per frame makes the
# flat tap index of EVERY half-offset lattice (c, u, v) non-decreasing, so
# every splat runs as an `indices_are_sorted` segment_sum — the per-scatter
# index sort (measured ~12 ms per 1M-update scatter, the dominant splat
# cost) is paid once per frame instead of once per scatter.
#
# Sort key: (sx, ky) lexicographic with sx = floor(x/h - 0.5) (the c/v
# lattice x cell) and ky = floor(2y/h) (half-cell y bin). Monotonicity
# argument, per lattice with offsets in multiples of 0.5:
#   * x: node index ii = base + di with base = sx for ALL lattices; the
#     x-face (off_x=0) lattice has floor(x/h) in {sx, sx+1}, covered by the
#     3-tap range di in {0,1,2} (the extra tap's hat weight is exactly 0).
#     For fixed di, ii is a non-decreasing function of the major key.
#   * y: within an sx group particles are y-sorted, and j0 = floor(y/h -
#     off_y) is a function of ky for off_y in {0, 0.5} — so for fixed dj,
#     jj is non-decreasing within the group; across groups ii*ny dominates.
# Contract (both in-step call sites guarantee it): positions lie in
# [h, (n-1)h] (the reference's advance clamp, cpp:1486), so no tap index
# ever leaves any lattice and no monotonicity-breaking clip is needed.
# ---------------------------------------------------------------------------


def bin_sort(grid, p: ParticleState) -> ParticleState:
    """Sort the particle pytree by the half-cell bin key (one argsort +
    column takes). The sorted order is written back into the state, so
    every downstream gather (G2P, trace) also reads with spatial
    locality."""
    h = grid.h
    sx = jnp.floor(p.pos[:, 0] / h - 0.5).astype(jnp.int32)
    ky = jnp.floor(2.0 * p.pos[:, 1] / h).astype(jnp.int32)
    key = sx * (2 * grid.nj + 4) + ky
    order = jnp.argsort(key)
    return jax.tree.map(lambda a: jnp.take(a, order, axis=0), p)


def _sorted_taps(shape, pos, h, off):
    """Yield (flat_ids, wx*wy weight factors...) per tap for the sorted
    splat: x taps ride the common base sx (3 taps for off_x=0 lattices),
    y taps the per-particle floor."""
    nx, ny = shape
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    base = jnp.floor(pos[:, 0] / h - 0.5).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    ndi = 2 if off[0] == 0.5 else 3
    for di in range(ndi):
        ii = base + di
        wx = _hat(gx - ii.astype(jnp.float32))
        for dj in (0, 1):
            jj = j0 + dj
            wy = _hat(gy - jj.astype(jnp.float32))
            yield ii * ny + jj, wx * wy, ii, jj


def _splat_multi_sorted(shape, pos, vals, h, off):
    """_splat_multi over bin-sorted particles: one sorted segment_sum per
    tap (no index sort), 4 taps for the c/v lattices, 6 for u."""
    nx, ny = shape
    C = len(vals)
    ones = jnp.ones((pos.shape[0],), jnp.float32)
    acc = jnp.zeros((nx * ny, C + 1), jnp.float32)
    for flat, w, _, _ in _sorted_taps(shape, pos, h, off):
        payload = jnp.stack([w * v for v in vals] + [w * ones], axis=-1)
        acc = acc + jax.ops.segment_sum(
            payload, flat, num_segments=nx * ny, indices_are_sorted=True)
    acc = acc.reshape(nx, ny, C + 1)
    weight = acc[..., C] + 1e-4
    return [acc[..., c] for c in range(C)], weight


def _splat_poly_multi_sorted(shape, pos, Cs, h, off, order):
    """_splat_poly_multi over bin-sorted particles (see
    _splat_multi_sorted)."""
    nx, ny = shape
    nch = len(Cs)
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    ones = jnp.ones((pos.shape[0],), jnp.float32)
    acc = jnp.zeros((nx * ny, nch + 1), jnp.float32)
    for flat, w, ii, jj in _sorted_taps(shape, pos, h, off):
        dx = (ii.astype(jnp.float32) - gx) * h
        dy = (jj.astype(jnp.float32) - gy) * h
        vals = []
        for Cf in Cs:
            val = Cf[:, 0] + Cf[:, 1] * dx + Cf[:, 2] * dy
            if order == "polypic":
                val = val + Cf[:, 3] * dx * dy
            vals.append(w * val)
        acc = acc + jax.ops.segment_sum(
            jnp.stack(vals + [w * ones], axis=-1), flat,
            num_segments=nx * ny, indices_are_sorted=True)
    acc = acc.reshape(nx, ny, nch + 1)
    weight = acc[..., nch] + 1e-4
    return [acc[..., c] for c in range(nch)], weight


def _splat_multi(shape, pos, vals, h, off):
    """Scatter-add C same-lattice channels (plus the shared weight) onto
    the 2x2 hat stencil in ONE multi-channel scatter per tap: the TPU
    scatter-add sorts its indices once per call, so C payload lanes ride
    a single sort instead of C+1 separate ones (measured: the index sort
    IS the cost — a 1M-update scatter runs ~12 ms regardless of small C;
    the old one-scatter-per-array form paid 8 sorts per splat).
    Returns ([field_c...], weight_sum) with the reference's 1e-4 floor."""
    nx, ny = shape
    C = len(vals)
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    i0 = jnp.floor(gx).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    acc = jnp.zeros((nx, ny, C + 1), jnp.float32)
    ones = jnp.ones_like(gx)
    for di in (0, 1):
        for dj in (0, 1):
            ii = jnp.clip(i0 + di, 0, nx - 1)
            jj = jnp.clip(j0 + dj, 0, ny - 1)
            w = _hat(gx - (i0 + di).astype(jnp.float32)) * _hat(
                gy - (j0 + dj).astype(jnp.float32)
            )
            payload = jnp.stack([w * v for v in vals] + [w * ones], axis=-1)
            acc = acc.at[ii, jj, :].add(payload)
    weight = acc[..., C] + 1e-4
    return [acc[..., c] for c in range(C)], weight


def _splat(shape, pos, val, h, off):
    """Single-channel _splat_multi (kept for tests/oracles)."""
    fields, weight = _splat_multi(shape, pos, [val], h, off)
    return fields[0], weight


def _splat_poly_multi(shape, pos, Cs, h, off, order):
    """PolyPIC/APIC splat of several same-lattice polynomial fields: value
    at node = c0 + c1 dx + c2 dy (+ c3 dx dy), dx = node - particle in
    world units (BimocqSolver2D.cpp:1631-1637). One multi-channel scatter
    per tap (see _splat_multi)."""
    nx, ny = shape
    nch = len(Cs)
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    i0 = jnp.floor(gx).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    acc = jnp.zeros((nx, ny, nch + 1), jnp.float32)
    ones = jnp.ones_like(gx)
    for di in (0, 1):
        for dj in (0, 1):
            ii = jnp.clip(i0 + di, 0, nx - 1)
            jj = jnp.clip(j0 + dj, 0, ny - 1)
            dxg = (i0 + di).astype(jnp.float32) - gx
            dyg = (j0 + dj).astype(jnp.float32) - gy
            w = _hat(dxg) * _hat(dyg)
            dx = dxg * h
            dy = dyg * h
            vals = []
            for C in Cs:
                val = C[:, 0] + C[:, 1] * dx + C[:, 2] * dy
                if order == "polypic":
                    val = val + C[:, 3] * dx * dy
                vals.append(w * val)
            acc = acc.at[ii, jj, :].add(
                jnp.stack(vals + [w * ones], axis=-1))
    weight = acc[..., nch] + 1e-4
    return [acc[..., c] for c in range(nch)], weight


def _splat_poly(shape, pos, C, h, off, order):
    """Single-channel _splat_poly_multi (kept for tests/oracles)."""
    fields, weight = _splat_poly_multi(shape, pos, [C], h, off, order)
    return fields[0], weight


def p2g_flip(grid, p: ParticleState, sorted_bins=False):
    """FLIP particle->grid transfer of (u, v, rho, T). rho and T share the
    cell lattice — one 2-channel scatter serves both. With
    `sorted_bins=True` the particles were bin_sort'ed and every splat is
    a sort-free sorted segment_sum."""
    splat = _splat_multi_sorted if sorted_bins else _splat_multi
    (u,), uw = splat(grid.shape_u, p.pos, [p.vel[:, 0]], grid.h, grid.OFF_U)
    (v,), vw = splat(grid.shape_v, p.pos, [p.vel[:, 1]], grid.h, grid.OFF_V)
    (rho, T), cw = splat(grid.shape_c, p.pos, [p.rho, p.T], grid.h,
                         grid.OFF_C)
    return u / uw, v / vw, rho / cw, T / cw


def p2g_poly(grid, p: ParticleState, order, sorted_bins=False):
    """APIC/PolyPIC particle->grid transfer; rho and T share the cell
    lattice's scatter. `sorted_bins` as in p2g_flip."""
    splat = _splat_poly_multi_sorted if sorted_bins else _splat_poly_multi
    (u,), uw = splat(grid.shape_u, p.pos, [p.C_x], grid.h,
                     grid.OFF_U, order)
    (v,), vw = splat(grid.shape_v, p.pos, [p.C_y], grid.h,
                     grid.OFF_V, order)
    (rho, T), cw = splat(grid.shape_c, p.pos, [p.C_rho, p.C_T],
                         grid.h, grid.OFF_C, order)
    return u / uw, v / vw, rho / cw, T / cw


def calculate_cp(field, pos, h, off, valid_hi_i, valid_hi_j):
    """Bilinear polynomial coefficients of `field` around each particle
    (CmapParticles::calculateCp, BimocqSolver2D.h:86-123). Returns (P, 4)
    [c0, c1, c2, c3]; zero outside the valid index band."""
    nx, ny = field.shape
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    i0 = jnp.floor(gx).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    px = (gx - i0.astype(jnp.float32)) * h
    py = (gy - j0.astype(jnp.float32)) * h
    valid = (i0 >= 0) & (i0 <= valid_hi_i) & (j0 >= 0) & (j0 <= valid_hi_j)
    f00, f10, f01, f11 = interp._gather4_2d(field, i0, j0)
    hh = h * h
    c0 = ((h - px) * (h - py) * f00 + px * (h - py) * f10
          + px * py * f11 + (h - px) * py * f01) / hh
    c1 = (-(h - py) * f00 + (h - py) * f10 + py * f11 - py * f01) / hh
    c2 = (-(h - px) * f00 - px * f10 + px * f11 + (h - px) * f01) / hh
    c3 = (f00 - f10 + f11 - f01) / hh
    C = jnp.stack([c0, c1, c2, c3], axis=-1)
    return jnp.where(valid[:, None], C, 0.0)


def g2p_sample(grid, u, v, rho, T, pos):
    """Gather grid fields at particle positions (sampleParticlesFromGrid,
    BimocqSolver2D.cpp:2269-2283)."""
    us, vs = interp.mac_velocity_2d(u, v, pos[:, 0], pos[:, 1], grid.h)
    rs = interp.sample2(rho, pos[:, 0], pos[:, 1], grid.h, grid.OFF_C)
    Ts = interp.sample2(T, pos[:, 0], pos[:, 1], grid.h, grid.OFF_C)
    return us, vs, rs, Ts


def update_cp_all(grid, p: ParticleState, u, v, rho, T) -> ParticleState:
    """Validity bands follow calculateCp's offy>0 / else branches with the
    per-field (ni, nj) arguments of BimocqSolver2D.cpp:2279-2282."""
    ni, nj = grid.ni, grid.nj
    return p.replace(
        C_x=calculate_cp(u, p.pos, grid.h, grid.OFF_U, ni, nj - 2),
        C_y=calculate_cp(v, p.pos, grid.h, grid.OFF_V, ni - 2, nj),
        C_rho=calculate_cp(rho, p.pos, grid.h, grid.OFF_C, ni - 1, nj - 2),
        C_T=calculate_cp(T, p.pos, grid.h, grid.OFF_C, ni - 1, nj - 2),
    )
