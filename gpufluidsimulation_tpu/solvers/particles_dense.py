"""Dense-binned particle transfers: TPU-native FLIP / APIC / PolyPIC.

The flat particle path (solvers/particles.py) is faithful to the reference's
per-particle loops (bimocq2D/BimocqSolver2D.cpp:1476-1715) but its cost on
TPU is entirely 1M-index gathers/scatters — XLA lowers them to serialized
row-at-a-time HBM traffic (~10 ms per million indices on v5e), so a FLIP
frame was ~900 ms of pure address machinery around ~1 ms of arithmetic.

This module re-lays the particles out the way a TPU wants them: packed by
HOME CELL ``(bi, bj) = floor(pos/h)`` into ``K`` slots per cell, giving
``(ni, nj, K)`` dense arrays. Every transfer op then becomes *static-shift
window arithmetic*:

* P2G splat: for each of the <=9 static taps of the hat stencil, the tap's
  contribution is a K-reduction ``sum_k w_k * val_k`` per cell, added into
  the output grid at a STATIC slice offset — no scatter anywhere.
* G2P gather / RK3 trace velocity samples: the bilinear value at a particle
  is ``sum_t hat(gx - t) * field[t]`` over the static taps of a radius-R
  window around the home cell (the tent identity: bilinear interpolation
  equals the hat-weighted sum over ALL lattice taps, only two of which are
  nonzero per axis) — no gather anywhere.
* Packing: one ``argsort`` of the bin keys (~1 ms for 1M keys) plus
  contiguous ROW-TAKES (``payload[starts[b] + k]``) — XLA vectorizes row
  copies, unlike scatters, so the pack costs a few ms, not ~100.

Contract (same architecture as ops/interp_fast.py's displacement contract):

* ``K`` bounds per-cell occupancy. Particles beyond K in a cell are dropped
  from the dense arrays and COUNTED (``overflow``); with the default K =
  2x the seeded density this never fires on incompressible scenes.
* ``R`` bounds how far an RK3 stage position may stray from the particle's
  home cell (R >= total CFL + 1). Escaped in-band samples are clamped to
  the window edge and COUNTED (``escapes``). Out-of-DOMAIN stage positions
  are NOT escapes — the reference's getVelocity returns 0 out of band
  (BimocqSolver2D.cpp getVelocity / sampleField) and the band mask here is
  computed from the unclamped position, so that semantic is exact.

Both counters ride ``Smoke2DState.interp_overflow`` so ``step_checked``
retries a tripped frame through the exact flat path.

Numerics: identical formulas to the flat path (RK3 coefficients, hat
weights, the reference's 1e-4 weight floor, zero-out-of-band velocity,
calculateCp's validity bands) — results differ from the flat path only by
fp summation order.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Binning: sort + contiguous row-take pack (no scatter)
# ---------------------------------------------------------------------------


class BinMeta:
    """Per-frame binning of flat particles into (ni*nj, K) slots.

    slot_take : (P,) int32 — flat dense index of each particle (overflowed
        particles point at the zero-filled trash row ni*nj*K).
    pack_idx : (ni*nj*K,) int32 — flat PARTICLE index filling each slot
        (clamped; mask invalid slots with `valid`).
    side_idx / side_valid : fixed-budget SIDECAR of overflowed particles
        (rank >= K — in practice the boundary-ring pile-up the reference's
        domain clamp creates, cpp:1486): the first `side` of them, in
        spatial-sort order, for exact flat-path handling. `overflow` counts
        only the tail BEYOND the sidecar budget.
    """

    def __init__(self, grid, pos, K, side=0):
        h = grid.h
        ni, nj = grid.ni, grid.nj
        P = pos.shape[0]
        bi = jnp.clip(jnp.floor(pos[:, 0] / h).astype(jnp.int32), 0, ni - 1)
        bj = jnp.clip(jnp.floor(pos[:, 1] / h).astype(jnp.int32), 0, nj - 1)
        key = bi * nj + bj
        iota = jnp.arange(P, dtype=jnp.int32)
        # one sort yields both the sorted keys and the order (an argsort +
        # separate take re-reads the 1M keys for ~3 ms extra)
        ks, order = lax.sort_key_val(key, iota)
        newseg = jnp.concatenate(
            [jnp.ones((1,), bool), ks[1:] != ks[:-1]])
        rank = iota - lax.cummax(jnp.where(newseg, iota, 0))
        # method='sort': the default scan method is 20 serialized gather
        # rounds (~31 ms at 1M keys on v5e); the sort form is ~6 ms
        starts = jnp.searchsorted(ks, jnp.arange(ni * nj, dtype=jnp.int32),
                                  method="sort").astype(jnp.int32)
        counts = jnp.diff(jnp.append(starts, P)).astype(jnp.int32)
        self.grid = grid
        self.K = K
        self.order = order
        n_over = jnp.sum(rank >= K).astype(jnp.int32)
        # slot of each particle, in SORTED order -> back to particle order
        # via the inverse permutation (argsort of a permutation: ~1 ms for
        # 1M keys — a scatter here would cost ~100 ms, see module docstring)
        slot_sorted = jnp.where(rank < K, ks * K + rank, ni * nj * K)
        inv_order = jnp.argsort(order)
        self.slot_take = jnp.take(slot_sorted, inv_order)
        k_iota = jnp.arange(K, dtype=jnp.int32)
        self.valid = (k_iota[None, :] < counts[:, None]).reshape(ni, nj, K)
        self.pack_idx = jnp.clip(
            starts[:, None] + k_iota[None, :], 0, P - 1).reshape(-1)
        self.side = side = min(side, P)
        if side:
            over_sorted = rank >= K
            # stable argsort of (not overflow): overflow entries first,
            # keeping spatial order
            side_order = jnp.argsort(~over_sorted)[:side]
            self.side_idx = jnp.take(order, side_order)
            self.side_valid = jnp.take(over_sorted, side_order)
            self.overflow = jnp.maximum(n_over - side, 0)
        else:
            self.side_idx = jnp.zeros((0,), jnp.int32)
            self.side_valid = jnp.zeros((0,), bool)
            self.overflow = n_over

    def pack(self, cols):
        """Pack flat per-particle columns into dense (ni, nj, K) arrays.
        `cols`: list of (P,) or (P, C) arrays. Returns matching list of
        (ni, nj, K) / (ni, nj, K, C) arrays, zero in invalid slots."""
        g, K = self.grid, self.K
        flat = [c[:, None] if c.ndim == 1 else c for c in cols]
        payload = jnp.concatenate(flat, axis=-1)
        payload = jnp.take(payload, self.order, axis=0)
        dense = jnp.take(payload, self.pack_idx, axis=0)
        dense = jnp.where(self.valid.reshape(-1)[:, None], dense, 0.0)
        dense = dense.reshape(g.ni, g.nj, K, -1)
        out, c0 = [], 0
        for c in cols:
            w = 1 if c.ndim == 1 else c.shape[-1]
            d = dense[..., c0:c0 + w]
            out.append(d[..., 0] if c.ndim == 1 else d)
            c0 += w
        return out

    def unpack(self, denses, fill=0.0):
        """Read each particle's slot back out of dense (ni, nj, K[, C])
        arrays (overflowed particles get `fill`)."""
        g, K = self.grid, self.K
        flat = [d.reshape(g.ni * g.nj * K, -1) for d in denses]
        payload = jnp.concatenate(flat, axis=-1)
        trash = jnp.full((1, payload.shape[-1]), fill, payload.dtype)
        payload = jnp.concatenate([payload, trash], axis=0)
        rows = jnp.take(payload, self.slot_take, axis=0)
        out, c0 = [], 0
        for d in denses:
            if d.ndim == 3:
                out.append(rows[:, c0]); c0 += 1
            else:
                w = d.shape[-1]
                out.append(rows[:, c0:c0 + w]); c0 += w
        return out


# ---------------------------------------------------------------------------
# Static-tap window primitives
# ---------------------------------------------------------------------------


def _hat(r):
    return jnp.maximum(0.0, 1.0 - jnp.abs(r))


def _tap_range(off, R):
    """Static relative-tap range [t0, t1] on one axis for a lattice with
    sampling offset `off` (in cells) and window radius R: positions are
    allowed lattice coords gx in [bi - R - off, bi + R + 1 - off]."""
    import math

    t0 = math.floor(-R - off)
    t1 = math.ceil(R + 1 - off)
    return t0, t1


def _pad_for_taps(field, t0x, t1x, t0y, t1y, ni, nj):
    """Zero-pad so slice [t - t0x : t - t0x + ni] is valid for every tap."""
    nx, ny = field.shape
    return jnp.pad(field, ((-t0x, max(0, t1x + ni - nx + 1)),
                           (-t0y, max(0, t1y + nj - ny + 1))))


def window_sample(fields, gx, gy, off, R, band=None):
    """Bilinear-sample each (nx, ny) field of `fields` at dense positions.

    gx, gy: ABSOLUTE lattice coords (pos/h - off) shaped (ni, nj, K), for
    particles whose home cell is their (i, j) array position. Returns
    (values..., escapes) where escapes counts in-band samples whose support
    left the radius-R window (values for those are window-edge clamped).
    `band` = (ihi, jhi) applies the reference's zero-out-of-band mask
    (getVelocity: 0 <= i0 <= ihi and 0 <= j0 <= jhi, from the UNCLAMPED
    position)."""
    ni, nj, K = gx.shape
    t0x, t1x = _tap_range(off[0], R)
    t0y, t1y = _tap_range(off[1], R)
    ii = jnp.arange(ni, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(nj, dtype=jnp.float32)[None, :, None]
    rx = gx - ii
    ry = gy - jj
    rxw = jnp.clip(rx, t0x, t1x)
    ryw = jnp.clip(ry, t0y, t1y)
    if band is not None:
        i0 = jnp.floor(gx)
        j0 = jnp.floor(gy)
        ok = (i0 >= 0) & (i0 <= band[0]) & (j0 >= 0) & (j0 <= band[1])
        esc = jnp.sum(ok & ((rx != rxw) | (ry != ryw)),
                      dtype=jnp.int32)
        mask = ok.astype(jnp.float32)
    else:
        esc = jnp.sum((rx != rxw) | (ry != ryw), dtype=jnp.int32)
        mask = None
    pads = [_pad_for_taps(f, t0x, t1x, t0y, t1y, ni, nj) for f in fields]
    outs = [jnp.zeros((ni, nj, K), jnp.float32) for _ in fields]
    for t in range(t0x, t1x + 1):
        wx = _hat(rxw - t)
        for s in range(t0y, t1y + 1):
            w = wx * _hat(ryw - s)
            for m, fp in enumerate(pads):
                sl = fp[t - t0x:t - t0x + ni, s - t0y:s - t0y + nj]
                outs[m] = outs[m] + w * sl[:, :, None]
    if mask is not None:
        outs = [o * mask for o in outs]
    return outs, esc


def window_splat(vals_per_lattice, gx, gy, off, out_shape, valid):
    """Splat dense per-particle values onto one lattice with the hat
    stencil (radius-0 window: positions must lie in their home cell, which
    the domain clamp guarantees). `vals_per_lattice`: list of (ni,nj,K)
    value arrays sharing this lattice; `valid` (ni,nj,K) masks empty slots
    out of the weights. Returns ([grids...], weight) with the raw
    accumulated weight (caller applies the reference's 1e-4 floor)."""
    ni, nj, K = gx.shape
    t0x, t1x = _tap_range(off[0], 0)
    t0y, t1y = _tap_range(off[1], 0)
    ii = jnp.arange(ni, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(nj, dtype=jnp.float32)[None, :, None]
    rx = jnp.clip(gx - ii, t0x, t1x)
    ry = jnp.clip(gy - jj, t0y, t1y)
    vmask = valid.astype(jnp.float32)
    nx, ny = out_shape
    px0, py0 = -t0x, -t0y
    accs = [jnp.zeros((nx + px0 + t1x + 1, ny + py0 + t1y + 1), jnp.float32)
            for _ in range(len(vals_per_lattice) + 1)]
    for t in range(t0x, t1x + 1):
        wx = _hat(rx - t)
        for s in range(t0y, t1y + 1):
            w = wx * _hat(ry - s) * vmask
            contribs = [jnp.sum(w * v, axis=-1) for v in vals_per_lattice]
            contribs.append(jnp.sum(w, axis=-1))
            for m, c in enumerate(contribs):
                accs[m] = accs[m].at[
                    t + px0:t + px0 + ni, s + py0:s + py0 + nj].add(c)
    grids = [a[px0:px0 + nx, py0:py0 + ny] for a in accs]
    return grids[:-1], grids[-1]


def window_splat_poly(Cs, gx, gy, off, out_shape, h, order, valid):
    """APIC/PolyPIC splat: node value = c0 + c1 dx + c2 dy (+ c3 dx dy)
    with dx = (node - particle) in world units (BimocqSolver2D.cpp:
    1631-1637). `Cs`: list of (ni,nj,K,4) coefficient arrays sharing the
    lattice."""
    ni, nj, K = gx.shape
    t0x, t1x = _tap_range(off[0], 0)
    t0y, t1y = _tap_range(off[1], 0)
    ii = jnp.arange(ni, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(nj, dtype=jnp.float32)[None, :, None]
    rx = jnp.clip(gx - ii, t0x, t1x)
    ry = jnp.clip(gy - jj, t0y, t1y)
    vmask = valid.astype(jnp.float32)
    nx, ny = out_shape
    px0, py0 = -t0x, -t0y
    accs = [jnp.zeros((nx + px0 + t1x + 1, ny + py0 + t1y + 1), jnp.float32)
            for _ in range(len(Cs) + 1)]
    for t in range(t0x, t1x + 1):
        dxr = t - rx
        wx = _hat(dxr)
        dx = dxr * h
        for s in range(t0y, t1y + 1):
            dyr = s - ry
            w = wx * _hat(dyr) * vmask
            dy = dyr * h
            contribs = []
            for C in Cs:
                val = C[..., 0] + C[..., 1] * dx + C[..., 2] * dy
                if order == "polypic":
                    val = val + C[..., 3] * dx * dy
                contribs.append(jnp.sum(w * val, axis=-1))
            contribs.append(jnp.sum(w, axis=-1))
            for m, c in enumerate(contribs):
                accs[m] = accs[m].at[
                    t + px0:t + px0 + ni, s + py0:s + py0 + nj].add(c)
    grids = [a[px0:px0 + nx, py0:py0 + ny] for a in accs]
    return grids[:-1], grids[-1]


# ---------------------------------------------------------------------------
# Sidecar splats: flat 4-tap scatter-add for the (small, fixed-budget)
# overflow population — the scatter cost that forbids this form at 1M
# particles (~100 ms) is sub-ms at the 8k sidecar size.
# ---------------------------------------------------------------------------


def side_splat(shape, pos, vals, h, off, svalid):
    """Raw (unnormalized) hat splat of sidecar particles; returns
    ([field_sums...], weight_sum) to merge into the dense accumulators."""
    nx, ny = shape
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    i0 = jnp.floor(gx).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    m = svalid.astype(jnp.float32)
    C = len(vals)
    acc = jnp.zeros((nx, ny, C + 1), jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            ii = jnp.clip(i0 + di, 0, nx - 1)
            jj = jnp.clip(j0 + dj, 0, ny - 1)
            w = m * _hat(gx - (i0 + di)) * _hat(gy - (j0 + dj))
            payload = jnp.stack([w * v for v in vals] + [w], axis=-1)
            acc = acc.at[ii, jj, :].add(payload)
    return [acc[..., c] for c in range(C)], acc[..., C]


def side_splat_poly(shape, pos, Cs, h, off, order, svalid):
    """Raw APIC/PolyPIC sidecar splat (node value from the bilinear
    polynomial, BimocqSolver2D.cpp:1631-1637)."""
    nx, ny = shape
    gx = pos[:, 0] / h - off[0]
    gy = pos[:, 1] / h - off[1]
    i0 = jnp.floor(gx).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    m = svalid.astype(jnp.float32)
    nch = len(Cs)
    acc = jnp.zeros((nx, ny, nch + 1), jnp.float32)
    for di in (0, 1):
        for dj in (0, 1):
            ii = jnp.clip(i0 + di, 0, nx - 1)
            jj = jnp.clip(j0 + dj, 0, ny - 1)
            dxg = (i0 + di) - gx
            dyg = (j0 + dj) - gy
            w = m * _hat(dxg) * _hat(dyg)
            dx = dxg * h
            dy = dyg * h
            vals = []
            for Cf in Cs:
                val = Cf[:, 0] + Cf[:, 1] * dx + Cf[:, 2] * dy
                if order == "polypic":
                    val = val + Cf[:, 3] * dx * dy
                vals.append(w * val)
            acc = acc.at[ii, jj, :].add(jnp.stack(vals + [w], axis=-1))
    return [acc[..., c] for c in range(nch)], acc[..., nch]


# ---------------------------------------------------------------------------
# Dense MAC velocity + RK3 trace
# ---------------------------------------------------------------------------


def mac_velocity_dense(u, v, px, py, h, R):
    """getVelocity at dense positions: bilinear u and v with the
    reference's zero-out-of-band bands (core/interp.mac_velocity_2d)."""
    ni = v.shape[0]
    nj = u.shape[1]
    (us,), e1 = window_sample([u], px / h, py / h - 0.5, (0.0, 0.5), R,
                              band=(ni - 1, nj - 2))
    (vs,), e2 = window_sample([v], px / h - 0.5, py / h, (0.5, 0.0), R,
                              band=(ni - 2, nj - 1))
    return us, vs, e1 + e2


def trace_rk3_dense(u, v, h, dt, px, py, R):
    """ops/advect.trace_rk3_2d on dense positions (same coefficients and
    0.001h domain clamp)."""
    ni = v.shape[0]
    nj = u.shape[1]
    c1, c2, c3 = 2.0 / 9.0 * dt, 3.0 / 9.0 * dt, 4.0 / 9.0 * dt
    u1, v1, e1 = mac_velocity_dense(u, v, px, py, h, R)
    m1x, m1y = px + 0.5 * dt * u1, py + 0.5 * dt * v1
    u2, v2, e2 = mac_velocity_dense(u, v, m1x, m1y, h, R)
    m2x, m2y = px + 0.75 * dt * u2, py + 0.75 * dt * v2
    u3, v3, e3 = mac_velocity_dense(u, v, m2x, m2y, h, R)
    ox = px + c1 * u1 + c2 * u2 + c3 * u3
    oy = py + c1 * v1 + c2 * v2 + c3 * v3
    eps = 0.001
    ox = jnp.clip(ox, eps * h, (ni - eps) * h)
    oy = jnp.clip(oy, eps * h, (nj - eps) * h)
    return ox, oy, e1 + e2 + e3


def advect_dense(grid, u, v, cfldt, dt, px, py, R):
    """Substepped forward RK3 on dense positions + the FLIP domain clamp
    (cpp:1480-1487, clamp to [h, (n-1)h]). Window homes stay the PRE-trace
    bins for the whole substep loop, so R must cover the total CFL of the
    frame (escapes are counted when it doesn't). Mirrors
    ops/advect._substepped (GPU_kernel.cu:92-125 fixed substep, last
    partial)."""
    total = jnp.abs(dt)
    sign = jnp.where(dt >= 0, 1.0, -1.0).astype(jnp.float32)
    cfldt = jnp.maximum(jnp.asarray(cfldt, jnp.float32), 1e-30)
    h = grid.h

    def cond(carry):
        return carry[0] < total

    def body(carry):
        t, x, y, esc = carry
        sub = jnp.minimum(cfldt, total - t)
        x, y, e = trace_rk3_dense(u, v, h, sign * sub, x, y, R)
        return (t + sub, x, y, esc + e)

    _, px, py, esc = lax.while_loop(
        cond, body, (jnp.float32(0.0), px, py, jnp.int32(0)))
    px = jnp.clip(px, h, (grid.ni - 1) * h)
    py = jnp.clip(py, h, (grid.nj - 1) * h)
    return px, py, esc


# ---------------------------------------------------------------------------
# Dense P2G / G2P / Cp
# ---------------------------------------------------------------------------


def home_center_fill(grid, px, py, valid):
    """Replace empty-slot positions (zero-filled by pack) with their home
    cell center so they trace harmlessly inside the window and never
    pollute the escape counter (their splat weight is masked by `valid`)."""
    ni, nj, K = px.shape
    cx = (jnp.arange(ni, dtype=jnp.float32)[:, None, None] + 0.5) * grid.h
    cy = (jnp.arange(nj, dtype=jnp.float32)[None, :, None] + 0.5) * grid.h
    return (jnp.where(valid, px, cx), jnp.where(valid, py, cy))


def p2g_flip_dense(grid, px, py, vel_u, vel_v, rho, T, valid, side=None):
    """particles.p2g_flip on dense arrays (weight-normalized with the
    reference's 1e-4 floor). `side` = (pos (B,2), vu, vv, rho, T, svalid)
    merges the sidecar overflow particles' exact scatter splat into the
    raw sums before normalization."""
    h = grid.h
    (u,), uw = window_splat([vel_u], px / h, py / h - 0.5, grid.OFF_U,
                            grid.shape_u, valid)
    (v,), vw = window_splat([vel_v], px / h - 0.5, py / h, grid.OFF_V,
                            grid.shape_v, valid)
    (r, t_), cw = window_splat([rho, T], px / h - 0.5, py / h - 0.5,
                               grid.OFF_C, grid.shape_c, valid)
    if side is not None:
        spos, svu, svv, srho, sT, sv = side
        (su,), suw = side_splat(grid.shape_u, spos, [svu], h, grid.OFF_U, sv)
        (sv_,), svw = side_splat(grid.shape_v, spos, [svv], h, grid.OFF_V,
                                 sv)
        (sr, sT_), scw = side_splat(grid.shape_c, spos, [srho, sT], h,
                                    grid.OFF_C, sv)
        u, uw = u + su, uw + suw
        v, vw = v + sv_, vw + svw
        r, t_, cw = r + sr, t_ + sT_, cw + scw
    return (u / (uw + 1e-4), v / (vw + 1e-4),
            r / (cw + 1e-4), t_ / (cw + 1e-4))


def p2g_poly_dense(grid, px, py, C_x, C_y, C_rho, C_T, order, valid,
                   side=None):
    """particles.p2g_poly on dense arrays. `side` = (pos, C_x, C_y, C_rho,
    C_T, svalid) merges the sidecar's exact scatter splat."""
    h = grid.h
    (u,), uw = window_splat_poly([C_x], px / h, py / h - 0.5, grid.OFF_U,
                                 grid.shape_u, h, order, valid)
    (v,), vw = window_splat_poly([C_y], px / h - 0.5, py / h, grid.OFF_V,
                                 grid.shape_v, h, order, valid)
    (r, t_), cw = window_splat_poly([C_rho, C_T], px / h - 0.5, py / h - 0.5,
                                    grid.OFF_C, grid.shape_c, h, order,
                                    valid)
    if side is not None:
        spos, sCx, sCy, sCr, sCT, sv = side
        (su,), suw = side_splat_poly(grid.shape_u, spos, [sCx], h,
                                     grid.OFF_U, order, sv)
        (sv_,), svw = side_splat_poly(grid.shape_v, spos, [sCy], h,
                                      grid.OFF_V, order, sv)
        (sr, sT_), scw = side_splat_poly(grid.shape_c, spos, [sCr, sCT], h,
                                         grid.OFF_C, order, sv)
        u, uw = u + su, uw + suw
        v, vw = v + sv_, vw + svw
        r, t_, cw = r + sr, t_ + sT_, cw + scw
    return (u / (uw + 1e-4), v / (vw + 1e-4),
            r / (cw + 1e-4), t_ / (cw + 1e-4))


def g2p_dense(grid, px, py, u_fields, v_fields, c_fields):
    """Sample per-lattice field lists at dense particle positions
    (particles.g2p_sample: getVelocity bands for u/v, clamped-corner
    sample for cell fields — in-domain positions never trigger the clamp,
    so the zero-pad window form is exact). R=1 covers the off-0.5 lattices'
    [-1, 1] taps around the home cell."""
    h = grid.h
    ni, nj = grid.ni, grid.nj
    us, e1 = window_sample(u_fields, px / h, py / h - 0.5, (0.0, 0.5), 0,
                           band=(ni - 1, nj - 2))
    vs, e2 = window_sample(v_fields, px / h - 0.5, py / h, (0.5, 0.0), 0,
                           band=(ni - 2, nj - 1))
    cs, _ = window_sample(c_fields, px / h - 0.5, py / h - 0.5, (0.5, 0.5),
                          0)
    return us, vs, cs


def _corner_fields(field, gx, gy, off):
    """f00, f10, f01, f11 at (i0, j0) = floor of the lattice coords — as
    static-tap selections over the radius-0 window (the corner index is
    within 1 of the home cell for off in {0, 0.5})."""
    ni, nj, K = gx.shape
    t0x, t1x = _tap_range(off[0], 0)
    t0y, t1y = _tap_range(off[1], 0)
    ii = jnp.arange(ni, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(nj, dtype=jnp.float32)[None, :, None]
    i0r = jnp.floor(gx) - ii
    j0r = jnp.floor(gy) - jj
    fp = _pad_for_taps(field, t0x, t1x + 1, t0y, t1y + 1, ni, nj)
    f00 = jnp.zeros((ni, nj, K), jnp.float32)
    f10 = jnp.zeros_like(f00)
    f01 = jnp.zeros_like(f00)
    f11 = jnp.zeros_like(f00)
    for t in range(t0x, t1x + 1):
        sx = (i0r == t).astype(jnp.float32)
        for s in range(t0y, t1y + 1):
            sel = sx * (j0r == s).astype(jnp.float32)
            base = lambda dt_, ds_: fp[t - t0x + dt_:t - t0x + dt_ + ni,
                                       s - t0y + ds_:s - t0y + ds_ + nj
                                       ][:, :, None]
            f00 = f00 + sel * base(0, 0)
            f10 = f10 + sel * base(1, 0)
            f01 = f01 + sel * base(0, 1)
            f11 = f11 + sel * base(1, 1)
    return f00, f10, f01, f11


def calculate_cp_dense(field, gx, gy, off, h, valid_hi_i, valid_hi_j):
    """particles.calculate_cp on dense positions: bilinear polynomial
    coefficients [c0, c1, c2, c3] (CmapParticles::calculateCp,
    BimocqSolver2D.h:86-123), zero outside the validity band."""
    i0 = jnp.floor(gx)
    j0 = jnp.floor(gy)
    px = (gx - i0) * h
    py = (gy - j0) * h
    valid = ((i0 >= 0) & (i0 <= valid_hi_i)
             & (j0 >= 0) & (j0 <= valid_hi_j)).astype(jnp.float32)
    f00, f10, f01, f11 = _corner_fields(field, gx, gy, off)
    hh = h * h
    c0 = ((h - px) * (h - py) * f00 + px * (h - py) * f10
          + px * py * f11 + (h - px) * py * f01) / hh
    c1 = (-(h - py) * f00 + (h - py) * f10 + py * f11 - py * f01) / hh
    c2 = (-(h - px) * f00 - px * f10 + px * f11 + (h - px) * f01) / hh
    c3 = (f00 - f10 + f11 - f01) / hh
    return jnp.stack([c0, c1, c2, c3], axis=-1) * valid[..., None]


def update_cp_dense(grid, px, py, u, v, rho, T):
    """particles.update_cp_all on dense positions (same per-field validity
    bands, BimocqSolver2D.cpp:2279-2282)."""
    h = grid.h
    ni, nj = grid.ni, grid.nj
    return (
        calculate_cp_dense(u, px / h, py / h - 0.5, (0.0, 0.5), h,
                           ni, nj - 2),
        calculate_cp_dense(v, px / h - 0.5, py / h, (0.5, 0.0), h,
                           ni - 2, nj),
        calculate_cp_dense(rho, px / h - 0.5, py / h - 0.5, (0.5, 0.5), h,
                           ni - 1, nj - 2),
        calculate_cp_dense(T, px / h - 0.5, py / h - 0.5, (0.5, 0.5), h,
                           ni - 1, nj - 2),
    )
