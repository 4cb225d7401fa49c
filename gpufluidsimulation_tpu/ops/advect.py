"""Advection primitives: RK3 characteristic tracing (CFL-substepped),
semi-Lagrangian transport, MacCormack/BFECC with extrema clamping, and the
DMC (exponential modified-MacCormack) backward-map step.

All functions operate on whole-grid coordinate arrays and compile to a handful
of fused XLA gathers per op — the TPU replacement for the reference's
one-thread-per-cell CUDA kernels (GPU_kernel.cu:74-233) and TBB loops
(BimocqSolver2D.cpp:93-123).

Control flow: the CFL substep loops are `lax.while_loop`s over whole position
arrays (trace count is data-dependent, shapes static) — mirroring
GPU_kernel.cu:92-125 / Mapping.cpp:13-20 without host round-trips.

Documented deviations from the reference (intent preserved):
* 2D solveODE's per-point adaptive Richardson halving (BimocqSolver2D.cpp:21-43)
  is replaced by uniform CFL substepping (the 3D reference's own scheme,
  GPU_kernel.cu:92-125) — data-dependent per-point loop depth is hostile to
  SIMD/XLA and the substepped tracer is the same order of accuracy.
* DMC's |a|<1e-4 fallback uses explicit Euler (the 3D kernel's choice,
  GPU_kernel.cu:194-196) rather than 2D's recursive solveODE call.
* The 3D MacCormack clamp kernel writes through a scatter at the *backtraced*
  cell and floors world coordinates without dividing by h
  (GPU_kernel.cu:892-950) — an evident defect making it a near-no-op; we
  implement the intended gather-style clamp (the 2D semantics,
  BimocqSolver2D.cpp:276-295).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from gpufluidsimulation_tpu.core import interp

# ---------------------------------------------------------------------------
# RK3 tracing (Ralston's third-order scheme, GPU_kernel.cu:74-90)
# ---------------------------------------------------------------------------


def trace_rk3_3d(u, v, w, h, dt, px, py, pz, lo=1.0, hi=1.0, packed=None):
    ni, nj, nk = v.shape[0], u.shape[1], u.shape[2]
    c1, c2, c3 = 2.0 / 9.0 * dt, 3.0 / 9.0 * dt, 4.0 / 9.0 * dt
    u1, v1, w1 = interp.mac_velocity_3d(u, v, w, px, py, pz, h, packed)
    m1x, m1y, m1z = px + 0.5 * dt * u1, py + 0.5 * dt * v1, pz + 0.5 * dt * w1
    u2, v2, w2 = interp.mac_velocity_3d(u, v, w, m1x, m1y, m1z, h, packed)
    m2x, m2y, m2z = px + 0.75 * dt * u2, py + 0.75 * dt * v2, pz + 0.75 * dt * w2
    u3, v3, w3 = interp.mac_velocity_3d(u, v, w, m2x, m2y, m2z, h, packed)
    ox = px + c1 * u1 + c2 * u2 + c3 * u3
    oy = py + c1 * v1 + c2 * v2 + c3 * v3
    oz = pz + c1 * w1 + c2 * w2 + c3 * w3
    return interp.clamp_pos_3d(ox, oy, oz, h, ni, nj, nk, lo, hi)


def trace_rk3_2d(u, v, h, dt, px, py):
    """2D RK3 with the reference's 0.001h clamp (BimocqSolver2D.cpp:16-17)."""
    ni, nj = v.shape[0], u.shape[1]
    c1, c2, c3 = 2.0 / 9.0 * dt, 3.0 / 9.0 * dt, 4.0 / 9.0 * dt
    u1, v1 = interp.mac_velocity_2d_lattice(u, v, px, py, h)
    m1x, m1y = px + 0.5 * dt * u1, py + 0.5 * dt * v1
    u2, v2 = interp.mac_velocity_2d_lattice(u, v, m1x, m1y, h)
    m2x, m2y = px + 0.75 * dt * u2, py + 0.75 * dt * v2
    u3, v3 = interp.mac_velocity_2d_lattice(u, v, m2x, m2y, h)
    ox = px + c1 * u1 + c2 * u2 + c3 * u3
    oy = py + c1 * v1 + c2 * v2 + c3 * v3
    return interp.clamp_pos_2d(ox, oy, h, ni, nj, eps=0.001)


def _substepped(step_fn, cfldt, dt, pos):
    """Run `step_fn(substep_signed, pos)` until |dt| is covered (trace()).

    Equivalent to GPU_kernel.cu:92-125: fixed substep = cfldt, last partial.
    """
    total = jnp.abs(dt)
    sign = jnp.where(dt >= 0, 1.0, -1.0).astype(jnp.float32)
    cfldt = jnp.maximum(jnp.asarray(cfldt, jnp.float32), 1e-30)

    def cond(carry):
        return carry[0] < total

    def body(carry):
        t, p = carry
        sub = jnp.minimum(cfldt, total - t)
        return (t + sub, step_fn(sign * sub, p))

    _, out = lax.while_loop(cond, body, (jnp.float32(0.0), pos))
    return out


def trace_3d(u, v, w, h, cfldt, dt, px, py, pz, packed=None,
             from_identity=False, gate_nx=None, k1=None,
             node_off=(0.0, 0.0, 0.0)):
    # pack the MAC triplet once for the whole substep loop (up to 9
    # window-sampler calls share it); callers tracing several fields in the
    # same velocity pass their own pack
    from gpufluidsimulation_tpu import config as _cfg

    if packed is None and px.ndim == 3:
        packed = interp.mac_pack_3d(u, v, w, px.shape)
    if (
        px.ndim == 3
        and packed is not None
        and _cfg.use_fast_interp()
        and _cfg.interp_rr() <= 2
    ):
        # fused path: one window kernel per substep evaluates all three RK3
        # stages (vs 3 multi-channel launches + position round-trips).
        # from_identity (per-frame-reinit: the positions ARE the lattice)
        # additionally peels substep 1 onto a static-origin kernel whose
        # stage-1 velocity is this cell-centered MAC average — the
        # positions arrays never materialize for it.
        from gpufluidsimulation_tpu.ops import interp_fast

        if from_identity and k1 is None:
            # cell-lattice stage-1 velocity (the map-march case); staggered
            # identity starts pass their kind's k1 via mac_at_nodes_3d
            k1 = jnp.stack([
                0.5 * (u[:-1] + u[1:]),
                0.5 * (v[:, :-1] + v[:, 1:]),
                0.5 * (w[:, :, :-1] + w[:, :, 1:]),
            ])
        ni, nj, nk = v.shape[0], u.shape[1], u.shape[2]
        return interp_fast.trace_rk3_fused(
            packed, px, py, pz, h, cfldt, dt, interp._MAC_OFFS, (ni, nj, nk),
            Rr=_cfg.interp_rr(), interpret=_cfg.interp_interpret(),
            from_identity=from_identity, k1=k1, gate_nx=gate_nx,
            node_off=node_off,
        )

    def step(sdt, p):
        return trace_rk3_3d(u, v, w, h, sdt, *p, packed=packed)

    return _substepped(step, cfldt, dt, (px, py, pz))


def trace_2d(u, v, h, cfldt, dt, px, py):
    def step(sdt, p):
        return trace_rk3_2d(u, v, h, sdt, *p)

    return _substepped(step, cfldt, dt, (px, py))


# ---------------------------------------------------------------------------
# Semi-Lagrangian advection
# ---------------------------------------------------------------------------


def _cropped_positions(grid, kind):
    """Node positions of `kind` cropped to the cell-block lattice.

    The staggered axis's LAST face plane sits outside the semilag update
    band (semilag_kernel guard `i < buffer-2-dim`, GPU_kernel.cu:222), so
    tracing and sampling it is dead work — and on the z axis the extra
    plane forces the padded tiers from 256 to 384 lanes (+50% blocks in
    every w-kind trace launch). Returns (px, py, pz, ax): positions
    cropped along the staggered axis `ax` (None for cell kinds).

    Known single-plane deviation: the reference's clamp_extrema_kernel has
    NO such band guard — it runs over the full staggered buffer
    (BimocqGPUSolver.cpp:277-279 passes CellNumberX+1 etc.;
    GPU_kernel.cu:899). maccormack_multi_3d therefore keeps `src` at that
    last face plane where the reference would clamp it. The plane is
    overwritten by the subsequent boundary enforcement in every solver
    step, so the deviation is not observable in stepped fields; it is
    documented here rather than 'fixed' because clamping it would force
    the 384-lane padded tier back onto every staggered trace launch."""
    px, py, pz = grid.node_coords(kind)
    dim = grid.dim_of(kind)
    if not any(dim):
        return px, py, pz, None
    ax = dim.index(1)
    sl = [slice(None)] * 3
    sl[ax] = slice(0, px.shape[ax] - 1)
    sl = tuple(sl)
    return px[sl], py[sl], pz[sl], ax


def _pad_plane(out_crop, src, ax):
    """Re-expand a cropped-lattice result to the kind lattice: the dropped
    face plane keeps `src` (it is outside the update band)."""
    if ax is None:
        return out_crop
    sl = [slice(None)] * 3
    sl[ax] = slice(src.shape[ax] - 1, src.shape[ax])
    return jnp.concatenate([out_crop, src[tuple(sl)]], axis=ax)


def semilag_3d(grid, kind, field_src, u, v, w, cfldt, dt, packed=None):
    """Trace each node of `kind`'s lattice by `dt` (signed; pass -dt to
    backtrace) and sample field_src there. Nodes outside the reference's
    update band (semilag_kernel guard, GPU_kernel.cu:222) keep src values.
    """
    return semilag_multi_3d(grid, kind, [field_src], u, v, w, cfldt, dt,
                            packed)[0]


def mac_at_nodes_3d(grid, kind, u, v, w):
    """Stage-1 MAC velocity AT the cropped node lattice of `kind` — the
    identity-peel k1 for the semilag-family traces (which always start
    from the lattice). Exact field values where a node coincides with a
    component's own lattice (e.g. the u component at u nodes), 2/4-point
    staggered averages elsewhere (edge-clamped at the domain boundary —
    boundary nodes are outside the semilag update band anyway). Returns
    a stacked (3, ni, nj, nk) array."""
    ni, nj, nk = grid.ni, grid.nj, grid.nk
    dim = grid.dim_of(kind)

    def comp(f, fdim):
        x = f
        for axis in range(3):
            n_t = (ni, nj, nk)[axis]
            node_half = dim[axis] == 1   # kind node at -0.5 on this axis
            f_half = fdim == axis        # component node at -0.5 here
            sl0 = [slice(None)] * 3
            sl1 = [slice(None)] * 3
            sl0[axis] = slice(0, n_t)
            sl1[axis] = slice(1, n_t + 1)
            if node_half == f_half:      # aligned lattices: exact value
                x = x[tuple(sl0)]
            elif f_half:                 # node integer, field at -0.5
                x = 0.5 * (x[tuple(sl0)] + x[tuple(sl1)])
            else:                        # node at -0.5, field integer
                pads = [(0, 0)] * 3
                pads[axis] = (1, 0)
                xp = jnp.pad(x, pads, mode="edge")
                x = 0.5 * (xp[tuple(sl0)] + xp[tuple(sl1)])
        return x

    return jnp.stack([comp(u, 0), comp(v, 1), comp(w, 2)])


def semilag_multi_3d(grid, kind, fields, u, v, w, cfldt, dt, packed=None):
    """semilag_3d over several same-kind fields with ONE shared
    CFL-substepped trace (the positions depend only on `kind`, not the
    field): rho and T in the MacCormack/reflection/semilag steps used to
    trace the identical cell lattice once per field — the trace loop is
    ~20x the cost of the per-field sample launch it feeds.

    The trace always starts AT the lattice, so on the fast path its first
    substep rides the identity-peel kernel (static window origins, no
    origins prepass, no position arrays; stage-1 velocity precomputed by
    mac_at_nodes_3d) — the same peel the BiMocq forward march uses under
    per-frame reinit, now for every kind (r5)."""
    from gpufluidsimulation_tpu import config as _cfg

    px, py, pz, ax = _cropped_positions(grid, kind)
    ident_kw = {}
    if (_SEMILAG_PEEL and px.ndim == 3 and _cfg.use_fast_interp()
            and _cfg.interp_rr() <= 2):
        ident_kw = dict(
            from_identity=True,
            k1=mac_at_nodes_3d(grid, kind, u, v, w),
            node_off=tuple(-0.5 * d for d in grid.dim_of(kind)),
        )
    bx, by, bz = trace_3d(u, v, w, grid.h, cfldt, dt, px, py, pz, packed,
                          **ident_kw)
    off = grid.off_of(kind)
    mask = grid.interior_mask(kind, lo=2, hi=3, hi_add_dim=True)
    return [
        jnp.where(mask,
                  _pad_plane(
                      interp.sample3_lattice(f, bx, by, bz, grid.h, off,
                                             values=True), f, ax),
                  f)
        for f in fields
    ]


def maccormack_multi_3d(grid, kind, srcs, u, v, w, cfldt, dt, packed=None):
    """maccormack_3d over several same-kind fields sharing every trace:
    one forward trace, one backward trace, and one two-stage clamp
    backtrace serve all fields (maccormack_3d re-derived all three per
    field). Staggered kinds run the clamp chain on the cropped cell-block
    lattice (_cropped_positions) — the dropped face plane keeps src, the
    same out-of-band convention as the semilag stages."""
    from gpufluidsimulation_tpu import config as _cfg

    px, py, pz, ax = _cropped_positions(grid, kind)
    if packed is None and _cfg.use_fast_interp():
        packed = interp.mac_pack_3d(u, v, w, px.shape)
    fwds = semilag_multi_3d(grid, kind, srcs, u, v, w, cfldt, -dt, packed)
    backs = semilag_multi_3d(grid, kind, fwds, u, v, w, cfldt, dt, packed)

    h = grid.h
    off = grid.off_of(kind)
    crop = tuple(slice(0, s) for s in px.shape)
    # shared two-stage midpoint backtrace (clamp_extrema_kernel,
    # GPU_kernel.cu:900-911). Stage 1 samples AT the kind lattice, where
    # the MAC bilinear degenerates to the exact staggered average — on
    # the fast path that is mac_at_nodes_3d (an XLA stencil, no window
    # launch); the exact path keeps the gather sampler byte-stable
    # against the oracles.
    if _cfg.use_fast_interp():
        k1c = mac_at_nodes_3d(grid, kind, u, v, w)
        u1, v1, w1 = k1c[0], k1c[1], k1c[2]
    else:
        u1, v1, w1 = interp.mac_velocity_3d(u, v, w, px, py, pz, h, packed)
    mx_, my_, mz_ = px - 0.5 * dt * u1, py - 0.5 * dt * v1, pz - 0.5 * dt * w1
    u2, v2, w2 = interp.mac_velocity_3d(u, v, w, mx_, my_, mz_, h, packed)
    bx, by, bz = px - dt * u2, py - dt * v2, pz - dt * w2

    outs = []
    for src, fwd, back in zip(srcs, fwds, backs):
        dst = (fwd + 0.5 * (src - back))[crop]
        if _cfg.use_fast_interp():
            from gpufluidsimulation_tpu.ops import interp_fast

            mn, mx = interp_fast.minmax3_fast(
                src, bx, by, bz, h, off, Rr=_cfg.interp_rr(),
                interpret=_cfg.interp_interpret(),
            )
        else:
            gx, gy, gz = bx / h - off[0], by / h - off[1], bz / h - off[2]
            i0 = jnp.floor(gx).astype(jnp.int32)
            j0 = jnp.floor(gy).astype(jnp.int32)
            k0 = jnp.floor(gz).astype(jnp.int32)
            corners = interp._gather8_3d(src, i0, j0, k0)
            mn = jnp.min(corners, axis=0)
            mx = jnp.max(corners, axis=0)
        fallback = interp.sample3_lattice(src, bx, by, bz, h, off,
                                          values=True)
        clamped = jnp.where((dst < mn) | (dst > mx), fallback, dst)
        outs.append(_pad_plane(clamped, src, ax))
    return outs


# ---------------------------------------------------------------------------
# Multi-kind fused traces (round-5): after _cropped_positions every kind's
# lattice shares the cell-block shape (ni, nj, nk), so the backtraces of
# several kinds concatenate along x into ONE fused-RK3 launch — one
# while_loop, one origins prepass and one rim pad per substep instead of
# one per kind. Positions are absolute world coordinates, so the window
# kernel needs no notion of which section a block belongs to; sections are
# individually padded to the BX block multiple (edge-replicated rows trace
# real in-domain positions and are sliced away).
#
# MEASURED NEGATIVE (r5, 256^3, CFL 2.4): the concatenated launch saves
# nothing — 4x per-kind traces 248.3 ms vs 1x concat 250.8 ms; full
# semilag stage 267.6 vs 273.6 (the concat/slice materializations cost
# more than the launches save). The fused RK3 kernel is COMPUTE-bound
# (~20 ms per kind-substep of tap FMAs), so launch-count fusion has no
# lever arm. The concat path is therefore OFF by default
# (GFS_MULTIKIND=1 to enable); the grouped API below stays because it
# reads better at call sites and keeps the measured experiment pinned by
# tests/test_multikind.py.
# ---------------------------------------------------------------------------

_MULTIKIND = os.environ.get("GFS_MULTIKIND", "0") not in ("0", "")

# identity-peel for the semilag-family traces (they always start AT the
# lattice): substep 1 rides the static-origin peel kernel with a per-kind
# precomputed stage-1 velocity (mac_at_nodes_3d). Default on;
# GFS_SEMILAG_PEEL=0 restores the r4 all-substeps-prepass form. The
# concat (multikind) path cannot peel — its sections carry different
# node offsets — so peel-vs-concat comparisons disable this knob.
_SEMILAG_PEEL = os.environ.get("GFS_SEMILAG_PEEL", "1") not in ("0", "")


def _concat_kind_positions(grid, kinds):
    from gpufluidsimulation_tpu.ops import interp_fast

    pos, axes = [], []
    for kind in kinds:
        px, py, pz, ax = _cropped_positions(grid, kind)
        pos.append((px, py, pz))
        axes.append(ax)
    ni = pos[0][0].shape[0]
    sec = interp_fast._ceil(ni, interp_fast.BX)
    pads = ((0, sec - ni), (0, 0), (0, 0))

    def cat(i):
        parts = [jnp.pad(p[i], pads, mode="edge") if sec != ni else p[i]
                 for p in pos]
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else parts[0]

    return (cat(0), cat(1), cat(2)), axes, sec, ni


def _kinds_fast(grid, groups):
    from gpufluidsimulation_tpu import config as _cfg

    return (_MULTIKIND and len(groups) > 1 and _cfg.use_fast_interp()
            and _cfg.interp_rr() <= 2)


def _union_pack(grid, u, v, w):
    return interp.mac_pack_3d(
        u, v, w, (grid.ni + 1, grid.nj + 1, grid.nk + 1))


def semilag_kinds_3d(grid, groups, u, v, w, cfldt, dt, packed=None):
    """semilag_multi_3d over several (kind, [fields]) groups with ONE
    fused multi-kind trace serving every kind's backtrace (see the
    section comment above). Returns one field list per group. Off the
    fast path (or single group) this is exactly the per-kind form."""
    if not _kinds_fast(grid, groups):
        return [semilag_multi_3d(grid, k, fs, u, v, w, cfldt, dt, packed)
                for k, fs in groups]
    if packed is None:
        packed = _union_pack(grid, u, v, w)
    kinds = [k for k, _ in groups]
    (cx, cy, cz), axes, sec, ni = _concat_kind_positions(grid, kinds)
    bx, by, bz = trace_3d(u, v, w, grid.h, cfldt, dt, cx, cy, cz, packed,
                          gate_nx=sec)
    outs = []
    for g_idx, ((kind, fields), ax) in enumerate(zip(groups, axes)):
        sl = slice(g_idx * sec, g_idx * sec + ni)
        kbx, kby, kbz = bx[sl], by[sl], bz[sl]
        off = grid.off_of(kind)
        mask = grid.interior_mask(kind, lo=2, hi=3, hi_add_dim=True)
        outs.append([
            jnp.where(mask,
                      _pad_plane(
                          interp.sample3_lattice(f, kbx, kby, kbz, grid.h,
                                                 off, values=True), f, ax),
                      f)
            for f in fields
        ])
    return outs


def maccormack_kinds_3d(grid, groups, u, v, w, cfldt, dt, packed=None):
    """maccormack_multi_3d over several (kind, [fields], clamp) groups with
    the forward and backward semilag stages each running as ONE fused
    multi-kind trace. `clamp` selects the reference's two clamp variants:
    'trace' = backtraced-corner min/max with semilag fallback (the scalar
    clamp, clamp_extrema_kernel); 'neighborhood' = 27-point neighborhood
    clamp (the velocity clamp, clampExtrema_kernel)."""
    from gpufluidsimulation_tpu import config as _cfg

    sgroups = [(k, fs) for k, fs, _ in groups]
    if not _kinds_fast(grid, sgroups):
        outs = []
        for kind, fields, cl in groups:
            if cl == "trace":
                outs.append(maccormack_multi_3d(grid, kind, fields, u, v, w,
                                                cfldt, dt, packed))
            else:
                fw = semilag_multi_3d(grid, kind, fields, u, v, w, cfldt,
                                      -dt, packed)
                bk = semilag_multi_3d(grid, kind, fw, u, v, w, cfldt, dt,
                                      packed)
                outs.append([
                    clamp_extrema_neighborhood(s, f + 0.5 * (s - b))
                    for s, f, b in zip(fields, fw, bk)
                ])
        return outs
    if packed is None:
        packed = _union_pack(grid, u, v, w)
    fwds = semilag_kinds_3d(grid, sgroups, u, v, w, cfldt, -dt, packed)
    backs = semilag_kinds_3d(grid, [(k, fw) for (k, _), fw
                                    in zip(sgroups, fwds)],
                             u, v, w, cfldt, dt, packed)
    h = grid.h
    outs = []
    for (kind, srcs, cl), fwd_g, back_g in zip(groups, fwds, backs):
        if cl == "neighborhood":
            outs.append([
                clamp_extrema_neighborhood(s, f + 0.5 * (s - b))
                for s, f, b in zip(srcs, fwd_g, back_g)
            ])
            continue
        # trace clamp: shared two-stage midpoint backtrace per kind
        px, py, pz, ax = _cropped_positions(grid, kind)
        off = grid.off_of(kind)
        crop = tuple(slice(0, s) for s in px.shape)
        u1, v1, w1 = interp.mac_velocity_3d(u, v, w, px, py, pz, h, packed)
        mx_, my_, mz_ = (px - 0.5 * dt * u1, py - 0.5 * dt * v1,
                         pz - 0.5 * dt * w1)
        u2, v2, w2 = interp.mac_velocity_3d(u, v, w, mx_, my_, mz_, h,
                                            packed)
        bx, by, bz = px - dt * u2, py - dt * v2, pz - dt * w2
        kouts = []
        for src, fwd, back in zip(srcs, fwd_g, back_g):
            dst = (fwd + 0.5 * (src - back))[crop]
            from gpufluidsimulation_tpu.ops import interp_fast

            mn, mx = interp_fast.minmax3_fast(
                src, bx, by, bz, h, off, Rr=_cfg.interp_rr(),
                interpret=_cfg.interp_interpret(),
            )
            fallback = interp.sample3_lattice(src, bx, by, bz, h, off,
                                              values=True)
            clamped = jnp.where((dst < mn) | (dst > mx), fallback, dst)
            kouts.append(_pad_plane(clamped, src, ax))
        outs.append(kouts)
    return outs


def semilag_2d(grid, kind, field_src, u, v, w_unused, cfldt, dt):
    """2D semiLagAdvect (BimocqSolver2D.cpp:110-123): traces with -dt."""
    del w_unused
    px, py = grid.node_coords(kind)
    bx, by = trace_2d(u, v, grid.h, cfldt, -dt, px, py)
    off = grid.off_of(kind)
    return interp.sample2_lattice(field_src, bx, by, grid.h, off, values=True)


# ---------------------------------------------------------------------------
# Extrema clamping
# ---------------------------------------------------------------------------


def _window_minmax(x, ndim):
    window = (3,) * ndim
    strides = (1,) * ndim
    mx = lax.reduce_window(x, -jnp.inf, lax.max, window, strides, "SAME")
    mn = lax.reduce_window(x, jnp.inf, lax.min, window, strides, "SAME")
    return mn, mx


def clamp_extrema_neighborhood(before, after):
    """27-point (3D) / 9-point (2D) neighborhood clamp.

    3D: clampExtrema_kernel (GPU_kernel.cu:146-167), interior-only update.
    2D: clampExtrema2 (BimocqSolver2D.cpp:1261-1274) updates every node but
    initializes min at 1e6 / max at 0 — we reproduce the mathematically
    intended pure min/max window (identical in interior for typical fields).
    """
    ndim = before.ndim
    mn, mx = _window_minmax(before, ndim)
    clamped = jnp.clip(after, mn, mx)
    if ndim == 3:
        interior = jnp.zeros(before.shape, bool).at[1:-1, 1:-1, 1:-1].set(True)
        return jnp.where(interior, clamped, after)
    return clamped


def _maccormack_clamp_2d(grid, kind, src, dst, u, v, cfldt, dt):
    """Corner min/max fallback clamp of solveMaccormack (BimocqSolver2D.cpp:282-295)."""
    h = grid.h
    off = grid.off_of(kind)
    px, py = grid.node_coords(kind)
    bx, by = trace_2d(u, v, h, cfldt, -dt, px, py)
    gx = bx / h - off[0]
    gy = by / h - off[1]
    i0 = jnp.floor(gx).astype(jnp.int32)
    j0 = jnp.floor(gy).astype(jnp.int32)
    v00 = interp._gather2(src, i0, j0)
    v10 = interp._gather2(src, i0 + 1, j0)
    v01 = interp._gather2(src, i0, j0 + 1)
    v11 = interp._gather2(src, i0 + 1, j0 + 1)
    mn = jnp.minimum(jnp.minimum(v00, v10), jnp.minimum(v01, v11))
    mx = jnp.maximum(jnp.maximum(v00, v10), jnp.maximum(v01, v11))
    fallback = interp.sample2_lattice(src, bx, by, h, off, values=True)
    return jnp.where((dst < mn) | (dst > mx), fallback, dst)


def maccormack_2d(grid, kind, src, u, v, cfldt, dt):
    """solveMaccormack (BimocqSolver2D.cpp:272-296)."""
    fwd = semilag_2d(grid, kind, src, u, v, None, cfldt, dt)
    back = semilag_2d(grid, kind, fwd, u, v, None, cfldt, -dt)
    dst = fwd + 0.5 * (src - back)
    return _maccormack_clamp_2d(grid, kind, src, dst, u, v, cfldt, dt)


def bfecc_2d(grid, kind, src, u, v, cfldt, dt):
    """solveBFECC (BimocqSolver2D.cpp:298-328)."""
    fwd = semilag_2d(grid, kind, src, u, v, None, cfldt, dt)
    back = semilag_2d(grid, kind, fwd, u, v, None, cfldt, -dt)
    mid = 0.5 * (3.0 * src - back)
    dst = semilag_2d(grid, kind, mid, u, v, None, cfldt, dt)
    return _maccormack_clamp_2d(grid, kind, src, dst, u, v, cfldt, dt)


def maccormack_3d(grid, kind, src, u, v, w, cfldt, dt, packed=None):
    """3D MacCormack: forward/backward semilag + 0.5 correction + clamp.

    Orchestration of BimocqGPUSolver::advanceReflection scalar blocks
    (BimocqGPUSolver.cpp:238-247): tmp = SL(src, -dt); aux = SL(tmp, +dt);
    tmp += 0.5*(src - aux); clamp. Here SL(x, -dt) backtraces. The clamp is
    the intended gather-style one (see module docstring).
    """
    return maccormack_multi_3d(grid, kind, [src], u, v, w, cfldt, dt,
                               packed)[0]


# ---------------------------------------------------------------------------
# DMC backward-map step (GPU_kernel.cu:169-204, BimocqSolver2D.cpp:45-91)
# ---------------------------------------------------------------------------


def _dmc_newpos(pos, vel, a, substep):
    safe_a = jnp.where(jnp.abs(a) > 1e-4, a, 1.0)
    exp_step = pos - (1.0 - jnp.exp(-safe_a * substep)) * vel / safe_a
    euler_step = pos - vel * substep
    return jnp.where(jnp.abs(a) > 1e-4, exp_step, euler_step)


def dmc_displacements_3d(grid, u, v, w, substep):
    """Signed DMC exponential-step displacements (grid cells) at the cell
    lattice for one substep — the exact math of the fused DMC kernel
    (interp_fast._kernel_dmc) and of dmc_backward_step_3d, exposed for the
    runtime displacement-contract monitor (smoke3d._interp_overflow_check)."""
    vel_u, vel_v, vel_w = interp.mac_velocity_at_c_3d(u, v, w)
    sx = vel_u > 0
    sy = vel_v > 0
    sz = vel_w > 0

    def upwind8(f):
        nx_, ny_, nz_ = f.shape
        fp = jnp.pad(f, 1, mode="edge")
        out = jnp.zeros_like(f)
        for a in (0, 2):
            ma = sx if a == 0 else ~sx
            for b_ in (0, 2):
                mb = ma & (sy if b_ == 0 else ~sy)
                for c_ in (0, 2):
                    mc = mb & (sz if c_ == 0 else ~sz)
                    corner = jax.lax.slice(
                        fp, (a, b_, c_), (a + nx_, b_ + ny_, c_ + nz_))
                    out = out + jnp.where(mc, corner, 0.0)
        return out

    sh = substep / grid.h
    outs = []
    for velc, s_ in ((vel_u, sx), (vel_v, sy), (vel_w, sz)):
        t = upwind8(velc)
        sgn = jnp.where(s_, 1.0, -1.0)
        du = velc - t
        q = du * sgn * sh
        safe = jnp.abs(du) > 1e-4 * grid.h
        denom = jnp.where(safe, du * sgn, 1.0)
        outs.append(
            jnp.where(safe, (1.0 - jnp.exp(-q)) * velc / denom, velc * sh))
    return tuple(outs)


def dmc_backward_step_3d(grid, u, v, w, map_x, map_y, map_z, substep):
    """One DMC substep of the 3D backward map (DMC_backward_kernel).

    Nodes are cell centers at i*h; the upwind neighbor is +-h per axis;
    a = du/dx finite difference; gather the old map at the new position.
    Interior band i in [2, n-3]; boundary keeps the old map.

    Fast path: the velocity at the center lattice and at its +-1-cell
    upwind taps are STATIC stencils (face averages + sign-selected shifts)
    — only the final map gather at the DMC-traced position needs the
    windowed-DMA kernel. Values agree with the generic sampler everywhere
    the interior band uses them.
    """
    from gpufluidsimulation_tpu import config as _cfg

    h = grid.h
    px, py, pz = grid.node_coords("c")
    if _cfg.use_fast_interp():
        vel_u, vel_v, vel_w = interp.mac_velocity_at_c_3d(u, v, w)
        sx = vel_u > 0
        sy = vel_v > 0
        sz = vel_w > 0

        def upwind(f):
            # pad ONCE + 8 corner slices of the one padded array (single
            # fused select-sum pass; the previous nested pad-shifts
            # materialized every intermediate)
            nx_, ny_, nz_ = f.shape
            fp = jnp.pad(f, 1, mode="edge")
            out = jnp.zeros_like(f)
            for a in (0, 2):
                ma = sx if a == 0 else ~sx
                for b_ in (0, 2):
                    mb = ma & (sy if b_ == 0 else ~sy)
                    for c_ in (0, 2):
                        mc = mb & (sz if c_ == 0 else ~sz)
                        corner = jax.lax.slice(
                            fp, (a, b_, c_), (a + nx_, b_ + ny_, c_ + nz_)
                        )
                        out = out + jnp.where(mc, corner, 0.0)
            return out

        tu, tv, tw = upwind(vel_u), upwind(vel_v), upwind(vel_w)
        tx = jnp.where(sx, px - h, px + h)
        ty = jnp.where(sy, py - h, py + h)
        tz = jnp.where(sz, pz - h, pz + h)
    else:
        vel_u, vel_v, vel_w = interp.mac_velocity_3d(u, v, w, px, py, pz, h)
        tx = jnp.where(vel_u > 0, px - h, px + h)
        ty = jnp.where(vel_v > 0, py - h, py + h)
        tz = jnp.where(vel_w > 0, pz - h, pz + h)
        tu, tv, tw = interp.mac_velocity_3d(u, v, w, tx, ty, tz, h)
    ax = (vel_u - tu) / (px - tx)
    ay = (vel_v - tv) / (py - ty)
    az = (vel_w - tw) / (pz - tz)
    nx_ = _dmc_newpos(px, vel_u, ax, substep)
    ny_ = _dmc_newpos(py, vel_v, ay, substep)
    nz_ = _dmc_newpos(pz, vel_w, az, substep)
    off = (0.0, 0.0, 0.0)
    if _cfg.use_fast_interp():
        # the three map channels share positions: ONE 3-channel window
        # launch instead of three single-channel ones
        from gpufluidsimulation_tpu.ops import interp_fast

        out = interp_fast.sample3_multi(
            jnp.stack([map_x, map_y, map_z]), nx_, ny_, nz_, h, (off,) * 3,
            Rr=_cfg.interp_rr(), interpret=_cfg.interp_interpret(),
        )
        out_x, out_y, out_z = out[0], out[1], out[2]
    else:
        out_x = interp.sample3_lattice(map_x, nx_, ny_, nz_, h, off)
        out_y = interp.sample3_lattice(map_y, nx_, ny_, nz_, h, off)
        out_z = interp.sample3_lattice(map_z, nx_, ny_, nz_, h, off)
    mask = grid.interior_mask("c", lo=2, hi=3)
    return (
        jnp.where(mask, out_x, map_x),
        jnp.where(mask, out_y, map_y),
        jnp.where(mask, out_z, map_z),
    )


def dmc_backward_step_2d(grid, u, v, map_x, map_y, substep):
    """2D DMC substep (semiLagAdvectDMC, BimocqSolver2D.cpp:45-107).

    Nodes are cell centers at (i+0.5)h; out-of-range map samples use
    boundedAt clamping; the traced position is clamped to [h, L-h].
    """
    h = grid.h
    ni, nj = grid.ni, grid.nj
    px, py = grid.node_coords("c")
    vel_u, vel_v = interp.mac_velocity_2d_lattice(u, v, px, py, h)
    tx = jnp.where(vel_u > 0, px - h, px + h)
    ty = jnp.where(vel_v > 0, py - h, py + h)
    tu, tv = interp.mac_velocity_2d_lattice(u, v, tx, ty, h)
    ax = (vel_u - tu) / (px - tx)
    ay = (vel_v - tv) / (py - ty)
    nx_ = _dmc_newpos(px, vel_u, ax, substep)
    ny_ = _dmc_newpos(py, vel_v, ay, substep)
    nx_, ny_ = interp.clamp_pos_2d(nx_, ny_, h, ni, nj)
    out_x = interp.sample2_lattice(map_x, nx_, ny_, h, grid.OFF_C)
    out_y = interp.sample2_lattice(map_y, nx_, ny_, h, grid.OFF_C)
    return out_x, out_y


def dmc_backward_identity_3d(grid, u, v, w, substep):
    """One DMC substep applied to the IDENTITY backward map, in pure XLA.

    sample(identity, newpos) is just newpos with boundedAt clamping to the
    lattice-value range (linear interpolation of a linear ramp; edge
    replication clamps to the first/last node's value), so the map-window
    gather of the fused DMC kernel collapses to a clip — no map pad, no
    window DMA, no launch. Used to peel the first substep of the
    per-frame-reinit ('always') mode, where the backward map is statically
    identity at step entry (BimocqGPUSolver.cpp:218-229 resets both maps
    every frame). The 3D cell lattice sits at i*h (BimocqSolver.cpp:13-15),
    so the identity values span [0, (n-1)h] per axis."""
    h = grid.h
    du, dv, dw = dmc_displacements_3d(grid, u, v, w, substep)  # grid cells
    px, py, pz = grid.node_coords("c")
    nx_ = jnp.clip(px - du * h, 0.0, (grid.ni - 1) * h)
    ny_ = jnp.clip(py - dv * h, 0.0, (grid.nj - 1) * h)
    nz_ = jnp.clip(pz - dw * h, 0.0, (grid.nk - 1) * h)
    mask = grid.interior_mask("c", lo=2, hi=3)
    return (
        jnp.where(mask, nx_, px),
        jnp.where(mask, ny_, py),
        jnp.where(mask, nz_, pz),
    )


def update_backward_map_3d(grid, u, v, w, map_xyz, cfldt, dt, packed=None,
                           from_identity=False):
    """CFL-substepped backward-map update (Mapping.cpp:7-24).

    Fast path: each substep is ONE fused window kernel
    (interp_fast.dmc_substep_fast) — static window origins, in-VMEM
    center/upwind velocity stencils, exponential step and 3-channel map
    gather, no per-substep prepass or intermediate HBM passes. Pass
    `packed` (interp.mac_pack_3d onto a lattice covering shape_c) to share
    the MAC pack with the forward-map trace. `from_identity=True` asserts
    the incoming map is the identity (per-frame-reinit mode): the first
    substep then runs gather-free (dmc_backward_identity_3d)."""
    from gpufluidsimulation_tpu import config as _cfg

    if _cfg.use_fast_interp() and _cfg.interp_rr() <= 2:
        from gpufluidsimulation_tpu.ops import interp_fast

        grid_n = (grid.ni, grid.nj, grid.nk)
        mac_packed = (packed if packed is not None
                      else interp.mac_pack_3d(u, v, w, grid.shape_c))
        rr = _cfg.interp_rr()
        # NOTE (measured, PERF.md): carrying the PADDED maps across
        # substeps (interp_fast.dmc_substep_fast_carry — correct because
        # the interior band freezes the edge-replication ring) LOSES ~6 ms
        # at 256^3: XLA will not alias the dynamic_update_slice around the
        # pallas custom call, so the "in-place" interior write becomes a
        # 10 ms full-buffer copy, more than the ~7.7 ms of per-substep pads
        # it replaces. Per-substep pads stay.

        def cond(carry):
            return carry[0] < dt

        def body(carry):
            t, m, cnt = carry
            sub = jnp.minimum(cfldt, dt - t)
            m2, c2 = interp_fast.dmc_substep_fast(
                mac_packed, m, sub, grid.h, grid_n,
                Rr=rr, interpret=_cfg.interp_interpret(),
                want_count=True,
            )
            return (t + sub, m2, cnt + c2)

        if from_identity:
            # the identity-map substep is gather-free (a clip) — it cannot
            # violate the window contract, so it contributes no count
            sub0 = jnp.minimum(cfldt, dt)
            m0 = dmc_backward_identity_3d(grid, u, v, w, sub0)
            carry0 = (sub0, jnp.stack(list(m0)), jnp.int32(0))
        else:
            carry0 = (jnp.float32(0.0), jnp.stack(list(map_xyz)),
                      jnp.int32(0))
        _, out, cnt = lax.while_loop(cond, body, carry0)
        # every in-kernel substep self-reports its displacement-contract
        # violations; surface the total through the frame's overflow sink
        if interp_fast.OVERFLOW_SINK is not None:
            interp_fast.OVERFLOW_SINK.append(cnt)
        return out[0], out[1], out[2]

    def cond(carry):
        return carry[0] < dt

    def body(carry):
        t, (mx, my, mz) = carry
        sub = jnp.minimum(cfldt, dt - t)
        return (t + sub, dmc_backward_step_3d(grid, u, v, w, mx, my, mz, sub))

    _, out = lax.while_loop(cond, body, (jnp.float32(0.0), map_xyz))
    return out


def update_backward_map_2d(grid, u, v, map_xy, cfldt, dt):
    """2D substepped backward-map update (BimocqSolver2D.cpp:1242-1259)."""

    def cond(carry):
        return carry[0] < dt

    def body(carry):
        t, (mx, my) = carry
        sub = jnp.minimum(cfldt, dt - t)
        return (t + sub, dmc_backward_step_2d(grid, u, v, mx, my, sub))

    _, out = lax.while_loop(cond, body, (jnp.float32(0.0), map_xy))
    return out


def update_forward_map_3d(grid, u, v, w, map_xyz, cfldt, dt, packed=None,
                          from_identity=False):
    """Forward-map march: X <- trace(X, +dt) (forward_kernel, GPU_kernel.cu:127-144).

    `from_identity=True` asserts the incoming map is the identity
    (per-frame-reinit mode): the fused-trace path then peels substep 1
    onto the static-origin identity kernel."""
    mx, my, mz = map_xyz
    ox, oy, oz = trace_3d(u, v, w, grid.h, cfldt, dt, mx, my, mz, packed,
                          from_identity=from_identity)
    mask = grid.interior_mask("c", lo=2, hi=3)
    return (
        jnp.where(mask, ox, mx),
        jnp.where(mask, oy, my),
        jnp.where(mask, oz, mz),
    )


def update_forward_map_2d(grid, u, v, map_xy, cfldt, dt):
    """2D forward-map march (updateForward, BimocqSolver2D.cpp:1228-1240)."""
    mx, my = map_xy
    ox, oy = trace_2d(u, v, grid.h, cfldt, dt, mx, my)
    ox, oy = interp.clamp_pos_2d(ox, oy, grid.h, grid.ni, grid.nj)
    return ox, oy
