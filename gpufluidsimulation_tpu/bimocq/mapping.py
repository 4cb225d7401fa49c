"""BiMocq bidirectional characteristic-mapping engine (TPU-native).

Implements the two-level mapping advection of Qu et al. 2019 as pure
functions over a `MappingState` pytree that lives permanently in HBM —
the device-resident analogue of `MapperBaseGPU` (bimocq3D/Mapping.cpp:276-447)
with the `MapperBase` host staging fabric (Mapping.cpp:7-236) deleted.

Kernel parity (all in bimocq3D/GPU_kernel.cu unless noted):
* advect_with_map_3d     <-> advect_kernel          (:312-374)
* double_advect_3d       <-> doubleAdvect_kernel    (:236-310)
* accumulate_3d          <-> cumulate_kernel        (:376-436)
* compensate_3d          <-> gpu_compensate_velocity/field orchestration
                             (:438-499, 640-682)
* estimate_distortion_3d <-> estimate_kernel + host max/sqrt
                             (:501-537, Mapping.cpp:91-118)
* reinitialize           <-> MapperBaseGPU::reinitializeMapping (Mapping.cpp:430-447)

2D equivalents mirror the hand-inlined loops of bimocq2D/BimocqSolver2D.cpp
(:727-1424) including the 5-point volume stencil w = [1/8 x4, 1/2] with
+-0.25h offsets and the per-loop interior guards.

Every sample point is evaluated with the 8-corner (2D: 4-corner) +-0.25h
volume average blended 50/50 with the center sample — the reference's
anti-aliasing of the pulled-back fields (GPU_kernel.cu:371,432,492).
"""

from __future__ import annotations

import contextlib
import os
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gpufluidsimulation_tpu.core import interp
from gpufluidsimulation_tpu.ops import advect

# 8-corner volume offsets (units of h), GPU_kernel.cu:243-247.
_VOL3 = [
    (0.25, 0.25, 0.25), (0.25, 0.25, -0.25), (0.25, -0.25, 0.25), (0.25, -0.25, -0.25),
    (-0.25, 0.25, 0.25), (-0.25, 0.25, -0.25), (-0.25, -0.25, 0.25), (-0.25, -0.25, -0.25),
]
# 2D 5-point stencil (BimocqSolver2D.cpp:738-745): 4 corners w=1/8 + center w=1/2.
_VOL2 = [(-0.25, -0.25), (0.25, -0.25), (-0.25, 0.25), (0.25, 0.25)]


@flax.struct.dataclass
class MappingState:
    """Forward/backward/backward-prev maps, stacked (D, ...) world coords."""

    fwd: jnp.ndarray
    bwd: jnp.ndarray
    bwd_prev: jnp.ndarray
    reinit_count: jnp.ndarray  # int32 scalar (MapperBaseGPU::TotalReinitCount)


def identity_map_3d(grid) -> jnp.ndarray:
    x, y, z = grid.node_coords("c")
    return jnp.stack([x, y, z])


def identity_map_2d(grid) -> jnp.ndarray:
    x, y = grid.node_coords("c")
    return jnp.stack([x, y])


def init_mapping(grid, ndim: int, with_prev: bool = True,
                 with_maps: bool = True) -> MappingState:
    """with_prev=False drops the level-2 bwd_prev buffer (statically dead
    whenever blend_coeff == 1.0 — the reference default, main.cpp:47);
    with_maps=False drops fwd/bwd too (a counter-only alias, used when the
    scalar advector shares the velocity advector's maps under per-frame
    reinit). None leaves vanish from the pytree: no HBM, no donation
    copies — at 384^3 the full prev tier alone is ~2.5 GB."""
    if not with_maps:
        return MappingState(fwd=None, bwd=None, bwd_prev=None,
                            reinit_count=jnp.int32(0))
    ident = identity_map_3d(grid) if ndim == 3 else identity_map_2d(grid)
    return MappingState(
        fwd=ident, bwd=ident, bwd_prev=ident if with_prev else None,
        reinit_count=jnp.int32(0),
    )


def reinitialize(mapping: MappingState, grid) -> MappingState:
    if mapping.fwd is None:  # counter-only alias (see init_mapping)
        return mapping.replace(reinit_count=mapping.reinit_count + 1)
    ndim = mapping.fwd.shape[0]
    ident = identity_map_3d(grid) if ndim == 3 else identity_map_2d(grid)
    return MappingState(
        fwd=ident,
        bwd=ident,
        bwd_prev=mapping.bwd if mapping.bwd_prev is not None else None,
        reinit_count=mapping.reinit_count + 1,
    )


def update_mapping_3d(mapping: MappingState, grid, u, v, w, cfldt, dt,
                      from_identity=False, packed=None) -> MappingState:
    """Backward (DMC substepped) then forward march (Mapping.cpp:347-373).

    The MAC pack (the padded velocity triplet both marches sample) is
    materialized ONCE and shared; callers updating several maps with the
    same velocity (vel + scalar advectors) pass their own `packed`
    (interp.mac_pack_3d onto any lattice covering shape_c) to share it
    across calls. `from_identity=True` (per-frame-reinit mode only: both
    maps are statically identity at step entry) runs the backward march's
    first substep gather-free."""
    from gpufluidsimulation_tpu import config

    ss = config.sharded_sampling()
    if ss is not None:
        mesh, halo = ss
        if grid.nk % mesh.size == 0 and halo <= grid.nk // mesh.size:
            from gpufluidsimulation_tpu.parallel import sharded_interp

            return sharded_interp.update_mapping_3d_sharded(
                mapping, grid, u, v, w, cfldt, dt, mesh, halo)
    if packed is None:
        packed = interp.mac_pack_3d(u, v, w, grid.shape_c)
    bx, by, bz = advect.update_backward_map_3d(
        grid, u, v, w, (mapping.bwd[0], mapping.bwd[1], mapping.bwd[2]),
        cfldt, dt, packed, from_identity=from_identity,
    )
    fx, fy, fz = advect.update_forward_map_3d(
        grid, u, v, w, (mapping.fwd[0], mapping.fwd[1], mapping.fwd[2]),
        cfldt, dt, packed, from_identity=from_identity,
    )
    return mapping.replace(bwd=jnp.stack([bx, by, bz]), fwd=jnp.stack([fx, fy, fz]))


def update_mapping_2d(mapping: MappingState, grid, u, v, cfldt, dt) -> MappingState:
    bx, by = advect.update_backward_map_2d(
        grid, u, v, (mapping.bwd[0], mapping.bwd[1]), cfldt, dt
    )
    fx, fy = advect.update_forward_map_2d(
        grid, u, v, (mapping.fwd[0], mapping.fwd[1]), cfldt, dt
    )
    return mapping.replace(bwd=jnp.stack([bx, by]), fwd=jnp.stack([fx, fy]))


# ---------------------------------------------------------------------------
# Band masks — literal transcriptions of the CUDA guards
# ---------------------------------------------------------------------------


def _band3(shape, a: Tuple[int, int, int], b: Tuple[int, int, int]):
    """Mask for guard `a[d] < idx_d < n_d - b[d]` per axis.

    Built from broadcasted iotas (not a materialized constant array) so XLA
    computes it inside the consuming fusion — a 256^3 pred constant costs a
    real HBM load per use; iota compares are free ALU work."""
    nx, ny, nz = shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    return (
        (ii > a[0]) & (ii < nx - b[0])
        & (jj > a[1]) & (jj < ny - b[1])
        & (kk > a[2]) & (kk < nz - b[2])
    )


def _band2(shape, a: Tuple[int, int], b: Tuple[int, int]):
    nx, ny = shape
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return (ii > a[0]) & (ii < nx - b[0]) & (jj > a[1]) & (jj < ny - b[1])


# ---------------------------------------------------------------------------
# 3D volume-averaged pull-back / push-forward
# ---------------------------------------------------------------------------


def _map_sample_3d(grid, maps, px, py, pz, clamp_lo, clamp_hi):
    """Sample a (3, ni, nj, nk) map at world pos; clamp result into domain.

    Fast path: one 3-channel window kernel (shared DMA, launch, and — since
    the channel offsets are identical — shared hat weights)."""
    from gpufluidsimulation_tpu import config

    h = grid.h
    if px.ndim == 3 and config.use_fast_interp():
        from gpufluidsimulation_tpu.ops import interp_fast

        out = interp_fast.sample3_multi(
            maps, px, py, pz, h, ((0.0, 0.0, 0.0),) * 3,
            Rr=config.interp_rr(), interpret=config.interp_interpret(),
        )
        mx, my, mz = out[0], out[1], out[2]
        return (
            jnp.clip(mx, clamp_lo * h, grid.ni * h - clamp_hi * h),
            jnp.clip(my, clamp_lo * h, grid.nj * h - clamp_hi * h),
            jnp.clip(mz, clamp_lo * h, grid.nk * h - clamp_hi * h),
        )
    mx = interp.sample3_lattice(maps[0], px, py, pz, h, (0.0, 0.0, 0.0))
    my = interp.sample3_lattice(maps[1], px, py, pz, h, (0.0, 0.0, 0.0))
    mz = interp.sample3_lattice(maps[2], px, py, pz, h, (0.0, 0.0, 0.0))
    return (
        jnp.clip(mx, clamp_lo * h, grid.ni * h - clamp_hi * h),
        jnp.clip(my, clamp_lo * h, grid.nj * h - clamp_hi * h),
        jnp.clip(mz, clamp_lo * h, grid.nk * h - clamp_hi * h),
    )


def map_at_lattice_3d(grid, maps, kind, clamp_lo, clamp_hi):
    """Map values at `kind`'s node lattice — NO window kernel needed.

    A kind-node sits at x = (i - 0.5*dim)h on the map's cell lattice (x =
    i*h), so trilinear sampling degenerates to a static separable stencil:
    the identity for cell kinds, a clamped 0.5/0.5 face average along each
    staggered axis. This removes every map-sampling Pallas launch from the
    pull-back tier (the positions are compile-time lattices; only FIELD
    samples at *mapped* (data-dependent) positions need the windowed-DMA
    kernel). Matches sample3's boundedAt corner clamping exactly.
    """
    dim = grid.dim_of(kind)
    h = grid.h
    out = []
    for ch in range(3):
        m = maps[ch]
        for axis in range(3):
            if dim[axis]:
                pad = [(0, 0)] * 3
                pad[axis] = (1, 1)
                q = jnp.pad(m, pad, mode="edge")
                lo = [slice(None)] * 3
                hi = [slice(None)] * 3
                lo[axis] = slice(0, -1)
                hi[axis] = slice(1, None)
                m = 0.5 * (q[tuple(lo)] + q[tuple(hi)])
        out.append(m)
    return (
        jnp.clip(out[0], clamp_lo * h, grid.ni * h - clamp_hi * h),
        jnp.clip(out[1], clamp_lo * h, grid.nj * h - clamp_hi * h),
        jnp.clip(out[2], clamp_lo * h, grid.nk * h - clamp_hi * h),
    )


def volume_prefilter_3d(f):
    """Source-side equivalent of the 9-point volume stencil.

    The reference evaluates 0.5*mean(8 corner samples at +-0.25h) + 0.5*
    (center sample) per output point (GPU_kernel.cu:312-374). To first order
    in the map Jacobian (J ~ I in the distortion-limited regime BiMocq
    maintains by reinitializing), averaging the *composition* over the cell
    volume equals sampling a volume-prefiltered source:

        avg_i field(M(p + d_i)) ~ avg_i field(M(p) + J d_i) ~ (field*K)(M(p))

    with K = 0.5*delta + 0.5*(S(x)S(y)S(z)), S = [1/8, 3/4, 1/8] (the
    separable form of trilinear sampling at +-0.25 per axis). One fused XLA
    stencil pass instead of 9 windowed-kernel launches per sample op.
    """
    # NOTE: a windowed-DMA Pallas form exists (interp_fast.
    # volume_prefilter_fast, parity-tested) but measured NEUTRAL-to-worse
    # in-step at 256^3 — XLA fuses these separable passes into neighboring
    # elementwise work, which a separate kernel launch forfeits.

    # separable per-axis passes (3-tap each). NOTE: the "pad once + 27
    # static slices" single-fusion form was tried and is ~60 ms/step SLOWER
    # at 256^3 — 27 lane-misaligned operands in one fusion relayout worse
    # than three separable passes on this TPU/XLA.
    def s(axis):
        def apply(x):
            pad = [(0, 0)] * 3
            pad[axis] = (1, 1)
            xp = jnp.pad(x, pad, mode="edge")
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(0, -2)
            hi[axis] = slice(2, None)
            return 0.125 * xp[tuple(lo)] + 0.75 * x + 0.125 * xp[tuple(hi)]

        return apply

    return 0.5 * f + 0.5 * s(0)(s(1)(s(2)(f)))


def _use_prefilter():
    from gpufluidsimulation_tpu import config

    fast = config.use_fast_interp() or config.sharded_sampling() is not None
    return fast and not config.volume_exact()


def _volume_mode():
    """'exact' (9 composed evaluations — exact-gather or GFS_VOLUME_EXACT
    fast mode), 'dual' (separable dual-kernel approximation — post-map
    corners, map Jacobian taken as identity; the PRODUCTION DEFAULT,
    restored in round 4 — 212.8 ms/step at 256^3 vs vol9's ~470), 'vol9'
    (dual launch + sparse exact fixup evaluating the exact 9-position
    composition with in-kernel mapped corners; the opt-in exact tier for
    accuracy-critical runs, GFS_VOLUME_VOL9=1 — volexact-parity fidelity
    after the r4 alignment/routing fixes), or 'prefilter' (the legacy
    O(h^2) source filter — sharded sampling, non-rebased kernels, or
    GFS_VOLUME_DUAL=0).

    vol9 is built ON the dual launch (its fixup overwrites dual's blocks),
    so GFS_VOLUME_DUAL=0 disables BOTH tiers and restores the prefilter —
    scripts that used that knob to reach the prefilter path keep working
    unchanged."""
    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.ops import interp_fast

    if not _use_prefilter():
        return "exact"
    if (config.interp_adaptive() and interp_fast.REBASED_NT
            and config.volume_dual()):
        if config.sharded_sampling() is not None:
            # sharded runs the SAME dual volume form (windowed kernels per
            # shard behind ppermute halos; gather-dual for z-staggered
            # kinds) — the multi-chip step uses the production numerics.
            if config.volume_vol9():
                # fail LOUDLY (r4 verdict Weak #5): vol9's fixup launch is
                # not sharded; silently degrading the requested accuracy
                # tier under a mesh would be a fidelity surprise
                raise ValueError(
                    "GFS_VOLUME_VOL9=1 requested under a sharded mesh: "
                    "the vol9 fixup launch is not sharded. Use "
                    "GFS_VOLUME_EXACT=1 (the sharded exact-composition "
                    "tier, via GSPMD gathers) or unset vol9 for the "
                    "production dual form.")
            return "dual"
        if config.use_fast_interp():
            if config.volume_vol9():
                return "vol9"
            return "dual"
    return "prefilter"


def _volume_eval_3d(grid, kind, eval_fn, is_point=False):
    """0.5 * mean(8 corner evals) + 0.5 * center eval at each node of `kind`.

    Exact path: the 9 stencil points are stacked on a leading axis so every
    map/field lookup in eval_fn is ONE batched gather (compile-time and
    HBM-pass friendly). The fast-interp path replaces this with a source
    prefilter (see volume_prefilter_3d) and calls eval_fn once — callers
    pass prefiltered sources in that mode.
    """
    from gpufluidsimulation_tpu import config

    h = grid.h
    px, py, pz = grid.node_coords(kind)
    if is_point or _use_prefilter():
        return eval_fn(px, py, pz)
    if config.use_fast_interp():
        # exact-volume fast mode (GFS_VOLUME_EXACT): one rank-3 windowed
        # evaluation per stencil offset — exact 9-point composition
        vals = [eval_fn(px + dx * h, py + dy * h, pz + dz * h)
                for dx, dy, dz in _VOL3 + [(0.0, 0.0, 0.0)]]
        corner_sum = vals[0]
        for v in vals[1:8]:
            corner_sum = corner_sum + v
        return 0.5 * (corner_sum / 8.0) + 0.5 * vals[8]
    offs = jnp.asarray(_VOL3 + [(0.0, 0.0, 0.0)], px.dtype) * h  # (9, 3)
    sh = (9,) + (1,) * px.ndim
    bx = px[None] + offs[:, 0].reshape(sh)
    by = py[None] + offs[:, 1].reshape(sh)
    bz = pz[None] + offs[:, 2].reshape(sh)
    vals = eval_fn(bx, by, bz)  # (9, ...)
    return 0.5 * jnp.mean(vals[:8], axis=0) + 0.5 * vals[8]


def _prefilter_source(field, is_point):
    if is_point or not _use_prefilter():
        return field
    return volume_prefilter_3d(field)


def advect_with_map_3d(grid, kind, field_cur, field_init, bwd, is_point=False):
    """Pull field_init back through the backward map (advect_kernel).

    Outside the guard band (`2+dim < idx < n-3`) the *current* field value is
    kept — in the reference pipeline those nodes retain the pre-advection
    velocity that updateMapping left in the working buffer.
    """
    off = grid.off_of(kind)
    src = _prefilter_source(field_init, is_point)

    def ev(px, py, pz):
        mx, my, mz = _map_sample_3d(grid, bwd, px, py, pz, 1.0, 1.0)
        return interp.sample3_lattice(src, mx, my, mz, grid.h, off,
                                      values=True)

    out = _volume_eval_3d(grid, kind, ev, is_point)
    dim = grid.dim_of(kind)
    band = _band3(field_cur.shape, (2 + dim[0], 2 + dim[1], 2 + dim[2]), (3, 3, 3))
    return jnp.where(band, out, field_cur)


def double_advect_3d(grid, kind, field, field_prev, bwd, bwd_prev, blend_coeff,
                     is_point=False):
    """Two-level pull-back through bwd_prev o bwd, blended with `field`
    (doubleAdvect_kernel): field <- blend*field + (1-blend)*prev_value."""
    off = grid.off_of(kind)
    src = _prefilter_source(field_prev, is_point)

    def ev(px, py, pz):
        mx, my, mz = _map_sample_3d(grid, bwd, px, py, pz, 1.0, 1.0)
        ox, oy, oz = _map_sample_3d(grid, bwd_prev, mx, my, mz, 1.0, 1.0)
        return interp.sample3_lattice(src, ox, oy, oz, grid.h, off,
                                      values=True)

    prev_value = _volume_eval_3d(grid, kind, ev, is_point)
    out = field * blend_coeff + (1.0 - blend_coeff) * prev_value
    dim = grid.dim_of(kind)
    band = _band3(field.shape, (2 + dim[0], 2 + dim[1], 2 + dim[2]), (3, 3, 3))
    return jnp.where(band, out, field)


def accumulate_3d(grid, kind, dfield_init, field_change, fwd, coeff=1.0,
                  is_point=False):
    """Push a change at time t through the *forward* map into the init buffer
    (cumulate_kernel): dfield_init += volume<coeff * change(fwd(x))>."""
    off = grid.off_of(kind)
    src = _prefilter_source(field_change, is_point)

    def ev(px, py, pz):
        mx, my, mz = _map_sample_3d(grid, fwd, px, py, pz, 0.0, 0.0)
        return coeff * interp.sample3_lattice(src, mx, my, mz, grid.h,
                                              off, values=True)

    delta = _volume_eval_3d(grid, kind, ev, is_point)
    dim = grid.dim_of(kind)
    band = _band3(dfield_init.shape, (1 + dim[0], 1 + dim[1], 1 + dim[2]), (2, 2, 2))
    return jnp.where(band, dfield_init + delta, dfield_init)


def compensate_3d(grid, kind, field_adv, field_init, fwd, bwd, is_point=False):
    """BFECC-style error compensation of the mapping advection
    (gpu_compensate_velocity/field, GPU_kernel.cu:640-682):

      err   = volume<field_adv(fwd(x))> - field_init        (error at t=0)
      out   = field_adv - 0.5 * volume<err(bwd(x))>
      final = clamp27(out, around field_adv)
    """
    off = grid.off_of(kind)
    dim = grid.dim_of(kind)
    src_adv = _prefilter_source(field_adv, is_point)

    def ev_fwd(px, py, pz):
        mx, my, mz = _map_sample_3d(grid, fwd, px, py, pz, 0.0, 0.0)
        return interp.sample3_lattice(src_adv, mx, my, mz, grid.h, off,
                                      values=True)

    err = _volume_eval_3d(grid, kind, ev_fwd, is_point) - field_init
    band = _band3(field_adv.shape, (1 + dim[0], 1 + dim[1], 1 + dim[2]), (2, 2, 2))
    err = jnp.where(band, err, 0.0)

    err_src = _prefilter_source(err, is_point)

    def ev_bwd(px, py, pz):
        mx, my, mz = _map_sample_3d(grid, bwd, px, py, pz, 0.0, 0.0)
        return interp.sample3_lattice(err_src, mx, my, mz, grid.h, off,
                                      values=True)

    correction = _volume_eval_3d(grid, kind, ev_bwd, is_point)
    out = jnp.where(band, field_adv - 0.5 * correction, field_adv)
    return advect.clamp_extrema_neighborhood(field_adv, out)


def _dual_gather_3d(grid, f, mx, my, mz, off):
    """The dual volume form via exact gathers: 0.5 * mean over the 8
    (+-0.25h)^3 corner offsets applied at the MAPPED position + 0.5 *
    center sample (the separable identity the dual kernel evaluates
    in-window). Used where the windowed kernels don't apply (z-staggered
    kinds under sharded sampling)."""
    h = grid.h
    acc = None
    for dx, dy, dz in _VOL3:
        t = interp.sample3(f, mx + dx * h, my + dy * h, mz + dz * h, h, off)
        acc = t if acc is None else acc + t
    return 0.5 * (acc / 8.0) + 0.5 * interp.sample3(f, mx, my, mz, h, off)


def _sample_fields_at(grid, kind, fields, positions, dual=False):
    """Sample N same-shape (already prefiltered) fields of `kind` at shared
    world positions: ONE multi-channel window launch on the fast path,
    shard_map halo windows in sharded mode, exact gathers otherwise.
    dual=True evaluates the 9-point volume blend in-kernel
    (interp_fast dual sampling) — callers then pass UNfiltered fields."""
    from gpufluidsimulation_tpu import config

    mx, my, mz = positions
    off = grid.off_of(kind)
    ss = config.sharded_sampling()
    if ss is not None and mx.ndim == 3:
        mesh, halo = ss
        nz = mx.shape[2]
        if (nz % mesh.size == 0 and halo <= nz // mesh.size
                and all(f.shape == mx.shape for f in fields)):
            from gpufluidsimulation_tpu.parallel import sharded_interp

            kw = dict(halo=halo, Rr=config.interp_rr(),
                      interpret=config.interp_interpret(),
                      dtype=config.interp_window_dtype(), dual=dual)
            if len(fields) == 1:
                return [sharded_interp.sample3_fast_sharded(
                    fields[0], mx, my, mz, grid.h, off, mesh, **kw)]
            out = sharded_interp.sample3_multi_sharded(
                jnp.stack(fields), mx, my, mz, grid.h,
                (off,) * len(fields), mesh, **kw)
            return [out[i] for i in range(len(fields))]
        # z-staggered kinds (nk+1 lanes) don't divide the mesh: exact
        # gathers below (GSPMD partitions them correctly). dual=True keeps
        # the volume form by evaluating the post-map 9-point corner blend
        # directly (identical semantics to the windowed dual kernel).
        if dual:
            return [_dual_gather_3d(grid, f, mx, my, mz, off)
                    for f in fields]
        return [interp.sample3(f, mx, my, mz, grid.h, off) for f in fields]
    if config.use_fast_interp() and mx.ndim == 3:
        from gpufluidsimulation_tpu.ops import interp_fast

        # NOTE: dual's +-0.25 wider per-axis support spends a quarter cell
        # of the Rr residual budget (the origins dspan accounts for it in
        # the overflow monitor); widening the window by a full reach unit
        # instead measured +5 ms for no fewer trips — not worth it
        rr = config.interp_rr()
        if len(fields) == 1:
            if dual:
                return [interp_fast.sample3_fast(
                    fields[0], mx, my, mz, grid.h, off, Rr=rr,
                    interpret=config.interp_interpret(),
                    dtype=config.interp_window_dtype(), dual=True)]
            return [interp.sample3_lattice(fields[0], mx, my, mz, grid.h,
                                           off, values=True)]
        out = interp_fast.sample3_multi(
            jnp.stack(fields), mx, my, mz, grid.h, (off,) * len(fields),
            Rr=rr, interpret=config.interp_interpret(),
            dtype=config.interp_window_dtype(), dual=dual,
        )
        return [out[i] for i in range(len(fields))]
    return [interp.sample3(f, mx, my, mz, grid.h, off) for f in fields]


def _vol9_sampler(grid, kind):
    """Per-kind closure: the proven dual launch (map_at_lattice positions
    + the separable dual kernel) followed by the sparse exact fixup
    (interp_fast.vol9_fixup) on the blocks where dual provably differs
    from the exact 9-position composition. Map stats (padded pack +
    per-block corner deviation) are computed once per map and shared
    across the stages using it. Lists in, lists out."""
    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.ops import interp_fast

    dim = grid.dim_of(kind)
    gn = (grid.ni, grid.nj, grid.nk)
    kw = dict(Rr=config.interp_rr(), interpret=config.interp_interpret(),
              dtype=config.interp_window_dtype())

    def samp(fields, map_stats, maps, clamp_lo, clamp_hi, band_lo,
             band_hi):
        p1 = map_at_lattice_3d(grid, maps, kind, clamp_lo, clamp_hi)
        duals = _sample_fields_at(grid, kind, fields, p1, dual=True)
        band = (band_lo + dim[0], band_lo + dim[1], band_lo + dim[2],
                band_hi)
        return interp_fast.vol9_fixup(
            duals, jnp.stack(fields), map_stats, p1, dim, grid.h, gn,
            clamp_lo, clamp_hi, band=band, **kw)

    return samp


# experiment knob (read ONCE at import like GFS_VOL9_TOL — reading it at
# trace time made it invisible to the jit cache key): restrict the vol9
# exact fixup to the scalar (c-kind) stages, velocity stays dual.
_VOL9_FIELDS = os.environ.get("GFS_VOL9_FIELDS", "all")

# Scope-local memo of vol9 map stats keyed by the map array object id —
# bwd serves both the advect and correction stages of all four kinds in
# one step trace; fwd serves the error stage (and non-identity
# accumulates). The memo holds TRACERS, so it exists ONLY inside an
# active vol9_stats_cache_scope (one traced step body,
# solvers/smoke3d._scoped_step). Outside any scope there is NO caching:
# stats are recomputed per call and XLA CSE dedupes the compiled work —
# a module-global cache surviving across traces would hand trace-1
# tracers to trace 2 whenever the same concrete map array is closed over
# by two jits (the r3/r4 advisor's fragility finding).
_VOL9_STATS_SCOPE: dict | None = None


@contextlib.contextmanager
def vol9_stats_cache_scope():
    """Install a FRESH per-trace vol9 map-stats memo for the enclosed
    trace (tracer hygiene: entries are JAX tracers valid only inside the
    trace that made them); the memo is discarded on exit."""
    global _VOL9_STATS_SCOPE
    prev = _VOL9_STATS_SCOPE
    _VOL9_STATS_SCOPE = {}
    try:
        yield
    finally:
        _VOL9_STATS_SCOPE = prev


def _vol9_map_stats(grid, maps):
    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.ops import interp_fast

    memo = _VOL9_STATS_SCOPE
    key = id(maps)
    if memo is not None:
        hit = memo.get(key)
        # the memo holds a strong ref in hit[0], so `is` cannot alias a
        # recycled id while the entry lives
        if hit is not None and hit[0] is maps:
            return hit[1]
    stats = interp_fast.vol9_map_stats(
        maps, grid.h, (grid.ni, grid.nj, grid.nk), Rr=config.interp_rr())
    if memo is not None:
        memo[key] = (maps, stats)
    return stats


def bimocq_advect_3d(grid, kind, fields_cur, fields_init, fields_prev,
                     bwd, bwd_prev, fwd, blend_coeff):
    """Fused advect_with_map + compensate + double_advect over N fields of
    one lattice kind (the advectVelocity/advectField pipeline,
    Mapping.cpp:375-407).

    Fast path: every map-at-lattice sample is a static stencil
    (map_at_lattice_3d) and all N fields share one windowed-DMA launch per
    stage — 4 launches per kind instead of ~7 per field. Exact path:
    delegates to the single-field ops (oracle-parity semantics).

    `blend_coeff=None` marks the two-level blend as STATICALLY 1.0 (the
    reference's default mapping_blend_coeff, bimocq3D/main.cpp:47): the
    level-2 pull-back contributes with weight 0, so the bwd_prev
    composition and the whole `prevs` sampling stage are skipped — the
    reference's gpu_advect_vel_double runs this dead work unconditionally
    (Mapping.cpp:169-206)."""
    if not _use_prefilter():
        outs = []
        for cur, init, prev in zip(fields_cur, fields_init, fields_prev):
            x = advect_with_map_3d(grid, kind, cur, init, bwd)
            x = compensate_3d(grid, kind, x, init, fwd, bwd)
            if blend_coeff is not None:
                x = double_advect_3d(grid, kind, x, prev, bwd, bwd_prev,
                                     blend_coeff)
            outs.append(x)
        return outs

    dim = grid.dim_of(kind)
    shape = fields_cur[0].shape
    band_adv = _band3(shape, (2 + dim[0], 2 + dim[1], 2 + dim[2]), (3, 3, 3))
    band_c = _band3(shape, (1 + dim[0], 1 + dim[1], 1 + dim[2]), (2, 2, 2))
    # 'vol9': the EXACT 9-position composition in one launch (in-kernel
    # mapped corners — production default); 'dual': the separable post-map
    # corner approximation (J = I across the cube); 'prefilter': the legacy
    # O(h^2) source-filter commutation
    mode = _volume_mode()
    if mode == "vol9" and _VOL9_FIELDS == "scalars" and kind != "c":
        mode = "dual"  # experiment knob: exact composition scalars-only

    if mode == "vol9":
        samp = _vol9_sampler(grid, kind)

        stats_bwd = _vol9_map_stats(grid, bwd)
        stats_fwd = _vol9_map_stats(grid, fwd)

        # --- advect: pull init back through the backward map ---
        advs = samp(fields_init, stats_bwd, bwd, 1.0, 1.0, 2, 3)
        advs = [jnp.where(band_adv, a, cur)
                for a, cur in zip(advs, fields_cur)]

        # --- compensate: BFECC error correction + 27-pt clamp ---
        errs = samp(advs, stats_fwd, fwd, 0.0, 0.0, 1, 2)
        errs = [jnp.where(band_c, e - init, 0.0)
                for e, init in zip(errs, fields_init)]
        corrs = samp(errs, stats_bwd, bwd, 0.0, 0.0, 1, 2)
        comps = [
            advect.clamp_extrema_neighborhood(
                a, jnp.where(band_c, a - 0.5 * c, a))
            for a, c in zip(advs, corrs)
        ]

        # --- double advect (blend != 1 configs only): the two-level
        # composition samples bwd_prev at data-dependent points, outside
        # the vol9 kernel's static-map-window geometry — that stage keeps
        # the dual evaluation (the reference default blend_coeff == 1.0
        # never reaches here)
        if blend_coeff is None:
            return comps
        p1 = map_at_lattice_3d(grid, bwd, kind, 1.0, 1.0)
        p2 = _map_sample_3d(grid, bwd_prev, p1[0], p1[1], p1[2], 1.0, 1.0)
        prevs = _sample_fields_at(grid, kind, fields_prev, p2, dual=True)
        return [
            jnp.where(band_adv,
                      x * blend_coeff + (1.0 - blend_coeff) * pv, x)
            for x, pv in zip(comps, prevs)
        ]

    dual = mode == "dual"

    def pre(fs):
        return fs if dual else [volume_prefilter_3d(f) for f in fs]

    # --- advect: pull init back through the backward map ---
    p1 = map_at_lattice_3d(grid, bwd, kind, 1.0, 1.0)
    advs = _sample_fields_at(grid, kind, pre(fields_init), p1, dual=dual)
    advs = [jnp.where(band_adv, a, cur) for a, cur in zip(advs, fields_cur)]

    # --- compensate: BFECC error correction + 27-pt clamp ---
    p3 = map_at_lattice_3d(grid, fwd, kind, 0.0, 0.0)
    errs = _sample_fields_at(grid, kind, pre(advs), p3, dual=dual)
    errs = [jnp.where(band_c, e - init, 0.0)
            for e, init in zip(errs, fields_init)]
    p4 = map_at_lattice_3d(grid, bwd, kind, 0.0, 0.0)
    corrs = _sample_fields_at(grid, kind, pre(errs), p4, dual=dual)
    comps = [
        advect.clamp_extrema_neighborhood(
            a, jnp.where(band_c, a - 0.5 * c, a))
        for a, c in zip(advs, corrs)
    ]

    # --- double advect: two-level pull-back blended with blend_coeff ---
    if blend_coeff is None:  # statically 1.0: zero-weight level-2, skip
        return comps
    p2 = _map_sample_3d(grid, bwd_prev, p1[0], p1[1], p1[2], 1.0, 1.0)
    prevs = _sample_fields_at(grid, kind, pre(fields_prev), p2, dual=dual)
    return [
        jnp.where(band_adv, x * blend_coeff + (1.0 - blend_coeff) * pv, x)
        for x, pv in zip(comps, prevs)
    ]


def _pullback_stage(grid, maps, fields, kinds, clamp_lo, clamp_hi):
    """One fused pull-back launch: `maps` sampled at each kind's node
    lattice IN-KERNEL (static staggered window slices), then each field
    sampled there — no position arrays, no per-kind map stencil passes
    (interp_fast.sample3_pullback)."""
    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.ops import interp_fast

    dims = tuple(grid.dim_of(k) for k in kinds)
    out = interp_fast.sample3_pullback(
        maps, fields, dims, grid.h, (grid.ni, grid.nj, grid.nk),
        clamp_lo, clamp_hi, Rr=config.interp_rr(),
        interpret=config.interp_interpret(),
    )
    # the kernel evaluates the cell-lattice block grid only; a staggered
    # kind's last face plane (never inside any band guard) is zero-padded
    outs = []
    for i, f in enumerate(fields):
        o = out[i, : min(f.shape[0], out.shape[1]),
                : min(f.shape[1], out.shape[2]),
                : min(f.shape[2], out.shape[3])]
        pw = [(0, f.shape[k] - o.shape[k]) for k in range(3)]
        outs.append(jnp.pad(o, pw) if any(p[1] for p in pw) else o)
    return outs


def bimocq_advect_multi_3d(grid, kinds, fields_cur, fields_init,
                           fields_prev, bwd, bwd_prev, fwd, blend_coeff):
    """Fused advect + compensate + double-advect over SEVERAL lattice kinds
    at once (the whole velocity triplet, or rho+T): the advect/compensate
    stages each run as ONE pull-back launch across all kinds
    (_pullback_stage), vs one launch per kind per stage. Exact path
    delegates to the per-kind ops.

    NOT wired into the solver: measured 501 -> 568 ms/step at 256^3 — the
    in-kernel map window (3ch, ~8x block bytes) costs more DMA than the
    materialized position arrays it replaces (3 block-sized reads), and
    the per-dim prepass position stats don't fuse as hoped. Kept
    parity-tested (test_pullback_multi_matches_per_kind) as infrastructure
    for a future window-sharing redesign."""
    if not _use_prefilter():
        outs = []
        for kind, cur, init, prev in zip(kinds, fields_cur, fields_init,
                                         fields_prev):
            x = advect_with_map_3d(grid, kind, cur, init, bwd)
            x = compensate_3d(grid, kind, x, init, fwd, bwd)
            x = double_advect_3d(grid, kind, x, prev, bwd, bwd_prev,
                                 blend_coeff)
            outs.append(x)
        return outs

    dims = [grid.dim_of(k) for k in kinds]
    bands_adv = [
        _band3(f.shape, (2 + d[0], 2 + d[1], 2 + d[2]), (3, 3, 3))
        for f, d in zip(fields_cur, dims)
    ]
    bands_c = [
        _band3(f.shape, (1 + d[0], 1 + d[1], 1 + d[2]), (2, 2, 2))
        for f, d in zip(fields_cur, dims)
    ]

    # --- advect: pull init back through the backward map ---
    advs = _pullback_stage(
        grid, bwd, [volume_prefilter_3d(f) for f in fields_init], kinds,
        1.0, 1.0)
    advs = [jnp.where(b, a, cur)
            for b, a, cur in zip(bands_adv, advs, fields_cur)]

    # --- compensate: BFECC error correction + 27-pt clamp ---
    errs = _pullback_stage(
        grid, fwd, [volume_prefilter_3d(a) for a in advs], kinds, 0.0, 0.0)
    errs = [jnp.where(b, e - init, 0.0)
            for b, e, init in zip(bands_c, errs, fields_init)]
    corrs = _pullback_stage(
        grid, bwd, [volume_prefilter_3d(e) for e in errs], kinds, 0.0, 0.0)
    comps = [
        advect.clamp_extrema_neighborhood(a, jnp.where(b, a - 0.5 * c, a))
        for b, a, c in zip(bands_c, advs, corrs)
    ]

    # --- double advect: two-level pull-back blended with blend_coeff ---
    # (positions compose through bwd_prev at data-dependent points, so this
    # stage keeps the map-sample + field-sample launch pair per kind)
    outs = []
    from collections import defaultdict
    by_kind = defaultdict(list)
    for i, k in enumerate(kinds):
        by_kind[k].append(i)
    prevs = [None] * len(kinds)
    for k, idxs in by_kind.items():
        p1 = map_at_lattice_3d(grid, bwd, k, 1.0, 1.0)
        p2 = _map_sample_3d(grid, bwd_prev, p1[0], p1[1], p1[2], 1.0, 1.0)
        vals = _sample_fields_at(
            grid, k, [volume_prefilter_3d(fields_prev[i]) for i in idxs], p2)
        for i, v in zip(idxs, vals):
            prevs[i] = v
    for b, x, pv in zip(bands_adv, comps, prevs):
        outs.append(
            jnp.where(b, x * blend_coeff + (1.0 - blend_coeff) * pv, x))
    return outs


def accumulate_multi_3d(grid, kind, groups, fwd, identity=False):
    """Fused cumulate_kernel: `groups` is a list of
    (base_field, [(change, coeff), ...]) — all changes (across groups)
    share one forward map and ONE window launch on the fast path. With
    identity=True the forward map is known to be the identity (post-reinit
    accumulate, BimocqGPUSolver.cpp:222) and sampling collapses to the
    volume prefilter itself — no kernel at all. Returns the updated bases."""
    if not _use_prefilter():
        outs = []
        for base, pairs in groups:
            for change, coeff in pairs:
                base = accumulate_3d(grid, kind, base, change, fwd, coeff)
            outs.append(base)
        return outs
    dim = grid.dim_of(kind)
    shape = groups[0][0].shape
    band = _band3(shape, (1 + dim[0], 1 + dim[1], 1 + dim[2]), (2, 2, 2))
    # prefilter and pull-back are linear: fold each group's coeff-weighted
    # changes into ONE combined field before filtering/sampling
    # (sum_i c_i*samp(K*f_i) == samp(K*(sum_i c_i f_i))) — one prefilter
    # pass + one sampler channel per group instead of one per change
    combined = []
    for base, pairs in groups:
        if not pairs:
            combined.append(jnp.zeros_like(base))
            continue
        tot = pairs[0][1] * pairs[0][0]
        for change, coeff in pairs[1:]:
            tot = tot + coeff * change
        combined.append(tot)
    if identity:
        # identity forward map: corner positions are EXACTLY node + d, so
        # the separable S-stencil prefilter IS the exact 9-point volume
        # average — no kernel in any volume mode
        deltas = [volume_prefilter_3d(c) for c in combined]
    elif _volume_mode() == "vol9":
        deltas = _vol9_sampler(grid, kind)(
            combined, _vol9_map_stats(grid, fwd), fwd, 0.0, 0.0, 1, 2)
    else:
        flat = [volume_prefilter_3d(c) for c in combined]
        p3 = map_at_lattice_3d(grid, fwd, kind, 0.0, 0.0)
        deltas = _sample_fields_at(grid, kind, flat, p3)
    return [
        jnp.where(band, base + delta, base)
        for (base, _), delta in zip(groups, deltas)
    ]


def estimate_distortion_3d(grid, mapping: MappingState, exclude_mask=None):
    """sqrt(max_x max(|x - F(B(x))|^2, |x - B(F(x))|^2)) over interior cells
    (estimate_kernel + the host reduction in Mapping.cpp:91-118)."""
    h = grid.h
    px, py, pz = grid.node_coords("c")
    bwd, fwd = mapping.bwd, mapping.fwd

    bx = interp.sample3_lattice(bwd[0], px, py, pz, h, (0, 0, 0))
    by = interp.sample3_lattice(bwd[1], px, py, pz, h, (0, 0, 0))
    bz = interp.sample3_lattice(bwd[2], px, py, pz, h, (0, 0, 0))
    fx = interp.sample3_lattice(fwd[0], bx, by, bz, h, (0, 0, 0))
    fy = interp.sample3_lattice(fwd[1], bx, by, bz, h, (0, 0, 0))
    fz = interp.sample3_lattice(fwd[2], bx, by, bz, h, (0, 0, 0))
    d_bf = (px - fx) ** 2 + (py - fy) ** 2 + (pz - fz) ** 2

    fx = interp.sample3_lattice(fwd[0], px, py, pz, h, (0, 0, 0))
    fy = interp.sample3_lattice(fwd[1], px, py, pz, h, (0, 0, 0))
    fz = interp.sample3_lattice(fwd[2], px, py, pz, h, (0, 0, 0))
    bx = interp.sample3_lattice(bwd[0], fx, fy, fz, h, (0, 0, 0))
    by = interp.sample3_lattice(bwd[1], fx, fy, fz, h, (0, 0, 0))
    bz = interp.sample3_lattice(bwd[2], fx, fy, fz, h, (0, 0, 0))
    d_fb = (px - bx) ** 2 + (py - by) ** 2 + (pz - bz) ** 2

    d = jnp.maximum(d_bf, d_fb)
    band = _band3(d.shape, (1, 1, 1), (2, 2, 2))
    d = jnp.where(band, d, 0.0)
    if exclude_mask is not None:
        d = jnp.where(exclude_mask, 0.0, d)
    return jnp.sqrt(jnp.max(d))


# ---------------------------------------------------------------------------
# 2D pull-back / correction / push-forward (BimocqSolver2D.cpp:727-1424)
# ---------------------------------------------------------------------------


def _map_sample_2d(grid, maps, px, py):
    h = grid.h
    mx = interp.sample2_lattice(maps[0], px, py, h, (0.5, 0.5))
    my = interp.sample2_lattice(maps[1], px, py, h, (0.5, 0.5))
    return interp.clamp_pos_2d(mx, my, h, grid.ni, grid.nj)


def _volume_eval_2d(grid, kind, eval_fn):
    """w = [1/8 x 4 corners, 1/2 center] stencil (BimocqSolver2D.cpp:745),
    batched on a leading axis (cf. _volume_eval_3d)."""
    h = grid.h
    px, py = grid.node_coords(kind)
    offs = jnp.asarray(_VOL2 + [(0.0, 0.0)], px.dtype) * h  # (5, 2)
    sh = (5,) + (1,) * px.ndim
    bx = px[None] + offs[:, 0].reshape(sh)
    by = py[None] + offs[:, 1].reshape(sh)
    vals = eval_fn(bx, by)  # (5, ...)
    return 0.125 * jnp.sum(vals[:4], axis=0) + 0.5 * vals[4]


# Guard tables in _band2(shape, a, b) form (mask = a[d] < idx < n_d - b[d],
# n_d the BUFFER extent, u = (ni+1, nj), v = (ni, nj+1)), rederived from the
# reference loops:
#   advect  u: i>1&&i<ni-1, j>1&&j<nj-2   (BimocqSolver2D.cpp:947)  -> ((1,1),(2,2))
#   advect  v: i>1&&i<ni-2, j>1&&j<nj-1   (:983)                    -> ((1,1),(2,2))
#   advect  c: i>0&&i<ni-1, j>1&&j<nj-1   (:1022)                   -> ((0,1),(1,1))
#   correct u: i>1&&i<ni-1, j>0&&j<nj-1   (:850)                    -> ((1,0),(2,1))
#   correct v: i>0&&i<ni-1, j>1&&j<nj-1   (:896)                    -> ((0,1),(1,2))
#   correct c: i>1&&i<ni-1, j>0&&j<nj-1   (:746)                    -> ((1,0),(1,1))
#   accum   u: i>1&&i<ni-1, j>0&&j<nj-1   (:1099)                   -> ((1,0),(2,1))
#   accum   v: i>0&&i<ni-1, j>1&&j<nj-1   (:1167)                   -> ((0,1),(1,2))
#   accum   c: i>1&&i<ni-1, j>0&&j<nj-1   (:1296)                   -> ((1,0),(1,1))
_BANDS_2D_ADVECT = {"u": ((1, 1), (2, 2)), "v": ((1, 1), (2, 2)), "c": ((0, 1), (1, 1))}
_BANDS_2D_CORRECT = {"u": ((1, 0), (2, 1)), "v": ((0, 1), (1, 2)), "c": ((1, 0), (1, 1))}
_BANDS_2D_ACCUM = {"u": ((1, 0), (2, 1)), "v": ((0, 1), (1, 2)), "c": ((1, 0), (1, 1))}


def advect_bimocq_2d(grid, kind, semi_field, init_field, origin_field,
                     dfield, dfield_prev, bwd, bwd_prev, blend_coeff):
    """Two-level blended pull-back (advectVelocity/advectScalars,
    BimocqSolver2D.cpp:933-1077):

      out = (1-b) * vol< origin(B_prev(B(x))) + d(B(x)) + d_prev(B_prev(B(x))) >
          +  b    * vol< init(B(x)) + d(B(x)) >

    with semilag fallback outside the band."""
    off = grid.off_of(kind)
    h = grid.h

    def ev(px, py):
        p1x, p1y = _map_sample_2d(grid, bwd, px, py)
        p2x, p2y = _map_sample_2d(grid, bwd_prev, p1x, p1y)
        one_level = (
            interp.sample2_lattice(init_field, p1x, p1y, h, off, values=True)
            + interp.sample2_lattice(dfield, p1x, p1y, h, off, values=True)
        )
        two_level = (
            interp.sample2_lattice(origin_field, p2x, p2y, h, off,
                                   values=True)
            + interp.sample2_lattice(dfield, p1x, p1y, h, off, values=True)
            + interp.sample2_lattice(dfield_prev, p2x, p2y, h, off,
                                     values=True)
        )
        return blend_coeff * one_level + (1.0 - blend_coeff) * two_level

    out = _volume_eval_2d(grid, kind, ev)
    a, b = _BANDS_2D_ADVECT[kind]
    band = _band2(semi_field.shape, a, b)
    return jnp.where(band, out, semi_field)


def correct_2d(grid, kind, field, field_init, dfield, fwd, bwd):
    """Back-and-forth error correction (correctVelocity/correctScalars,
    BimocqSolver2D.cpp:727-931):

      tmp  = vol< field(F(x)) - d(x) > ; tmp = 0.5*(tmp - field_init)
      out  = field - vol< tmp(B(x)) >
      final= clamp9(out, around field)
    """
    off = grid.off_of(kind)
    h = grid.h
    a, b = _BANDS_2D_CORRECT[kind]
    band = _band2(field.shape, a, b)

    def ev_fwd(px, py):
        mx, my = _map_sample_2d(grid, fwd, px, py)
        return interp.sample2_lattice(field, mx, my, h, off, values=True)

    tmp = _volume_eval_2d(grid, kind, ev_fwd) - dfield
    tmp = jnp.where(band, tmp, 0.0)
    tmp = 0.5 * (tmp - field_init)

    def ev_bwd(px, py):
        mx, my = _map_sample_2d(grid, bwd, px, py)
        return interp.sample2_lattice(tmp, mx, my, h, off, values=True)

    corr = _volume_eval_2d(grid, kind, ev_bwd)
    out = jnp.where(band, field - corr, field)
    return advect.clamp_extrema_neighborhood(field, out)


def accumulate_2d(grid, kind, dfield, change, fwd, coeff=1.0):
    """dfield += vol< coeff * change(F(x)) > (accumulateVelocity/Scalars with
    error_correction=false, the only mode the reference exercises)."""
    off = grid.off_of(kind)
    h = grid.h

    def ev(px, py):
        mx, my = _map_sample_2d(grid, fwd, px, py)
        return coeff * interp.sample2_lattice(change, mx, my, h, off, values=True)

    delta = _volume_eval_2d(grid, kind, ev)
    a, b = _BANDS_2D_ACCUM[kind]
    band = _band2(dfield.shape, a, b)
    return jnp.where(band, dfield + delta, dfield)


def estimate_distortion_2d(grid, bwd, fwd):
    """2D distortion: max over both compositions of |x - M(x)| (NOT squared;
    estimateDistortion, BimocqSolver2D.cpp:666-697), band i,j in [3, n-4]."""
    h = grid.h
    px, py = grid.node_coords("c")
    off = (0.5, 0.5)

    fx = fwd[0]
    fy = fwd[1]
    bx_at_f = interp.sample2_lattice(bwd[0], fx, fy, h, off)
    by_at_f = interp.sample2_lattice(bwd[1], fx, fy, h, off)
    d1 = jnp.sqrt((bx_at_f - px) ** 2 + (by_at_f - py) ** 2)

    bx = bwd[0]
    by = bwd[1]
    fx_at_b = interp.sample2_lattice(fwd[0], bx, by, h, off)
    fy_at_b = interp.sample2_lattice(fwd[1], bx, by, h, off)
    d2 = jnp.sqrt((fx_at_b - px) ** 2 + (fy_at_b - py) ** 2)

    band = _band2(px.shape, (2, 2), (3, 3))
    d = jnp.where(band, jnp.maximum(d1, d2), 0.0)
    return jnp.max(d)
