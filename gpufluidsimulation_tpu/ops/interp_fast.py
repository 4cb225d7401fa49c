"""Gather-free trilinear interpolation for TPU — the engine's hot primitive.

Why: XLA's general gather on this TPU costs ~8ns per *index* (scalar-core
loop; measured: one 16.7M-point trilinear sample of a 256^3 field = 3.0 s).
Semi-Lagrangian/characteristic-map displacements are CFL-bounded and smooth
(SURVEY.md §7 hard part 1), so each output block only ever reads a bounded
input window around a per-block integer base shift — fetchable with ONE DMA
instead of thousands of scalar gathers.

Kernel geometry (`_kernel`): output blocks of (8, 8, 128) over a 3D grid.
Per block:
  1. XLA prepass computes per-block integer base shifts
     s = round(mean(g - node)) per axis and window origins:
     x free (leading dim, arbitrary offsets), y floor-8 aligned,
     z = the 128-aligned tile at the shifted band start (dynamic
     tile-aligned DMA offsets are legal; arbitrary ones are not).
  2. One async DMA pulls the (Wx, 32, 256) window HBM->VMEM.
  3. In-kernel re-basing with dynamic `pltpu.roll`s: a lane roll (256,
     power of two — a hard requirement, dynamic rolls on non-pow2 dims
     miscompile on this Mosaic) absorbs the sub-tile z offset, a sublane
     roll (32) absorbs the y alignment slack. After the rolls the needed
     (x, y, z) tap band sits at the window origin.
  4. Trilinear interpolation = hat-weighted sum over the relative integer
     shifts; hat(t) = max(0,1-|t|) is simultaneously the trilinear weight
     AND the window mask, so the sum is exact under the residual contract.
     Pure VPU fmas on VMEM data. Two forms: ADAPTIVE (default) loops only
     each block's live y/z tap range via dynamic fori_loops + pow2 rolls
     (x stays a static slice loop) — bit-identical to the static form,
     typically ~5x fewer fmas and ~100x smaller Mosaic programs (2s vs
     300s compiles at 256^3); STATIC (GFS_INTERP_ADAPTIVE=0) unrolls the
     full (2Rr+3)^3 stencil with hoisted hat weights.
  5. Coverage (product of per-axis hat sums) renormalizes window-clipped
     edge cells (clamp-to-window instead of silent mass loss).
  6. Window DMAs are double-buffered across grid steps (_pipeline_window):
     block i+1's window streams in while block i computes — the fetch and
     the arithmetic used to serialize, leaving the kernel latency-bound.

Contract (checked by residual_overflow / tests): per-axis
|(g - node) - round(block mean)| <= Rr + 0.5 over each (8,8,128) block
(plus |z base shift| <= 127-Rr, far beyond any CFL-bounded flow). BiMocq
with per-frame reinitialization keeps total displacement around the CFL
number and in-block variation well under Rr=2 (default).

CPU fallback / correctness oracle: interp.sample3 (exact gather form).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX = 16   # 32 tried: 527 -> 575 ms/step at 256^3 (bigger blocks lose more
# to rim-block waste + per-launch tail effects than the x-window ratio wins)
WY_WIN = 32   # y window rows (power of two: dynamic sublane rolls require it)


def _by(Rr):
    """Output-block y extent. The window is pinned at WY_WIN=32 rows (the
    pow2 the dynamic sublane roll requires); 24-row blocks (band 30 at
    Rr<=2) would cut window DMA waste 33% but compile+run stalled >9min on
    this Mosaic (vs ~2 min at 16) — parked until that's understood."""
    del Rr
    return 16
WZ_WIN = 384  # z window lanes DMA'd (3 tiles; rebased to a pow2 256 in-kernel)

# z-block extent: 256-lane blocks halve the window-DMA amplification on the
# z axis (512-lane window / 256 block = 2x vs 384/128 = 3x) and rebase with
# ONE pow2 roll (512 is a power of two; 384 needs two rolls + a select).
# Measured per-phase at 256^3: WINS only in the DMA-bound static-origin DMC
# kernel (63.2 -> 57.8 ms); LOSES in the compute-bound fused RK3 (79.5 ->
# 99.9) and the rebased pull-back samplers (47/47/60 -> 51/51/68) — so each
# wrapper passes its measured preference and 'auto' honors it. 128/256
# force the extent everywhere. Per-block contract residuals span twice the
# z extent at 256; the overflow counter (residual_overflow, same blocking
# rule) is the honest accuracy monitor either way.
_BZ_ENV = os.environ.get("GFS_INTERP_BZ", "auto")

# Static x-tap count of the fused RK3 trace kernels (0 disables): the x
# (major) axis supports neither dynamic slices nor dynamic rolls, so the
# narrowing rides the per-block DMA origin instead — _origins shifts each
# block's x window origin to its live-tap start (stage-1 stats widened by
# the <1-cell stage-drift bound) and the kernel loops [0, XNT) statically.
# Blocks whose live range exceeds XNT clamp + renormalize and are counted
# into the frame's overflow monitor (-> step_checked exact-path retry).
# default 7: the cheapest cap with ZERO exact-count truncations through
# developed bench flows under every volume mode (6 is ~2-7 ms faster but
# trips a handful of samples per frame at CFL ~2.6+, which the strict
# CLI mode would then retry on the exact path every frame)
_RK3_XNT = int(os.environ.get("GFS_RK3_XNT", "7"))
# Two-tier static-x-tap mode (r5): the per-block live width (prepass stats
# + clip shift, margin included) selects between a LO tap loop (default 5
# — covers 86-100% of blocks on the developed 256^3 bench flow, measured
# histogram: entry widths 4 for all blocks, after 2 substeps <=5 for 96%,
# after 3 for 86%) and the full XNT loop, ONE predicate per block over the
# whole stage body (the per-channel predication that loses — see
# _sample_mac_stage's docstring — has 18 small regions; this has 2 large
# ones). 0 disables the split.
_RK3_XNT_LO = int(os.environ.get("GFS_RK3_XNT_LO", "5"))
# Third tier (r5): blocks whose live width fits 4 taps — the measured
# histogram's "entry widths 4 for ALL blocks" after the first windowed
# substep — run a 4-tap loop. 0 disables (falls back to two-tier).
_RK3_XNT_LO2 = int(os.environ.get("GFS_RK3_XNT_LO2", "4"))
# Per-channel static x bands in the peel kernel (see _ident_x_bands);
# 0 restores the shared 5-tap channel-union band.
_IDENT_BANDS = os.environ.get("GFS_IDENT_BANDS", "1") not in ("0", "false")
# The same narrowing in the fused DMC kernel's map gather (5 static taps)
# measured ~1.5 ms at 256^3 — NOT worth tightening that kernel's
# documented |d| <= Rr+0.5 displacement contract (a 2.24-cell legal
# displacement would clamp). Off by default; kept for experiments.
_DMC_XNT = int(os.environ.get("GFS_DMC_XNT", "0"))


def _bz(Z, prefer=128):
    """Sampler z-block extent for a padded (128-multiple) z extent Z."""
    if _BZ_ENV not in ("auto", "", None):
        prefer = int(_BZ_ENV)
    return prefer if Z % prefer == 0 and Z >= prefer else 128


# z front pad of every padded field. 124 (not 128) so STATIC-origin
# kernels (s=0, _dmc_origin) land their band start 124-(Rr+1) lanes past a
# tile boundary: the in-window offset is 121 (Rr=2) and the full live tap
# band (bz + 2Rr+2 lanes) ends at 121 + 262 = 383 < 384 for bz=256 —
# letting the static 256-lane-block kernels use a 3-tile (384) window
# instead of 4 (512): -25% window DMA in the DMA-bound fused DMC kernel.
FRONT_Z = 124


def _wz_win(bz, static=False):
    """z window lanes DMA'd for a bz-lane block: bz + tap reach (2Rr+2 <=
    6) + alignment remainder, rounded up to a 128-multiple. Static-origin
    kernels have a fixed in-window offset of FRONT_Z-(Rr+1) <= 121, so
    their 256-lane blocks fit a 384 window; dynamic origins carry up to a
    ~231-lane rebase roll (top-clamped origins) and need 512."""
    if bz == 128 or static:
        return 384
    return 512


def _ceil(a, b):
    return -(-a // b) * b


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _gker(t):
    """Per-axis weight of the post-map volume corner average:
    0.5*(hat(t-1/4) + hat(t+1/4)) — sampling with this kernel per axis IS
    the mean over the 8 (+-0.25h)^3 corner offsets applied to the MAPPED
    position (the separable identity mean_c trilerp(p+c) = prod_axis
    pair-mean; support (-1.25, 1.25))."""
    return 0.5 * (_hat(t - 0.25) + _hat(t + 0.25))


def _live_taps_d(rel, W, d):
    """_live_taps widened by +-d (the dual volume kernel's wider per-axis
    support): tap dq is live iff g(rel - dq) > 0 for some element."""
    lo = jnp.clip(jnp.floor(jnp.min(rel) - d).astype(jnp.int32), 0, W - 1)
    hi = jnp.clip(jnp.floor(jnp.max(rel) + d).astype(jnp.int32) + 1, 0, W - 1)
    return lo, jnp.maximum(hi - lo + 1, 0)


# ---------------------------------------------------------------------------
# shared prepass: window origins + rebased local coordinates
# ---------------------------------------------------------------------------


_NSC = 9  # per-block scalars in the prefetch vector (see _origins)

# When a list, every windowed-sampler launch traced while it is active
# appends its per-launch contract-violation block count (see
# _overflow_count) — the zero-cost runtime monitor: the counts are a
# byproduct of the block stats the _origins prepass already computes.
OVERFLOW_SINK = None


class overflow_sink:
    """Context manager collecting per-launch displacement-contract
    violation counts from every windowed-sampler launch traced inside.

    Usage: `with overflow_sink() as counts: ... ; total = sum(counts)`.
    Only safe when the enclosed launches live in the SAME jax trace scope
    as the consumer — do NOT wrap samplers inside lax.while_loop/scan
    bodies whose counts are summed outside (leaked-tracer error)."""

    def __enter__(self):
        global OVERFLOW_SINK
        self._prev = OVERFLOW_SINK
        OVERFLOW_SINK = []
        return OVERFLOW_SINK

    def __exit__(self, *exc):
        global OVERFLOW_SINK
        OVERFLOW_SINK = self._prev
        return False


def _overflow_count(stats, Rr):
    """Count blocks whose residual band cannot fit the tap window: with the
    midpoint base shift s, an element's taps clip (-> clamp+renormalize,
    i.e. an actually-wrong sample) iff d + delta - s < -(Rr+1) or
    > Rr+1 somewhere in the block. This is the exact mass-clipping
    condition; residual_overflow's Rr+0.5 bound is the conservative
    guaranteed-fit version of the same contract (it can flag blocks whose
    rounding still fits)."""
    viol = None
    for mn, mx, s, dlo, dhi in stats:
        v = ((mn + dlo - s.astype(jnp.float32) < -(Rr + 1))
             | (mx + dhi - s.astype(jnp.float32) > Rr + 1))
        viol = v if viol is None else viol | v
    return jnp.sum(viol, dtype=jnp.int32)


def _origins(gx, gy, gz, fs_xy, *, Rr, P, nb,
             dspan=((0.0, 0.0), (0.0, 0.0), (0.0, 0.0)),
             want_count=False, x_taps=None, x_margin=0, count_x=True,
             want_x_widths=False):
    """Per-block scalars [ox, oy, sy_slack, ozw, g0, ylo, nyt, zlo, nzt].

    ox: x window origin (arbitrary); oy: y origin (floor-8, slack absorbed
    by a sublane roll); ozw: 128-aligned z window origin; g0: padded-coord
    start of the z tap band (g0 - ozw is the in-window lane roll).
    ylo/nyt, zlo/nzt: the block's LIVE tap range per axis — the smallest
    sub-range of [0, 2Rr+2] whose hat weights are nonzero for any element
    (and any channel coordinate delta in `dspan`), so adaptive kernels loop
    only over contributing taps. Base shifts use the block's residual
    midpoint (min+max)/2 — minimizes the worst-case in-block residual.
    """
    W = 2 * Rr + 3
    BY = _by(Rr)
    bz = gx.shape[2] // nb[2]
    dx = gx - (jax.lax.broadcasted_iota(jnp.float32, gx.shape, 0) + P)
    dy = gy - (jax.lax.broadcasted_iota(jnp.float32, gy.shape, 1) + P)
    dz = gz - (jax.lax.broadcasted_iota(jnp.float32, gz.shape, 2) + FRONT_Z)

    def mm(d):
        r = d.reshape(nb[0], BX, nb[1], BY, nb[2], bz)
        return r.min(axis=(1, 3, 5)), r.max(axis=(1, 3, 5))

    mnx, mxx = mm(dx)
    mny, mxy = mm(dy)
    mnz, mxz = mm(dz)
    s_x = jnp.round(0.5 * (mnx + mxx)).astype(jnp.int32)
    s_y = jnp.round(0.5 * (mny + mxy)).astype(jnp.int32)
    # +-(112 - Rr): keeps the top-clamped rebase roll (relz, below) within
    # the wrap-safe range of _rebased_window for both window extents
    # (live lane + relz < WZ); covers block-mean z drifts to ~110 cells,
    # far beyond any CFL-bounded flow (larger drifts clamp + renormalize,
    # flagged by residual_overflow exactly as before)
    s_z = jnp.clip(jnp.round(0.5 * (mnz + mxz)).astype(jnp.int32),
                   -(112 - Rr), 112 - Rr)

    Wx = BX + 2 * Rr + 2
    bo_x = (jnp.arange(nb[0], dtype=jnp.int32) * BX)[:, None, None]
    bo_y = (jnp.arange(nb[1], dtype=jnp.int32) * BY)[None, :, None]
    bo_z = (jnp.arange(nb[2], dtype=jnp.int32) * bz)[None, None, :]
    ox = jnp.clip(bo_x + P + s_x - (Rr + 1), 0, fs_xy[0] - Wx)
    oy_ideal = jnp.clip(bo_y + P + s_y - (Rr + 1), 0,
                        fs_xy[1] - (BY + 2 * Rr + 2))
    oy = jnp.minimum((oy_ideal // 8) * 8, fs_xy[1] - WY_WIN)
    slack = oy_ideal - oy
    # z: padded band start G0 = 128 + bz*bk + s_z - (Rr+1); window origin is
    # its 128-aligned floor, top-clamped so the fixed-extent window DMA
    # stays inside the (Z + 256)-padded field; the clamp remainder joins
    # the in-kernel rebase roll (relz = g0 - ozw <= ~234, wrap-safe)
    g0 = FRONT_Z + bo_z + s_z - (Rr + 1)
    ozw = jnp.clip((g0 // 128) * 128, 0, fs_xy[2] - _wz_win(bz))

    # live tap ranges: element taps are {floor(l - node), +1}; block-wide
    # [floor(min), floor(max)+1], clipped to the window's [0, W-1] (clipped
    # taps renormalize via coverage — identical to the static form)
    def taps(lo_val, hi_val):
        lo = jnp.clip(jnp.floor(lo_val).astype(jnp.int32), 0, W - 1)
        hi = jnp.clip(jnp.floor(hi_val).astype(jnp.int32) + 1, 0, W - 1)
        return lo, hi - lo + 1

    q_y = (bo_y + P - oy_ideal).astype(jnp.float32)
    ylo, nyt = taps(mny + q_y + dspan[1][0], mxy + q_y + dspan[1][1])
    r_z = (Rr + 1 - s_z).astype(jnp.float32)
    zlo, nzt = taps(mnz + r_z + dspan[2][0], mxz + r_z + dspan[2][1])

    count_x_taps = None
    if x_taps is not None:
        # STATIC-x-tap mode: shift each block's x window origin to its
        # live-tap start (x is the leading axis — origins are free, but
        # neither dynamic slices nor dynamic rolls exist there, so the
        # narrowing must come from the DMA descriptor itself). The kernel
        # then loops x taps [0, x_taps) statically — no switch, no
        # predication — over a window only BX + x_taps - 1 rows tall.
        # `x_margin` widens the measured live range by whole taps on both
        # sides (the RK3 kernel's stage-2/3 drift is < 1 cell by the CFL
        # substep bound). Blocks whose widened range exceeds x_taps lose
        # the overhanging taps (clamp + renormalize, exactly the window-
        # edge semantics) and are counted.
        q_x = (bo_x + P - ox).astype(jnp.float32)
        xlo_i = jnp.clip(
            jnp.floor(mnx + q_x + dspan[0][0]).astype(jnp.int32) - x_margin,
            0, W - 1)
        xhi_i = jnp.clip(
            jnp.floor(mxx + q_x + dspan[0][1]).astype(jnp.int32) + 1
            + x_margin, 0, W - 1)
        count_x_taps = jnp.sum(xhi_i - xlo_i + 1 > x_taps, dtype=jnp.int32)
        ox_intended = ox + xlo_i
        ox = jnp.clip(ox_intended, 0, fs_xy[0] - (BX + x_taps - 1))
        # effective per-block live x width for the two-tier kernel: the
        # raw live range plus any origin-clip shift (a clipped origin
        # slides every element's taps by the clip distance)
        x_widths = (xhi_i - xlo_i + 1) + jnp.abs(ox_intended - ox)

    if not want_count:
        count = None
    else:
        stats = [
            (mny, mxy, s_y, dspan[1][0], dspan[1][1]),
            (mnz, mxz, s_z, dspan[2][0], dspan[2][1]),
        ]
        if x_taps is None:
            stats.insert(0, (mnx, mxx, s_x, dspan[0][0], dspan[0][1]))
        count = _overflow_count(stats, Rr)
        if count_x_taps is not None and count_x:
            count = count + count_x_taps

    shape3 = (nb[0], nb[1], nb[2])
    packed = jnp.stack(
        [jnp.broadcast_to(v, shape3).reshape(-1)
         for v in (ox, oy, slack, ozw, g0, ylo, nyt, zlo, nzt)],
        axis=-1,
    ).reshape(-1)
    out = (packed,)
    if want_count:
        out = out + (count,)
    if want_x_widths:
        out = out + (jnp.broadcast_to(x_widths, shape3).reshape(-1),)
    return out if len(out) > 1 else packed


def _origins_union(pos_sets, fs_xy, *, Rr, P, nb):
    """_origins over the UNION of several (gx, gy, gz) position sets (the
    fused pull-back kernel samples one field pack at per-kind staggered
    positions): block residual stats are min/max across all sets, so one
    window covers every channel; per-channel live taps are re-derived
    in-kernel. NOTE: the origin-selection block below mirrors _origins —
    keep the two in sync if the window geometry ever changes."""
    W = 2 * Rr + 3
    BY = _by(Rr)
    bz = pos_sets[0][0].shape[2] // nb[2]

    def mm(d):
        r = d.reshape(nb[0], BX, nb[1], BY, nb[2], bz)
        return r.min(axis=(1, 3, 5)), r.max(axis=(1, 3, 5))

    mns = [None] * 3
    mxs = [None] * 3
    for gx, gy, gz in pos_sets:
        dx = gx - (jax.lax.broadcasted_iota(jnp.float32, gx.shape, 0) + P)
        dy = gy - (jax.lax.broadcasted_iota(jnp.float32, gy.shape, 1) + P)
        dz = gz - (jax.lax.broadcasted_iota(jnp.float32, gz.shape, 2) + FRONT_Z)
        for i, d in enumerate((dx, dy, dz)):
            mn, mx = mm(d)
            mns[i] = mn if mns[i] is None else jnp.minimum(mns[i], mn)
            mxs[i] = mx if mxs[i] is None else jnp.maximum(mxs[i], mx)

    s_x = jnp.round(0.5 * (mns[0] + mxs[0])).astype(jnp.int32)
    s_y = jnp.round(0.5 * (mns[1] + mxs[1])).astype(jnp.int32)
    s_z = jnp.clip(jnp.round(0.5 * (mns[2] + mxs[2])).astype(jnp.int32),
                   -(112 - Rr), 112 - Rr)

    Wx = BX + 2 * Rr + 2
    bo_x = (jnp.arange(nb[0], dtype=jnp.int32) * BX)[:, None, None]
    bo_y = (jnp.arange(nb[1], dtype=jnp.int32) * BY)[None, :, None]
    bo_z = (jnp.arange(nb[2], dtype=jnp.int32) * bz)[None, None, :]
    ox = jnp.clip(bo_x + P + s_x - (Rr + 1), 0, fs_xy[0] - Wx)
    oy_ideal = jnp.clip(bo_y + P + s_y - (Rr + 1), 0,
                        fs_xy[1] - (BY + 2 * Rr + 2))
    oy = jnp.minimum((oy_ideal // 8) * 8, fs_xy[1] - WY_WIN)
    slack = oy_ideal - oy
    g0 = FRONT_Z + bo_z + s_z - (Rr + 1)
    ozw = jnp.clip((g0 // 128) * 128, 0, fs_xy[2] - _wz_win(bz))
    zero = jnp.zeros_like(ox)
    shape3 = (nb[0], nb[1], nb[2])
    return jnp.stack(
        [jnp.broadcast_to(v, shape3).reshape(-1)
         for v in (ox, oy, slack, ozw, g0, zero, zero, zero, zero)],
        axis=-1,
    ).reshape(-1)


def _block_scalars(origin_ref, blk):
    # origins are a flat i32 vector (blk*_NSC + c) — 2D SMEM operands get
    # row-padded to 128 lanes, which overflows the 1MB SMEM at large grids
    ox = origin_ref[blk * _NSC]
    oy = pl.multiple_of(origin_ref[blk * _NSC + 1], 8)
    sy = origin_ref[blk * _NSC + 2]
    ozw = pl.multiple_of(origin_ref[blk * _NSC + 3], 128)
    g0 = origin_ref[blk * _NSC + 4]
    return ox, oy, sy, ozw, g0


def _block_taps(origin_ref, blk):
    ylo = origin_ref[blk * _NSC + 5]
    nyt = origin_ref[blk * _NSC + 6]
    zlo = origin_ref[blk * _NSC + 7]
    nzt = origin_ref[blk * _NSC + 8]
    return ylo, nyt, zlo, nzt


def _window_copy(origin_ref, blk, field_hbm, win_ref, sem, slot, win_shape):
    """The window DMA descriptor for block `blk` into double-buffer `slot`.

    The same descriptor is constructed twice — once to .start() it one grid
    step ahead, once to .wait() on it in the consuming step — the standard
    Pallas multi-buffering idiom that overlaps each block's window fetch
    with the previous block's arithmetic (the DMA and the hat loops used to
    serialize, leaving the kernel latency-bound)."""
    ox, oy, _, ozw, _ = _block_scalars(origin_ref, blk)
    if field_hbm.ndim == 4:
        src = field_hbm.at[
            :, pl.ds(ox, win_shape[1]), pl.ds(oy, win_shape[2]),
            pl.ds(ozw, win_shape[3]),
        ]
    else:
        src = field_hbm.at[
            pl.ds(ox, win_shape[0]), pl.ds(oy, win_shape[1]),
            pl.ds(ozw, win_shape[2]),
        ]
    return pltpu.make_async_copy(src, win_ref.at[slot], sem.at[slot])


def _pipeline_window(origin_ref, field_hbm, win_ref, sem, win_shape):
    """Start block blk+1's window DMA, wait for block blk's; returns the
    current block's window slot value."""
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    nb1 = pl.num_programs(1)
    nb2 = pl.num_programs(2)
    blk = (bi * nb1 + bj) * nb2 + bk
    nblk = pl.num_programs(0) * nb1 * nb2
    slot = jax.lax.rem(blk, 2)

    @pl.when(blk == 0)
    def _():
        _window_copy(origin_ref, 0, field_hbm, win_ref, sem, 0,
                     win_shape).start()

    @pl.when(blk + 1 < nblk)
    def _():
        _window_copy(origin_ref, blk + 1, field_hbm, win_ref, sem,
                     jax.lax.rem(blk + 1, 2), win_shape).start()

    _window_copy(origin_ref, blk, field_hbm, win_ref, sem, slot,
                 win_shape).wait()
    return blk, slot


def _rebased_window(win_ref, sy, relz, y_axis, out_z=None):
    """Rebase the (.., WY_WIN, WZ) window so the tap band starts at row
    (y=0, z=0) of a (.., WY_WIN, pow2) buffer.

    Dynamic `pltpu.roll` only compiles correctly on power-of-two dims.
    WZ=512 (256-lane blocks) is already a power of two: one z roll does it
    (taps only read lanes [0, 262) and l + relz <= 261 + 127 < 512, so no
    wraparound ever reaches a live tap). The 3-tile WZ=384 window (128-lane
    blocks) is rebased with two 256-lane rolls + a lane select:
      want V[l] = win[l + relz], l in [0, 256), relz in [0, 127]
      A = roll(win[0:256], -relz)          covers l + relz < 256
      D = roll(concat(win[256:], win[256:]), -relz)   covers the tail
    then one sublane roll (32 rows) absorbs the y alignment slack.

    bf16 windows (config.interp_window_dtype) are widened to f32 here, at
    the VMEM->vreg load — all tap math stays f32."""
    win = win_ref[...]
    if win.dtype != jnp.float32:
        win = win.astype(jnp.float32)
    z_axis = y_axis + 1
    ndim = win.ndim

    if win.shape[z_axis] != 384:
        v = pltpu.roll(win, -relz, z_axis)
        return pltpu.roll(v, -sy, y_axis)

    if out_z == 512:
        # 384-lane window feeding a 256-lane-block kernel (live tap band up
        # to 262 lanes > the 256-lane A/D result): zero-extend to the pow2
        # 512 in VMEM and single-roll. The zeros land past every live tap
        # (relz + live <= 383 < 384 by the FRONT_Z static-origin layout);
        # HBM DMA stays at the 3-tile 384 extent.
        zshape = list(win.shape)
        zshape[z_axis] = 128
        v = jnp.concatenate(
            [win, jnp.zeros(zshape, win.dtype)], axis=z_axis
        )
        v = pltpu.roll(v, -relz, z_axis)
        return pltpu.roll(v, -sy, y_axis)

    def zslice(lo, hi):
        idx = [slice(None)] * ndim
        idx[z_axis] = slice(lo, hi)
        return win[tuple(idx)]

    a = pltpu.roll(zslice(0, 256), -relz, z_axis)
    w2 = zslice(256, 384)
    d = pltpu.roll(jnp.concatenate([w2, w2], axis=z_axis), -relz, z_axis)
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, z_axis)
    v = jnp.where(lane + relz < 256, a, d)
    return pltpu.roll(v, -sy, y_axis)


def _local_coords(gx_ref, gy_ref, gz_ref, ox, oy, sy, g0, Rr):
    lx = gx_ref[...] - ox.astype(jnp.float32)
    ly = gy_ref[...] - (oy + sy).astype(jnp.float32)
    # lz measured from the tap-band start: band row 0 = padded row g0, and
    # g0 = node_base + s_z - (Rr+1), so local tap dr matches hat offset
    # (lz - dr) with lz in [Rr+0.5, Rr+1.5] + residual
    lz = gz_ref[...] - g0.astype(jnp.float32)
    return lx, ly, lz


def _hats(lx, ly, lz, block, Rr):
    W = 2 * Rr + 3
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    # hoisted hat weights: 3W evaluations instead of ~W^3
    hx = [_hat(lx - (a + dp)) for dp in range(W)]
    hy = [_hat(ly - (b + dq)) for dq in range(W)]
    hz = [_hat(lz - (c + dr)) for dr in range(W)]
    return hx, hy, hz


def _trilerp_sum_dual(win, lx, ly, lz, block, Rr):
    """Static full-W evaluation of the 9-point volume blend
    0.5*prod(g) + 0.5*prod(hat), each term coverage-renormalized like its
    single-kernel counterpart (window-clipped taps lose only their own
    term's mass)."""
    W = 2 * Rr + 3
    B1, B2, B3 = block
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    hx = [_hat(lx - (a + dp)) for dp in range(W)]
    hy = [_hat(ly - (b + dq)) for dq in range(W)]
    hz = [_hat(lz - (c + dr)) for dr in range(W)]
    gx = [_gker(lx - (a + dp)) for dp in range(W)]
    gy = [_gker(ly - (b + dq)) for dq in range(W)]
    gz = [_gker(lz - (c + dr)) for dr in range(W)]
    out_h = jnp.zeros(block, jnp.float32)
    out_g = jnp.zeros(block, jnp.float32)
    for dr in range(W):
        winz = win[:, :, dr : dr + B3]
        acc_yh = jnp.zeros(block, jnp.float32)
        acc_yg = jnp.zeros(block, jnp.float32)
        for dq in range(W):
            winyz = winz[:, dq : dq + B2, :]
            acc_xh = jnp.zeros(block, jnp.float32)
            acc_xg = jnp.zeros(block, jnp.float32)
            for dp in range(W):
                v = winyz[dp : dp + B1]
                acc_xh = acc_xh + hx[dp] * v
                acc_xg = acc_xg + gx[dp] * v
            acc_yh = acc_yh + hy[dq] * acc_xh
            acc_yg = acc_yg + gy[dq] * acc_xg
        out_h = out_h + hz[dr] * acc_yh
        out_g = out_g + gz[dr] * acc_yg
    cov_h = sum(hx) * sum(hy) * sum(hz)
    cov_g = sum(gx) * sum(gy) * sum(gz)
    rh = jnp.where(cov_h > 1e-6, out_h / jnp.maximum(cov_h, 1e-6), 0.0)
    rg = jnp.where(cov_g > 1e-6, out_g / jnp.maximum(cov_g, 1e-6), 0.0)
    return 0.5 * rg + 0.5 * rh


def _trilerp_sum(win, hx, hy, hz, block, Rr):
    W = 2 * Rr + 3
    B1, B2, B3 = block
    out = jnp.zeros(block, jnp.float32)
    for dr in range(W):
        winz = win[:, :, dr : dr + B3]
        acc_y = jnp.zeros(block, jnp.float32)
        for dq in range(W):
            winyz = winz[:, dq : dq + B2, :]
            acc_x = jnp.zeros(block, jnp.float32)
            for dp in range(W):
                acc_x = acc_x + hx[dp] * winyz[dp : dp + B1]
            acc_y = acc_y + hy[dq] * acc_x
        out = out + hz[dr] * acc_y
    cov = sum(hx) * sum(hy) * sum(hz)
    return jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)


# ---------------------------------------------------------------------------
# Adaptive-tap accumulation: dynamic fori_loops over each block's live tap
# ranges (ylo/nyt, zlo/nzt from _origins) instead of the full static W^3
# stencil. Bit-identical to the static form — skipped taps have exactly-zero
# hat weight — but typically ~5x fewer VPU ops (live range = hat support 2
# + in-block displacement variation, usually 3-4 taps vs W=2Rr+3) and a far
# smaller Mosaic program (loops compile once instead of W^3 unrolled terms).
# y/z re-basing per tap is a dynamic pow2 roll (sublane 32 / lane 256 — the
# only dynamic-shift form this Mosaic compiles correctly); the x axis keeps
# the static W-slice loop (major-axis slices must be static).
# ---------------------------------------------------------------------------


def _cov_loop(l, iota, lo, n):
    def body(s, cv):
        return cv + _hat(l - (iota + (lo + s).astype(jnp.float32)))

    return jax.lax.fori_loop(0, n, body, jnp.zeros(l.shape, jnp.float32))


_XNX_ENV = os.environ.get("GFS_INTERP_XNX")
X_NX = None if _XNX_ENV in (None, "", "0") else int(_XNX_ENV)

# rebase-once + static-tap-tile trilerp (see _trilerp_when): NT y/z taps
# per block; 0 disables (falls back to the roll-per-tap adaptive form)
_REBASED_ENV = os.environ.get("GFS_INTERP_REBASED", "3")
REBASED_NT = 0 if _REBASED_ENV in ("", "0", "false") else int(_REBASED_ENV)

# static CENTERED x-tap subrange in _trilerp_when's fast branch. The x axis
# can be neither dynamically sliced nor rolled (major axis, non-pow2), but
# the prepass base shift centers each block's x residual band on the window
# center Rr+1, so live x taps cluster in a small centered subrange
# (measured on the developed 128^3 vortex-collision flow at CFL 2.6:
# max 4 live taps, 100% inside the centered 5, ~89% inside the centered 3).
# Blocks whose live range escapes it take the existing full-W fallback
# branch — bit-identical either way. 0 = keep the full-W x loop.
_XNT_ENV = os.environ.get("GFS_INTERP_XNT", "5")
REBASED_XNT = 0 if _XNT_ENV in ("", "0", "false") else int(_XNT_ENV)


def _trilerp_when(win_c, lx, ly, lz, block, Rr, store, nt=None,
                  dual=False):
    """Trilerp one channel window with the rebase-once/static-tile scheme,
    delivering the result via `store(value)` inside predicated regions.

    Measured on v5e: the roll-per-tap adaptive form spends as much in its
    dynamic rolls + fori machinery as it saves in hat-weighted FMAs; static
    small-tap tiles after a SINGLE per-channel (y, z) rebase roll run ~2x
    faster (6.8 vs 13.8 ms for the 3-channel 256^3 sampler microbench) and
    compile fast — but only with exactly TWO predicated variants (a 7-way
    lax.switch evaluates every branch; a 7-way pl.when chain compiles for
    >28 min on this Mosaic).

    Used by the pull-back samplers (_kernel/_kernel_multi: one store per
    launch), where it wins ~15% at the step level. NOT used by the fused
    RK3/DMC kernels: there the many predicated regions per launch (3
    channels x 3 stages x 2 branches) defeat Mosaic pipelining — measured
    +69/+33 ms at 256^3 (see _sample_mac_stage).

    `win_c` must be the _rebased_window output (alignment already folded),
    (WX, WY_WIN, 256) for one channel. The fast branch covers blocks whose
    live y/z tap ranges fit in `nt` taps; others take the full static-W
    branch. Both branches are bit-identical to the static form: skipped
    taps carry exactly-zero hat weight, rolls are exact permutations, and
    wrapped rows/lanes only ever multiply zero hats (field values are
    finite, so 0*x == 0).
    """
    W = 2 * Rr + 3
    B1, B2, B3 = block
    nt = REBASED_NT if nt is None else nt
    if dual:
        nt = nt + 1  # the g kernel's +-0.25 wider support per axis
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    y_axis = win_c.ndim - 2
    z_axis = win_c.ndim - 1

    d = 0.25 if dual else 0.0
    ylo, nyt = _live_taps_d(ly - b, W, d)
    zlo, nzt = _live_taps_d(lz - c, W, d)
    fits = (nyt <= nt) & (nzt <= nt)
    nx = REBASED_XNT if 0 < REBASED_XNT < W else W
    if dual and nx < W:
        nx = nx + 1
    xs = (W - nx) // 2
    if nx < W:
        xlo, nxt = _live_taps_d(lx - a, W, d)
        fits = fits & (xlo >= xs) & (xlo + nxt <= xs + nx)

    @pl.when(fits)
    def _():
        wy = pltpu.roll(win_c, -ylo, y_axis)
        wz = pltpu.roll(wy, -zlo, z_axis)
        lyr = ly - ylo.astype(jnp.float32)
        lzr = lz - zlo.astype(jnp.float32)
        hx = [_hat(lx - (a + (xs + i))) for i in range(nx)]
        covx = sum(hx)
        gx = [_gker(lx - (a + (xs + i))) for i in range(nx)] if dual else None
        out = jnp.zeros(block, jnp.float32)
        covy = jnp.zeros(block, jnp.float32)
        covz = jnp.zeros(block, jnp.float32)
        out_g = jnp.zeros(block, jnp.float32) if dual else None
        covyg = jnp.zeros(block, jnp.float32) if dual else None
        covzg = jnp.zeros(block, jnp.float32) if dual else None
        for dr in range(nt):
            hz = _hat(lzr - (c + dr))
            covz = covz + hz
            if dual:
                gz = _gker(lzr - (c + dr))
                covzg = covzg + gz
            wzr = wz[..., dr : dr + B3]
            accy = jnp.zeros(block, jnp.float32)
            accyg = jnp.zeros(block, jnp.float32) if dual else None
            for dq in range(nt):
                hy = _hat(lyr - (b + dq))
                if dr == 0:
                    covy = covy + hy
                if dual:
                    gy = _gker(lyr - (b + dq))
                    if dr == 0:
                        covyg = covyg + gy
                wyz = wzr[:, dq : dq + B2, :]
                accx = jnp.zeros(block, jnp.float32)
                accxg = jnp.zeros(block, jnp.float32) if dual else None
                for i in range(nx):
                    v = wyz[xs + i : xs + i + B1]
                    accx = accx + hx[i] * v
                    if dual:
                        accxg = accxg + gx[i] * v
                accy = accy + hy * accx
                if dual:
                    accyg = accyg + gy * accxg
            out = out + hz * accy
            if dual:
                out_g = out_g + gz * accyg
        cov = covx * covy * covz
        rh = jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)
        if dual:
            covg = sum(gx) * covyg * covzg
            rg = jnp.where(covg > 1e-6, out_g / jnp.maximum(covg, 1e-6), 0.0)
            store(0.5 * rg + 0.5 * rh)
        else:
            store(rh)

    @pl.when(~fits)
    def _():
        if dual:
            store(_trilerp_sum_dual(win_c, lx, ly, lz, block, Rr))
        else:
            hx, hy, hz = _hats(lx, ly, lz, block, Rr)
            store(_trilerp_sum(win_c, hx, hy, hz, block, Rr))


def _trilerp_sum_adaptive(win, lx, ly, lz, taps, block, Rr, x_nx=None,
                          x_static=None):
    """Adaptive trilerp. The x axis cannot use dynamic slices (major-axis
    slices must be static under Mosaic) nor dynamic rolls (non-pow2 dim),
    so per-block live x-tap subranges are dispatched with lax.switch over
    STATIC start offsets: branch k sums taps [k, k+NX), the last branch is
    the full-W fallback for blocks whose live range exceeds NX. Skipped
    taps have exactly-zero hat weight, so every branch is bit-identical to
    the static form."""
    W = 2 * Rr + 3
    B1, B2, B3 = block
    ylo, nyt, zlo, nzt = taps
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    covy = _cov_loop(ly, b, ylo, nyt)
    covz = _cov_loop(lz, c, zlo, nzt)
    y_axis = win.ndim - 2
    z_axis = win.ndim - 1

    def core(x0, xn):
        hx = [_hat(lx - (a + dp)) for dp in range(x0, x0 + xn)]
        covx = sum(hx)

        def zbody(t, acc):
            dr = zlo + t
            hz = _hat(lz - (c + dr.astype(jnp.float32)))
            wz = pltpu.roll(win, -dr, z_axis)[..., :B3]

            def ybody(s, accy):
                dq = ylo + s
                hy = _hat(ly - (b + dq.astype(jnp.float32)))
                wyz = pltpu.roll(wz, -dq, y_axis)[:, :B2, :]
                accx = jnp.zeros(block, jnp.float32)
                for i, dp in enumerate(range(x0, x0 + xn)):
                    accx = accx + hx[i] * wyz[dp : dp + B1]
                return accy + hy * accx

            inner = jax.lax.fori_loop(
                0, nyt, ybody, jnp.zeros(block, jnp.float32)
            )
            return acc + hz * inner

        out = jax.lax.fori_loop(0, nzt, zbody, jnp.zeros(block, jnp.float32))
        return out, covx

    if x_static is not None:
        # taps [x0, x0+xn) are a STATIC superset of every element's live
        # x taps (by origin shift or by construction): one unpredicated
        # branch, bit-identical (skipped taps have exactly-zero hat
        # weight; overhangs clamp + renormalize via covx like any window
        # edge)
        out, covx = core(*x_static)
        cov = covx * covy * covz
        return jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)
    nx_cap = X_NX if x_nx is None else x_nx
    if nx_cap is None or nx_cap >= W:
        out, covx = core(0, W)
    else:
        xlo_, nxt_ = _live_taps(lx - a, W)
        sel = jnp.where(nxt_ <= nx_cap,
                        jnp.minimum(xlo_, W - nx_cap),
                        jnp.int32(W - nx_cap + 1))
        branches = [
            (lambda k: (lambda: core(k, nx_cap)))(k)
            for k in range(W - nx_cap + 1)
        ] + [lambda: core(0, W)]
        out, covx = jax.lax.switch(sel, branches)
    cov = covx * covy * covz
    return jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)


def _trilerp_sum_adaptive3(win, lx, ly, lz, taps3, block, Rr):
    """Fully-adaptive trilerp: like _trilerp_sum_adaptive but the x axis
    also loops only its live taps, via lax.dynamic_slice on the window's
    (untiled) major axis. PARKED: wiring this into the fused RK3 kernel
    made the 256^3 Mosaic compile blow up (>9 min / crash) — the dynamic
    major-axis slice inside the triple fori lowers pathologically. Kept for
    reference; the static-x W-loop wastes ~2.2x fma but compiles in
    seconds."""
    B1, B2, B3 = block
    xlo, nxt, ylo, nyt, zlo, nzt = taps3
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    covx = _cov_loop(lx, a, xlo, nxt)
    covy = _cov_loop(ly, b, ylo, nyt)
    covz = _cov_loop(lz, c, zlo, nzt)
    y_axis = win.ndim - 2
    z_axis = win.ndim - 1
    x_axis = win.ndim - 3

    def zbody(t, acc):
        dr = zlo + t
        hz = _hat(lz - (c + dr.astype(jnp.float32)))
        wz = pltpu.roll(win, -dr, z_axis)[..., :B3]

        def ybody(s, accy):
            dq = ylo + s
            hy = _hat(ly - (b + dq.astype(jnp.float32)))
            wyz = pltpu.roll(wz, -dq, y_axis)[:, :B2, :]

            def xbody(r, accx):
                dp = xlo + r
                hxr = _hat(lx - (a + dp.astype(jnp.float32)))
                wxyz = jax.lax.dynamic_slice_in_dim(wyz, dp, B1, x_axis)
                return accx + hxr * wxyz

            inner = jax.lax.fori_loop(
                0, nxt, xbody, jnp.zeros(block, jnp.float32)
            )
            return accy + hy * inner

        return acc + hz * jax.lax.fori_loop(
            0, nyt, ybody, jnp.zeros(block, jnp.float32)
        )

    out = jax.lax.fori_loop(0, nzt, zbody, jnp.zeros(block, jnp.float32))
    cov = covx * covy * covz
    return jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)


def _minmax_adaptive(win, lx, ly, lz, taps, block, Rr):
    W = 2 * Rr + 3
    B1, B2, B3 = block
    ylo, nyt, zlo, nzt = taps
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    hx = [_hat(lx - (a + dp)) for dp in range(W)]
    y_axis = win.ndim - 2
    z_axis = win.ndim - 1
    big = jnp.float32(3.0e38)

    def zbody(t, carry):
        dr = zlo + t
        mz = _hat(lz - (c + dr.astype(jnp.float32))) > 0.0
        wz = pltpu.roll(win, -dr, z_axis)[..., :B3]

        def ybody(s, carry2):
            mn, mx = carry2
            dq = ylo + s
            myq = mz & (_hat(ly - (b + dq.astype(jnp.float32))) > 0.0)
            wyz = pltpu.roll(wz, -dq, y_axis)[:, :B2, :]
            for dp in range(W):
                m = myq & (hx[dp] > 0.0)
                vals = wyz[dp : dp + B1]
                mn = jnp.where(m, jnp.minimum(mn, vals), mn)
                mx = jnp.where(m, jnp.maximum(mx, vals), mx)
            return mn, mx

        return jax.lax.fori_loop(0, nyt, ybody, carry)

    return jax.lax.fori_loop(
        0, nzt, zbody, (jnp.full(block, big), jnp.full(block, -big))
    )


# ---------------------------------------------------------------------------
# single-channel sampler
# ---------------------------------------------------------------------------


def _kernel(origin_ref, gx_ref, gy_ref, gz_ref, field_hbm, out_ref, win_ref,
            sem, *, Rr, block, win_shape, adaptive, dual=False):
    blk, slot = _pipeline_window(origin_ref, field_hbm, win_ref, sem,
                                 win_shape)
    ox, oy, sy, ozw, g0 = _block_scalars(origin_ref, blk)
    lx, ly, lz = _local_coords(gx_ref, gy_ref, gz_ref, ox, oy, sy, g0, Rr)
    win = _rebased_window(win_ref.at[slot], sy, g0 - ozw, 1)
    if dual:
        # 9-point volume blend (0.5*prod(g) + 0.5*prod(hat)) in one pass;
        # dual rides the rebased scheme (callers enforce REBASED_NT)
        def store(v):
            out_ref[...] = v

        _trilerp_when(win, lx, ly, lz, block, Rr, store, dual=True)
        return
    if adaptive:
        if REBASED_NT:
            def store(v):
                out_ref[...] = v

            _trilerp_when(win, lx, ly, lz, block, Rr, store)
            return
        taps = _block_taps(origin_ref, blk)
        out_ref[...] = _trilerp_sum_adaptive(win, lx, ly, lz, taps, block, Rr)
        return
    hx, hy, hz = _hats(lx, ly, lz, block, Rr)
    out_ref[...] = _trilerp_sum(win, hx, hy, hz, block, Rr)


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "P", "interpret", "out_shape", "adaptive",
                     "count_overflow", "dual"),
)
def _sample3_padded(field_padded, gx, gy, gz, *, Rr, P, interpret, out_shape,
                    adaptive=False, count_overflow=False, dual=False):
    """Positions g are lattice-shaped arrays in PADDED field coordinates
    (x/y: +P, z: +128), pre-padded to (mult8, mult8, mult128).
    count_overflow=True additionally returns the launch's contract-violation
    block count (see overflow_sink)."""
    nx, ny, Z = gx.shape
    BY = _by(Rr)
    bz = _bz(Z)
    nb = (nx // BX, ny // BY, Z // bz)
    block = (BX, BY, bz)
    fs = field_padded.shape
    Wx = BX + 2 * Rr + 2
    win_shape = (Wx, WY_WIN, _wz_win(bz))
    # the dual volume kernel's g weights reach +-0.25 cell further per axis
    dsp = ((-0.25, 0.25),) * 3 if dual else ((0.0, 0.0),) * 3
    ocount = None
    if count_overflow:
        origins, ocount = _origins(gx, gy, gz, fs, Rr=Rr, P=P, nb=nb,
                                   dspan=dsp, want_count=True)
    else:
        origins = _origins(gx, gy, gz, fs, Rr=Rr, P=P, nb=nb, dspan=dsp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=nb,
        in_specs=[
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, field_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, Rr=Rr, block=block, win_shape=win_shape, adaptive=adaptive,
        dual=dual,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(gx.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins, gx, gy, gz, field_padded)
    out = out[: out_shape[0], : out_shape[1], : out_shape[2]]
    return (out, ocount) if count_overflow else out


def pad_fields(field_like, out_shape, Rr, dtype=None):
    """Edge-pad a field (leading C axis optional) to the window-safe extent
    for sampling onto `out_shape` lattices. Expensive at large volumes —
    callers that sample the same fields repeatedly (the CFL-substepped
    trace loops) pad ONCE and reuse via the *_padded entry points.

    `dtype` (value windows only — NEVER maps/positions): storage dtype of
    the padded copy; the window kernels DMA it as-is and widen to f32 at
    the vreg load (_rebased_window)."""
    P = Rr + 2
    if dtype is not None and field_like.dtype != dtype:
        field_like = field_like.astype(dtype)
    BY = _by(Rr)
    Z = _ceil(out_shape[2], 128)
    # 128 front pad + 128 back: window origins are top-clamped to
    # fs_z - WZ in _origins/_origins_union (the extra distance moves into
    # the in-kernel rebase roll, legal up to relz ~370/512 minus the live
    # band; see _rebased_window); static origins (_dmc_origin) end at
    # exactly Z + 256 by construction. Was Z + 384 — shrinking the pad
    # cut ~20% of every padded-field materialization at 256^3.
    ZP = Z + 256
    spatial = field_like.shape[-3:]

    xpad = P + max(0, _ceil(out_shape[0], BX) - spatial[0])
    ypad = max(P + max(0, _ceil(out_shape[1], BY) - spatial[1]),
               WY_WIN - spatial[1] + 1)
    # round the padded y extent UP to a sublane multiple: the window-origin
    # top clamp is fs_y - WY_WIN, and every kernel asserts
    # pl.multiple_of(oy, 8) — an odd fs_y (y-staggered kinds: spatial[1] =
    # nj+1) made the clamp value non-8-aligned, so top-y blocks DMA'd
    # their window through a FALSE alignment hint (silently corrupted
    # sublane copies on hardware; interpret mode ignores the hint, which
    # is why CPU tests never saw it). Measured: v-kind vol9 pull-back
    # L_inf 3.9e-4 vs exact at 64^3 before, ~1e-6 after.
    ypad += (-(P + spatial[1] + ypad)) % 8
    padw = [(P, xpad), (P, ypad), (FRONT_Z, ZP - FRONT_Z - spatial[2])]
    if field_like.ndim == 4:
        padw = [(0, 0)] + padw
    return jnp.pad(field_like, padw, mode="edge")


def _pad_positions_rim(gx, gy, gz, P, BY):
    """Pad padded-coord positions out to the (BX, BY, 128) block lattice in
    DISPLACEMENT space: rim elements replicate the edge displacement, so
    rim-block statistics stay representative of the real cells. (The node
    base constant subtracted/re-added cancels algebraically, so any
    consistent base is correct.)"""
    out_shape = gx.shape
    pad_to = (
        _ceil(out_shape[0], BX) - out_shape[0],
        _ceil(out_shape[1], BY) - out_shape[1],
        _ceil(out_shape[2], 128) - out_shape[2],
    )
    if not any(pad_to):
        return gx, gy, gz
    pw = [(0, p) for p in pad_to]

    # Closed form of the displacement-space pad: along its OWN axis a rim
    # element is the edge value plus the node overhang (displacement
    # replicates, the node base keeps growing); along the other axes the
    # coordinate simply replicates. One fused pad+iota pass per channel
    # instead of the subtract/pad/re-add round-trip (two extra full-array
    # materializations per channel at 256^3 — was ~18 ms/step across the
    # pull-back launches). Interior elements pass through EXACTLY (the old
    # form's (g - node) + node could differ in the last ulp).
    def rim(g, axis):
        gp = jnp.pad(g, pw, mode="edge")
        if pad_to[axis]:
            n = g.shape[axis]
            i = jax.lax.broadcasted_iota(jnp.int32, gp.shape, axis)
            gp = gp + jnp.maximum(i - (n - 1), 0).astype(jnp.float32)
        return gp

    return rim(gx, 0), rim(gy, 1), rim(gz, 2)


def _pad_field_positions(field_like, px, py, pz, h, off, Rr, dtype=None):
    """Shared host-side prep: edge-pad the field (leading C axis optional)
    to the window-safe extent and rebase positions into padded coords."""
    out_shape = px.shape
    P = Rr + 2
    BY = _by(Rr)
    fpad = pad_fields(field_like, out_shape, Rr, dtype=dtype)

    gx = px / h - off[0] + P
    gy = py / h - off[1] + P
    gz = pz / h - off[2] + FRONT_Z
    gx, gy, gz = _pad_positions_rim(gx, gy, gz, P, BY)
    return fpad, gx, gy, gz, P


def sample3_fast(field, px, py, pz, h, off, *, Rr=2, Rz=8, interpret=False,
                 adaptive=None, dtype=None, dual=False):
    """Drop-in replacement for interp.sample3 (world positions, field offset
    in units of h) under the bounded-displacement contract above.

    `px, py, pz` must be full-lattice position arrays whose element (i,j,k)
    samples near lattice site (i,j,k) (true for every use in this engine).
    """
    del Rz  # the dynamic-tile z window covers shifts up to ~125 cells
    from gpufluidsimulation_tpu import config

    if adaptive is None:
        adaptive = config.interp_adaptive()
    if dual and not (adaptive and REBASED_NT):
        raise ValueError("dual volume sampling requires the adaptive "
                         "rebased scheme (GFS_INTERP_REBASED > 0)")
    out_shape = px.shape
    fpad, gx, gy, gz, P = _pad_field_positions(field, px, py, pz, h, off, Rr,
                                               dtype=dtype)
    want = OVERFLOW_SINK is not None
    out = _sample3_padded(
        fpad, gx, gy, gz,
        Rr=Rr, P=P, interpret=interpret, out_shape=out_shape,
        adaptive=adaptive, count_overflow=want, dual=dual,
    )
    if want:
        out, ocount = out
        OVERFLOW_SINK.append(ocount)
    return out


def residual_overflow(px, py, pz, h, off, *, Rr=2, Rz=8):
    """Diagnostic: count of samples violating the kernel's reach — per-axis
    in-block residual > Rr+0.5 after mean-centering with the kernel's own
    (BX, BY, bz) blocking, or |z base shift| beyond the window budget.
    Keep at 0."""
    out_shape = px.shape
    BY = _by(Rr)
    bz = _bz(_ceil(out_shape[2], 128))
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    padw = [
        (0, _ceil(out_shape[0], BX) - out_shape[0]),
        (0, _ceil(out_shape[1], BY) - out_shape[1]),
        (0, _ceil(out_shape[2], 128) - out_shape[2]),
    ]
    over = jnp.zeros((), jnp.int32)
    for g, axis in ((gx, 0), (gy, 1), (gz, 2)):
        node = jax.lax.broadcasted_iota(jnp.float32, g.shape, axis)
        d = jnp.pad(g - node, padw, mode="edge")
        nbx, nby = d.shape[0] // BX, d.shape[1] // BY
        nbz = d.shape[2] // bz
        # z-first staged block reduction (lane-dim split is layout
        # preserving; the one-shot 6D reshape retiles the whole array)
        z2 = d.reshape(d.shape[0], d.shape[1], nbz, bz)
        mnz = z2.min(axis=-1).reshape(nbx, BX, nby, BY, nbz)
        mxz = z2.max(axis=-1).reshape(nbx, BX, nby, BY, nbz)
        # the kernel's own base-shift convention: round the block's residual
        # midpoint (min+max)/2 — the shift that minimizes the max residual
        mn = mnz.min(axis=(1, 3))
        mx = mxz.max(axis=(1, 3))
        s = jnp.round(0.5 * (mn + mx))
        if axis == 2:
            s = jnp.clip(s, -(112 - Rr), 112 - Rr)
        sfull = jnp.repeat(jnp.repeat(s, BX, axis=0), BY, axis=1)
        res = jnp.abs(z2 - sfull[:, :, :, None])
        over = over + jnp.sum(res > (Rr + 0.5), dtype=jnp.int32)
    return over


# ---------------------------------------------------------------------------
# Corner min/max variant (MacCormack extrema clamp, GPU_kernel.cu:892-950
# intended semantics): min/max over the 8 trilinear corners at each sample
# position = min/max over window cells with nonzero hat weight.
# ---------------------------------------------------------------------------


def _kernel_minmax(origin_ref, gx_ref, gy_ref, gz_ref, field_hbm,
                   mn_ref, mx_ref, win_ref, sem, *, Rr, block, win_shape,
                   adaptive):
    blk, slot = _pipeline_window(origin_ref, field_hbm, win_ref, sem,
                                 win_shape)
    ox, oy, sy, ozw, g0 = _block_scalars(origin_ref, blk)
    lx, ly, lz = _local_coords(gx_ref, gy_ref, gz_ref, ox, oy, sy, g0, Rr)
    win = _rebased_window(win_ref.at[slot], sy, g0 - ozw, 1)
    if adaptive:
        taps = _block_taps(origin_ref, blk)
        mn_ref[...], mx_ref[...] = _minmax_adaptive(
            win, lx, ly, lz, taps, block, Rr
        )
        return
    hx, hy, hz = _hats(lx, ly, lz, block, Rr)
    W = 2 * Rr + 3
    B1, B2, B3 = block

    big = jnp.float32(3.0e38)
    mn = jnp.full(block, big)
    mx = jnp.full(block, -big)
    for dr in range(W):
        winz = win[:, :, dr : dr + B3]
        for dq in range(W):
            myq = (hz[dr] > 0.0) & (hy[dq] > 0.0)
            winyz = winz[:, dq : dq + B2, :]
            for dp in range(W):
                m = myq & (hx[dp] > 0.0)
                vals = winyz[dp : dp + B1]
                mn = jnp.where(m, jnp.minimum(mn, vals), mn)
                mx = jnp.where(m, jnp.maximum(mx, vals), mx)
    mn_ref[...] = mn
    mx_ref[...] = mx


def minmax3_fast(field, px, py, pz, h, off, *, Rr=2, Rz=8, interpret=False,
                 adaptive=None):
    """Min/max over the trilinear corner cells at each position — the
    window-kernel counterpart of an 8-way corner gather. Same bounded-smooth
    displacement contract as sample3_fast.

    Corner membership is hat-weight > 0: a position within an f32 ulp of a
    lattice plane (in the kernel's padded coordinates) quantizes the far
    corner's weight to exactly 0 and drops that corner from the min/max
    set — a slightly TIGHTER clamp bound than the reference's
    unconditional 8-corner gather at those measure-zero positions
    (O(1e-5)-weight corners; tests mask them)."""
    del Rz
    from gpufluidsimulation_tpu import config

    if adaptive is None:
        adaptive = config.interp_adaptive()
    out_shape = px.shape
    # clamp bounds are field VALUES -> the bf16 window knob applies
    fpad, gx, gy, gz, P = _pad_field_positions(
        field, px, py, pz, h, off, Rr, dtype=config.interp_window_dtype()
    )
    return _minmax3_padded(
        fpad, gx, gy, gz, Rr=Rr, P=P, interpret=interpret,
        out_shape=out_shape, adaptive=adaptive,
    )


@functools.partial(
    jax.jit, static_argnames=("Rr", "P", "interpret", "out_shape", "adaptive")
)
def _minmax3_padded(field_padded, gx, gy, gz, *, Rr, P, interpret, out_shape,
                    adaptive=False):
    nx, ny, Z = gx.shape
    BY = _by(Rr)
    bz = _bz(Z)
    nb = (nx // BX, ny // BY, Z // bz)
    block = (BX, BY, bz)
    fs = field_padded.shape
    Wx = BX + 2 * Rr + 2
    win_shape = (Wx, WY_WIN, _wz_win(bz))
    origins = _origins(gx, gy, gz, fs, Rr=Rr, P=P, nb=nb)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=nb,
        in_specs=[
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, field_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_minmax, Rr=Rr, block=block, win_shape=win_shape,
        adaptive=adaptive,
    )
    mn, mx = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct(gx.shape, jnp.float32),
            jax.ShapeDtypeStruct(gx.shape, jnp.float32),
        ),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins, gx, gy, gz, field_padded)
    sl = np.s_[: out_shape[0], : out_shape[1], : out_shape[2]]
    return mn[sl], mx[sl]


# ---------------------------------------------------------------------------
# Multi-channel sampling: C same-shape fields sampled at one position lattice
# (per-channel static offsets). One window DMA; hat stacks shared between
# channels with identical offsets — the map (3ch) and MAC-velocity (3ch)
# samplers that dominate the BiMocq step's launch count.
# ---------------------------------------------------------------------------


def _kernel_multi(origin_ref, gx_ref, gy_ref, gz_ref, fields_hbm, out_ref,
                  win_ref, sem, *, Rr, block, win_shape, deltas, adaptive,
                  dual=False):
    C = len(deltas)
    blk, slot = _pipeline_window(origin_ref, fields_hbm, win_ref, sem,
                                 win_shape)
    ox, oy, sy, ozw, g0 = _block_scalars(origin_ref, blk)
    lx0, ly0, lz0 = _local_coords(gx_ref, gy_ref, gz_ref, ox, oy, sy, g0, Rr)
    win_all = _rebased_window(win_ref.at[slot], sy, g0 - ozw, 2)

    if dual:
        for ch in range(C):
            dxo, dyo, dzo = deltas[ch]

            def store(v, ch=ch):
                out_ref[ch] = v

            _trilerp_when(win_all[ch], lx0 + dxo, ly0 + dyo, lz0 + dzo,
                          block, Rr, store, dual=True)
        return
    if adaptive:
        if REBASED_NT:
            for ch in range(C):
                dxo, dyo, dzo = deltas[ch]

                def store(v, ch=ch):
                    out_ref[ch] = v

                _trilerp_when(win_all[ch], lx0 + dxo, ly0 + dyo, lz0 + dzo,
                              block, Rr, store)
            return
        # per-block tap bounds were widened over all channel deltas
        taps = _block_taps(origin_ref, blk)
        for ch in range(C):
            dxo, dyo, dzo = deltas[ch]
            out_ref[ch] = _trilerp_sum_adaptive(
                win_all[ch], lx0 + dxo, ly0 + dyo, lz0 + dzo, taps, block, Rr
            )
        return

    # hats are shared between channels with identical offset deltas
    hat_cache = {}

    def hats_for(delta):
        if delta not in hat_cache:
            dxo, dyo, dzo = delta
            hat_cache[delta] = _hats(
                lx0 + dxo, ly0 + dyo, lz0 + dzo, block, Rr
            )
        return hat_cache[delta]

    for ch in range(C):
        hx, hy, hz = hats_for(deltas[ch])
        out_ref[ch] = _trilerp_sum(win_all[ch], hx, hy, hz, block, Rr)


def _dspan(deltas):
    return tuple(
        (min(d[ax] for d in deltas), max(d[ax] for d in deltas))
        for ax in range(3)
    )


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "P", "interpret", "out_shape", "deltas",
                     "adaptive", "count_overflow", "dual"),
)
def _sample3_padded_multi(fields_padded, gx, gy, gz, *, Rr, P, interpret,
                          out_shape, deltas, adaptive=False,
                          count_overflow=False, dual=False):
    C = fields_padded.shape[0]
    nx, ny, Z = gx.shape
    BY = _by(Rr)
    bz = _bz(Z)
    nb = (nx // BX, ny // BY, Z // bz)
    block = (BX, BY, bz)
    fs = fields_padded.shape[1:]
    Wx = BX + 2 * Rr + 2
    win_shape = (C, Wx, WY_WIN, _wz_win(bz))
    dsp = _dspan(deltas)
    if dual:  # widen by the g kernel's +-0.25 support per axis
        dsp = tuple((lo - 0.25, hi + 0.25) for lo, hi in dsp)
    ocount = None
    if count_overflow:
        origins, ocount = _origins(gx, gy, gz, fs, Rr=Rr, P=P, nb=nb,
                                   dspan=dsp, want_count=True)
    else:
        origins = _origins(gx, gy, gz, fs, Rr=Rr, P=P, nb=nb, dspan=dsp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=nb,
        in_specs=[
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, k, o: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (C,) + block, lambda i, j, k, o: (0, i, j, k),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, fields_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel_multi, Rr=Rr, block=block, win_shape=win_shape,
        deltas=deltas, adaptive=adaptive, dual=dual,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C,) + gx.shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins, gx, gy, gz, fields_padded)
    out = out[:, : out_shape[0], : out_shape[1], : out_shape[2]]
    return (out, ocount) if count_overflow else out


def sample3_multi_padded(fields_padded, px, py, pz, h, offs, *, Rr=2,
                         interpret=False, adaptive=None):
    """sample3_multi over fields already padded by pad_fields — the reuse
    path for the substepped trace loops. The pack's out_shape key only
    needs to COVER px.shape (per axis: ceil-to-block extents >= this
    call's): block geometry comes from the position arrays; the pack
    supplies window extent, and _origins clamps windows to the actual fs.
    One union-extent pack can therefore serve every lattice kind's trace
    (smoke3d._vel_pack, mapping.update_mapping_3d)."""
    from gpufluidsimulation_tpu import config

    if adaptive is None:
        adaptive = config.interp_adaptive()
    out_shape = px.shape
    off0 = offs[0]
    deltas = tuple(
        (float(off0[0] - o[0]), float(off0[1] - o[1]), float(off0[2] - o[2]))
        for o in offs
    )
    P = Rr + 2
    BY = _by(Rr)
    gx = px / h - off0[0] + P
    gy = py / h - off0[1] + P
    gz = pz / h - off0[2] + FRONT_Z
    gx, gy, gz = _pad_positions_rim(gx, gy, gz, P, BY)
    return _sample3_padded_multi(
        fields_padded, gx, gy, gz,
        Rr=Rr, P=P, interpret=interpret, out_shape=out_shape, deltas=deltas,
        adaptive=adaptive,
    )


# ---------------------------------------------------------------------------
# Windowed volume prefilter: out = 0.5*f + 0.5*(S (x) S (x) S) * f with
# S = [1/8, 3/4, 1/8] (the source-side form of the reference's 9-point
# composition average, cf. mapping.volume_prefilter_3d). One windowed-DMA
# pass with in-VMEM separable taps and STATIC per-block window origins.
# NOT wired into the solver: measured neutral-to-worse in-step at 256^3 —
# XLA fuses the separable XLA form into neighboring elementwise work, which
# a separate kernel launch forfeits. Kept as a parity-tested reference for
# future stencil fusion work.
# ---------------------------------------------------------------------------


def _prefilter_origin(i, j, k, fs, P):
    """Static window origin for the 1-halo stencil around block (i,j,k)."""
    BY = 16
    ox = i * BX + P - 1
    oy_ideal = j * BY + P - 1
    oy = jnp.minimum((oy_ideal // 8) * 8, fs[1] - WY_WIN)
    sy = oy_ideal - oy
    g0 = FRONT_Z + k * 128 - 1
    ozw = (g0 // 128) * 128
    # relz as a traced scalar: pltpu.roll rejects static negatives
    return (ox, pl.multiple_of(oy, 8), sy, pl.multiple_of(ozw, 128),
            jnp.int32(g0 - ozw))


def _kernel_prefilter(field_hbm, out_ref, win_ref, sem, *, block, win_shape,
                      fs, P):
    nb1 = pl.num_programs(1)
    nb2 = pl.num_programs(2)
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    blk = (bi * nb1 + bj) * nb2 + bk
    nblk = pl.num_programs(0) * nb1 * nb2
    slot = jax.lax.rem(blk, 2)

    def copy(b, sl):
        k = jax.lax.rem(b, nb2)
        ij = b // nb2
        j = jax.lax.rem(ij, nb1)
        i = ij // nb1
        ox, oy, _, ozw, _ = _prefilter_origin(i, j, k, fs, P)
        src = field_hbm.at[
            pl.ds(ox, win_shape[0]), pl.ds(oy, win_shape[1]),
            pl.ds(ozw, win_shape[2]),
        ]
        return pltpu.make_async_copy(src, win_ref.at[sl], sem.at[sl])

    @pl.when(blk == 0)
    def _():
        copy(0, 0).start()

    @pl.when(blk + 1 < nblk)
    def _():
        copy(blk + 1, jax.lax.rem(blk + 1, 2)).start()

    copy(blk, slot).wait()

    _, _, sy, _, relz = _prefilter_origin(bi, bj, bk, fs, P)
    win = _rebased_window(win_ref.at[slot], sy, relz, 1)
    # node (a,b,c) of the block sits at window (a+1, b+1, c+1)
    B1, B2, B3 = block
    tz = (0.125 * win[:, :, 0:B3] + 0.75 * win[:, :, 1:B3 + 1]
          + 0.125 * win[:, :, 2:B3 + 2])
    ty = (0.125 * tz[:, 0:B2, :] + 0.75 * tz[:, 1:B2 + 1, :]
          + 0.125 * tz[:, 2:B2 + 2, :])
    tx = (0.125 * ty[0:B1] + 0.75 * ty[1:B1 + 1] + 0.125 * ty[2:B1 + 2])
    center = win[1:B1 + 1, 1:B2 + 1, 1:B3 + 1]
    out_ref[...] = 0.5 * center + 0.5 * tx


@functools.partial(jax.jit, static_argnames=("interpret", "out_shape"))
def _prefilter_padded(fpad, *, interpret, out_shape):
    P = 4
    BY = 16
    nx = _ceil(out_shape[0], BX)
    ny = _ceil(out_shape[1], BY)
    Z = _ceil(out_shape[2], 128)
    nb = (nx // BX, ny // BY, Z // 128)
    block = (BX, BY, 128)
    fs = fpad.shape
    win_shape = (BX + 2, WY_WIN, WZ_WIN)
    kernel = functools.partial(
        _kernel_prefilter, block=block, win_shape=win_shape, fs=fs, P=P,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, ny, Z), jnp.float32),
        grid=nb,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(block, lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fpad)
    return out[: out_shape[0], : out_shape[1], : out_shape[2]]


def volume_prefilter_fast(f, *, interpret=False):
    """Windowed-DMA volume prefilter; exact same math as the XLA separable
    form (edge-clamped boundaries)."""
    # Rr=2 pad geometry gives P=4 margins; the stencil only needs 1
    fpad = pad_fields(f, f.shape, 2)
    return _prefilter_padded(fpad, interpret=interpret, out_shape=f.shape)


# ---------------------------------------------------------------------------
# Fused RK3 substep: ONE window DMA + launch evaluates all three Ralston-RK3
# velocity stages (trace kernel, GPU_kernel.cu:74-90) instead of three
# separate multi-channel sampler launches with position round-trips through
# HBM. The window reach grows by one cell (Rk = Rr + 1) to cover the stage
# drift: each substep is bounded by cfldt = h/maxvel, so stage positions move
# at most 0.75 cells from the block-statistics positions the window was
# anchored on. Per-stage live tap ranges are re-derived IN-KERNEL from the
# actual stage coordinates (block min/max — cheap VPU reductions), so the
# wider window costs no extra hat-loop work.
# ---------------------------------------------------------------------------


def _live_taps(rel, W):
    """Block-wide live tap range for element-relative coords `rel = l - iota`
    (a tap dq is live iff hat(rel - dq) > 0 for some element, i.e.
    dq in [floor(min rel), floor(max rel) + 1])."""
    lo = jnp.clip(jnp.floor(jnp.min(rel)).astype(jnp.int32), 0, W - 1)
    hi = jnp.clip(jnp.floor(jnp.max(rel)).astype(jnp.int32) + 1, 0, W - 1)
    return lo, jnp.maximum(hi - lo + 1, 0)


def _sample_mac_stage(win_all, lx, ly, lz, deltas, block, Rr, x_static=None,
                      want_x_viol=False):
    """The 3 MAC channels at window-local coords (lx,ly,lz) + channel deltas.

    `x_static` is (x0, nxt) shared by the channels, or a per-channel list
    of such tuples (the ident kernel derives a tighter static band per
    channel from its compile-time delta, see _ident_x_bands).

    Stays on the roll-per-tap adaptive form: routing these stages through
    _trilerp_when (writing each channel via a VMEM stage scratch so the
    predicated branches have a ref destination) measured +69 ms on the
    fused RK3 trace and +33 ms on the DMC kernel at 256^3 — the 18
    predicated regions per launch defeat Mosaic's pipelining, the opposite
    of the pull-back samplers where the same scheme wins ~15%."""
    W = 2 * Rr + 3
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    per_ch = x_static is not None and not isinstance(x_static[0], int)
    outs = []
    viol = None
    for ch, (dxo, dyo, dzo) in enumerate(deltas):
        xs = x_static[ch] if per_ch else x_static
        lxc, lyc, lzc = lx + dxo, ly + dyo, lz + dzo
        ylo, nyt = _live_taps(lyc - b, W)
        zlo, nzt = _live_taps(lzc - c, W)
        if want_x_viol and xs is not None:
            # EXACT truncation test: element taps {floor(rel), floor+1}
            # fit the static range [x0, x0+xn) iff rel in [x0, x0+xn-1)
            relx = lxc - a
            v = (relx < xs[0]) | (relx >= xs[0] + xs[1] - 1)
            viol = v if viol is None else (viol | v)
        outs.append(
            _trilerp_sum_adaptive(
                win_all[ch], lxc, lyc, lzc, (ylo, nyt, zlo, nzt), block, Rr,
                x_static=xs,
            )
        )
    if want_x_viol:
        return outs, viol
    return outs


def _ident_x_bands(Rr, base_x, deltas, drift):
    """Per-channel STATIC x-tap bands for the identity-start kernel: the
    stage position's x rel-coord is Rr+1 + (node_off - off0) + delta_ch +
    drift with the per-axis stage drift bounded by the CFL substep
    (|0.5*sh*u| <= 0.5 cell at stage 2, |0.75*sh*u| <= 0.75 at stage 3 —
    interpolated velocity is bounded by the field max that set cfldt).
    Element taps {floor(rel), floor+1} then span 3 taps at stage 2 and
    3-4 at stage 3 per channel, vs the 5 of the drift<1 channel-union
    band. `base_x` = node_off[0] - off0[0]."""
    import math

    bands = []
    for (dxo, _, _) in deltas:
        q = base_x + dxo
        lo = math.floor(Rr + 1 + q - drift)
        hi = math.floor(Rr + 1 + q + drift) + 1
        bands.append((lo, hi - lo + 1))
    return bands


def _kernel_rk3(origin_ref, gx_ref, gy_ref, gz_ref, sh_ref, fields_hbm,
                out_ref, cnt_ref, win_ref, sem, *, Rr, block, win_shape,
                deltas, clamp, x_taps=None, widths_ref=None, x_taps_lo=0):
    blk, slot = _pipeline_window(origin_ref, fields_hbm, win_ref, sem,
                                 win_shape)
    ox, oy, sy, ozw, g0 = _block_scalars(origin_ref, blk)
    lx, ly, lz = _local_coords(gx_ref, gy_ref, gz_ref, ox, oy, sy, g0, Rr)
    win_all = _rebased_window(win_ref.at[slot], sy, g0 - ozw, 2)
    sh = sh_ref[0, 0]  # signed substep dt / h (world velocity -> grid disp)

    # EXACT static-x-tap truncation count (not the prepass's conservative
    # worst-case-drift bound): accumulated over the sequential grid like
    # the DMC kernel's in-kernel contract monitor
    @pl.when(blk == 0)
    def _():
        cnt_ref[0, 0] = 0

    def stages(nx_taps):
        xs = None if nx_taps is None else (0, nx_taps)
        wv = nx_taps is not None
        (u1, v1, w1), x_v1 = _sample_mac_stage(
            win_all, lx, ly, lz, deltas, block, Rr, x_static=xs,
            want_x_viol=True)
        a = 0.5 * sh
        (u2, v2, w2), x_v2 = _sample_mac_stage(
            win_all, lx + a * u1, ly + a * v1, lz + a * w1, deltas, block,
            Rr, x_static=xs, want_x_viol=True,
        )
        b = 0.75 * sh
        (u3, v3, w3), x_v3 = _sample_mac_stage(
            win_all, lx + b * u2, ly + b * v2, lz + b * w2, deltas, block,
            Rr, x_static=xs, want_x_viol=True,
        )
        if wv:
            viol = x_v1 | x_v2 | x_v3
            cnt_ref[0, 0] += jnp.sum(viol.astype(jnp.int32))
        c1 = (2.0 / 9.0) * sh
        c2 = (3.0 / 9.0) * sh
        c3 = (4.0 / 9.0) * sh
        out_ref[0] = jnp.clip(
            gx_ref[...] + c1 * u1 + c2 * u2 + c3 * u3, clamp[0], clamp[1]
        )
        out_ref[1] = jnp.clip(
            gy_ref[...] + c1 * v1 + c2 * v2 + c3 * v3, clamp[2], clamp[3]
        )
        out_ref[2] = jnp.clip(
            gz_ref[...] + c1 * w1 + c2 * w2 + c3 * w3, clamp[4], clamp[5]
        )

    if widths_ref is None or not x_taps or not x_taps_lo \
            or x_taps_lo >= x_taps:
        stages(x_taps)
        return

    # tiered x taps: ONE whole-body predicate per block — blocks whose
    # live width (prepass stats + clip shift, margin included) fits the
    # LO2 range loop 4 static taps, the LO range 5, the rest the full
    # x_taps. Identical semantics: a LO block's taps fit its range by
    # construction (stage drift < 0.75 cell is inside the +-1 margin),
    # and any escapee is clamped + counted exactly like the HI loop's.
    wx_blk = widths_ref[blk]
    lo2 = _RK3_XNT_LO2 if 0 < _RK3_XNT_LO2 < x_taps_lo else 0

    if lo2:
        @pl.when(wx_blk <= lo2)
        def _():
            stages(lo2)

        @pl.when((wx_blk > lo2) & (wx_blk <= x_taps_lo))
        def _():
            stages(x_taps_lo)
    else:
        @pl.when(wx_blk <= x_taps_lo)
        def _():
            stages(x_taps_lo)

    @pl.when(wx_blk > x_taps_lo)
    def _():
        stages(x_taps)


def _kernel_rk3_twotier(origin_ref, widths_ref, gx_ref, gy_ref, gz_ref,
                        sh_ref, fields_hbm, out_ref, cnt_ref, win_ref, sem,
                        **kw):
    """_kernel_rk3 with the per-block live-width prefetch vector as a
    second scalar-prefetch argument (two-tier static x taps)."""
    return _kernel_rk3(origin_ref, gx_ref, gy_ref, gz_ref, sh_ref,
                       fields_hbm, out_ref, cnt_ref, win_ref, sem,
                       widths_ref=widths_ref, **kw)


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "P", "interpret", "deltas", "clamp", "x_taps",
                     "gate_nx"),
)
def _rk3_padded(fields_padded, gx, gy, gz, sh, *, Rr, P, interpret, deltas,
                clamp, x_taps=None, gate_nx=None):
    """One fused RK3 substep over padded-coord position lattices; returns
    (stacked (3, ...) new positions in the same padded channel-0 coords,
    contract-violation count of this launch's origins prepass)."""
    C = fields_padded.shape[0]
    nx, ny, Z = gx.shape
    Rk = Rr + 1  # window reach: contract residual + <=0.75-cell stage drift
    BY = _by(Rr)
    bz = _bz(Z)
    nb = (nx // BX, ny // BY, Z // bz)
    block = (BX, BY, bz)
    fs = fields_padded.shape[1:]
    # production-geometry gate: a block must be a small fraction of the x
    # extent for its in-block displacement SPREAD (what the static cap
    # truncates) to stay at the measured ~3 live taps — on toy grids where
    # one 16-wide block spans most of the domain, whole-domain velocity
    # variation lands in a single block and the cap would clip real taps.
    # nb_x >= 4 keeps every small-grid parity test bit-exact and enables
    # the narrowing everywhere production runs (>= 64^3). Multi-kind
    # concatenated launches pass gate_nx = their per-kind SECTION extent
    # so the gate fires exactly where the per-kind launches' would.
    if x_taps and (gate_nx if gate_nx is not None else nx) // BX < 4:
        x_taps = None
    if x_taps:
        # static-x-tap mode: per-block origins sit at the live-tap start
        # (stage drift margin 1 tap each side), window only x_taps-1 rows
        # taller than the block — less DMA and a 2Rk+3 -> x_taps x loop.
        # NOTE (advisor r2): x_margin=1 covers the <=0.75-cell stage-2/3
        # drift ONLY; the per-channel MAC deltas (+-0.5) are NOT folded
        # into the stage-1 live-range stats and ride the empirical
        # headroom of x_taps (default 6; measured 0 truncations through
        # CFL ~2.6). Flows that do exceed it are never silent: the
        # in-kernel per-stage count below feeds the frame overflow
        # monitor -> step_checked's exact-path retry.
        Wx = BX + x_taps - 1
        two_tier = 0 < _RK3_XNT_LO < x_taps
        # y/z window-fit violations counted in the prepass; x truncation
        # counted EXACTLY in-kernel per stage (count_x=False drops the
        # prepass's conservative worst-case-drift x bound)
        res = _origins(gx, gy, gz, fs, Rr=Rk, P=P, nb=nb,
                       want_count=True, x_taps=x_taps, x_margin=1,
                       count_x=False, want_x_widths=two_tier)
        if two_tier:
            origins, cnt, widths = res
        else:
            origins, cnt = res
            widths = None
    else:
        Wx = BX + 2 * Rk + 2
        origins = _origins(gx, gy, gz, fs, Rr=Rk, P=P, nb=nb)
        cnt = jnp.int32(0)
        widths = None
    win_shape = (C, Wx, WY_WIN, _wz_win(bz))

    nsp = 1 if widths is None else 2
    osl = (lambda i, j, k, o: (i, j, k)) if nsp == 1 else \
        (lambda i, j, k, o, w_: (i, j, k))
    osl0 = (lambda i, j, k, o: (0, i, j, k)) if nsp == 1 else \
        (lambda i, j, k, o, w_: (0, i, j, k))
    osl1 = (lambda i, j, k, o: (0, 0)) if nsp == 1 else \
        (lambda i, j, k, o, w_: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nsp,
        grid=nb,
        in_specs=[
            pl.BlockSpec(block, osl, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, osl, memory_space=pltpu.VMEM),
            pl.BlockSpec(block, osl, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((C,) + block, osl0, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), osl1, memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, fields_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    if widths is None:
        kernel = functools.partial(
            _kernel_rk3, Rr=Rk, block=block, win_shape=win_shape,
            deltas=deltas, clamp=clamp, x_taps=x_taps or None,
        )
        args = (origins, gx, gy, gz, sh.reshape(1, 1), fields_padded)
    else:
        kernel = functools.partial(
            _kernel_rk3_twotier, Rr=Rk, block=block, win_shape=win_shape,
            deltas=deltas, clamp=clamp, x_taps=x_taps,
            x_taps_lo=_RK3_XNT_LO,
        )
        args = (origins, widths, gx, gy, gz, sh.reshape(1, 1),
                fields_padded)
    out, kcnt = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((C,) + gx.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return out, cnt + jnp.sum(kcnt)


def _kernel_rk3_ident(sh_ref, k1_ref, fields_hbm, out_ref, win_ref, sem, *,
                      Rr, block, win_shape, fs, P, deltas, clamp, off0,
                      node_off=(0.0, 0.0, 0.0)):
    """The identity-start RK3 substep: positions are the node lattice, so
    window origins are STATIC (no prepass, 3-tile z window as in the fused
    DMC kernel) and the stage-1 velocity is the precomputed MAC average
    `k1` AT the node lattice (a plain block input) — only stages 2 and 3
    sample the velocity windows. `Rr` here is the widened reach Rk = Rr+1.

    `node_off` is the lattice kind's per-axis node offset in cells (0 for
    the map/cell lattice, -0.5 on the staggered axis of u/v/w cropped
    lattices — node_coords convention (i - 0.5*dim)*h). The static 5-tap
    x band still holds: rel = Rk+1 + node_off + delta_ch + drift with
    |node_off| <= 0.5, |delta_ch| <= 0.5, drift < 0.75 -> taps within
    [Rk-1, Rk+3]."""
    nb1 = pl.num_programs(1)
    nb2 = pl.num_programs(2)
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    blk = (bi * nb1 + bj) * nb2 + bk
    nblk = pl.num_programs(0) * nb1 * nb2
    slot = jax.lax.rem(blk, 2)
    BY = block[1]

    def copy(b, sl):
        k = jax.lax.rem(b, nb2)
        ij = b // nb2
        j = jax.lax.rem(ij, nb1)
        i = ij // nb1
        ox, oy, _, ozw, _ = _dmc_origin(i, j, k, fs, P, Rr, block[2])
        src = fields_hbm.at[:, pl.ds(ox, win_shape[1]),
                            pl.ds(oy, win_shape[2]),
                            pl.ds(ozw, win_shape[3])]
        return pltpu.make_async_copy(src, win_ref.at[sl], sem.at[sl])

    @pl.when(blk == 0)
    def _():
        copy(0, 0).start()

    @pl.when(blk + 1 < nblk)
    def _():
        copy(blk + 1, jax.lax.rem(blk + 1, 2)).start()

    copy(blk, slot).wait()

    sh = sh_ref[0, 0]   # signed substep dt / h
    h = sh_ref[0, 1]
    ox, oy, sy, ozw, relz = _dmc_origin(bi, bj, bk, fs, P, Rr, block[2])
    oz = 512 if block[2] == 256 else None
    win_all = _rebased_window(win_ref.at[slot], sy, relz, 2, out_z=oz)

    # identity positions, replicating the array path's float ops exactly:
    # px = (i + node_off)*h (node_coords), gx = px/h - off0 + P
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2)
    gx = (((bi * BX + a).astype(jnp.float32) + node_off[0]) * h) / h \
        - off0[0] + P
    gy = (((bj * BY + b).astype(jnp.float32) + node_off[1]) * h) / h \
        - off0[1] + P
    gz = (((bk * block[2] + c).astype(jnp.float32) + node_off[2]) * h) / h \
        - off0[2] + FRONT_Z
    lx = gx - ox.astype(jnp.float32)
    ly = gy - (oy + sy).astype(jnp.float32)
    lz = gz - (ozw + relz).astype(jnp.float32)

    u1 = k1_ref[0]
    v1 = k1_ref[1]
    w1 = k1_ref[2]
    # identity positions make the live x taps STATIC by construction:
    # rel = Rr+1 + (node_off - off0) + delta_ch + drift, and the per-axis
    # stage drift is bounded by the CFL substep (|0.5*sh*u| <= 0.5 cell
    # at stage 2, |0.75*sh*u| <= 0.75 at stage 3) — so each channel's
    # band is 3 taps at stage 2 and 3-4 at stage 3, vs 5 for the old
    # channel-union drift<1 band (r5: ~35% fewer x-tap rolls per peel)
    base_x = node_off[0] - off0[0]
    if not _RK3_XNT:
        xs2 = xs3 = None
    elif _IDENT_BANDS:
        xs2 = _ident_x_bands(Rr, base_x, deltas, 0.5)
        xs3 = _ident_x_bands(Rr, base_x, deltas, 0.75)
    else:
        xs2 = xs3 = (Rr - 1, 5)
    aa = 0.5 * sh
    u2, v2, w2 = _sample_mac_stage(
        win_all, lx + aa * u1, ly + aa * v1, lz + aa * w1, deltas, block, Rr,
        x_static=xs2,
    )
    bb = 0.75 * sh
    u3, v3, w3 = _sample_mac_stage(
        win_all, lx + bb * u2, ly + bb * v2, lz + bb * w2, deltas, block, Rr,
        x_static=xs3,
    )
    c1 = (2.0 / 9.0) * sh
    c2 = (3.0 / 9.0) * sh
    c3 = (4.0 / 9.0) * sh
    out_ref[0] = jnp.clip(gx + c1 * u1 + c2 * u2 + c3 * u3,
                          clamp[0], clamp[1])
    out_ref[1] = jnp.clip(gy + c1 * v1 + c2 * v2 + c3 * v3,
                          clamp[2], clamp[3])
    out_ref[2] = jnp.clip(gz + c1 * w1 + c2 * w2 + c3 * w3,
                          clamp[4], clamp[5])


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "P", "interpret", "deltas", "clamp", "off0",
                     "node_off"),
)
def _rk3_padded_ident(fields_padded, k1, sh, h, *, Rr, P, interpret, deltas,
                      clamp, off0, node_off=(0.0, 0.0, 0.0)):
    """The peeled identity-start RK3 substep (static origins, no position
    inputs). `k1` is the stacked (3, nx, ny, Z) cell-centered MAC average
    on the block lattice; returns new positions in padded channel-0 coords
    like _rk3_padded."""
    C = fields_padded.shape[0]
    nx, ny, Z = k1.shape[1:]
    Rk = Rr + 1
    BY = _by(Rr)
    bz = _bz(Z)
    nb = (nx // BX, ny // BY, Z // bz)
    block = (BX, BY, bz)
    fs = fields_padded.shape[1:]
    Wx = BX + 2 * Rk + 2
    win_shape = (C, Wx, WY_WIN, _wz_win(bz, static=True))
    kernel = functools.partial(
        _kernel_rk3_ident, Rr=Rk, block=block, win_shape=win_shape, fs=fs,
        P=P, deltas=deltas, clamp=clamp, off0=off0, node_off=node_off,
    )
    scalars = jnp.stack([sh, h]).astype(jnp.float32).reshape(1, 2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, nx, ny, Z), jnp.float32),
        grid=nb,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3,) + block, lambda i, j, k: (0, i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((3,) + block, lambda i, j, k: (0, i, j, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, fields_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, k1, fields_padded)


def trace_rk3_fused(packed, px, py, pz, h, cfldt, dt, offs, grid_n, *,
                    lo=1.0, hi=1.0, Rr=2, interpret=False,
                    from_identity=False, k1=None, gate_nx=None,
                    node_off=(0.0, 0.0, 0.0)):
    """CFL-substepped RK3 characteristic trace with each substep's three MAC
    velocity stages fused into ONE window kernel (the trace loop of
    GPU_kernel.cu:92-125). Positions stay in padded block-multiple grid
    coords across the whole `lax.while_loop` — no per-substep repadding.

    Contract: every substep is <= cfldt = h/max|vel| (so in-kernel stage
    drift is <= 0.75 cells, covered by the Rk = Rr+1 window reach) and the
    input positions obey the usual bounded-displacement contract. Requires
    Rr <= 2 (the WY_WIN=32 y window fits BY + 2*Rk + 2 + 7 rows only up to
    Rk = 3)."""
    if Rr > 2:
        raise ValueError("trace_rk3_fused requires Rr <= 2")
    out_shape = px.shape
    off0 = offs[0]
    deltas = tuple(
        (float(off0[0] - o[0]), float(off0[1] - o[1]), float(off0[2] - o[2]))
        for o in offs
    )
    P = Rr + 2
    use_ident = from_identity and k1 is not None
    if not use_ident:
        gx = px / h - off0[0] + P
        gy = py / h - off0[1] + P
        gz = pz / h - off0[2] + FRONT_Z
        gx, gy, gz = _pad_positions_rim(gx, gy, gz, P, _by(Rr))

    # world clamp [lo*h, L-hi*h] per axis in padded channel-0 coords
    ni, nj, nk = grid_n
    clamp = (
        float(lo - off0[0] + P), float(ni - hi - off0[0] + P),
        float(lo - off0[1] + P), float(nj - hi - off0[1] + P),
        float(lo - off0[2] + FRONT_Z), float(nk - hi - off0[2] + FRONT_Z),
    )

    total = jnp.abs(dt)
    sign = jnp.where(dt >= 0, 1.0, -1.0).astype(jnp.float32)
    cfldt = jnp.maximum(jnp.asarray(cfldt, jnp.float32), 1e-30)

    # Off-block-multiple shapes carry rim cells in the padded positions.
    # The kernel's world clamp is ABSOLUTE, so rim cells (whose lattice
    # nodes sit outside the domain) clamp differently from the edge row
    # they replicate — after one substep their displacement diverges by
    # the rim overhang, breaking the block displacement contract for the
    # last real rows. Re-derive the rim from the real edge in
    # displacement space after every substep (statically skipped at
    # block-multiple shapes, e.g. 256³, where there is no rim).
    has_rim = (
        _ceil(out_shape[0], BX) != out_shape[0]
        or _ceil(out_shape[1], _by(Rr)) != out_shape[1]
        or _ceil(out_shape[2], 128) != out_shape[2]
    )
    rsl = np.s_[: out_shape[0], : out_shape[1], : out_shape[2]]

    def _rerim(g2):
        rx, ry, rz = _pad_positions_rim(
            g2[0][rsl], g2[1][rsl], g2[2][rsl], P, _by(Rr)
        )
        return jnp.stack([rx, ry, rz])

    def cond(carry):
        return carry[0] < total

    x_taps = _RK3_XNT or None

    def body(carry):
        t, g, cnt = carry
        sub = jnp.minimum(cfldt, total - t)
        g2, c2 = _rk3_padded(
            packed, g[0], g[1], g[2], (sign * sub / h).astype(jnp.float32),
            Rr=Rr, P=P, interpret=interpret, deltas=deltas, clamp=clamp,
            x_taps=x_taps, gate_nx=gate_nx,
        )
        if has_rim:
            g2 = _rerim(g2)
        return (t + sub, g2, cnt + c2)

    if use_ident:
        # identity-start peel (per-frame-reinit mode): substep 1 runs with
        # STATIC window origins and a precomputed stage-1 velocity — no
        # position arrays, no rim pad, no origins prepass for it
        pads = [(0, 0)] + [
            (0, _ceil(s, m) - s)
            for s, m in zip(k1.shape[1:], (BX, _by(Rr), 128))
        ]
        k1p = (jnp.pad(k1, pads, mode="edge")
               if any(p[1] for p in pads) else k1)
        sub0 = jnp.minimum(cfldt, total)
        g0_ = _rk3_padded_ident(
            packed, k1p, (sign * sub0 / h).astype(jnp.float32),
            jnp.float32(h), Rr=Rr, P=P, interpret=interpret, deltas=deltas,
            clamp=clamp,
            off0=(float(off0[0]), float(off0[1]), float(off0[2])),
            node_off=tuple(float(o) for o in node_off),
        )
        if has_rim:
            g0_ = _rerim(g0_)
        carry0 = (sub0, g0_, jnp.int32(0))
    else:
        carry0 = (jnp.float32(0.0), jnp.stack([gx, gy, gz]), jnp.int32(0))
    _, g, cnt = jax.lax.while_loop(cond, body, carry0)
    # static-x-tap truncations self-report through the frame's overflow
    # sink (clamped + renormalized samples are counted, never silent)
    if OVERFLOW_SINK is not None:
        OVERFLOW_SINK.append(cnt)
    sl = np.s_[: out_shape[0], : out_shape[1], : out_shape[2]]
    return (
        (g[0][sl] - P + off0[0]) * h,
        (g[1][sl] - P + off0[1]) * h,
        (g[2][sl] - FRONT_Z + off0[2]) * h,
    )


# ---------------------------------------------------------------------------
# Fused pull-back: map window -> in-VMEM staggered lattice positions ->
# field sampling, one launch for several lattice kinds at once. This is the
# advect/compensate stage primitive of the BiMocq pipeline: the positions
# (backward/forward map sampled at each kind's node lattice) are STATIC
# staggered averages of the map window (cf. mapping.map_at_lattice_3d), so
# they are computed in VMEM and never round-trip HBM; the per-kind field
# samples then ride the usual adaptive hat loops on a shared multi-channel
# field window. Replaces, per stage: 3 XLA map-at-lattice stencil passes +
# 3 position-array HBM round-trips + 3 origins prepasses + 3 launches with
# ONE union prepass + ONE launch.
# ---------------------------------------------------------------------------


def _kernel_pullback(origin_ref, maps_hbm, fields_hbm, out_ref, win_m,
                     win_f, sem, *, Rr, block, win_shape_m, win_shape_f,
                     fs_m, P, dims, clamp, grid_n):
    nb1 = pl.num_programs(1)
    nb2 = pl.num_programs(2)
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    blk = (bi * nb1 + bj) * nb2 + bk
    nblk = pl.num_programs(0) * nb1 * nb2
    slot = jax.lax.rem(blk, 2)

    def copies(b, sl):
        # field window: prefetched union origins; map window: static (the
        # map is read AT the lattice — 1-cell stagger reach only)
        k = jax.lax.rem(b, nb2)
        ij = b // nb2
        j = jax.lax.rem(ij, nb1)
        i = ij // nb1
        oxm, oym, _, ozwm, _ = _dmc_origin(i, j, k, fs_m, P, Rr)
        mcopy = pltpu.make_async_copy(
            maps_hbm.at[:, pl.ds(oxm, win_shape_m[1]),
                        pl.ds(oym, win_shape_m[2]),
                        pl.ds(ozwm, win_shape_m[3])],
            win_m.at[sl], sem.at[sl, 0],
        )
        ox, oy, _, ozw, _ = _block_scalars(origin_ref, b)
        fcopy = pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(ox, win_shape_f[1]),
                          pl.ds(oy, win_shape_f[2]),
                          pl.ds(ozw, win_shape_f[3])],
            win_f.at[sl], sem.at[sl, 1],
        )
        return mcopy, fcopy

    @pl.when(blk == 0)
    def _():
        for d in copies(0, 0):
            d.start()

    @pl.when(blk + 1 < nblk)
    def _():
        for d in copies(blk + 1, jax.lax.rem(blk + 1, 2)):
            d.start()

    for d in copies(blk, slot):
        d.wait()

    _, _, sym, _, relzm = _dmc_origin(bi, bj, bk, fs_m, P, Rr)
    wm = _rebased_window(win_m.at[slot], sym, relzm, 2)
    ox, oy, syf, ozw, g0 = _block_scalars(origin_ref, blk)
    wf = _rebased_window(win_f.at[slot], syf, g0 - ozw, 2)

    B1, B2, B3 = block
    R1 = Rr + 1
    W = 2 * Rr + 3
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b_ = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c_ = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    ni, nj, nk = grid_n
    clo, chi = clamp

    def stag(ch, d):
        """Map channel `ch` at the d-staggered node lattice of this block
        (static window slices; grid units — the map pack is pre-divided
        by h)."""
        v = wm[ch]
        if d[0]:
            v = 0.5 * (v[R1 - 1: R1 - 1 + B1] + v[R1: R1 + B1])
        else:
            v = v[R1: R1 + B1]
        if d[1]:
            v = 0.5 * (v[:, R1 - 1: R1 - 1 + B2] + v[:, R1: R1 + B2])
        else:
            v = v[:, R1: R1 + B2]
        if d[2]:
            v = 0.5 * (v[:, :, R1 - 1: R1 - 1 + B3] + v[:, :, R1: R1 + B3])
        else:
            v = v[:, :, R1: R1 + B3]
        return v

    for c, d in enumerate(dims):
        px = jnp.clip(stag(0, d), clo, ni - chi)
        py = jnp.clip(stag(1, d), clo, nj - chi)
        pz = jnp.clip(stag(2, d), clo, nk - chi)
        # field coords: g = p - off + pad, off = -0.5*dim (3D convention)
        lx = px + (0.5 * d[0] + P) - ox.astype(jnp.float32)
        ly = py + (0.5 * d[1] + P) - (oy + syf).astype(jnp.float32)
        lz = pz + (0.5 * d[2] + FRONT_Z) - g0.astype(jnp.float32)
        xlo_t, nxt = _live_taps(lx - a, W)
        del xlo_t, nxt  # x stays the static W loop
        ylo, nyt = _live_taps(ly - b_, W)
        zlo, nzt = _live_taps(lz - c_, W)
        out_ref[c] = _trilerp_sum_adaptive(
            wf[c], lx, ly, lz, (ylo, nyt, zlo, nzt), block, Rr
        )


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "interpret", "out_shape", "dims", "clamp",
                     "grid_n"),
)
def _pullback_padded(maps_packed, fields_packed, origins, *, Rr, interpret,
                     out_shape, dims, clamp, grid_n):
    C = fields_packed.shape[0]
    P = Rr + 2
    BY = _by(Rr)
    nx = _ceil(out_shape[0], BX)
    ny = _ceil(out_shape[1], BY)
    Z = _ceil(out_shape[2], 128)
    nb = (nx // BX, ny // BY, Z // 128)
    block = (BX, BY, 128)
    fs_m = maps_packed.shape[1:]
    Wx = BX + 2 * Rr + 2
    win_shape_m = (3, Wx, WY_WIN, WZ_WIN)
    win_shape_f = (C, Wx, WY_WIN, WZ_WIN)
    kernel = functools.partial(
        _kernel_pullback, Rr=Rr, block=block, win_shape_m=win_shape_m,
        win_shape_f=win_shape_f, fs_m=fs_m, P=P, dims=dims, clamp=clamp,
        grid_n=grid_n,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=nb,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((C,) + block, lambda i, j, k, o: (0, i, j, k),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape_m, jnp.float32),
            pltpu.VMEM((2,) + win_shape_f, fields_packed.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C, nx, ny, Z), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins, maps_packed, fields_packed)
    return out


def _prepass_positions_grid(maps_grid, d, grid_n, clamp, P, out_shape):
    """Field-window coords (gx, gy, gz) of kind `d`'s pull-back positions,
    on the common block lattice — used ONLY for the union stats prepass
    (XLA fuses the staggered average into the reduction; nothing
    materializes). Mirrors the in-kernel stag() + clamp + coord math."""
    ni, nj, nk = grid_n
    clo, chi = clamp

    def stag_axis(m, axis):
        padw = [(0, 0)] * 3
        padw[axis] = (1, 0)
        q = jnp.pad(m, padw, mode="edge")
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -1)
        hi[axis] = slice(1, None)
        return 0.5 * (q[tuple(lo)] + q[tuple(hi)])

    out = []
    bounds = (ni, nj, nk)
    for ch in range(3):
        m = maps_grid[ch]
        for axis in range(3):
            if d[axis]:
                m = stag_axis(m, axis)
        m = jnp.clip(m, clo, bounds[ch] - chi)
        base = (0.5 * d[ch] + (FRONT_Z if ch == 2 else P))
        g = m + base
        # pad to the common block-multiple lattice in displacement space
        pw = [(0, out_shape[i] - g.shape[i]) for i in range(3)]
        if any(p[1] for p in pw):
            node = jax.lax.broadcasted_iota(jnp.float32, g.shape, ch) + (
                128 if ch == 2 else P)
            dd = jnp.pad(g - node, pw, mode="edge")
            node2 = jax.lax.broadcasted_iota(jnp.float32, dd.shape, ch) + (
                128 if ch == 2 else P)
            g = node2 + dd
        out.append(g)
    return tuple(out)


def sample3_pullback(maps, fields, dims, h, grid_n, clamp_lo, clamp_hi, *,
                     Rr=2, interpret=False):
    """Pull C fields back through `maps` sampled at their kinds' node
    lattices: out[c] = fields[c] sampled at clamp(maps(node_c)). `fields`
    is a list of per-kind arrays (stacked/edge-padded to a common extent
    here); `dims` the per-channel staggering. Returns the (C, ...) padded
    block lattice — callers slice per kind."""
    ni, nj, nk = grid_n
    BY = _by(Rr)
    common = (max(f.shape[0] for f in fields),
              max(f.shape[1] for f in fields),
              max(f.shape[2] for f in fields))
    # evaluate on the CELL-lattice block grid: the callers' band guards
    # never update a staggered kind's last face plane (i < n-3), so the
    # extra +1 extents must NOT inflate the block lattice (a (257,257,257)
    # common lattice pads to (272,272,384) blocks — 70% more work and a
    # 3-tile z grid; measured 501 -> 631 ms/step before this fix)
    out_shape = (_ceil(ni, BX), _ceil(nj, BY), _ceil(nk, 128))
    fstack = jnp.stack([
        jnp.pad(f, [(0, common[i] - f.shape[i]) for i in range(3)],
                mode="edge")
        for f in fields
    ])
    fields_packed = pad_fields(fstack, common, Rr)
    maps_grid = maps / h
    maps_packed = pad_fields(maps_grid, common, Rr)
    clamp = (float(clamp_lo), float(clamp_hi))
    P = Rr + 2
    pos_sets = [
        _prepass_positions_grid(maps_grid, d, grid_n, clamp, P, out_shape)
        for d in set(dims)
    ]
    nb = (out_shape[0] // BX, out_shape[1] // BY, out_shape[2] // 128)
    origins = _origins_union(
        pos_sets, fields_packed.shape[1:], Rr=Rr, P=P, nb=nb
    )
    return _pullback_padded(
        maps_packed, fields_packed, origins, Rr=Rr, interpret=interpret,
        out_shape=out_shape, dims=tuple(dims), clamp=clamp, grid_n=grid_n,
    )


# ---------------------------------------------------------------------------
# vol9: the one-launch 9-POSITION composed volume evaluation — the
# reference's advect_kernel volume average computed EXACTLY on the fast
# path (GPU_kernel.cu:312-374): each of the 8 (+-0.25h)^3 corner offsets is
# mapped THROUGH the backward/forward map's trilinear interpolation before
# the field sample, so the map Jacobian (and its edge discontinuities) acts
# on the corner cube — the term the 'dual' separable kernel drops (J taken
# as identity across the cube; measured 10x worse at emitter edges,
# FIDELITY_r2.json).
#
# Geometry per output block:
#   * The 9 positions are trilinear MAP samples at lattice +- 0.25h — a
#     STATIC 2-tap-per-axis stencil (per axis: +0.25 -> weights (3/4, 1/4),
#     -0.25 -> (1/4, 3/4), staggered kinds shift the tap pair) — so the map
#     is fetched with a static ring-1 window (BX+2, BY+8, bz+128 lanes),
#     ~2.4x smaller than a full-reach map window, and the corner positions
#     are pure VPU slice-fma work in VMEM. No position arrays materialize
#     in HBM (the _origins prepass reads the same stencil lazily, fused
#     into its reductions).
#   * The field window uses the usual dynamic per-block origins with the
#     corner spread folded in as dspan=(-0.25, +0.25).
#   * ADAPTIVE EXACTNESS (v2): the exact 9-corner evaluation is 9 hat
#     trilerps per output — measured VPU-fma-bound at ~5x the separable
#     dual kernel (2088 vs ~400 ops/element: 36-56 ms/launch at 256^3,
#     i.e. +450 ms/step run everywhere). But the dual form IS the exact
#     composition whenever the map is locally affine-identity across the
#     corner cube: the difference is bounded by dev * |grad f| * h, where
#     dev = max corner deviation |M(node+d) - M(node) - d| in cells. So
#     each block evaluates dual ALWAYS (cheap), then overwrites with the
#     exact 9-corner tile only where dev_blk * rough_ch > tol * scale_ch
#     (rough = the block's max neighbor jump, scale = the field's global
#     max — i.e. the bound says dual would differ from exact by more than
#     tol * scale there). tol = GFS_VOL9_TOL (cells * relative-jump units;
#     0 forces exact everywhere). Smooth velocity blocks and empty density
#     blocks stay at dual cost; emitter edges and vortex cores get the
#     exact composition.
#   * Blocks whose union tap range does not fit the static tile take a
#     per-corner roll-adaptive exact fallback (third predicated region) —
#     no silent truncation. Window-level escapes (residual beyond the
#     window itself) are counted per block from the in-kernel union stats
#     (corner deviations included — stricter than the center-only prepass
#     count) and ride the frame overflow monitor -> step_checked retry.
# ---------------------------------------------------------------------------

# y/z tap-tile extent of the vol9 kernel (0 -> REBASED_NT + 1: the dual
# kernel's wider-support default).
_VOL9_NT = int(os.environ.get("GFS_VOL9_NT", "0"))
# adaptive-exactness threshold: a block goes exact when dev_blk * rough_ch
# > tol * scale_ch (see header). 0 = exact wherever the tile fits.
_VOL9_TOL = float(os.environ.get("GFS_VOL9_TOL", "2e-3"))


def _vol9_nt(Rr):
    W = 2 * Rr + 3
    nt = _VOL9_NT if _VOL9_NT > 0 else (REBASED_NT + 1 if REBASED_NT else 4)
    return min(nt, W)


# the 8 corner sign patterns + the center (sx, sy, sz, weight)
_VOL9_STENCIL = tuple(
    (sx, sy, sz, 1.0 / 16.0)
    for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
) + ((0, 0, 0, 0.5),)


def _vol9_map_slices(wm_ch, dim, block, P):
    """The 9 stencil positions of one map channel over the block, from the
    static ring-1 map window (local cell (a,b,c) = window (a+1, b+P, c+FZR)
    where FZR = FRONT_Z - bz*k offset folds to a static 124... the window
    copy puts cell c at lane c + (FRONT_Z - 1) - 122 ... see _kernel_vol9).

    Per axis, the 2-tap trilinear weights of a sample at node +- 0.25h:
      dim=0 (node on the map lattice): +: (i, i+1) w (3/4, 1/4)
                                       -: (i-1, i) w (1/4, 3/4)
                                       0: (i)      w (1)
      dim=1 (node at i - 0.5):         +: (i-1, i) w (1/4, 3/4)
                                       -: (i-1, i) w (3/4, 1/4)
                                       0: (i-1, i) w (1/2, 1/2)
    Returns {s: array} per axis combo lazily — callers walk corners one at
    a time to bound VMEM live ranges."""
    del P

    def taps(d, s):
        if d == 0:
            if s == 1:
                return ((0, 0.75), (1, 0.25))
            if s == -1:
                return ((-1, 0.25), (0, 0.75))
            return ((0, 1.0),)
        if s == 1:
            return ((-1, 0.25), (0, 0.75))
        if s == -1:
            return ((-1, 0.75), (0, 0.25))
        return ((-1, 0.5), (0, 0.5))

    B1, B2, B3 = block

    def pos(sx, sy, sz):
        v = wm_ch
        for axis, (s, bn) in enumerate(((sx, B1), (sy, B2), (sz, B3))):
            acc = None
            for off, wgt in taps(dim[axis], s):
                idx = [slice(None)] * 3
                # window base offsets: x rows a+1, y rows b (pre-sliced),
                # z lanes c (pre-sliced) — callers pass wm_ch already
                # sliced to the (B1+2, B2+2, B3+2) neighborhood with the
                # cell at local index +1 per axis
                idx[axis] = slice(1 + off, 1 + off + bn)
                t = v[tuple(idx)] * wgt if wgt != 1.0 else v[tuple(idx)]
                acc = t if acc is None else acc + t
            v = acc
        return v

    return pos


_NSC9_BASE = 10  # per-block scalars before the C branch codes


def _corner_pos_grid(maps_grid, dim, sx, sy, sz, grid_n, clamp, P,
                     out_shape):
    """Field-window coords of the (sx,sy,sz)*0.25h corner's mapped
    positions, lazily (feeds the prepass reductions; XLA fuses the stencil
    chains over one read of the map). s=0 is the center (the staggered
    average)."""
    ni, nj, nk = grid_n
    clo, chi = clamp

    def ax_op(m, axis, d, s):
        if d == 0 and s == 0:
            return m
        if d == 0:
            taps = (((0, 0.75), (1, 0.25)) if s == 1
                    else ((-1, 0.25), (0, 0.75)))
        else:
            taps = {1: ((-1, 0.25), (0, 0.75)),
                    -1: ((-1, 0.75), (0, 0.25)),
                    0: ((-1, 0.5), (0, 0.5))}[s]
        n = m.shape[axis]
        # staggered axes emit the FULL n+1 node lattice (both boundary
        # faces via the edge pad = boundedAt tap clamping)
        out_n = n + d
        min_o = min(o for o, _ in taps)
        max_o = max(o for o, _ in taps)
        padw = [(0, 0)] * 3
        padw[axis] = (max(0, -min_o), max(0, out_n + max_o - n))
        q = jnp.pad(m, padw, mode="edge")
        acc = None
        for off, wgt in taps:
            idx = [slice(None)] * 3
            idx[axis] = slice(off + max(0, -min_o),
                              off + max(0, -min_o) + out_n)
            t = q[tuple(idx)] * wgt
            acc = t if acc is None else acc + t
        return acc

    out = []
    bounds = (ni, nj, nk)
    signs = (sx, sy, sz)
    for ch in range(3):
        m = maps_grid[ch]
        for axis in range(3):
            m = ax_op(m, axis, dim[axis], signs[axis])
        m = jnp.clip(m, clo, bounds[ch] - chi)
        base = 0.5 * dim[ch] + (FRONT_Z if ch == 2 else P)
        g = m + base
        # a staggered kind's last face plane can exceed the cell block
        # grid (n % BX == 0): it is outside every band guard and gets
        # zero-padded by the caller — drop it here
        g = g[tuple(slice(0, min(g.shape[i], out_shape[i]))
                    for i in range(3))]
        pw = [(0, out_shape[i] - g.shape[i]) for i in range(3)]
        if any(p[1] for p in pw):
            node = jax.lax.broadcasted_iota(jnp.float32, g.shape, ch) + (
                128 if ch == 2 else P)
            dd = jnp.pad(g - node, pw, mode="edge")
            node2 = jax.lax.broadcasted_iota(jnp.float32, dd.shape, ch) + (
                128 if ch == 2 else P)
            g = node2 + dd
        out.append(g)
    return tuple(out)


def _vol9_bz(Z):
    return 256 if Z % 256 == 0 else 128


def vol9_map_stats(maps, h, grid_n, *, Rr=2, interpret=False):
    """Once-per-map statistics for the vol9 fixup: the padded map pack and
    the per-block corner-deviation estimate dev_blk.

    dev ~ max_s |0.25 sum_b E^{s_b}_b M_ch - 0.25 s_ch| from the six
    one-sided map differences (the first-order expansion of the corner
    trilerp product — exact to second differences, and maps are smooth
    marched fields, so the dropped cross terms are O(dt^2 grad^2 u);
    clamp-induced deviation near the domain faces is added separately in
    _origins_vol9 from the center positions). Computed on the cell
    lattice and dilated one block each way so every kind/stage sharing
    this map can reuse it."""
    del interpret
    ni, nj, nk = grid_n
    BY = _by(Rr)
    out_shape = (_ceil(ni, BX), _ceil(nj, BY), _ceil(nk, 128))
    bz = _vol9_bz(out_shape[2])
    nb = (out_shape[0] // BX, out_shape[1] // BY, out_shape[2] // bz)
    maps_grid = maps / h
    maps_packed = pad_fields(maps_grid, (ni, nj, nk), Rr)

    # six one-sided diffs per channel on the interior; identity-corrected
    dev_e = None
    for ch in range(3):
        m = maps_grid[ch]
        dpos = []
        dneg = []
        for b in range(3):
            lo = [slice(1, -1)] * 3
            hi = [slice(1, -1)] * 3
            lo[b] = slice(0, -2)
            hi[b] = slice(2, None)
            mid = [slice(1, -1)] * 3
            dpos.append(m[tuple(hi)] - m[tuple(mid)]
                        - (1.0 if b == ch else 0.0))
            dneg.append(-(m[tuple(mid)] - m[tuple(lo)])
                        + (1.0 if b == ch else 0.0))
        # max over the 8 sign combos of |sum_b chosen diff| = sum_b
        # max(|d+|, |d-|)? NO — signs couple the terms; evaluate the 8
        # combos exactly (cheap elementwise tree)
        for sx in (0, 1):
            for sy in (0, 1):
                for sz in (0, 1):
                    t = ((dpos[0] if sx else dneg[0])
                         + (dpos[1] if sy else dneg[1])
                         + (dpos[2] if sz else dneg[2]))
                    t = 0.25 * jnp.abs(t)
                    dev_e = t if dev_e is None else jnp.maximum(dev_e, t)
    # back to the full cell lattice (interior values; edge ring absorbed
    # by the block dilation)
    dev_e = jnp.pad(dev_e, [(1, out_shape[i] - dev_e.shape[i] - 1)
                            for i in range(3)])
    r = dev_e.reshape(nb[0], BX, nb[1], BY, nb[2], bz).max(
        axis=(1, 3, 5))
    for ax in range(3):
        pads = [(1, 1) if i == ax else (0, 0) for i in range(3)]
        q = jnp.pad(r, pads, mode="edge")
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[ax] = slice(0, -2)
        hi[ax] = slice(2, None)
        r = jnp.maximum(r, jnp.maximum(q[tuple(lo)], q[tuple(hi)]))
    return maps_packed, r


def _origins_vol9(p1, fields, dev_blk, dim, clamp, grid_n, fs, *, Rr, P,
                  nb, tol, nt, out_shape, band):
    """Prepass of the vol9 fixup launch, from REUSED inputs: `p1` = the
    dual path's world center positions (already materialized by
    map_at_lattice), `dev_blk` = vol9_map_stats' per-block corner
    deviation. Computes per-block branch codes + window origins for the
    flagged blocks as a handful of fused reductions.

    Statistics are masked to `band` (the cells the consuming stage
    actually updates). Branch codes per (block, channel): 0 = keep dual,
    1 = exact 9-corner static tile, 2 = union exceeds the tile ->
    per-corner adaptive. esc counts blocks whose corner union escapes the
    window itself."""
    C = fields.shape[0]
    W = 2 * Rr + 3
    BY = _by(Rr)
    bz = out_shape[2] // nb[2]
    nx_fast = min(REBASED_XNT + 1 if REBASED_XNT else W, W)
    big = jnp.float32(1e9)
    h = None  # positions arrive in grid units below

    if band is not None:
        lo0, lo1, lo2, hib = band
        kind_n = tuple(grid_n[i] + dim[i] for i in range(3))
        ii = jax.lax.broadcasted_iota(jnp.int32, out_shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, out_shape, 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, out_shape, 2)
        bmask = ((ii > lo0) & (ii < kind_n[0] - hib)
                 & (jj > lo1) & (jj < kind_n[1] - hib)
                 & (kk > lo2) & (kk < kind_n[2] - hib))
    else:
        bmask = None

    def blockify(d, fill):
        d = d[tuple(slice(0, min(d.shape[i], out_shape[i]))
                    for i in range(3))]
        pw = [(0, out_shape[i] - d.shape[i]) for i in range(3)]
        if any(p[1] for p in pw):
            d = jnp.pad(d, pw, constant_values=fill)
        if bmask is not None:
            d = jnp.where(bmask, d, fill)
        return d.reshape(nb[0], BX, nb[1], BY, nb[2], bz)

    def bmin(d):
        return blockify(d, big).min(axis=(1, 3, 5))

    def bmax(d, neutral=0.0):
        return blockify(d, neutral).max(axis=(1, 3, 5))

    # center positions in grid units + clamp-induced corner deviation
    # (clipped corners deviate from center +- 0.25 near the domain faces)
    ni, nj, nk = grid_n
    clo, chi = clamp
    gpos = [p1[ax] for ax in range(3)]  # grid units (caller divides by h)
    clampdev = None
    for ax, n_ax in ((0, ni), (1, nj), (2, nk)):
        g = gpos[ax]
        d = jnp.maximum(jnp.maximum(clo - (g - 0.25), 0.0),
                        jnp.maximum((g + 0.25) - (n_ax - chi), 0.0))
        d = jnp.minimum(d, 0.25)
        clampdev = d if clampdev is None else jnp.maximum(clampdev, d)
    dev_full = dev_blk + bmax(clampdev)
    half = 0.25 + dev_full

    mn = []
    mx = []
    iot_base = (P, P, FRONT_Z)
    for ax in range(3):
        i_ = jax.lax.broadcasted_iota(jnp.float32, gpos[ax].shape, ax)
        d = gpos[ax] + (0.5 * dim[ax]) - i_
        mn.append(bmin(d) - half)
        mx.append(bmax(d, neutral=-big) + half)

    # window origins from the union midpoints (padded coords)
    s_x = jnp.round(0.5 * (mn[0] + mx[0])).astype(jnp.int32)
    s_y = jnp.round(0.5 * (mn[1] + mx[1])).astype(jnp.int32)
    s_z = jnp.clip(jnp.round(0.5 * (mn[2] + mx[2])).astype(jnp.int32),
                   -(112 - Rr), 112 - Rr)
    Wx = BX + 2 * Rr + 2
    bo_x = (jnp.arange(nb[0], dtype=jnp.int32) * BX)[:, None, None]
    bo_y = (jnp.arange(nb[1], dtype=jnp.int32) * BY)[None, :, None]
    bo_z = (jnp.arange(nb[2], dtype=jnp.int32) * bz)[None, None, :]
    ox = jnp.clip(bo_x + P + s_x - (Rr + 1), 0, fs[0] - Wx)
    oy_ideal = jnp.clip(bo_y + P + s_y - (Rr + 1), 0,
                        fs[1] - (BY + 2 * Rr + 2))
    oy = jnp.minimum((oy_ideal // 8) * 8, fs[1] - WY_WIN)
    slack = oy_ideal - oy
    g0 = FRONT_Z + bo_z + s_z - (Rr + 1)
    ozw = jnp.clip((g0 // 128) * 128, 0, fs[2] - _wz_win(bz))

    # union live taps in window coords: the position d above is relative
    # to each element's own lattice index; in-window rel = d - s + (Rr+1)
    lo_x = jnp.floor(mn[0] - s_x.astype(jnp.float32) + (Rr + 1)).astype(
        jnp.int32)
    hi_x = jnp.floor(mx[0] - s_x.astype(jnp.float32) + (Rr + 1)).astype(
        jnp.int32) + 1
    lo_y = jnp.floor(mn[1] - s_y.astype(jnp.float32) + (Rr + 1)).astype(
        jnp.int32)
    hi_y = jnp.floor(mx[1] - s_y.astype(jnp.float32) + (Rr + 1)).astype(
        jnp.int32) + 1
    lo_z = jnp.floor(mn[2] - s_z.astype(jnp.float32) + (Rr + 1)).astype(
        jnp.int32)
    hi_z = jnp.floor(mx[2] - s_z.astype(jnp.float32) + (Rr + 1)).astype(
        jnp.int32) + 1
    # the escape monitor keeps the established center +-0.25 condition
    # (the dual kernel's dspan semantics): the dev term stays in the
    # ROUTING (fits/branch C evaluates wide unions without truncation;
    # its window is centered on the dev-inclusive union midpoint, so
    # corners stay covered far beyond the monitored envelope)
    def tapless(v, s):
        return jnp.floor(v - s.astype(jnp.float32) + (Rr + 1))

    esc = None
    for ax, s_ax in ((0, s_x), (1, s_y), (2, s_z)):
        lo_m = tapless(mn[ax] + dev_full, s_ax).astype(jnp.int32)
        hi_m = tapless(mx[ax] - dev_full, s_ax).astype(jnp.int32) + 1
        e = (lo_m < 0) | (hi_m > W - 1)
        esc = e if esc is None else esc | e
    esc_count = jnp.sum(esc, dtype=jnp.int32)
    ylo = jnp.clip(lo_y, 0, W - 1)
    zlo = jnp.clip(lo_z, 0, W - 1)
    nyt = jnp.clip(hi_y, 0, W - 1) - ylo + 1
    nzt = jnp.clip(hi_z, 0, W - 1) - zlo + 1
    fits = ((nyt <= nt) & (nzt <= nt)
            & (lo_x >= 0) & (hi_x <= nx_fast - 1))

    # per-channel roughness (block max |neighbor diff|, dilated one block)
    shape3 = (nb[0], nb[1], nb[2])
    codes = []
    n_exact = jnp.int32(0)
    for ch in range(C):
        f = fields[ch]
        r = None
        for ax in range(3):
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(0, -1)
            hi[ax] = slice(1, None)
            d = jnp.abs(f[tuple(hi)] - f[tuple(lo)])
            dm = bmax(d)
            r = dm if r is None else jnp.maximum(r, dm)
        for ax in range(3):
            pads = [(1, 1) if i == ax else (0, 0) for i in range(3)]
            q = jnp.pad(r, pads, mode="edge")
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[ax] = slice(0, -2)
            hi[ax] = slice(2, None)
            r = jnp.maximum(r, jnp.maximum(q[tuple(lo)], q[tuple(hi)]))
        scale = jnp.max(jnp.abs(f))
        if tol <= 0.0:
            need = jnp.ones(shape3, bool)
        else:
            need = dev_full * r > tol * scale
        # routing: blocks whose dual value is provably within tol stay
        # dual (code 0) REGARDLESS of tile fit; only needing blocks pick
        # exact-static (1) vs exact-adaptive (2). The previous form
        # `where(fits, where(need, 1, 0), 2)` sent every fits-false block
        # exact — and `fits` is almost never true in production (the tap
        # union is taken over full-depth 128/256-lane z blocks), so the
        # "adaptive" scheme degenerated to exact-everywhere: the entire
        # 2.2x step cost / 14x compile regression of BENCH_r03, with tol
        # having no effect at all (VERDICT r3: tol=0 was bit-identical).
        code = jnp.where(need, jnp.where(fits, 1, 2), 0).astype(jnp.int32)
        codes.append(code)
        n_exact = n_exact + jnp.sum((code > 0).astype(jnp.int32))

    has_exact = jnp.zeros(shape3, jnp.int32)
    for code in codes:
        has_exact = jnp.maximum(has_exact, jnp.minimum(code, 1))

    cols = [ox, oy, slack, ozw, g0, ylo, nyt, zlo, nzt, has_exact] + codes
    packed = jnp.stack(
        [jnp.broadcast_to(v, shape3).reshape(-1) for v in cols], axis=-1,
    ).reshape(-1)
    return packed, jnp.stack(codes), esc_count, n_exact


def _kernel_vol9fix(origin_ref, maps_hbm, fields_hbm, out_hbm, win_m,
                    win_f, out_s, sem, *, Rr, block, win_m_shape,
                    win_f_shape, P, dim, clamp, grid_n, nt):
    """The sparse exact-composition FIXUP: blocks with no flagged channel
    do NOTHING (the output lives in ANY space and is written only by
    flagged blocks via an explicit DMA — VMEM-blocked outputs copy back
    every block, and lax.cond around the launch measured ~30 ms per cond
    at 256^3). Flagged blocks fetch the static ring-1 map window + the
    union-origin field window, evaluate the exact 9-corner composition
    for their flagged channels into a VMEM scratch, and write that block
    out. Unflagged channels of a flagged block carry scratch garbage —
    the caller's where-merge keeps the dual value wherever code == 0."""
    nb1 = pl.num_programs(1)
    nb2 = pl.num_programs(2)
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    blk = (bi * nb1 + bj) * nb2 + bk
    B1, B2, B3 = block
    C = win_f_shape[0]
    nsc = _NSC9_BASE + C

    def sc(i):
        return origin_ref[blk * nsc + i]

    @pl.when(sc(9) > 0)
    def _():
        ox = sc(0)
        oy = pl.multiple_of(sc(1), 8)
        syf = sc(2)
        ozw = pl.multiple_of(sc(3), 128)
        g0 = sc(4)
        ylo = sc(5)
        zlo = sc(7)
        mcopy = pltpu.make_async_copy(
            maps_hbm.at[:, pl.ds(bi * B1 + (P - 1), win_m_shape[1]),
                        pl.ds(bj * B2, win_m_shape[2]),
                        pl.ds(bk * B3, win_m_shape[3])],
            win_m, sem.at[0],
        )
        fcopy = pltpu.make_async_copy(
            fields_hbm.at[:, pl.ds(ox, win_f_shape[1]),
                          pl.ds(oy, win_f_shape[2]),
                          pl.ds(ozw, win_f_shape[3])],
            win_f, sem.at[1],
        )
        mcopy.start()
        fcopy.start()
        mcopy.wait()
        fcopy.wait()

        a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(
            jnp.float32)
        b_ = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(
            jnp.float32)
        c_ = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(
            jnp.float32)
        ni, nj, nk = grid_n
        clo, chi = clamp
        W = 2 * Rr + 3
        nxf = min(REBASED_XNT + 1 if REBASED_XNT else W, W)
        wf = _rebased_window(win_f, syf, g0 - ozw, 2)

        wm = win_m[...]
        pos_fns = [
            _vol9_map_slices(
                wm[ch, :, P - 1: P + B2 + 1,
                   FRONT_Z - 1: FRONT_Z + B3 + 1], dim, block, P)
            for ch in range(3)
        ]

        def local_coords(sx, sy, sz):
            px = jnp.clip(pos_fns[0](sx, sy, sz), clo, ni - chi)
            py = jnp.clip(pos_fns[1](sx, sy, sz), clo, nj - chi)
            pz = jnp.clip(pos_fns[2](sx, sy, sz), clo, nk - chi)
            lx = px + (0.5 * dim[0] + P) - ox.astype(jnp.float32)
            ly = py + (0.5 * dim[1] + P) - (oy + syf).astype(jnp.float32)
            lz = pz + (0.5 * dim[2] + FRONT_Z) - g0.astype(jnp.float32)
            return lx, ly, lz

        for ch in range(C):
            @pl.when(sc(_NSC9_BASE + ch) == 1)
            def _(ch=ch):
                wch = pltpu.roll(pltpu.roll(wf[ch], -ylo, 1), -zlo, 2)
                acc = jnp.zeros(block, jnp.float32)
                for sx, sy, sz, wgt in _VOL9_STENCIL:
                    lx, ly, lz = local_coords(sx, sy, sz)
                    lyr = ly - ylo.astype(jnp.float32)
                    lzr = lz - zlo.astype(jnp.float32)
                    hx = [_hat(lx - (a + i)) for i in range(nxf)]
                    hy = [_hat(lyr - (b_ + q)) for q in range(nt)]
                    hz = [_hat(lzr - (c_ + r)) for r in range(nt)]
                    cov = sum(hx) * sum(hy) * sum(hz)
                    out = jnp.zeros(block, jnp.float32)
                    for dr in range(nt):
                        wz = wch[:, :, dr: dr + B3]
                        accy = jnp.zeros(block, jnp.float32)
                        for dq in range(nt):
                            wyz = wz[:, dq: dq + B2, :]
                            accx = jnp.zeros(block, jnp.float32)
                            for dp in range(nxf):
                                accx = accx + hx[dp] * wyz[dp: dp + B1]
                            accy = accy + hy[dq] * accx
                        out = out + hz[dr] * accy
                    val = jnp.where(cov > 1e-6,
                                    out / jnp.maximum(cov, 1e-6), 0.0)
                    acc = acc + wgt * val
                out_s[ch] = acc

            @pl.when(sc(_NSC9_BASE + ch) == 2)
            def _(ch=ch):
                wch = wf[ch]
                acc = jnp.zeros(block, jnp.float32)
                for sx, sy, sz, wgt in _VOL9_STENCIL:
                    lx, ly, lz = local_coords(sx, sy, sz)
                    cylo, cnyt = _live_taps(ly - b_, W)
                    czlo, cnzt = _live_taps(lz - c_, W)
                    val = _trilerp_sum_adaptive(
                        wch, lx, ly, lz, (cylo, cnyt, czlo, cnzt), block,
                        Rr)
                    acc = acc + wgt * val
                out_s[ch] = acc

        # write the block out: scratch -> HBM
        def out_copy():
            return pltpu.make_async_copy(
                out_s,
                out_hbm.at[:, pl.ds(bi * B1, B1), pl.ds(bj * B2, B2),
                           pl.ds(bk * B3, B3)],
                sem.at[2],
            )

        out_copy().start()
        out_copy().wait()


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "interpret", "out_shape", "dim", "clamp",
                     "grid_n", "tol", "band"),
)
def _vol9_fixup_padded(maps_packed, fields_packed, gx, gy, gz, fields,
                       dev_blk, *, Rr, interpret, out_shape, dim, clamp,
                       grid_n, tol, band):
    C = fields_packed.shape[0]
    P = Rr + 2
    BY = _by(Rr)
    # 256-lane fixup blocks: halves the per-block iteration overhead of
    # the (mostly-skipping) sparse launch
    bz = _vol9_bz(out_shape[2])
    nb = (out_shape[0] // BX, out_shape[1] // BY, out_shape[2] // bz)
    block = (BX, BY, bz)
    nt = _vol9_nt(Rr)
    fs = fields_packed.shape[1:]
    origins, codes, esc_count, n_exact = _origins_vol9(
        (gx, gy, gz), fields, dev_blk, dim, clamp, grid_n, fs, Rr=Rr, P=P,
        nb=nb, tol=tol, nt=nt, out_shape=out_shape, band=band)
    win_m_shape = (3, BX + 2, _ceil(BY + P + 1, 8), bz + 128)
    win_f_shape = (C, BX + 2 * Rr + 2, WY_WIN, _wz_win(bz))
    kernel = functools.partial(
        _kernel_vol9fix, Rr=Rr, block=block, win_m_shape=win_m_shape,
        win_f_shape=win_f_shape, P=P, dim=dim, clamp=clamp, grid_n=grid_n,
        nt=nt,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=nb,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM(win_m_shape, jnp.float32),
            pltpu.VMEM(win_f_shape, fields_packed.dtype),
            pltpu.VMEM((C,) + block, jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C,) + out_shape, jnp.float32),
        grid_spec=grid_spec,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(origins, maps_packed, fields_packed)
    return out, codes, esc_count, n_exact


# per-step telemetry sink for the adaptive-exactness branch counts (list
# of (exact_block_channels, total_block_channels) per launch when active)
VOL9_ECOUNT_SINK = None


def vol9_fixup(dual_outs, fields, map_stats, p1, dim, h, grid_n, clamp_lo,
               clamp_hi, *, band=None, Rr=2, interpret=False, dtype=None,
               tol=None):
    """Overwrite the dual launch's outputs with the EXACT 9-position
    composition (advect_kernel, GPU_kernel.cu:312-374) on the blocks where
    the separable dual form is NOT provably within tol * max|f| of it —
    the sparse second pass of the adaptive-exactness scheme.

    `dual_outs`: list of C per-kind arrays from the dual evaluation;
    `fields`: the C SOURCE fields (stacked); `map_stats` = vol9_map_stats'
    (maps_packed, dev_blk), computed once per map per step; `p1`: the dual
    path's world-coordinate center positions (map_at_lattice output,
    reused — no new stencil work). Returns the merged list. Window-escape
    block counts go to OVERFLOW_SINK; (exact, total) block-channel counts
    to VOL9_ECOUNT_SINK."""
    maps_packed, dev_blk = map_stats
    ni, nj, nk = grid_n
    P = Rr + 2
    BY = _by(Rr)
    out_shape = (_ceil(ni, BX), _ceil(nj, BY), _ceil(nk, 128))
    kind_shape = fields.shape[1:]
    fields_packed = pad_fields(fields, (ni, nj, nk), Rr, dtype=dtype)
    clamp = (float(clamp_lo), float(clamp_hi))
    sl = tuple(slice(0, min(out_shape[i], kind_shape[i])) for i in range(3))
    gx, gy, gz = (p1[0][sl] / h, p1[1][sl] / h, p1[2][sl] / h)
    gx, gy, gz = _pad_positions_rim(gx, gy, gz, P, BY)
    out, codes, esc_count, n_exact = _vol9_fixup_padded(
        maps_packed, fields_packed, gx, gy, gz, fields, dev_blk, Rr=Rr,
        interpret=interpret, out_shape=out_shape,
        dim=tuple(int(d) for d in dim), clamp=clamp, grid_n=tuple(grid_n),
        tol=_VOL9_TOL if tol is None else float(tol),
        band=band,
    )
    if OVERFLOW_SINK is not None:
        OVERFLOW_SINK.append(esc_count)
    if VOL9_ECOUNT_SINK is not None:
        nblk = (out_shape[0] // BX) * (out_shape[1] // BY) * (
            out_shape[2] // _vol9_bz(out_shape[2])) * fields.shape[0]
        VOL9_ECOUNT_SINK.append((n_exact, nblk))
    merged = []
    for ch, dual_out in enumerate(dual_outs):
        o = out[ch, : min(kind_shape[0], out.shape[1]),
                : min(kind_shape[1], out.shape[2]),
                : min(kind_shape[2], out.shape[3])]
        pw = [(0, kind_shape[i] - o.shape[i]) for i in range(3)]
        if any(p[1] for p in pw):
            o = jnp.pad(o, pw)
        # expand the per-block code to elements lazily (fuses into the
        # select)
        bz = out_shape[2] // codes.shape[3]
        ce = jnp.broadcast_to(
            codes[ch][:, None, :, None, :, None],
            (codes.shape[1], BX, codes.shape[2], BY, codes.shape[3], bz),
        ).reshape(out_shape)
        ce = ce[tuple(slice(0, min(out_shape[i], kind_shape[i]))
                      for i in range(3))]
        pwc = [(0, kind_shape[i] - ce.shape[i]) for i in range(3)]
        if any(p[1] for p in pwc):
            ce = jnp.pad(ce, pwc)
        merged.append(jnp.where(ce > 0, o, dual_out))
    return merged


def sample3_vol9(fields, maps, dim, h, grid_n, clamp_lo, clamp_hi, *, Rr=2,
                 interpret=False, dtype=None, tol=None, band=None):
    """The 9-position volume composition as (dual launch + sparse exact
    fixup) — see vol9_fixup. This convenience form runs the dual
    evaluation and the map stats internally; the solver path shares the
    map stats across stages (mapping.bimocq_advect_3d)."""
    off = tuple(-0.5 * d for d in dim)
    maps_grid = maps / h
    ni, nj, nk = grid_n
    out_shape = (_ceil(ni, BX), _ceil(nj, _by(Rr)), _ceil(nk, 128))
    P = Rr + 2
    ctr = _corner_pos_grid(maps_grid, dim, 0, 0, 0, grid_n,
                           (float(clamp_lo), float(clamp_hi)), P, out_shape)
    kind_shape = fields.shape[1:]
    px = (ctr[0] - (0.5 * dim[0] + P)) * h
    py = (ctr[1] - (0.5 * dim[1] + P)) * h
    pz = (ctr[2] - (0.5 * dim[2] + FRONT_Z)) * h
    sl = tuple(slice(0, min(out_shape[i], kind_shape[i])) for i in range(3))
    pads = [(0, kind_shape[i] - min(out_shape[i], kind_shape[i]))
            for i in range(3)]

    def to_kind(arr):
        arr = arr[sl]
        return jnp.pad(arr, pads, mode="edge") if any(
            p[1] for p in pads) else arr

    px, py, pz = to_kind(px), to_kind(py), to_kind(pz)
    duals = sample3_multi(fields, px, py, pz, h, (off,) * fields.shape[0],
                          Rr=Rr, interpret=interpret, dtype=dtype,
                          dual=True)
    stats = vol9_map_stats(maps, h, grid_n, Rr=Rr)
    return jnp.stack(vol9_fixup(
        [duals[c] for c in range(fields.shape[0])], fields, stats,
        (px, py, pz), dim, h, grid_n, clamp_lo, clamp_hi, band=band, Rr=Rr,
        interpret=interpret, dtype=dtype, tol=tol))


# ---------------------------------------------------------------------------
# Fused DMC backward-map substep: the ENTIRE per-substep pipeline of
# DMC_backward_kernel (GPU_kernel.cu:169-204 / ops/advect.dmc_backward_step_3d
# fast path) in one two-window launch: center-lattice MAC velocities and
# their sign-selected diagonal upwind neighbors are STATIC window slices
# (cell centers sit exactly between faces), the exponential-integrator new
# position is VPU math, and the 3 map channels are gathered with the usual
# adaptive hat loops. Window origins are static per block (the DMC sampling
# position stays within ~1.3 cells of its node for |a*dt| <= 1; the
# exponential integrator can reach ~3.2 cells at the |a*dt| ~ 2 extreme, in
# which case taps clip to the window and renormalize — the same bounded
# local-clamp behavior as the rest of the fast-interp contract, vs the old
# path's per-block adaptive base shift), so there is NO prepass, no
# intermediate HBM traffic, and one launch instead of ~10 fused XLA passes
# plus a sampler launch per substep.
# ---------------------------------------------------------------------------


def _dmc_origin(i, j, k, fs, P, Rr, bz=128):
    """Static (s=0) window origin for block (i,j,k) against an array with
    per-copy spatial shape `fs`."""
    BY = _by(Rr)
    ox = i * BX + P - (Rr + 1)
    oy_ideal = j * BY + P - (Rr + 1)
    oy = jnp.minimum((oy_ideal // 8) * 8, fs[1] - WY_WIN)
    sy = oy_ideal - oy
    g0 = FRONT_Z + k * bz - (Rr + 1)
    ozw = (g0 // 128) * 128
    return ox, pl.multiple_of(oy, 8), sy, pl.multiple_of(ozw, 128), g0 - ozw


def _kernel_dmc(sh_ref, mac_hbm, maps_hbm, out_ref, cnt_ref, win_v, win_m,
                sem, *, Rr, block, win_shape, fs_v, fs_m, P, grid_n):
    nb1 = pl.num_programs(1)
    nb2 = pl.num_programs(2)
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    blk = (bi * nb1 + bj) * nb2 + bk
    nblk = pl.num_programs(0) * nb1 * nb2
    slot = jax.lax.rem(blk, 2)

    def copies(b, sl):
        k = jax.lax.rem(b, nb2)
        ij = b // nb2
        j = jax.lax.rem(ij, nb1)
        i = ij // nb1
        out = []
        for hbm, wref, fs, c in ((mac_hbm, win_v, fs_v, 0),
                                 (maps_hbm, win_m, fs_m, 1)):
            ox, oy, _, ozw, _ = _dmc_origin(i, j, k, fs, P, Rr, block[2])
            src = hbm.at[:, pl.ds(ox, win_shape[1]), pl.ds(oy, win_shape[2]),
                         pl.ds(ozw, win_shape[3])]
            out.append(pltpu.make_async_copy(src, wref.at[sl],
                                             sem.at[sl, c]))
        return out

    @pl.when(blk == 0)
    def _():
        for d in copies(0, 0):
            d.start()

    @pl.when(blk + 1 < nblk)
    def _():
        for d in copies(blk + 1, jax.lax.rem(blk + 1, 2)):
            d.start()

    for d in copies(blk, slot):
        d.wait()

    sh = sh_ref[0, 0]   # substep dt / h
    h = sh_ref[0, 1]    # cell size (the reference's 1e-4 |a| threshold)
    _, _, sy_v, _, relz = _dmc_origin(bi, bj, bk, fs_v, P, Rr, block[2])
    _, _, sy_m, _, _ = _dmc_origin(bi, bj, bk, fs_m, P, Rr, block[2])
    # 256-lane blocks need >= 262 rebased lanes: zero-extend the 3-tile
    # window to the pow2 512 in VMEM (out_z) — HBM DMA stays at 384
    oz = 512 if block[2] == 256 else None
    wv = _rebased_window(win_v.at[slot], sy_v, relz, 2, out_z=oz)
    wm = _rebased_window(win_m.at[slot], sy_m, relz, 2, out_z=oz)

    B1, B2, B3 = block
    R1 = Rr + 1  # window index of node (a,b,c) is (a+R1, b+R1, c+R1)

    def at(ch, dx, dy, dz):
        # MAC channel value slice at node offsets (dx, dy, dz) from centers
        return wv[ch, R1 + dx: R1 + dx + B1, R1 + dy: R1 + dy + B2,
                  R1 + dz: R1 + dz + B3]

    def vel_at(dx, dy, dz):
        # staggered face averages: u straddles x, v straddles y, w z
        vu = 0.5 * (at(0, dx, dy, dz) + at(0, dx + 1, dy, dz))
        vv = 0.5 * (at(1, dx, dy, dz) + at(1, dx, dy + 1, dz))
        vw = 0.5 * (at(2, dx, dy, dz) + at(2, dx, dy, dz + 1))
        return vu, vv, vw

    vel_u, vel_v, vel_w = vel_at(0, 0, 0)
    sx = vel_u > 0
    sy_ = vel_v > 0
    sz = vel_w > 0

    tu = jnp.zeros(block, jnp.float32)
    tv = jnp.zeros(block, jnp.float32)
    tw = jnp.zeros(block, jnp.float32)
    for ex in (-1, 1):
        mx_ = sx if ex == -1 else ~sx
        for ey in (-1, 1):
            my_ = mx_ & (sy_ if ey == -1 else ~sy_)
            for ez in (-1, 1):
                m = my_ & (sz if ez == -1 else ~sz)
                cu, cv, cw = vel_at(ex, ey, ez)
                tu = jnp.where(m, cu, tu)
                tv = jnp.where(m, cv, tv)
                tw = jnp.where(m, cw, tw)

    def newdisp(vel, t, sgn_pos):
        # displacement in grid cells of the exponential DMC step
        sgn = jnp.where(sgn_pos, 1.0, -1.0)
        du = vel - t
        q = du * sgn * sh
        safe = jnp.abs(du) > 1e-4 * h
        denom = jnp.where(safe, du * sgn, 1.0)
        exp_disp = (1.0 - jnp.exp(-q)) * vel / denom
        return jnp.where(safe, exp_disp, vel * sh)

    a_i = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b_i = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c_i = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)
    lx = a_i + (Rr + 1) - newdisp(vel_u, tu, sx)
    ly = b_i + (Rr + 1) - newdisp(vel_v, tv, sy_)
    lz = c_i + (Rr + 1) - newdisp(vel_w, tw, sz)

    W = 2 * Rr + 3
    ylo, nyt = _live_taps(ly - b_i, W)
    zlo, nzt = _live_taps(lz - c_i, W)

    # interior band (interior_mask('c', lo=2, hi=3)): else keep the old map
    gi = bi * BX + a_i
    gj = bj * _by(Rr) + b_i
    gk = bk * B3 + c_i
    ni, nj, nk = grid_n
    band = ((gi >= 2) & (gi <= ni - 3) & (gj >= 2) & (gj <= nj - 3)
            & (gk >= 2) & (gk <= nk - 3))

    xs = (R1 - 2, 5) if _DMC_XNT else None  # see _DMC_XNT: default off
    for ch in range(3):
        # adaptive (not _trilerp_when): the predicated-region form measured
        # +33 ms on this kernel at 256^3 — see _sample_mac_stage.
        sampled = _trilerp_sum_adaptive(
            wm[ch], lx, ly, lz, (ylo, nyt, zlo, nzt), block, Rr,
            x_static=xs,
        )
        center = wm[ch, R1: R1 + B1, R1: R1 + B2, R1: R1 + B3]
        out_ref[ch] = jnp.where(band, sampled, center)

    # free displacement-contract monitor: DMC displacements beyond the
    # window reach (|d| > Rr + 0.5 cells per axis) are clamped by the tap
    # machinery — count them per launch so every substep of every frame
    # self-reports (the in-kernel twin of smoke3d's periodic XLA mirror,
    # which this byproduct replaces). Band cells only: rim cells keep the
    # old map and never consume a clamped sample.
    reach = Rr + 0.5
    if _DMC_XNT:
        # x: exact fit test of the 5-tap static range [R1-2, R1+2)
        x_viol = (lx - a_i < R1 - 2) | (lx - a_i >= R1 + 2)
    else:
        x_viol = jnp.abs(lx - (a_i + R1)) > reach
    viol = band & (x_viol
                   | (jnp.abs(ly - (b_i + R1)) > reach)
                   | (jnp.abs(lz - (c_i + R1)) > reach))
    # single (1,1) SMEM accumulator with a constant index map: the TPU grid
    # runs sequentially on one core, so += across grid steps is safe, and
    # the block is only flushed once, after the last step. (A per-block row
    # output would need a (1,1) block over an (nblk,1) array — rejected by
    # Mosaic's (8,128)-divisible-or-whole-array block rule.)
    @pl.when(blk == 0)
    def _():
        cnt_ref[0, 0] = 0

    cnt_ref[0, 0] += jnp.sum(viol.astype(jnp.int32))


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "interpret", "out_shape", "grid_n", "slice_out"),
)
def _dmc_padded(mac_packed, maps_packed, sh, h, *, Rr, interpret, out_shape,
                grid_n, slice_out=True):
    P = Rr + 2
    BY = _by(Rr)
    nx = _ceil(out_shape[0], BX)
    ny = _ceil(out_shape[1], BY)
    Z = _ceil(out_shape[2], 128)
    bz = _bz(Z, prefer=256)  # static-origin DMA-bound kernel: 256 wins
    nb = (nx // BX, ny // BY, Z // bz)
    block = (BX, BY, bz)
    fs_v = mac_packed.shape[1:]
    fs_m = maps_packed.shape[1:]
    Wx = BX + 2 * Rr + 2
    # static origins: the in-window z offset is fixed at FRONT_Z-(Rr+1),
    # so 256-lane blocks fit a 3-tile (384) window — 25% less window DMA
    # in this DMA-bound kernel than the dynamic-origin 512 extent
    win_shape = (3, Wx, WY_WIN, _wz_win(bz, static=True))
    kernel = functools.partial(
        _kernel_dmc, Rr=Rr, block=block, win_shape=win_shape,
        fs_v=fs_v, fs_m=fs_m, P=P, grid_n=grid_n,
    )
    scalars = jnp.stack([sh, h]).astype(jnp.float32).reshape(1, 2)
    out, cnt = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((3, nx, ny, Z), jnp.float32),
            # launch-total contract-violation count (see _kernel_dmc)
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        grid=nb,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((3,) + block, lambda i, j, k: (0, i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2,) + win_shape, mac_packed.dtype),  # win_v (MAC)
            pltpu.VMEM((2,) + win_shape, jnp.float32),       # win_m (maps)
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scalars, mac_packed, maps_packed)
    if not slice_out:
        return out, jnp.sum(cnt)
    return (out[:, : out_shape[0], : out_shape[1], : out_shape[2]],
            jnp.sum(cnt))


def dmc_substep_fast(mac_packed, maps, sub, h, grid_n, *, Rr=2,
                     interpret=False, want_count=False):
    """One fused DMC backward-map substep. `mac_packed` is the frame's MAC
    pack (pad_fields onto the cell lattice); `maps` is the stacked
    (3, ni, nj, nk) backward map, padded here per substep (it changes).
    `want_count=True` additionally returns the launch's in-kernel
    displacement-contract violation count (free byproduct)."""
    out_shape = maps.shape[1:]
    maps_packed = pad_fields(maps, out_shape, Rr)
    sh = jnp.asarray(sub, jnp.float32) / h
    out, cnt = _dmc_padded(
        mac_packed, maps_packed, sh, jnp.float32(h),
        Rr=Rr, interpret=interpret, out_shape=out_shape, grid_n=grid_n,
    )
    return (out, cnt) if want_count else out


def dmc_substep_fast_carry(mac_packed, maps_padded, sub, h, grid_n, *,
                           out_shape, Rr=2, interpret=False):
    """One fused DMC substep over an ALREADY-PADDED map carry: returns the
    (next padded carry, violation count). The caller updates the carry
    in place (lax.dynamic_update_slice at (P, P, FRONT_Z)) instead of
    re-materializing a full edge-pad per substep — correct because the
    DMC interior band freezes the map's boundary cells, so the edge-
    replication ring is invariant across a frame's substeps. Requires
    block-multiple out_shape (no rim blocks; rim outputs would overwrite
    live pad rows).

    PARKED (measured negative, PERF.md): XLA refuses to alias the
    dynamic_update_slice around the pallas custom call, so the interior
    write runs as a ~10 ms full-buffer copy at 256^3 — more than the
    per-substep pads it replaces. Bit-identical to dmc_substep_fast
    (tested); becomes interesting again only if pallas output aliasing
    at unaligned offsets lands."""
    P = Rr + 2
    assert (out_shape[0] % BX == 0 and out_shape[1] % _by(Rr) == 0
            and out_shape[2] % 128 == 0)
    sh = jnp.asarray(sub, jnp.float32) / h
    out, cnt = _dmc_padded(
        mac_packed, maps_padded, sh, jnp.float32(h),
        Rr=Rr, interpret=interpret, out_shape=out_shape, grid_n=grid_n,
        slice_out=False,
    )
    nxt = jax.lax.dynamic_update_slice(maps_padded, out, (0, P, P, FRONT_Z))
    return nxt, cnt


def sample3_multi(fields, px, py, pz, h, offs, *, Rr=2, interpret=False,
                  adaptive=None, dtype=None, dual=False):
    """Sample C stacked same-shape fields (C, nx, ny, nz) at one position
    lattice with per-channel offsets `offs` (C tuples, units of h). Returns
    (C, *px.shape). One window DMA + one launch for all channels."""
    from gpufluidsimulation_tpu import config

    if adaptive is None:
        adaptive = config.interp_adaptive()
    out_shape = px.shape
    # reference channel 0 defines the position lattice; other channels get
    # static per-channel coordinate deltas (offs in units of h)
    off0 = offs[0]
    deltas = tuple(
        (float(off0[0] - o[0]), float(off0[1] - o[1]), float(off0[2] - o[2]))
        for o in offs
    )
    fpad, gx, gy, gz, P = _pad_field_positions(
        fields, px, py, pz, h, off0, Rr, dtype=dtype
    )
    if dual and not (adaptive and REBASED_NT):
        raise ValueError("dual volume sampling requires the adaptive "
                         "rebased scheme (GFS_INTERP_REBASED > 0)")
    want = OVERFLOW_SINK is not None
    out = _sample3_padded_multi(
        fpad, gx, gy, gz,
        Rr=Rr, P=P, interpret=interpret, out_shape=out_shape, deltas=deltas,
        adaptive=adaptive, count_overflow=want, dual=dual,
    )
    if want:
        out, ocount = out
        OVERFLOW_SINK.append(ocount)
    return out


# ---------------------------------------------------------------------------
# 2D sampling on the 3D window machinery: a 2D field (ni, nj) lifts to a
# singleton-x volume (1, ni, nj) — 2D-i becomes the sublane axis, 2D-j the
# lane axis, and the x axis is a single plane sampled at displacement 0
# (edge-replicated by pad_fields; zero x residual trivially satisfies the
# contract). The whole 2D problem is small enough that the lift's padding
# waste is irrelevant next to the ~20 ns/index scalar-core gathers it
# replaces (a 256^2 BiMocq frame was gather-bound at ~650 ms on the TPU;
# the windowed form runs the same samples in fractions of a millisecond).
# Same bounded-displacement contract per (block) as the 3D kernels, now
# over (i, j) blocks of the lifted (y, z) axes.
# ---------------------------------------------------------------------------


def sample2_fast(field, px, py, h, off, *, Rr=2, interpret=False, dtype=None):
    """Bilinear drop-in for interp.sample2 on full-lattice position arrays:
    element (i, j) samples near lattice site (i, j). Positions may carry a
    small leading batch axis (B, ni, nj) — e.g. the 5-point volume stencil
    of _volume_eval_2d — lifted onto the x block axis; the per-block base
    shift centers the 0..B-1 batch residual, so B <= 2*Rr + 1 keeps the
    contract."""
    squeeze = px.ndim == 2
    if squeeze:
        px, py = px[None], py[None]
    if px.shape[0] > 2 * Rr + 1:
        raise ValueError(f"2D position batch {px.shape[0]} > {2 * Rr + 1}")
    zeros = jnp.zeros_like(px)
    off3 = (0.0, off[0], off[1])
    out = sample3_fast(field[None], zeros, px, py, h, off3,
                       Rr=Rr, interpret=interpret, dtype=dtype)
    return out[0] if squeeze else out


def sample2_multi(fields, px, py, h, offs, *, Rr=2, interpret=False,
                  dtype=None):
    """C stacked 2D fields sampled at one lattice with per-channel offsets:
    one lifted window launch (the 2D counterpart of sample3_multi)."""
    squeeze = px.ndim == 2
    if squeeze:
        px, py = px[None], py[None]
    zeros = jnp.zeros_like(px)
    offs3 = tuple((0.0, o[0], o[1]) for o in offs)
    out = sample3_multi(fields[:, None], zeros, px, py, h,
                        offs3, Rr=Rr, interpret=interpret, dtype=dtype)
    return out[:, 0] if squeeze else out


def mac2_fast(u, v, px, py, h, *, Rr=2, interpret=False):
    """MAC velocity sampling with getVelocity's zero-out-of-band semantics
    (interp.mac_velocity_2d): bilinear from the windowed kernels, then the
    band mask applied in XLA (the fast path clamps; masked cells become 0
    exactly as the reference's early-return does)."""
    ni = v.shape[0]
    nj = u.shape[1]
    squeeze = px.ndim == 2
    if squeeze:
        px, py = px[None], py[None]
    zeros = jnp.zeros_like(px)
    us = sample3_fast(u[None], zeros, px, py, h,
                      (0.0, 0.0, 0.5), Rr=Rr, interpret=interpret)
    vs = sample3_fast(v[None], zeros, px, py, h,
                      (0.0, 0.5, 0.0), Rr=Rr, interpret=interpret)
    iu = jnp.floor(px / h)
    ju = jnp.floor(py / h - 0.5)
    us = jnp.where((iu >= 0) & (iu <= ni - 1) & (ju >= 0) & (ju <= nj - 2),
                   us, 0.0)
    iv = jnp.floor(px / h - 0.5)
    jv = jnp.floor(py / h)
    vs = jnp.where((iv >= 0) & (iv <= ni - 2) & (jv >= 0) & (jv <= nj - 1),
                   vs, 0.0)
    return (us[0], vs[0]) if squeeze else (us, vs)
