"""Pallas TPU kernels for the bandwidth-bound inner loops.

Blocked red-black Gauss-Seidel smoother for the Poisson solve — the
parallel-safe smoother the reference uses on CPU (RBGS,
utils/AlgebraicMultigrid.h:22-151) and approximates with Jacobi on GPU
(smoothing_jacobi, GPU_kernel.cu:1420-1485).

Geometry: (32, 32, nz) output tiles over an (x, y) grid, full z column in
VMEM, window DMAs double-buffered across tiles (_pipeline_tiles). Each
launch performs up to 2 full red+black sweeps entirely on-chip: one window
DMA of (x, b) and one write of the tile per launch, vs 2 HBM round-trips
per half-sweep for the XLA pad/slice formulation. Halo cells (4 in x, 8 in
y — the y halo doubles as the 8-row DMA alignment) are recomputed
redundantly and discarded; their validity shrinks by one ring per
half-sweep, which bounds sweeps-per-launch at 2.

Boundary conditions ride the unified zero-ghost form: ghosts are frozen
at 0 and `diag` carries the BC (6 everywhere for Dirichlet, the existing-
neighbor count for Neumann) — identical to ops.poisson.laplacian.

Red-black coloring keeps the update race-free under SIMD (same structural
trick as the reference's coloring, SURVEY.md §5 'race detection').

CPU fallback: `interpret=True` (tests); ops.poisson.jacobi_smooth remains
the XLA-native alternative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TX, TY = 32, 32
HX, HY = 4, 8  # halo (x) and halo+alignment (y); sweeps/launch <= HX/2


def _shift_zero(x, d, axis):
    """x shifted so result[i] = x[i+d], zero-filled at the window edge."""
    zshape = list(x.shape)
    zshape[axis] = abs(d)
    zeros = jnp.zeros(zshape, x.dtype)
    sl = [slice(None)] * x.ndim
    if d > 0:
        sl[axis] = slice(d, None)
        return jnp.concatenate([x[tuple(sl)], zeros], axis=axis)
    sl[axis] = slice(0, d)
    return jnp.concatenate([zeros, x[tuple(sl)]], axis=axis)


def _pipeline_tiles(srcs, sems, tx, ty, win):
    """Double-buffered window DMA for STATIC (x, y) tile origins on a 2D
    sequential grid: start block blk+1's windows, wait for block blk's —
    the static-origin twin of interp_fast._pipeline_window (without it,
    every block stalls on its own window DMA latency; at 256³ that is ~70
    serial stalls per launch). `srcs` = tuple of (hbm_ref, vmem_scratch
    with a leading 2-slot axis); `sems` is a (2, len(srcs)) DMA semaphore
    array. Returns the current block's slot index."""
    gy_n = pl.num_programs(1)
    blk = pl.program_id(0) * gy_n + pl.program_id(1)
    nblk = pl.num_programs(0) * gy_n
    slot = jax.lax.rem(blk, 2)

    def copies(b, s):
        ox = (b // gy_n) * tx
        oy = pl.multiple_of(jax.lax.rem(b, gy_n) * ty, 8)
        return [
            pltpu.make_async_copy(
                src.at[pl.ds(ox, win[0]), pl.ds(oy, win[1]), :],
                dst.at[s], sems.at[s, i])
            for i, (src, dst) in enumerate(srcs)
        ]

    @pl.when(blk == 0)
    def _():
        for cp in copies(blk, slot):
            cp.start()

    @pl.when(blk + 1 < nblk)
    def _():
        for cp in copies(blk + 1, jax.lax.rem(blk + 1, 2)):
            cp.start()

    for cp in copies(blk, slot):
        cp.wait()
    return slot


def _rbgs_kernel(x_hbm, b_hbm, out_ref, xw, bw, sems, *,
                 sweeps, win, nx, ny, nz, neumann, from_zero=False,
                 reverse=False):
    # NOTE nz here is the REAL z extent; the window/launch z may be padded
    # to a 128 multiple (lane-aligned DMA) — pad lanes are invalid.
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    ox = bi * TX          # window x origin in padded coords (pad = HX)
    oy = pl.multiple_of(bj * TY, 8)

    srcs = ((b_hbm, bw),) if from_zero else ((x_hbm, xw), (b_hbm, bw))
    slot = _pipeline_tiles(srcs, sems, TX, TY, win)

    li = jax.lax.broadcasted_iota(jnp.int32, win, 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, win, 1)
    lk = jax.lax.broadcasted_iota(jnp.int32, win, 2)
    gi = ox + li - HX
    gj = oy + lj - HY
    valid = (gi >= 0) & (gi < nx) & (gj >= 0) & (gj < ny) & (lk < nz)
    # global checkerboard: pads/origins are even, so local parity == global
    red = (li + lj + lk) % 2 == 0
    # The diagonal is STRUCTURAL (poisson._diag): 2*ndim for Dirichlet, the
    # existing-neighbor count for Neumann — recomputed here from the global
    # indices instead of DMA'ing a third full window per block (-1/3 of the
    # input DMA bytes and one XLA pad per launch). Integer-valued in f32,
    # bitwise identical to the _diag table. Halo cells outside the domain
    # get a harmless nonzero value (their results are masked off).
    if neumann:
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        diag = (jnp.where(gi > 0, one, zero) + jnp.where(gi < nx - 1, one, zero)
                + jnp.where(gj > 0, one, zero) + jnp.where(gj < ny - 1, one, zero)
                + jnp.where(lk > 0, one, zero) + jnp.where(lk < nz - 1, one, zero))
        # each axis contributes >= 1 even in the halo, so diag >= 3: no /0
    else:
        diag = jnp.float32(6.0)

    # from_zero: the pre-smoother starts at x == 0 everywhere (v_cycle's
    # zeros_like(r) initial guess) — skip the x window DMA and pad entirely;
    # nbr(0) == 0 makes the first red sweep b/diag, exactly as if the zero
    # window had been loaded.
    x = jnp.zeros(win, bw.dtype) if from_zero else xw[slot]
    b = bw[slot]

    def nbr(x):
        total = jnp.zeros_like(x)
        for axis in range(3):
            total = total + _shift_zero(x, 1, axis) + _shift_zero(x, -1, axis)
        return total

    # reverse=True sweeps black-then-red (the post-smoother order that
    # makes the V-cycle a SYMMETRIC preconditioner for the outer CG —
    # red-then-red of the transpose; advisor r2 finding)
    colors = (~red, red) if reverse else (red, ~red)
    for _ in range(sweeps):
        gs = (nbr(x) + b) / diag
        x = jnp.where(valid & colors[0], gs, x)
        gs = (nbr(x) + b) / diag
        x = jnp.where(valid & colors[1], gs, x)

    out_ref[...] = x[HX : HX + TX, HY : HY + TY, :]


@functools.partial(jax.jit,
                   static_argnames=("sweeps", "neumann", "interpret",
                                    "from_zero", "reverse"))
def _rbgs_launch(x, b, *, sweeps, neumann, interpret, from_zero=False,
                 reverse=False):
    nx, ny, nz = b.shape
    # lane (z) axis of window DMA slices must be 128-aligned: round up once
    # (pad lanes are masked invalid in-kernel — x stays 0 there and the
    # in-domain stencil never reads them with weight). Lifts the old
    # nz % 128 == 0 gate (the reference's own default 100x200x200 grid).
    nzp = -(-nz // 128) * 128
    gx_ = -(-nx // TX)
    gy_ = -(-ny // TY)
    padw = [(HX, HX + gx_ * TX - nx), (HY, HY + gy_ * TY - ny), (0, nzp - nz)]
    bp = jnp.pad(b, padw)
    # from_zero skips the x pad AND the x window DMA (kernel substitutes a
    # zero window); bp stands in as the unused first operand.
    xp = bp if from_zero else jnp.pad(x, padw)
    win = (TX + 2 * HX, TY + 2 * HY, nzp)

    kernel = functools.partial(
        _rbgs_kernel, sweeps=sweeps, win=win, nx=nx, ny=ny, nz=nz,
        neumann=neumann, from_zero=from_zero, reverse=reverse)
    out = pl.pallas_call(
        kernel,
        grid=(gx_, gy_),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=pl.BlockSpec((TX, TY, nzp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx_ * TX, gy_ * TY, nzp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2,) + win, jnp.float32),
            pltpu.VMEM((2,) + win, jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, bp)
    return out[:nx, :ny, :nz]


def _jacobi_diffuse_kernel(x_hbm, b_hbm, out_ref, xw, bw, sems, *,
                           sweeps, coef, win, nx, ny, nz, tx, ty, hx, hy):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    ox = bi * tx
    oy = pl.multiple_of(bj * ty, 8)

    slot = _pipeline_tiles(((x_hbm, xw), (b_hbm, bw)), sems, tx, ty, win)

    li = jax.lax.broadcasted_iota(jnp.int32, win, 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, win, 1)
    lk = jax.lax.broadcasted_iota(jnp.int32, win, 2)
    gi = ox + li - hx
    gj = oy + lj - hy
    # diffuse_3d's interior band: the boundary ring holds source values
    interior = ((gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)
                & (lk > 0) & (lk < nz - 1))

    x = xw[slot]
    b = bw[slot]
    denom = 1.0 + 6.0 * coef

    for _ in range(sweeps):
        # neighbor-sum order matches forces.diffuse_3d (x-,x+,y-,y+,z-,z+)
        nb = (_shift_zero(x, -1, 0) + _shift_zero(x, 1, 0)
              + _shift_zero(x, -1, 1) + _shift_zero(x, 1, 1)
              + _shift_zero(x, -1, 2) + _shift_zero(x, 1, 2))
        x = jnp.where(interior, (b + coef * nb) / denom, x)

    out_ref[...] = x[hx : hx + tx, hy : hy + ty, :]


@functools.partial(jax.jit, static_argnames=("iters", "coef", "interpret"))
def jacobi_diffuse(x, b, *, iters, coef, interpret: bool = False):
    """Damped-Jacobi viscosity solve (I + coef*L)x = b — the Pallas blocked
    form of forces.diffuse_3d (gpu_diffuse_field, GPU_kernel.cu:834-876).

    Runs `sweeps<=8` Jacobi iterations per launch entirely in VMEM
    ((tx+16, ty+16, nz) windows, halo validity shrinking one ring per
    sweep), so 20 reference-parity iterations need 3 window round-trips
    instead of 20 HBM passes, with the window DMAs double-buffered across
    tiles (_pipeline_tiles). Bitwise-ordered like diffuse_3d's neighbor
    sum. `b` is the held right-hand side (the pre-diffusion field)."""
    tx, ty, hx, hy = 32, 32, 8, 8
    nx, ny, nz = x.shape
    # window DMA slices must be 128-aligned on the lane (z) axis: round nz
    # up once; pad cells are non-interior (lk bound uses the real nz) so
    # they stay zero through every sweep and are sliced off at the end
    nzp = -(-nz // 128) * 128
    gx_ = -(-nx // tx)
    gy_ = -(-ny // ty)
    padw = [(hx, hx + gx_ * tx - nx), (hy, hy + gy_ * ty - ny), (0, nzp - nz)]
    bp = jnp.pad(b, padw)
    win = (tx + 2 * hx, ty + 2 * hy, nzp)

    remaining = int(iters)
    first = True
    while remaining > 0:
        s = min(8, remaining)
        xp = jnp.pad(x, padw if first else padw[:2] + [(0, 0)])
        first = False
        kernel = functools.partial(
            _jacobi_diffuse_kernel, sweeps=s, coef=coef, win=win,
            nx=nx, ny=ny, nz=nz, tx=tx, ty=ty, hx=hx, hy=hy)
        out = pl.pallas_call(
            kernel,
            grid=(gx_, gy_),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
            out_specs=pl.BlockSpec((tx, ty, nzp), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gx_ * tx, gy_ * ty, nzp),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2,) + win, jnp.float32),
                pltpu.VMEM((2,) + win, jnp.float32),
                pltpu.SemaphoreType.DMA((2, 2)),
            ],
            compiler_params=None if interpret else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(xp, bp)
        x = out[:nx, :ny, :]
        remaining -= s
    return x[..., :nz]


def rbgs_smooth(x, b, *, bc: str, iters: int, interpret: bool = False,
                reverse: bool = False):
    """Red-black Gauss-Seidel: `iters` full red+black sweeps of
    L x = b with L as in ops.poisson.laplacian (x_new = (nbr_sum + b)/diag
    per color; the structural diagonal for `bc` is computed in-kernel).
    Blocked — works at any volume size (the halo budget caps sweeps at 2
    per launch).

    `x=None` means the initial guess is exactly zero (the V-cycle's
    pre-smoother): the first launch then runs from_zero — no x pad, no x
    window DMA — and produces bit-identical results to smoothing an
    explicit zeros array."""
    remaining = int(iters)
    from_zero = x is None
    while remaining > 0:
        s = min(2, remaining)
        x = _rbgs_launch(b if from_zero else x, b, sweeps=s,
                         neumann=(bc == "neumann"), interpret=interpret,
                         from_zero=from_zero, reverse=reverse)
        from_zero = False
        remaining -= s
    return x


def _masked_rbgs_kernel(x_hbm, b_hbm, f_hbm, out_ref, xw, bw, fw, sems, *,
                        sweeps, win, nx, ny, nz, from_zero=False,
                        reverse=False):
    """Red-black Gauss-Seidel on the MASKED operator (poisson.
    masked_laplacian): fluid rows update x = (b + sum of fluid-neighbor x)
    / (# fluid-or-air neighbors); air/solid rows hold 0. Because x is
    identically 0 on non-fluid cells, the fluid-neighbor sum IS the plain
    6-point neighbor sum — only the diagonal needs the flags, computed
    here from a flags window (FLUID=0, AIR=1 count; SOLID=2/OBJECT=3 and
    out-of-domain don't; the launch pads flags with SOLID)."""
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    ox = bi * TX
    oy = pl.multiple_of(bj * TY, 8)

    srcs = (((b_hbm, bw), (f_hbm, fw)) if from_zero
            else ((x_hbm, xw), (b_hbm, bw), (f_hbm, fw)))
    slot = _pipeline_tiles(srcs, sems, TX, TY, win)

    li = jax.lax.broadcasted_iota(jnp.int32, win, 0)
    lj = jax.lax.broadcasted_iota(jnp.int32, win, 1)
    lk = jax.lax.broadcasted_iota(jnp.int32, win, 2)
    gi = ox + li - HX
    gj = oy + lj - HY
    valid = (gi >= 0) & (gi < nx) & (gj >= 0) & (gj < ny) & (lk < nz)
    red = (li + lj + lk) % 2 == 0

    f = fw[slot]
    fluid = f < 0.5               # FLUID == 0
    counts = jnp.where(f < 1.5, 1.0, 0.0)  # fluid or air neighbor counts
    diag = jnp.zeros(win, jnp.float32)
    for axis in range(3):
        diag = diag + _shift_zero(counts, 1, axis) + _shift_zero(counts, -1, axis)
    diag = jnp.maximum(diag, 1.0)  # identity rows / isolated cells: no /0

    upd = valid & fluid
    x = jnp.zeros(win, bw.dtype) if from_zero else xw[slot]
    x = jnp.where(upd, x, 0.0)     # enforce the non-fluid x == 0 invariant
    b = bw[slot]

    def nbr(x):
        total = jnp.zeros_like(x)
        for axis in range(3):
            total = total + _shift_zero(x, 1, axis) + _shift_zero(x, -1, axis)
        return total

    colors = (~red, red) if reverse else (red, ~red)
    for _ in range(sweeps):
        gs = (nbr(x) + b) / diag
        x = jnp.where(upd & colors[0], gs, x)
        gs = (nbr(x) + b) / diag
        x = jnp.where(upd & colors[1], gs, x)

    out_ref[...] = x[HX : HX + TX, HY : HY + TY, :]


@functools.partial(jax.jit,
                   static_argnames=("sweeps", "interpret", "from_zero",
                                    "reverse"))
def _masked_rbgs_launch(x, b, flags, *, sweeps, interpret, from_zero=False,
                        reverse=False):
    nx, ny, nz = b.shape
    nzp = -(-nz // 128) * 128
    gx_ = -(-nx // TX)
    gy_ = -(-ny // TY)
    padw = [(HX, HX + gx_ * TX - nx), (HY, HY + gy_ * TY - ny), (0, nzp - nz)]
    bp = jnp.pad(b, padw)
    fp = jnp.pad(flags.astype(jnp.float32), padw, constant_values=2.0)  # SOLID
    xp = bp if from_zero else jnp.pad(x, padw)
    win = (TX + 2 * HX, TY + 2 * HY, nzp)

    kernel = functools.partial(
        _masked_rbgs_kernel, sweeps=sweeps, win=win, nx=nx, ny=ny, nz=nz,
        from_zero=from_zero, reverse=reverse)
    out = pl.pallas_call(
        kernel,
        grid=(gx_, gy_),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=pl.BlockSpec((TX, TY, nzp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gx_ * TX, gy_ * TY, nzp),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2,) + win, jnp.float32),
            pltpu.VMEM((2,) + win, jnp.float32),
            pltpu.VMEM((2,) + win, jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, bp, fp)
    return out[:nx, :ny, :nz]


def masked_rbgs_smooth(x, b, flags, *, iters: int, interpret: bool = False,
                       reverse: bool = False):
    """Masked red-black Gauss-Seidel smoother for the boundary-aware MG
    V-cycle — the Pallas role of RBGS_with_pattern
    (utils/AlgebraicMultigrid.h:609). `x=None` = exactly-zero initial
    guess (skips the x window DMA of the first launch)."""
    remaining = int(iters)
    from_zero = x is None
    while remaining > 0:
        s = min(2, remaining)
        x = _masked_rbgs_launch(b if from_zero else x, b, flags, sweeps=s,
                                interpret=interpret, from_zero=from_zero,
                                reverse=reverse)
        from_zero = False
        remaining -= s
    return x
