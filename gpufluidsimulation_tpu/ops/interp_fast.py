"""Gather-free trilinear interpolation for TPU — the engine's hot primitive.

Why: XLA's general gather on this TPU costs ~8ns per *index* (scalar-core
loop; measured, see git history) — 4 orders of magnitude off HBM bandwidth
for the ~10^2 samples/cell/step the BiMocq pipeline needs. But semi-
Lagrangian/characteristic-map displacements are CFL-bounded and smooth
(SURVEY.md §7 hard part 1), so each 8x8x128 output block only ever reads a
fixed-size input window around a per-block integer offset.

Kernel strategy (`sample3_block`):
  1. XLA prepass: per-block integer base shift s_blk = round(mean(g - node)),
     per-block window origins -> scalar-prefetch array.
  2. Pallas: DMA the (B + 2*Rr + 2)^3-ish window HBM->VMEM at the dynamic
     per-block origin (one contiguous-ish DMA instead of thousands of
     scalar gathers).
  3. Evaluate trilinear interpolation as a hat-function-weighted sum over
     the (2*Rr+3)^3 relative integer shifts — pure VPU fused multiply-adds
     on VMEM-resident data, factored per axis:
         out = sum_dp hatx_dp * sum_dq haty_dq * sum_dr hatz_dr * win[...]
     (hat(t) = max(0, 1-|t|) is simultaneously the trilinear weight AND the
     selection mask, so the sum is exact for any fractional position whose
     residual |g - node - s_blk| <= Rr + 0.5.)

Residual bound: Rr is a static parameter; `residual_overflow` (prepass
diagnostic) reports violations. For BiMocq with per-frame reinitialization
the per-step map displacement is <= the CFL number, and the *in-block
variation* (what Rr must cover after mean-centering) is <= |grad d|*B ~ 1-2
cells, so Rr=2 is safe for the reference scenes; callers pass larger Rr for
adaptive-reinit configs.

CPU fallback / correctness oracle: interp.sample3 (the exact gather form).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpufluidsimulation_tpu.core import interp as interp_ref

DEFAULT_BLOCK = (8, 8, 128)


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _kernel(origin_ref, gx_ref, gy_ref, gz_ref, field_hbm, out_ref, win_ref,
            sem, *, Rr, block, win_shape):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    bk = pl.program_id(2)
    nbj = pl.num_programs(1)
    nbk = pl.num_programs(2)
    blk = (bi * nbj + bj) * nbk + bk

    ox = origin_ref[blk, 0]
    oy = origin_ref[blk, 1]
    oz = origin_ref[blk, 2]

    copy = pltpu.make_async_copy(
        field_hbm.at[
            pl.ds(ox, win_shape[0]), pl.ds(oy, win_shape[1]), pl.ds(oz, win_shape[2])
        ],
        win_ref,
        sem,
    )
    copy.start()

    # local sample coordinates inside the window
    lx = gx_ref[...] - ox.astype(jnp.float32)
    ly = gy_ref[...] - oy.astype(jnp.float32)
    lz = gz_ref[...] - oz.astype(jnp.float32)

    W = 2 * Rr + 3
    B1, B2, B3 = block
    a = jax.lax.broadcasted_iota(jnp.float32, block, 0)
    b = jax.lax.broadcasted_iota(jnp.float32, block, 1)
    c = jax.lax.broadcasted_iota(jnp.float32, block, 2)

    copy.wait()
    win = win_ref[...]

    # Hat-weighted window sum. The per-axis hat weights sum to 1 when both
    # corners lie in the window; `cov` tracks the captured weight so edge
    # blocks whose window was clipped degrade to sampling at the window
    # boundary (out/cov) instead of silently losing mass.
    out = jnp.zeros(block, jnp.float32)
    cov_x = jnp.zeros(block, jnp.float32)
    for dp in range(W):
        hx = _hat(lx - (a + dp))
        cov_x = cov_x + hx
        acc_y = jnp.zeros(block, jnp.float32)
        for dq in range(W):
            hy = _hat(ly - (b + dq))
            acc_z = jnp.zeros(block, jnp.float32)
            for dr in range(W):
                hz = _hat(lz - (c + dr))
                acc_z = acc_z + hz * jax.lax.dynamic_slice(
                    win, (dp, dq, dr), block
                )
            acc_y = acc_y + hy * acc_z
        out = out + hx * acc_y
    # per-axis coverage factors multiply; recompute y/z coverage cheaply
    cov_y = jnp.zeros(block, jnp.float32)
    cov_z = jnp.zeros(block, jnp.float32)
    for dq in range(W):
        cov_y = cov_y + _hat(ly - (b + dq))
    for dr in range(W):
        cov_z = cov_z + _hat(lz - (c + dr))
    cov = cov_x * cov_y * cov_z
    out_ref[...] = jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)


def _block_plan(shape, block):
    return tuple(-(-s // b) for s, b in zip(shape, block))


@functools.partial(
    jax.jit, static_argnames=("Rr", "block", "interpret", "out_shape", "pad")
)
def _sample3_padded(field_padded, gx, gy, gz, node_x, node_y, node_z, *,
                    Rr, block, interpret, out_shape, pad):
    """Core: positions g (grid units, in PADDED coords), node_* are the
    output lattice indices (padded coords) used for displacement centering.
    All position arrays are pre-padded to block multiples."""
    nb = _block_plan(gx.shape, block)
    W = 2 * Rr + 3
    win_shape = tuple(b + 2 * Rr + 2 for b in block)

    # ---- prepass: per-block integer origins ----
    dx = gx - node_x
    dy = gy - node_y
    dz = gz - node_z

    def block_mean(d):
        r = d.reshape(nb[0], block[0], nb[1], block[1], nb[2], block[2])
        return r.mean(axis=(1, 3, 5))

    s_x = jnp.round(block_mean(dx)).astype(jnp.int32)
    s_y = jnp.round(block_mean(dy)).astype(jnp.int32)
    s_z = jnp.round(block_mean(dz)).astype(jnp.int32)
    bo_x = (jnp.arange(nb[0], dtype=jnp.int32) * block[0])[:, None, None]
    bo_y = (jnp.arange(nb[1], dtype=jnp.int32) * block[1])[None, :, None]
    bo_z = (jnp.arange(nb[2], dtype=jnp.int32) * block[2])[None, None, :]
    # origins live in PADDED field coords: block origin + pad + base shift
    fs = field_padded.shape
    ox = jnp.clip(bo_x + pad + s_x - (Rr + 1), 0, fs[0] - win_shape[0])
    oy = jnp.clip(bo_y + pad + s_y - (Rr + 1), 0, fs[1] - win_shape[1])
    oz = jnp.clip(bo_z + pad + s_z - (Rr + 1), 0, fs[2] - win_shape[2])
    origins = jnp.stack(
        [ox.reshape(-1), oy.reshape(-1), oz.reshape(-1)], axis=-1
    )

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
            pltpu.VMEM(win_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, Rr=Rr, block=block, win_shape=win_shape
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(gx.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, gx, gy, gz, field_padded)
    return out[: out_shape[0], : out_shape[1], : out_shape[2]]


def sample3_fast(field, px, py, pz, h, off, *, Rr=2, block=DEFAULT_BLOCK,
                 interpret=False):
    """Drop-in replacement for interp.sample3 (world positions, field offset
    in units of h) under the bounded-residual contract described above.

    `px, py, pz` must be full-lattice position arrays whose element (i,j,k)
    samples near lattice site (i,j,k) (true for every use in this engine).
    """
    out_shape = px.shape
    P = Rr + 2
    # pad the field to the block-padded output lattice + P halo each side so
    # every block's window fits inside the padded field
    pad_to = [(-s) % b for s, b in zip(out_shape, block)]
    fpad = jnp.pad(
        field,
        [(P, max(0, P + p + (o - f)))
         for p, o, f in zip(pad_to, out_shape, field.shape)],
        mode="edge",
    )

    gx = px / h - off[0] + P
    gy = py / h - off[1] + P
    gz = pz / h - off[2] + P

    # pad to block multiples in DISPLACEMENT space: padded entries replicate
    # the edge displacement (not the edge position), so block statistics in
    # rim blocks stay representative of the real cells
    padw = [(0, p) for p in pad_to]

    def node_like(x, axis):
        return jax.lax.broadcasted_iota(jnp.float32, x.shape, axis) + P

    dx = jnp.pad(gx - node_like(gx, 0), padw, mode="edge")
    dy = jnp.pad(gy - node_like(gy, 1), padw, mode="edge")
    dz = jnp.pad(gz - node_like(gz, 2), padw, mode="edge")
    shape = dx.shape
    node_x = jax.lax.broadcasted_iota(jnp.float32, shape, 0) + P
    node_y = jax.lax.broadcasted_iota(jnp.float32, shape, 1) + P
    node_z = jax.lax.broadcasted_iota(jnp.float32, shape, 2) + P
    gx = node_x + dx
    gy = node_y + dy
    gz = node_z + dz

    return _sample3_padded(
        fpad, gx, gy, gz, node_x, node_y, node_z,
        Rr=Rr, block=block, interpret=interpret, out_shape=out_shape, pad=P,
    )


def residual_overflow(px, py, pz, h, off, *, Rr=2, block=DEFAULT_BLOCK):
    """Diagnostic: fraction of samples whose in-block residual exceeds the
    kernel's reach (those would lose hat coverage). Keep at 0."""
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    shape = gx.shape
    pad_to = [(-s) % b for s, b in zip(shape, block)]
    padw = [(0, p) for p in pad_to]
    gx = jnp.pad(gx, padw, mode="edge")
    gy = jnp.pad(gy, padw, mode="edge")
    gz = jnp.pad(gz, padw, mode="edge")
    nb = _block_plan(gx.shape, block)
    over = jnp.zeros((), jnp.int32)
    for g, axis in ((gx, 0), (gy, 1), (gz, 2)):
        node = jax.lax.broadcasted_iota(jnp.float32, g.shape, axis)
        d = (g - node).reshape(
            nb[0], block[0], nb[1], block[1], nb[2], block[2]
        )
        s = jnp.round(d.mean(axis=(1, 3, 5)))
        res = jnp.abs(d - s[:, None, :, None, :, None])
        over = over + jnp.sum(res > (Rr + 0.5), dtype=jnp.int32)
    return over
