"""Gather-free trilinear interpolation for TPU — the engine's hot primitive.

Why: XLA's general gather on this TPU costs ~8ns per *index* (scalar-core
loop; measured: one 16.7M-point trilinear sample of a 256^3 field = 3.0 s).
Semi-Lagrangian/characteristic-map displacements are CFL-bounded and smooth
(SURVEY.md §7 hard part 1), so each output block only ever reads a bounded
input window around a per-block integer base shift — fetchable with ONE DMA
instead of thousands of scalar gathers.

Kernel geometry (`_kernel`): output blocks of (8, 8, Z), Z = the full
(128-padded) z extent; grid over (x, y) blocks. Per block:
  1. XLA prepass: per-block integer base shifts s = round(mean(g - node))
     per axis; window origins (x free; y floor-8 aligned — Mosaic needs a
     pl.multiple_of proof for sublane-dim DMA offsets) via scalar prefetch.
  2. One async DMA pulls the (Wx, Wy, ZP) window HBM->VMEM.
  3. In-kernel re-basing: dynamic sublane slice absorbs the y alignment
     slack; a dynamic lane `pltpu.roll` absorbs the z base shift. After
     re-basing, every axis has residual <= Rr + 0.5.
  4. Trilinear interpolation = hat-weighted sum over the (2Rr+3)^3 relative
     integer shifts (static slices, hats hoisted per axis); hat(t) =
     max(0,1-|t|) is simultaneously the trilinear weight AND the window
     mask, so the sum is exact under the residual contract. Pure VPU fmas
     on VMEM-resident data.
  5. Coverage (product of per-axis hat sums) renormalizes window-clipped
     edge cells (clamp-to-window instead of silent mass loss).

Contracts (checked by residual_overflow / tests):
  * per-axis |(g - node) - round(block mean)| <= Rr + 0.5   (smoothness)
  * |g_z - node_z| <= Rz + 0.5                              (z roll budget)
BiMocq with per-frame reinitialization keeps total displacement around the
CFL number; defaults Rr=2 (in-block variation), Rz=8 (z roll padding).

CPU fallback / correctness oracle: interp.sample3 (exact gather form).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BX, BY = 8, 8


def _ceil(a, b):
    return -(-a // b) * b


def _hat(t):
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _kernel(origin_ref, gx_ref, gy_ref, gz_ref, field_hbm, out_ref, win_ref,
            sem, *, Rr, Pz, block, win_shape):
    bi = pl.program_id(0)
    bj = pl.program_id(1)
    blk = bi * pl.num_programs(1) + bj

    ox = origin_ref[blk, 0]
    oy = pl.multiple_of(origin_ref[blk, 1], 8)
    sz = origin_ref[blk, 3]   # z base shift (col 2 unused)

    copy = pltpu.make_async_copy(
        field_hbm.at[pl.ds(ox, win_shape[0]), pl.ds(oy, win_shape[1]), :],
        win_ref,
        sem,
    )
    copy.start()

    lx = gx_ref[...] - ox.astype(jnp.float32)
    ly = gy_ref[...] - oy.astype(jnp.float32)
    lz = gz_ref[...] - sz.astype(jnp.float32)

    B1, B2, B3 = block
    a = jax.lax.broadcasted_iota(jnp.int32, block, 0).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, block, 1).astype(jnp.float32)
    c = jax.lax.broadcasted_iota(jnp.int32, block, 2).astype(jnp.float32)

    W = 2 * Rr + 3
    WY = 2 * Rr + 10  # y shifts incl. the floor-8 alignment slack (<= 7)

    copy.wait()
    # re-base z via a dynamic LANE roll (exact global roll; the sublane axis
    # has no global dynamic roll/slice on this hardware, so y keeps its
    # alignment slack in the hat loop instead)
    win = pltpu.roll(win_ref[...], -sz, 2)

    # hoisted per-axis hat stacks and coverage
    hx = [_hat(lx - (a + dp)) for dp in range(W)]
    hy = [_hat(ly - (b + dq)) for dq in range(WY)]
    out = jnp.zeros(block, jnp.float32)
    cov_z = jnp.zeros(block, jnp.float32)
    for dr in range(W):
        hz = _hat(lz - (c + (Pz - Rr - 1 + dr)))
        cov_z = cov_z + hz
        winz = win[:, :, Pz - Rr - 1 + dr : Pz - Rr - 1 + dr + B3]
        acc_y = jnp.zeros(block, jnp.float32)
        for dq in range(WY):
            winyz = winz[:, dq : dq + B2, :]
            acc_x = jnp.zeros(block, jnp.float32)
            for dp in range(W):
                acc_x = acc_x + hx[dp] * winyz[dp : dp + B1]
            acc_y = acc_y + hy[dq] * acc_x
        out = out + hz * acc_y

    cov = sum(hx) * sum(hy) * cov_z
    out_ref[...] = jnp.where(cov > 1e-6, out / jnp.maximum(cov, 1e-6), 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("Rr", "P", "Pz", "interpret", "out_shape"),
)
def _sample3_padded(field_padded, gx, gy, gz, *, Rr, P, Pz, interpret,
                    out_shape):
    """Positions g are lattice-shaped arrays in PADDED field coordinates
    (x/y: +P, z: +Pz), pre-padded to (mult8, mult8, Z)."""
    nx, ny, Z = gx.shape
    nb = (nx // BX, ny // BY)
    block = (BX, BY, Z)
    fs = field_padded.shape
    Wx = BX + 2 * Rr + 2
    Wy = _ceil(BY + 2 * Rr + 2 + 7, 8)
    win_shape = (Wx, Wy, fs[2])

    def block_mean(d):
        r = d.reshape(nb[0], BX, nb[1], BY, Z)
        return r.mean(axis=(1, 3, 4))

    node_x = jax.lax.broadcasted_iota(jnp.float32, gx.shape, 0) + P
    node_y = jax.lax.broadcasted_iota(jnp.float32, gy.shape, 1) + P
    node_z = jax.lax.broadcasted_iota(jnp.float32, gz.shape, 2) + Pz
    s_x = jnp.round(block_mean(gx - node_x)).astype(jnp.int32)
    s_y = jnp.round(block_mean(gy - node_y)).astype(jnp.int32)
    s_z = jnp.round(block_mean(gz - node_z)).astype(jnp.int32)
    bo_x = (jnp.arange(nb[0], dtype=jnp.int32) * BX)[:, None]
    bo_y = (jnp.arange(nb[1], dtype=jnp.int32) * BY)[None, :]
    ox = jnp.clip(bo_x + P + s_x - (Rr + 1), 0, fs[0] - Wx)
    oy_ideal = jnp.clip(bo_y + P + s_y - (Rr + 1), 0, fs[1] - (BY + 2 * Rr + 2))
    oy = jnp.minimum((oy_ideal // 8) * 8, fs[1] - Wy)
    sy = oy_ideal - oy
    # z roll budget: |s_z| <= Pz - Rr - 2 keeps the rolled window unwrapped
    s_z = jnp.clip(s_z, -(Pz - Rr - 2), Pz - Rr - 2)
    origins = jnp.stack(
        [ox.reshape(-1),
         jnp.broadcast_to(oy, (nb[0], nb[1])).reshape(-1),
         jnp.broadcast_to(sy, (nb[0], nb[1])).reshape(-1),
         s_z.reshape(-1)],
        axis=-1,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=nb,
        in_specs=[
            pl.BlockSpec(block, lambda i, j, o: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, o: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(block, lambda i, j, o: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(block, lambda i, j, o: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(win_shape, jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, Rr=Rr, Pz=Pz, block=block, win_shape=win_shape
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(gx.shape, jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(origins, gx, gy, gz, field_padded)
    return out[: out_shape[0], : out_shape[1], : out_shape[2]]


def sample3_fast(field, px, py, pz, h, off, *, Rr=2, Rz=8, interpret=False):
    """Drop-in replacement for interp.sample3 (world positions, field offset
    in units of h) under the bounded-displacement contract above.

    `px, py, pz` must be full-lattice position arrays whose element (i,j,k)
    samples near lattice site (i,j,k) (true for every use in this engine).
    """
    out_shape = px.shape
    P = Rr + 2
    Pz = Rz + Rr + 2  # roll budget Rz plus hat reach

    Z = _ceil(out_shape[2], 128)
    ZP = _ceil(Z + 2 * Pz, 128)

    xpad = P + max(0, _ceil(out_shape[0], BX) - field.shape[0])
    ypad = P + max(0, _ceil(out_shape[1], BY) - field.shape[1])
    fpad = jnp.pad(
        field,
        ((P, xpad), (P, ypad), (Pz, ZP - field.shape[2] - Pz)),
        mode="edge",
    )

    gx = px / h - off[0] + P
    gy = py / h - off[1] + P
    gz = pz / h - off[2] + Pz

    pad_to = (
        _ceil(out_shape[0], BX) - out_shape[0],
        _ceil(out_shape[1], BY) - out_shape[1],
        Z - out_shape[2],
    )
    padw = [(0, p) for p in pad_to]

    def node_like(x, axis, p):
        return jax.lax.broadcasted_iota(jnp.float32, x.shape, axis) + p

    # pad to block multiples in DISPLACEMENT space so rim-block statistics
    # stay representative of the real cells
    dx = jnp.pad(gx - node_like(gx, 0, P), padw, mode="edge")
    dy = jnp.pad(gy - node_like(gy, 1, P), padw, mode="edge")
    dz = jnp.pad(gz - node_like(gz, 2, Pz), padw, mode="edge")
    gx = node_like(dx, 0, P) + dx
    gy = node_like(dy, 1, P) + dy
    gz = node_like(dz, 2, Pz) + dz

    return _sample3_padded(
        fpad, gx, gy, gz,
        Rr=Rr, P=P, Pz=Pz, interpret=interpret, out_shape=out_shape,
    )


def residual_overflow(px, py, pz, h, off, *, Rr=2, Rz=8):
    """Diagnostic: count of samples violating the kernel's reach — per-axis
    in-block residual > Rr+0.5 after mean-centering with the kernel's own
    (8, 8, full-z) blocking, or |z base shift| beyond the Rz roll budget.
    Keep at 0."""
    out_shape = px.shape
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    padw = [
        (0, _ceil(out_shape[0], BX) - out_shape[0]),
        (0, _ceil(out_shape[1], BY) - out_shape[1]),
        (0, 0),
    ]
    over = jnp.zeros((), jnp.int32)
    for g, axis in ((gx, 0), (gy, 1), (gz, 2)):
        node = jax.lax.broadcasted_iota(jnp.float32, g.shape, axis)
        d = jnp.pad(g - node, padw, mode="edge")
        nbx, nby = d.shape[0] // BX, d.shape[1] // BY
        r = d.reshape(nbx, BX, nby, BY, d.shape[2])
        s = jnp.round(r.mean(axis=(1, 3, 4)))
        if axis == 2:
            s = jnp.clip(s, -(Rz + 1), Rz + 1)
        res = jnp.abs(r - s[:, None, :, None, None])
        over = over + jnp.sum(res > (Rr + 0.5), dtype=jnp.int32)
    return over
