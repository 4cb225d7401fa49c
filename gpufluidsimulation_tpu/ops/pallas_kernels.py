"""Pallas TPU kernels for the bandwidth-bound inner loops.

First kernel: fused red-black Gauss-Seidel smoother for the Poisson solve —
the parallel-safe smoother the reference uses on CPU (RBGS,
utils/AlgebraicMultigrid.h:22-151) and approximates with Jacobi on GPU
(smoothing_jacobi, GPU_kernel.cu:1420-1485). One kernel invocation performs
`iters` full red+black sweeps entirely in VMEM: a single HBM read of (x, b)
and a single write of x per call, vs 2*iters round-trips for the XLA
pad/slice formulation.

Red-black coloring keeps the update race-free under SIMD (same structural
trick as the reference's coloring, SURVEY.md §5 'race detection').

CPU fallback: `interpret=True` (tests); the caller can also use
ops.poisson.jacobi_smooth when Pallas is unavailable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _checkerboard(shape):
    ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2) if len(shape) == 3 else 0
    return (ii + jj + kk) % 2 == 0


def _rbgs_kernel_3d(x_ref, b_ref, diag_ref, out_ref, *, iters, bc):
    """Full-volume red-black GS; assumes the block fits VMEM."""
    shape = x_ref.shape
    red = _checkerboard(shape)

    def neighbor_sum(x):
        mode = "edge" if bc == "neumann" else "constant"
        total = jnp.zeros_like(x)
        for axis in range(3):
            padw = [(0, 0)] * 3
            padw[axis] = (1, 1)
            pp = jnp.pad(x, padw, mode=mode)
            lo = [slice(None)] * 3
            hi = [slice(None)] * 3
            lo[axis] = slice(0, -2)
            hi[axis] = slice(2, None)
            total = total + pp[tuple(lo)] + pp[tuple(hi)]
        return total

    b = b_ref[...]
    diag = diag_ref[...]
    # edge-replicate neighbor sums count the center cell once per missing
    # neighbor (the Neumann trick); subtract it for the true in-domain sum
    overcount = 6.0 - diag

    def sweep(_, x):
        gs = (neighbor_sum(x) - overcount * x + b) / diag
        x = jnp.where(red, gs, x)
        gs = (neighbor_sum(x) - overcount * x + b) / diag
        x = jnp.where(red, x, gs)
        return x

    out_ref[...] = jax.lax.fori_loop(0, iters, sweep, x_ref[...])


def _vmem_ok(shape, n_buffers=4, budget=12 * 2**20):
    return int(np.prod(shape)) * 4 * n_buffers <= budget


@functools.partial(jax.jit, static_argnames=("bc", "iters", "interpret"))
def rbgs_smooth(x, b, diag, *, bc: str, iters: int, interpret: bool = False):
    """Red-black Gauss-Seidel: solves L x = b approximately, L as in
    ops.poisson.laplacian (x_new = (neighbor_sum + b)/diag per color)."""
    if not _vmem_ok(x.shape):
        # fall back to the XLA Jacobi formulation for oversized volumes
        from gpufluidsimulation_tpu.ops.poisson import jacobi_smooth

        return jacobi_smooth(x, b, bc, diag, 2 * iters, omega=1.0)
    kernel = functools.partial(_rbgs_kernel_3d, iters=iters, bc=bc)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, b, diag)
