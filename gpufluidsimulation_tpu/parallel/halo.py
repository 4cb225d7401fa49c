"""Explicit halo-exchange stencils under shard_map — the ICI-native path for
the bandwidth-critical Poisson smoothing loop (vs. letting GSPMD insert
all-gathers). Fields are sharded along the last (z) axis; each relaxation
needs a 1-cell halo, exchanged with `jax.lax.ppermute` (neighbors only).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def halo_exchange_z(x_local, axis_name="z"):
    """Return (left_halo, right_halo) planes from the z-neighbors.

    Non-periodic: the first/last shard receives a zero plane (Dirichlet ghost)
    — callers overlay their own boundary handling.
    """
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    # send my last plane rightward -> arrives as neighbor's left halo
    right_from_left = lax.ppermute(
        x_local[..., -1:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    left_from_right = lax.ppermute(
        x_local[..., :1], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    left_halo = jnp.where(idx == 0, 0.0, right_from_left)
    right_halo = jnp.where(idx == n - 1, 0.0, left_from_right)
    return left_halo, right_halo


def _neighbor_sum_local(p, left_halo, right_halo, bc):
    """Neighbor sum with x/y axes local and z halos supplied."""
    mode = "edge" if bc == "neumann" else "constant"
    total = jnp.zeros_like(p)
    for axis in (0, 1):
        padw = [(0, 0)] * 3
        padw[axis] = (1, 1)
        pp = jnp.pad(p, padw, mode=mode)
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, -2)
        hi[axis] = slice(2, None)
        total = total + pp[tuple(lo)] + pp[tuple(hi)]
    # z axis with halos; on global edges apply bc
    n = lax.axis_size("z")
    idx = lax.axis_index("z")
    if bc == "neumann":
        # replicate the local edge plane when at the global boundary
        left_halo = jnp.where(idx == 0, p[..., :1], left_halo)
        right_halo = jnp.where(idx == n - 1, p[..., -1:], right_halo)
    pz = jnp.concatenate([left_halo, p, right_halo], axis=-1)
    total = total + pz[..., :-2] + pz[..., 2:]
    return total


def laplacian_sharded(p, mesh: Mesh, bc: str):
    """L p with explicit ppermute halo exchange (matches ops.poisson.laplacian)."""

    def body(p_local):
        lh, rh = halo_exchange_z(p_local)
        return 6.0 * p_local - _neighbor_sum_local(p_local, lh, rh, bc)

    spec = P(None, None, "z")
    f = shard_map(body, mesh=mesh, in_specs=(spec,), out_specs=spec)
    return f(p)


def jacobi_smooth_sharded(x, b, mesh: Mesh, bc: str, diag, iters, omega=0.8):
    """Damped Jacobi with per-iteration neighbor halo exchange (the Pallas
    ring-collective upgrade slots in here; see ops/pallas_kernels.py)."""
    spec = P(None, None, "z")

    def body(x_local, b_local, diag_local):
        def it(_, xl):
            lh, rh = halo_exchange_z(xl)
            nsum = _neighbor_sum_local(xl, lh, rh, bc)
            lap = 6.0 * xl - nsum
            return xl + omega * (b_local - lap) / diag_local

        return lax.fori_loop(0, iters, it, x_local)

    f = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return f(x, b, diag)
