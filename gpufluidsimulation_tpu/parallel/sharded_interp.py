"""Windowed-DMA fast interpolation under shard_map — the multi-chip fast
path for the BiMocq pull-back samplers.

Round-1 sharded mode forced the exact-gather interpolation everywhere
(sharding.py): XLA's gather partitioning is correct under any sharding but
serializes through scalar-core gathers and GSPMD all-gathers. Here the
z-sharded fields instead ride the same HBM-window discipline as the
single-chip engine: each device samples its own slab against a
`halo`-plane-extended local field, and only those halo planes cross the
interconnect (jax.lax.ppermute, neighbors only).

Why no kernel changes are needed: interp_fast's _origins prepass gives
every (BX, BY, bz) block an integer z base shift with a ±~110-cell budget
(ops/interp_fast.py). Shifting the position lattice into extended-local
coordinates adds the SAME +halo offset to every element's residual, which
the base shift absorbs — the windowed kernel runs bit-identically to the
single-device fast path on the extended slab.

Correctness contract: per-element z displacement <= `halo` cells (beyond
it, taps clamp to the extended slab's edge and renormalize — the same
bounded local error as a single-chip contract violation, and the same
monitor applies). CFL-bounded BiMocq displacements sit far inside the
default halo of 8.

Reference framing: the reference is single-GPU (SURVEY.md §2.9); this is
a NEW capability, the fluid analogue of tensor-parallel attention with
ring halos instead of all-gathers.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def halo_exchange_z_slab(x_local, halo: int, axis_name: str = "z"):
    """(left, right) halo slabs of `halo` z-planes from the neighbors.

    Global edges receive edge-replicated local planes — matching the
    clamped-gather / edge-pad semantics of the single-chip sampler
    (interp_fast.pad_fields mode='edge')."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    right_from_left = lax.ppermute(
        x_local[..., -halo:], axis_name, [(i, i + 1) for i in range(n - 1)]
    )
    left_from_right = lax.ppermute(
        x_local[..., :halo], axis_name, [(i + 1, i) for i in range(n - 1)]
    )
    edge_lo = jnp.repeat(x_local[..., :1], halo, axis=-1)
    edge_hi = jnp.repeat(x_local[..., -1:], halo, axis=-1)
    left = jnp.where(idx == 0, edge_lo, right_from_left)
    right = jnp.where(idx == n - 1, edge_hi, left_from_right)
    return left, right


def _check_geometry(nz: int, mesh: Mesh, halo: int, what: str):
    d = mesh.size
    if nz % d:
        raise ValueError(
            f"{what}: z extent {nz} does not divide the {d}-device mesh"
        )
    if halo > nz // d:
        raise ValueError(
            f"{what}: halo {halo} exceeds the local slab {nz // d} — "
            "ppermute exchanges immediate neighbors only"
        )


def sample3_fast_sharded(field, px, py, pz, h, off, mesh: Mesh, *,
                         halo: int = 8, Rr=2, interpret=False, dtype=None):
    """sample3_fast with `field` and the position lattices sharded along z.

    Every array is a GLOBAL jax array (sharded or not — jit/GSPMD reshards
    to P(None, None, 'z') at the shard_map boundary). Element (i, j, k)
    samples near global lattice site (i, j, k); z displacement bounded by
    `halo` cells."""
    from gpufluidsimulation_tpu.ops import interp_fast

    _check_geometry(px.shape[2], mesh, halo, "sample3_fast_sharded")
    nz_local = px.shape[2] // mesh.size
    hh = jnp.float32(h)

    def body(f_local, px_l, py_l, pz_l):
        lh, rh = halo_exchange_z_slab(f_local, halo)
        f_ext = jnp.concatenate([lh, f_local, rh], axis=-1)
        # global z -> extended-local z: cell j of f_ext is global
        # z0 - halo + j, so world positions shift by -(z0 - halo)*h
        z0 = lax.axis_index("z") * nz_local
        pz_local = pz_l - (z0 - halo).astype(jnp.float32) * hh
        # the overflow sink must not capture tracers from inside the
        # shard_map scope (they cannot escape to the outer consumer)
        prev, interp_fast.OVERFLOW_SINK = interp_fast.OVERFLOW_SINK, None
        try:
            return interp_fast.sample3_fast(
                f_ext, px_l, py_l, pz_local, hh, off,
                Rr=Rr, interpret=interpret, dtype=dtype,
            )
        finally:
            interp_fast.OVERFLOW_SINK = prev

    spec = P(None, None, "z")
    # check_vma=False: pallas_call's ShapeDtypeStruct carries no varying-
    # mesh-axes annotation, which the vma checker (jax >= 0.6) rejects
    f = shard_map(body, mesh=mesh, in_specs=(spec,) * 4, out_specs=spec,
                  check_vma=False)
    return f(field, px, py, pz)


def sample3_multi_sharded(fields, px, py, pz, h, offs, mesh: Mesh, *,
                          halo: int = 8, Rr=2, interpret=False, dtype=None):
    """sample3_multi (C stacked same-shape fields, one window launch) with
    everything sharded along z. Returns (C, *px.shape)."""
    from gpufluidsimulation_tpu.ops import interp_fast

    _check_geometry(px.shape[2], mesh, halo, "sample3_multi_sharded")
    nz_local = px.shape[2] // mesh.size
    hh = jnp.float32(h)

    def body(f_local, px_l, py_l, pz_l):
        lh, rh = halo_exchange_z_slab(f_local, halo)
        f_ext = jnp.concatenate([lh, f_local, rh], axis=-1)
        z0 = lax.axis_index("z") * nz_local
        pz_local = pz_l - (z0 - halo).astype(jnp.float32) * hh
        prev, interp_fast.OVERFLOW_SINK = interp_fast.OVERFLOW_SINK, None
        try:
            return interp_fast.sample3_multi(
                f_ext, px_l, py_l, pz_local, hh, offs,
                Rr=Rr, interpret=interpret, dtype=dtype,
            )
        finally:
            interp_fast.OVERFLOW_SINK = prev

    pspec = P(None, None, "z")
    fspec = P(None, None, None, "z")
    f = shard_map(body, mesh=mesh, in_specs=(fspec,) + (pspec,) * 3,
                  out_specs=fspec, check_vma=False)
    return f(fields, px, py, pz)
