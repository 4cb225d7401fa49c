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


def _halo_contract_count(pz, h, off_zs, halo, dual):
    """z halo-contract prepass OUTSIDE the shard_map scope (r4 advisor):
    inside the body OVERFLOW_SINK is forced to None — tracers created
    under shard_map cannot escape to the outer consumer — so the
    in-kernel displacement monitor is blind under a mesh. This global
    elementwise prepass counts samples whose z displacement from their
    lattice site exceeds the halo margin (minus the dual kernel's extra
    0.25-cell per-axis support) and reports through the SAME sink the
    single-chip monitor feeds, so multi-chip runs keep an enforced — not
    just documented — displacement contract (step_checked's exact-retry
    gate sees these counts like any other launch's)."""
    from gpufluidsimulation_tpu.ops import interp_fast

    if interp_fast.OVERFLOW_SINK is None:
        return
    k = jax.lax.broadcasted_iota(jnp.float32, pz.shape, 2)
    zl = pz / jnp.float32(h)
    worst = None
    for oz in off_zs:
        d = jnp.abs(zl - jnp.float32(oz) - k)
        worst = d if worst is None else jnp.maximum(worst, d)
    margin = jnp.float32(halo - (0.25 if dual else 0.0))
    cnt = jnp.sum((worst > margin).astype(jnp.int32))
    interp_fast.OVERFLOW_SINK.append(cnt)


def sample3_fast_sharded(field, px, py, pz, h, off, mesh: Mesh, *,
                         halo: int = 8, Rr=2, interpret=False, dtype=None,
                         dual=False):
    """sample3_fast with `field` and the position lattices sharded along z.

    Every array is a GLOBAL jax array (sharded or not — jit/GSPMD reshards
    to P(None, None, 'z') at the shard_map boundary). Element (i, j, k)
    samples near global lattice site (i, j, k); z displacement bounded by
    `halo` cells (minus 0.25 with dual=True — the volume kernel's wider
    per-axis support)."""
    from gpufluidsimulation_tpu.ops import interp_fast

    _check_geometry(px.shape[2], mesh, halo, "sample3_fast_sharded")
    _halo_contract_count(pz, h, (off[2],), halo, dual)
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
                Rr=Rr, interpret=interpret, dtype=dtype, dual=dual,
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
                          halo: int = 8, Rr=2, interpret=False, dtype=None,
                          dual=False):
    """sample3_multi (C stacked same-shape fields, one window launch) with
    everything sharded along z. Returns (C, *px.shape)."""
    from gpufluidsimulation_tpu.ops import interp_fast

    _check_geometry(px.shape[2], mesh, halo, "sample3_multi_sharded")
    _halo_contract_count(pz, h, tuple(o[2] for o in offs), halo, dual)
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
                Rr=Rr, interpret=interpret, dtype=dtype, dual=dual,
            )
        finally:
            interp_fast.OVERFLOW_SINK = prev

    pspec = P(None, None, "z")
    fspec = P(None, None, None, "z")
    f = shard_map(body, mesh=mesh, in_specs=(fspec,) + (pspec,) * 3,
                  out_specs=fspec, check_vma=False)
    return f(fields, px, py, pz)


# ---------------------------------------------------------------------------
# Sharded map marches: the DMC backward and RK3 forward updates under
# shard_map. Velocities enter REPLICATED (one all-gather per step — the
# march samples them at CFL-displaced positions on every substep, so a
# halo-extended local slab per device is the cheap side of the trade);
# the maps stay z-sharded with a 2-plane ppermute halo exchange per DMC
# substep (per-substep displacement <= 1 cell + 1 tap). All sampling
# runs the windowed kernels in LOCAL slab coordinates (dynamic window
# origins absorb the constant halo offset); map VALUES remain global
# world coordinates throughout. Mirrors the generic (non-fused) paths of
# ops/advect.py: dmc_backward_step_3d and trace_rk3_3d + _substepped.
# ---------------------------------------------------------------------------


def _vel_slab(f, s0, L, extra):
    ni, nj = f.shape[0], f.shape[1]
    return lax.dynamic_slice(f, (0, 0, s0), (ni, nj, L + extra))


def _map_halo_ext(m, mh, axis_name="z"):
    """Extend a local (3, ni, nj, nzl) map slab by mh z-planes per side
    (neighbor data via ppermute; edge-replicated at the global boundary —
    the interior band mask keeps boundary rows out of the update)."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    right_from_left = lax.ppermute(
        m[..., -mh:], axis_name, [(i, i + 1) for i in range(n - 1)])
    left_from_right = lax.ppermute(
        m[..., :mh], axis_name, [(i + 1, i) for i in range(n - 1)])
    lo = jnp.where(idx == 0, jnp.repeat(m[..., :1], mh, -1), right_from_left)
    hi = jnp.where(idx == n - 1, jnp.repeat(m[..., -1:], mh, -1),
                   left_from_right)
    return jnp.concatenate([lo, m, hi], axis=-1)


def update_mapping_3d_sharded(mapping, grid, u, v, w, cfldt, dt,
                              mesh: Mesh, halo: int = 8):
    """Backward (DMC substepped) then forward march with z-sharded maps —
    the distributed counterpart of bimocq.mapping.update_mapping_3d.
    Requires nk divisible by the mesh and halo <= local slab."""
    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.core import interp
    from gpufluidsimulation_tpu.ops import advect, interp_fast

    ni, nj, nk = grid.ni, grid.nj, grid.nk
    h = grid.h
    D = mesh.size
    _check_geometry(nk, mesh, halo, "update_mapping_3d_sharded")
    nzl = nk // D
    L = nzl + 2 * halo
    mh = 2
    interpret = config.interp_interpret()
    Rr = config.interp_rr()

    def body(u_g, v_g, w_g, bwd_l, fwd_l):
        z0 = lax.axis_index("z") * nzl
        s0 = jnp.clip(z0 - halo, 0, nk - L)
        off_cells = (z0 - s0).astype(jnp.float32)      # local index of k=0
        shift = s0.astype(jnp.float32) * h             # world rebase
        u_l = _vel_slab(u_g, s0, L, 0)
        v_l = _vel_slab(v_g, s0, L, 0)
        w_l = _vel_slab(w_g, s0, L, 1)
        prev_fast = config._FORCED
        config.set_fast_interp(True)
        # the overflow sink must not capture tracers from inside the
        # shard_map / while_loop scopes (they cannot escape to the outer
        # consumer); the sharded march reports no per-launch counts
        prev_sink, interp_fast.OVERFLOW_SINK = interp_fast.OVERFLOW_SINK, None
        try:
            pack = interp.mac_pack_3d(u_l, v_l, w_l, (ni, nj, L))

            # local lattice (slab coords): cell k_l sits at (off + k_l)*h
            xi = jax.lax.broadcasted_iota(jnp.float32, (ni, nj, nzl), 0)
            yi = jax.lax.broadcasted_iota(jnp.float32, (ni, nj, nzl), 1)
            zi = jax.lax.broadcasted_iota(jnp.float32, (ni, nj, nzl), 2)
            px, py = xi * h, yi * h
            pz = (zi + off_cells) * h
            gk = zi + z0.astype(jnp.float32)           # global z index
            # grid.interior_mask('c', lo=2, hi=3): update iff 2 <= idx <= n-3
            band = ((xi >= 2) & (xi <= ni - 3) & (yi >= 2) & (yi <= nj - 3)
                    & (gk >= 2) & (gk <= nk - 3))

            # center + upwind velocities on the slab lattice, cropped to
            # the output region (dmc_backward_step_3d's static stencils)
            uc, vc, wc = interp.mac_velocity_at_c_3d(u_l, v_l, w_l)

            def crop(f):
                return lax.dynamic_slice(
                    f, (0, 0, z0 - s0), (ni, nj, nzl))

            sx_f, sy_f, sz_f = uc > 0, vc > 0, wc > 0

            def upwind(f, sx, sy, sz):
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
                                fp, (a, b_, c_),
                                (a + nx_, b_ + ny_, c_ + nz_))
                            out = out + jnp.where(mc, corner, 0.0)
                return out

            tu = crop(upwind(uc, sx_f, sy_f, sz_f))
            tv = crop(upwind(vc, sx_f, sy_f, sz_f))
            tw = crop(upwind(wc, sx_f, sy_f, sz_f))
            vel_u, vel_v, vel_w = crop(uc), crop(vc), crop(wc)
            sx, sy, sz = vel_u > 0, vel_v > 0, vel_w > 0
            ax = jnp.where(sx, vel_u - tu, tu - vel_u) / h
            ay = jnp.where(sy, vel_v - tv, tv - vel_v) / h
            az = jnp.where(sz, vel_w - tw, tw - vel_w) / h

            def dmc_substep(m, sub):
                nx_ = advect._dmc_newpos(px, vel_u, ax, sub)
                ny_ = advect._dmc_newpos(py, vel_v, ay, sub)
                nz_ = advect._dmc_newpos(pz, vel_w, az, sub)
                m_ext = _map_halo_ext(m, mh)
                # positions into m_ext lattice coords: its plane j is slab
                # coord (off - mh + j)
                nz_m = nz_ - (off_cells - mh) * h
                out = interp_fast.sample3_multi(
                    m_ext, nx_, ny_, nz_m, h, ((0.0, 0.0, 0.0),) * 3,
                    Rr=Rr, interpret=interpret)
                return jnp.where(band[None], out, m)

            def bwd_cond(c):
                return c[0] < dt

            def bwd_body(c):
                t, m = c
                sub = jnp.minimum(cfldt, dt - t)
                return (t + sub, dmc_substep(m, sub))

            _, bwd_out = lax.while_loop(
                bwd_cond, bwd_body, (jnp.float32(0.0), bwd_l))

            # forward RK3 march: values global-world; sampling positions
            # rebase z by -shift (trace_rk3_3d + _substepped semantics,
            # clamp [h, (n-1)h] — z bounds are global constants)
            def rk3_substep(m, sub):
                mx, my, mz = m[0], m[1], m[2]

                def vel(ppx, ppy, ppz):
                    return interp.mac_velocity_3d(
                        u_l, v_l, w_l, ppx, ppy, ppz - shift, h, pack)

                c1, c2, c3 = (2.0 / 9.0) * sub, (3.0 / 9.0) * sub, \
                    (4.0 / 9.0) * sub
                u1, v1, w1 = vel(mx, my, mz)
                m1x, m1y, m1z = (mx + 0.5 * sub * u1, my + 0.5 * sub * v1,
                                 mz + 0.5 * sub * w1)
                u2, v2, w2 = vel(m1x, m1y, m1z)
                m2x, m2y, m2z = (mx + 0.75 * sub * u2, my + 0.75 * sub * v2,
                                 mz + 0.75 * sub * w2)
                u3, v3, w3 = vel(m2x, m2y, m2z)
                ox = jnp.clip(mx + c1 * u1 + c2 * u2 + c3 * u3,
                              h, (ni - 1) * h)
                oy = jnp.clip(my + c1 * v1 + c2 * v2 + c3 * v3,
                              h, (nj - 1) * h)
                oz = jnp.clip(mz + c1 * w1 + c2 * w2 + c3 * w3,
                              h, (nk - 1) * h)
                out = jnp.stack([ox, oy, oz])
                return jnp.where(band[None], out, m)

            def fwd_cond(c):
                return c[0] < dt

            def fwd_body(c):
                t, m = c
                sub = jnp.minimum(cfldt, dt - t)
                return (t + sub, rk3_substep(m, sub))

            _, fwd_out = lax.while_loop(
                fwd_cond, fwd_body, (jnp.float32(0.0), fwd_l))
            return bwd_out, fwd_out
        finally:
            config.set_fast_interp(prev_fast)
            interp_fast.OVERFLOW_SINK = prev_sink

    rep = P(None, None, None)
    mspec = P(None, None, None, "z")
    f = shard_map(body, mesh=mesh,
                  in_specs=(rep, rep, rep, mspec, mspec),
                  out_specs=(mspec, mspec), check_vma=False)
    bwd, fwd = f(u, v, w, mapping.bwd, mapping.fwd)
    return mapping.replace(bwd=bwd, fwd=fwd)
