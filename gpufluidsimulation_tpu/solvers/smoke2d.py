"""2D MAC-grid smoke / level-set solver with all eight reference schemes
(SEMILAG, MACCORMACK, BFECC, MAC_REFLECTION, FLIP, APIC, POLYPIC, BIMOCQ) —
the TPU re-architecture of `BimocqSolver2D` (bimocq2D/BimocqSolver2D.cpp).

Each scheme is one jitted, donated step. Host-side control is limited to the
frame loop; remap decisions, CFL handling and the reflection blend live inside
the compiled program (`lax.cond` over fixed-layout state — SURVEY.md §7 hard
part 3).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import flax.struct
import jax
import jax.numpy as jnp

from gpufluidsimulation_tpu import config as config_mod
from gpufluidsimulation_tpu.bimocq import mapping as mp
from gpufluidsimulation_tpu.core.grids import Grid2D
from gpufluidsimulation_tpu.ops import advect, forces, poisson
from gpufluidsimulation_tpu.solvers import particles as part
from gpufluidsimulation_tpu.solvers.schemes import Scheme

_PARTICLE_SCHEMES = (Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC)


@dataclasses.dataclass(frozen=True)
class Smoke2DConfig:
    ni: int
    nj: int
    L: float                     # domain length in x; h = L/ni
    scheme: Scheme = Scheme.BIMOCQ
    blend_coeff: float = 1.0
    particles_per_cell_axis: int = 4      # N (main.cpp:49)
    pure_neumann: bool = False
    alpha: float = 0.0           # smoke_rise (setSmoke: alpha=rise)
    beta: float = 0.0            # smoke_drop
    advect_levelset: bool = False
    proj_tol: float = 1e-6
    proj_max_iters: int = 500
    vel_remap_gap: int = 8       # BimocqSolver2D.cpp:461
    rho_remap_gap: int = 20      # :462
    flip_ratio: float = 0.99     # :1567
    # per-solver engine mode (config.EngineMode; None = process defaults)
    engine_mode: "config_mod.EngineMode | None" = None

    @property
    def h(self) -> float:
        return self.L / self.ni

    @property
    def grid(self) -> Grid2D:
        return Grid2D(self.ni, self.nj, self.h)

    @property
    def bc(self) -> str:
        return "neumann" if self.pure_neumann else "dirichlet"


@flax.struct.dataclass
class Smoke2DState:
    u: jnp.ndarray
    v: jnp.ndarray
    u_temp: jnp.ndarray          # reflection-blend memory (BIMOCQ :493-507)
    v_temp: jnp.ndarray
    rho: jnp.ndarray
    T: jnp.ndarray
    # BiMocq buffers (BimocqSolver2D.h:233-279)
    u_init: jnp.ndarray
    v_init: jnp.ndarray
    u_origin: jnp.ndarray
    v_origin: jnp.ndarray
    du: jnp.ndarray
    dv: jnp.ndarray
    du_prev: jnp.ndarray
    dv_prev: jnp.ndarray
    rho_init: jnp.ndarray
    rho_orig: jnp.ndarray
    drho: jnp.ndarray
    drho_prev: jnp.ndarray
    T_init: jnp.ndarray
    T_orig: jnp.ndarray
    dT: jnp.ndarray
    dT_prev: jnp.ndarray
    vel_map: mp.MappingState
    scalar_map: mp.MappingState
    particles: part.ParticleState
    frame: jnp.ndarray
    last_remeshing: jnp.ndarray
    rho_last_remeshing: jnp.ndarray
    total_resample_count: jnp.ndarray
    total_scalar_resample: jnp.ndarray
    cfl: jnp.ndarray
    proj_iters: jnp.ndarray
    proj_res: jnp.ndarray
    # fast-interp contract monitor: per-frame violating-block counts from
    # the BIMOCQ pull-back/correct sampler launches (interp_fast.
    # overflow_sink); 0 on the exact path and for the other schemes
    interp_overflow: jnp.ndarray


def init_state(cfg: Smoke2DConfig) -> Smoke2DState:
    g = cfg.grid
    z = g.zeros
    if cfg.scheme in _PARTICLE_SCHEMES:
        p = part.seed_particles(g, cfg.particles_per_cell_axis)
    else:
        p = part.ParticleState(
            pos=jnp.zeros((0, 2)), vel=jnp.zeros((0, 2)),
            rho=jnp.zeros((0,)), T=jnp.zeros((0,)),
            C_x=jnp.zeros((0, 4)), C_y=jnp.zeros((0, 4)),
            C_rho=jnp.zeros((0, 4)), C_T=jnp.zeros((0, 4)),
        )
    state = Smoke2DState(
        u=z("u"), v=z("v"), u_temp=z("u"), v_temp=z("v"),
        rho=z("c"), T=z("c"),
        u_init=z("u"), v_init=z("v"), u_origin=z("u"), v_origin=z("v"),
        du=z("u"), dv=z("v"), du_prev=z("u"), dv_prev=z("v"),
        rho_init=z("c"), rho_orig=z("c"), drho=z("c"), drho_prev=z("c"),
        T_init=z("c"), T_orig=z("c"), dT=z("c"), dT_prev=z("c"),
        vel_map=mp.init_mapping(g, 2),
        scalar_map=mp.init_mapping(g, 2),
        particles=p,
        frame=jnp.int32(0),
        last_remeshing=jnp.int32(0),
        rho_last_remeshing=jnp.int32(0),
        total_resample_count=jnp.int32(0),
        total_scalar_resample=jnp.int32(0),
        cfl=jnp.float32(0.0),
        proj_iters=jnp.int32(0),
        proj_res=jnp.float32(0.0),
        interp_overflow=jnp.int32(0),
    )
    return jax.tree.map(lambda x: x + jnp.zeros_like(x), state)


# ---------------------------------------------------------------------------
# Shared pieces
# ---------------------------------------------------------------------------


def max_vel(u, v):
    """Positive max over raw entries + 1e-5, faithfully reproducing maxVel
    (BimocqSolver2D.cpp:699-725 — note: NOT the absolute value)."""
    return jnp.maximum(jnp.max(u), jnp.max(v)) + 1e-5


def apply_velocity_boundary(g, u, v):
    """Zero the two face columns at each wall (applyVelocityBoundary,
    BimocqSolver2D.cpp:2228-2254)."""
    u = u.at[0:2, :].set(0.0).at[g.ni - 1 : g.ni + 1, :].set(0.0)
    v = v.at[:, 0:2].set(0.0).at[:, g.nj - 1 : g.nj + 1].set(0.0)
    return u, v


def _project(cfg, g, ctx, u, v):
    """applyVelocityBoundary + projection + re-apply (cpp:349-388)."""
    u, v = apply_velocity_boundary(g, u, v)
    u, v, p, iters, res = poisson.project_2d(u, v, ctx, cfg.proj_tol, cfg.proj_max_iters)
    u, v = apply_velocity_boundary(g, u, v)
    return u, v, iters, res


def _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt):
    v = forces.buoyancy_2d(v, rho, T, cfg.alpha, cfg.beta, dt)
    u, v, iters, res = _project(cfg, g, ctx, u, v)
    return u, v, iters, res


# ---------------------------------------------------------------------------
# Scheme steps (each: (cfg, g, ctx, state, dt) -> state)
# ---------------------------------------------------------------------------


def _step_semilag(cfg, g, ctx, s, dt):
    """advanceSemilag (cpp:510-536)."""
    cfldt = g.h / max_vel(s.u, s.v)
    rho = advect.semilag_2d(g, "c", s.rho, s.u, s.v, None, cfldt, dt)
    if cfg.advect_levelset:
        return s.replace(rho=rho, frame=s.frame + 1)
    T = advect.semilag_2d(g, "c", s.T, s.u, s.v, None, cfldt, dt)
    u = advect.semilag_2d(g, "u", s.u, s.u, s.v, None, cfldt, dt)
    v = advect.semilag_2d(g, "v", s.v, s.u, s.v, None, cfldt, dt)
    u, v, iters, res = _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt)
    return s.replace(u=u, v=v, rho=rho, T=T, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=iters, proj_res=res)


def _step_highorder(cfg, g, ctx, s, dt, solver):
    """advanceMaccormack / advanceBFECC (cpp:1759-1831)."""
    cfldt = g.h / max_vel(s.u, s.v)
    rho = solver(g, "c", s.rho, s.u, s.v, cfldt, dt)
    if cfg.advect_levelset:
        return s.replace(rho=rho, frame=s.frame + 1)
    T = solver(g, "c", s.T, s.u, s.v, cfldt, dt)
    u = solver(g, "u", s.u, s.u, s.v, cfldt, dt)
    v = solver(g, "v", s.v, s.u, s.v, cfldt, dt)
    u, v, iters, res = _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt)
    return s.replace(u=u, v=v, rho=rho, T=T, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=iters, proj_res=res)


def _step_reflection(cfg, g, ctx, s, dt):
    """advanceReflection (cpp:538-605)."""
    cfldt = g.h / max_vel(s.u, s.v)
    rho = advect.maccormack_2d(g, "c", s.rho, s.u, s.v, cfldt, dt)
    if cfg.advect_levelset:
        return s.replace(rho=rho, frame=s.frame + 1)
    T = advect.maccormack_2d(g, "c", s.T, s.u, s.v, cfldt, dt)
    # step 1: half-dt advection
    u = advect.maccormack_2d(g, "u", s.u, s.u, s.v, cfldt, 0.5 * dt)
    v = advect.maccormack_2d(g, "v", s.v, s.u, s.v, cfldt, 0.5 * dt)
    v = forces.buoyancy_2d(v, rho, T, cfg.alpha, cfg.beta, 0.5 * dt)
    u_save, v_save = u, v
    # step 2: project
    u, v, it1, res1 = _project(cfg, g, ctx, u, v)
    # step 3: reflect
    ru = 2.0 * u - u_save
    rv = 2.0 * v - v_save
    # step 4: advect the reflected field another half dt (tracing in (ru, rv))
    u = advect.maccormack_2d(g, "u", ru, ru, rv, cfldt, 0.5 * dt)
    v = advect.maccormack_2d(g, "v", rv, ru, rv, cfldt, 0.5 * dt)
    v = forces.buoyancy_2d(v, rho, T, cfg.alpha, cfg.beta, 0.5 * dt)
    # step 5: project again
    u, v, it2, res2 = _project(cfg, g, ctx, u, v)
    return s.replace(u=u, v=v, rho=rho, T=T, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=it1 + it2, proj_res=jnp.maximum(res1, res2))


def _step_bimocq(cfg, g, ctx, s, dt):
    """advanceBIMOCQ (cpp:390-508)."""
    cfldt = g.h / max_vel(s.u, s.v)
    lvl = cfg.advect_levelset

    # un-average the reflection blend of the previous frame (:396-400)
    if not lvl:
        u0 = jnp.where(s.frame != 0, s.u_temp, s.u)
        v0 = jnp.where(s.frame != 0, s.v_temp, s.v)
    else:
        u0, v0 = s.u, s.v

    vel_map = s.vel_map if lvl else mp.update_mapping_2d(s.vel_map, g, u0, v0, cfldt, dt)
    scalar_map = mp.update_mapping_2d(s.scalar_map, g, u0, v0, cfldt, dt)

    semi_rho = advect.semilag_2d(g, "c", s.rho, u0, v0, None, cfldt, dt)
    semi_T = advect.semilag_2d(g, "c", s.T, u0, v0, None, cfldt, dt)
    semi_u = advect.semilag_2d(g, "u", u0, u0, v0, None, cfldt, dt)
    semi_v = advect.semilag_2d(g, "v", v0, u0, v0, None, cfldt, dt)

    u_presave, v_presave = u0, v0

    # the pull-back/correct launches self-report contract-violation block
    # counts (free byproduct of the window prepass; cf. the 3D step)
    from gpufluidsimulation_tpu.ops import interp_fast

    with interp_fast.overflow_sink() as ovf_counts:
        if not lvl:
            u = mp.advect_bimocq_2d(g, "u", semi_u, s.u_init, s.u_origin,
                                    s.du, s.du_prev, vel_map.bwd,
                                    vel_map.bwd_prev, cfg.blend_coeff)
            v = mp.advect_bimocq_2d(g, "v", semi_v, s.v_init, s.v_origin,
                                    s.dv, s.dv_prev, vel_map.bwd,
                                    vel_map.bwd_prev, cfg.blend_coeff)
            u = mp.correct_2d(g, "u", u, s.u_init, s.du, vel_map.fwd,
                              vel_map.bwd)
            v = mp.correct_2d(g, "v", v, s.v_init, s.dv, vel_map.fwd,
                              vel_map.bwd)
        else:
            u, v = u0, v0

        rho = mp.advect_bimocq_2d(g, "c", semi_rho, s.rho_init, s.rho_orig,
                                  s.drho, s.drho_prev, scalar_map.bwd,
                                  scalar_map.bwd_prev, cfg.blend_coeff)
        T = mp.advect_bimocq_2d(g, "c", semi_T, s.T_init, s.T_orig, s.dT,
                                s.dT_prev, scalar_map.bwd,
                                scalar_map.bwd_prev, cfg.blend_coeff)
        if not lvl:
            rho = mp.correct_2d(g, "c", rho, s.rho_init, s.drho,
                                scalar_map.fwd, scalar_map.bwd)
            T = mp.correct_2d(g, "c", T, s.T_init, s.dT,
                              scalar_map.fwd, scalar_map.bwd)
    overflow = (sum(ovf_counts) if ovf_counts else jnp.int32(0))

    u_save, v_save = u, v
    rho_save, T_save = rho, T
    v = forces.buoyancy_2d(v, rho, T, cfg.alpha, cfg.beta, dt)
    du_temp = u - u_save
    dv_temp = v - v_save
    u_save, v_save = u, v

    if not lvl:
        u, v, iters, res = _project(cfg, g, ctx, u, v)
    else:
        iters, res = jnp.int32(0), jnp.float32(0.0)

    d_vel = mp.estimate_distortion_2d(g, vel_map.bwd, vel_map.fwd)
    d_scalar = mp.estimate_distortion_2d(g, scalar_map.bwd, scalar_map.fwd)
    vel = max_vel(u, v)
    vel_remap = (d_vel / (vel * dt) > 1.0) | (
        s.frame - s.last_remeshing >= cfg.vel_remap_gap
    )
    rho_remap = (d_scalar / (vel * dt) > 1.0) | (
        s.frame - s.rho_last_remeshing >= cfg.rho_remap_gap
    )
    proj_coeff = jnp.where(vel_remap, 1.0, 2.0)

    du, dv = s.du, s.dv
    drho, dT = s.drho, s.dT
    if not lvl:
        du_proj = u - u_save
        dv_proj = v - v_save
        drho_temp = rho - rho_save
        dT_temp = T - T_save
        du = mp.accumulate_2d(g, "u", du, du_temp, vel_map.fwd, 1.0)
        dv = mp.accumulate_2d(g, "v", dv, dv_temp, vel_map.fwd, 1.0)
        du = mp.accumulate_2d(g, "u", du, du_proj, vel_map.fwd, proj_coeff)
        dv = mp.accumulate_2d(g, "v", dv, dv_proj, vel_map.fwd, proj_coeff)
        drho = mp.accumulate_2d(g, "c", drho, drho_temp, scalar_map.fwd, 1.0)
        dT = mp.accumulate_2d(g, "c", dT, dT_temp, scalar_map.fwd, 1.0)

    # --- velocity remap (resampleVelBuffer, cpp:1426-1449) ---
    def do_vel_remap(args):
        (vel_map_, du_, dv_) = args
        vm = mp.reinitialize(vel_map_, g)
        u_origin, v_origin = s.u_init, s.v_init
        u_init, v_init = u, v
        du_prev, dv_prev = du_, dv_
        ndu = jnp.zeros_like(du_)
        ndv = jnp.zeros_like(dv_)
        if not lvl:
            ndu = mp.accumulate_2d(g, "u", ndu, u - u_save, vm.fwd, proj_coeff)
            ndv = mp.accumulate_2d(g, "v", ndv, v - v_save, vm.fwd, proj_coeff)
        return (vm, u_init, v_init, u_origin, v_origin, ndu, ndv, du_, dv_,
                s.total_resample_count + 1)

    def no_vel_remap(args):
        (vel_map_, du_, dv_) = args
        return (vel_map_, s.u_init, s.v_init, s.u_origin, s.v_origin, du_, dv_,
                s.du_prev, s.dv_prev, s.total_resample_count)

    (vel_map, u_init, v_init, u_origin, v_origin, du, dv, du_prev, dv_prev,
     total_resample) = jax.lax.cond(
        vel_remap & (not lvl), do_vel_remap, no_vel_remap, (vel_map, du, dv)
    )

    # --- scalar remap (resampleRhoBuffer, cpp:1451-1474) ---
    def do_rho_remap(args):
        (scalar_map_, drho_, dT_) = args
        sm = mp.reinitialize(scalar_map_, g)
        return (sm, rho, T, s.rho_init, s.T_init,
                jnp.zeros_like(drho_), jnp.zeros_like(dT_), drho_, dT_,
                s.total_scalar_resample + 1)

    def no_rho_remap(args):
        (scalar_map_, drho_, dT_) = args
        return (scalar_map_, s.rho_init, s.T_init, s.rho_orig, s.T_orig,
                drho_, dT_, s.drho_prev, s.dT_prev, s.total_scalar_resample)

    (scalar_map, rho_init, T_init, rho_orig, T_orig, drho, dT, drho_prev,
     dT_prev, total_scalar_resample) = jax.lax.cond(
        rho_remap, do_rho_remap, no_rho_remap, (scalar_map, drho, dT)
    )

    # reflection-style average with the pre-advection field (:493-507)
    u_temp, v_temp = u, v
    if not lvl:
        u = jnp.where(s.frame != 0, 0.5 * (u_presave + u), u)
        v = jnp.where(s.frame != 0, 0.5 * (v_presave + v), v)

    return s.replace(
        u=u, v=v, u_temp=u_temp, v_temp=v_temp, rho=rho, T=T,
        u_init=u_init, v_init=v_init, u_origin=u_origin, v_origin=v_origin,
        du=du, dv=dv, du_prev=du_prev, dv_prev=dv_prev,
        rho_init=rho_init, rho_orig=rho_orig, drho=drho, drho_prev=drho_prev,
        T_init=T_init, T_orig=T_orig, dT=dT, dT_prev=dT_prev,
        vel_map=vel_map, scalar_map=scalar_map,
        frame=s.frame + 1,
        last_remeshing=jnp.where(vel_remap, s.frame, s.last_remeshing),
        rho_last_remeshing=jnp.where(rho_remap, s.frame, s.rho_last_remeshing),
        interp_overflow=overflow,
        total_resample_count=total_resample,
        total_scalar_resample=total_scalar_resample,
        cfl=max_vel(u, v) * dt / g.h, proj_iters=iters, proj_res=res,
    )


def _advect_particles(g, p, u, v, cfldt, dt):
    """Forward trace + domain clamp (cpp:1480-1487, clamp to [h, (n-1)h])."""
    px, py = advect.trace_2d(u, v, g.h, cfldt, dt, p.pos[:, 0], p.pos[:, 1])
    px = jnp.clip(px, g.h, (g.ni - 1) * g.h)
    py = jnp.clip(py, g.h, (g.nj - 1) * g.h)
    return p.replace(pos=jnp.stack([px, py], axis=-1))


def _dense_advect_phase(cfg, g, s, dt):
    """Shared dense-path advection: bin by current positions, trace dense
    (window R), trace the sidecar overflow exactly through the flat RK3,
    and return (pos_new, esc, meta0_overflow). The sidecar covers the
    boundary-ring pile-up the reference's domain clamp creates; only the
    tail beyond its budget keeps old positions (and is counted)."""
    from gpufluidsimulation_tpu.solvers import particles_dense as pdense

    K = config_mod.particle_k(cfg.particles_per_cell_axis ** 2)
    R = config_mod.particle_r()
    B = config_mod.particle_side()
    cfldt = g.h / max_vel(s.u, s.v)
    p = s.particles
    trash = g.ni * g.nj * K

    meta0 = pdense.BinMeta(g, p.pos, K, side=B)
    pxd, pyd = meta0.pack([p.pos[:, 0], p.pos[:, 1]])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta0.valid)
    nxd, nyd, esc = pdense.advect_dense(g, s.u, s.v, cfldt, dt, pxd, pyd, R)
    npx, npy = meta0.unpack([nxd, nyd])
    keep0 = meta0.slot_take < trash
    npx = jnp.where(keep0, npx, p.pos[:, 0])
    npy = jnp.where(keep0, npy, p.pos[:, 1])
    if meta0.side:
        sp = jnp.take(p.pos, meta0.side_idx, axis=0)
        sx, sy = advect.trace_2d(s.u, s.v, g.h, cfldt, dt,
                                 sp[:, 0], sp[:, 1])
        sx = jnp.clip(sx, g.h, (g.ni - 1) * g.h)
        sy = jnp.clip(sy, g.h, (g.nj - 1) * g.h)
        sv = meta0.side_valid
        npx = npx.at[meta0.side_idx].set(
            jnp.where(sv, sx, jnp.take(npx, meta0.side_idx)))
        npy = npy.at[meta0.side_idx].set(
            jnp.where(sv, sy, jnp.take(npy, meta0.side_idx)))
    return jnp.stack([npx, npy], axis=-1), esc, meta0.overflow


def _merge_side(flat_cols, side_cols, side_idx, side_valid):
    """Overwrite sidecar particles' rows with their exactly-computed
    values (B-sized scatter: cheap)."""
    out = []
    for col, scol in zip(flat_cols, side_cols):
        cur = jnp.take(col, side_idx, axis=0)
        if col.ndim == 1:
            out.append(col.at[side_idx].set(
                jnp.where(side_valid, scol, cur)))
        else:
            out.append(col.at[side_idx].set(
                jnp.where(side_valid[:, None], scol, cur)))
    return out


def _step_flip_dense(cfg, g, ctx, s, dt):
    """advanceFLIP through the dense-binned transfer path
    (solvers/particles_dense.py): same formulas as _step_flip, zero
    large gather/scatter ops. Bin overflow beyond the sidecar budget +
    trace-window escapes are counted into interp_overflow (step_checked
    retries via the flat path)."""
    from gpufluidsimulation_tpu.solvers import particles_dense as pdense

    K = config_mod.particle_k(cfg.particles_per_cell_axis ** 2)
    B = config_mod.particle_side()
    p = s.particles
    trash = g.ni * g.nj * K

    pos_new, esc, over0 = _dense_advect_phase(cfg, g, s, dt)

    meta1 = pdense.BinMeta(g, pos_new, K, side=B)
    pxd, pyd, vud, vvd, rhod, Td = meta1.pack(
        [pos_new[:, 0], pos_new[:, 1], p.vel[:, 0], p.vel[:, 1],
         p.rho, p.T])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta1.valid)
    side = None
    if meta1.side:
        spos = jnp.take(pos_new, meta1.side_idx, axis=0)
        side = (spos,
                jnp.take(p.vel[:, 0], meta1.side_idx),
                jnp.take(p.vel[:, 1], meta1.side_idx),
                jnp.take(p.rho, meta1.side_idx),
                jnp.take(p.T, meta1.side_idx),
                meta1.side_valid)
    u, v, rho, T = pdense.p2g_flip_dense(g, pxd, pyd, vud, vvd, rhod, Td,
                                         meta1.valid, side=side)
    u_save, v_save, rho_save, T_save = u, v, rho, T
    u, v, iters, res = _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt)
    (us, dus), (vs, dvs), (rs, Ts, drs, dTs) = pdense.g2p_dense(
        g, pxd, pyd, [u, u - u_save], [v, v - v_save],
        [rho, T, rho - rho_save, T - T_save])
    fl = cfg.flip_ratio
    nvu = fl * (vud + dus) + (1 - fl) * us
    nvv = fl * (vvd + dvs) + (1 - fl) * vs
    nrho = fl * (rhod + drs) + (1 - fl) * rs
    nT = fl * (Td + dTs) + (1 - fl) * Ts
    fvu, fvv, frho, fT = meta1.unpack([nvu, nvv, nrho, nT])
    keep1 = meta1.slot_take < trash
    fvu = jnp.where(keep1, fvu, p.vel[:, 0])
    fvv = jnp.where(keep1, fvv, p.vel[:, 1])
    frho = jnp.where(keep1, frho, p.rho)
    fT = jnp.where(keep1, fT, p.T)
    if meta1.side:
        spx, spy = spos[:, 0], spos[:, 1]
        sug, svg, srg, sTg = part.g2p_sample(g, u, v, rho, T, spos)
        sdu, sdv, sdr, sdT = part.g2p_sample(
            g, u - u_save, v - v_save, rho - rho_save, T - T_save, spos)
        ovu = jnp.take(p.vel[:, 0], meta1.side_idx)
        ovv = jnp.take(p.vel[:, 1], meta1.side_idx)
        orh = jnp.take(p.rho, meta1.side_idx)
        oT = jnp.take(p.T, meta1.side_idx)
        fvu, fvv, frho, fT = _merge_side(
            [fvu, fvv, frho, fT],
            [fl * (ovu + sdu) + (1 - fl) * sug,
             fl * (ovv + sdv) + (1 - fl) * svg,
             fl * (orh + sdr) + (1 - fl) * srg,
             fl * (oT + sdT) + (1 - fl) * sTg],
            meta1.side_idx, meta1.side_valid)
    p = p.replace(pos=pos_new,
                  vel=jnp.stack([fvu, fvv], axis=-1), rho=frho, T=fT)
    overflow = (over0 + meta1.overflow + esc).astype(jnp.int32)
    return s.replace(u=u, v=v, rho=rho, T=T, particles=p, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=iters, proj_res=res,
                     interp_overflow=overflow)


def _step_polypic_dense(cfg, g, ctx, s, dt, order):
    """advancePolyPIC/advanceAPIC through the dense-binned path (see
    _step_flip_dense)."""
    from gpufluidsimulation_tpu.solvers import particles_dense as pdense

    K = config_mod.particle_k(cfg.particles_per_cell_axis ** 2)
    B = config_mod.particle_side()
    p = s.particles
    trash = g.ni * g.nj * K

    pos_new, esc, over0 = _dense_advect_phase(cfg, g, s, dt)

    meta1 = pdense.BinMeta(g, pos_new, K, side=B)
    pxd, pyd, Cxd, Cyd, Crd, CTd = meta1.pack(
        [pos_new[:, 0], pos_new[:, 1], p.C_x, p.C_y, p.C_rho, p.C_T])
    pxd, pyd = pdense.home_center_fill(g, pxd, pyd, meta1.valid)
    side = None
    if meta1.side:
        spos = jnp.take(pos_new, meta1.side_idx, axis=0)
        side = (spos,
                jnp.take(p.C_x, meta1.side_idx, axis=0),
                jnp.take(p.C_y, meta1.side_idx, axis=0),
                jnp.take(p.C_rho, meta1.side_idx, axis=0),
                jnp.take(p.C_T, meta1.side_idx, axis=0),
                meta1.side_valid)
    u, v, rho, T = pdense.p2g_poly_dense(g, pxd, pyd, Cxd, Cyd, Crd, CTd,
                                         order, meta1.valid, side=side)
    u, v, iters, res = _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt)
    (us,), (vs,), (rs, Ts) = pdense.g2p_dense(
        g, pxd, pyd, [u], [v], [rho, T])
    nCx, nCy, nCr, nCT = pdense.update_cp_dense(g, pxd, pyd, u, v, rho, T)
    fvu, fvv, frho, fT, fCx, fCy, fCr, fCT = meta1.unpack(
        [us, vs, rs, Ts, nCx, nCy, nCr, nCT])
    keep1 = meta1.slot_take < trash
    k4 = keep1[:, None]
    fvu = jnp.where(keep1, fvu, p.vel[:, 0])
    fvv = jnp.where(keep1, fvv, p.vel[:, 1])
    frho = jnp.where(keep1, frho, p.rho)
    fT = jnp.where(keep1, fT, p.T)
    fCx = jnp.where(k4, fCx, p.C_x)
    fCy = jnp.where(k4, fCy, p.C_y)
    fCr = jnp.where(k4, fCr, p.C_rho)
    fCT = jnp.where(k4, fCT, p.C_T)
    if meta1.side:
        sug, svg, srg, sTg = part.g2p_sample(g, u, v, rho, T, spos)
        sC = part.update_cp_all(
            g, part.ParticleState(
                pos=spos, vel=jnp.zeros_like(spos),
                rho=srg, T=sTg, C_x=side[1], C_y=side[2],
                C_rho=side[3], C_T=side[4]),
            u, v, rho, T)
        fvu, fvv, frho, fT = _merge_side(
            [fvu, fvv, frho, fT], [sug, svg, srg, sTg],
            meta1.side_idx, meta1.side_valid)
        fCx, fCy, fCr, fCT = _merge_side(
            [fCx, fCy, fCr, fCT],
            [sC.C_x, sC.C_y, sC.C_rho, sC.C_T],
            meta1.side_idx, meta1.side_valid)
    p = p.replace(pos=pos_new,
                  vel=jnp.stack([fvu, fvv], axis=-1), rho=frho, T=fT,
                  C_x=fCx, C_y=fCy, C_rho=fCr, C_T=fCT)
    overflow = (over0 + meta1.overflow + esc).astype(jnp.int32)
    return s.replace(u=u, v=v, rho=rho, T=T, particles=p, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=iters, proj_res=res,
                     interp_overflow=overflow)


def _step_flip(cfg, g, ctx, s, dt):
    """advanceFLIP (cpp:1476-1584)."""
    if config_mod.particle_dense():
        return _step_flip_dense(cfg, g, ctx, s, dt)
    cfldt = g.h / max_vel(s.u, s.v)
    p = _advect_particles(g, s.particles, s.u, s.v, cfldt, dt)
    # one bin sort per frame: every splat below becomes a sort-free
    # sorted segment_sum, and the sorted order persists in the state so
    # G2P gathers read with spatial locality (particles.bin_sort)
    p = part.bin_sort(g, p)
    u, v, rho, T = part.p2g_flip(g, p, sorted_bins=True)
    u_save, v_save, rho_save, T_save = u, v, rho, T
    u, v, iters, res = _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt)
    du_g, dv_g = u - u_save, v - v_save
    drho_g, dT_g = rho - rho_save, T - T_save
    fl = cfg.flip_ratio
    pu, pv, prho, pT = part.g2p_sample(g, u, v, rho, T, p.pos)
    # FLIP update: new = flip*(old + grid_delta) + (1-flip)*grid_value
    d_u, d_v, d_rho, d_T = part.g2p_sample(g, du_g, dv_g, drho_g, dT_g, p.pos)
    new_vel = fl * (p.vel + jnp.stack([d_u, d_v], -1)) + (1 - fl) * jnp.stack(
        [pu, pv], -1
    )
    new_rho = fl * (p.rho + d_rho) + (1 - fl) * prho
    new_T = fl * (p.T + d_T) + (1 - fl) * pT
    p = p.replace(vel=new_vel, rho=new_rho, T=new_T)
    return s.replace(u=u, v=v, rho=rho, T=T, particles=p, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=iters, proj_res=res)


def _step_polypic(cfg, g, ctx, s, dt, order):
    """advancePolyPIC — also serves APIC (cpp:1592-1715)."""
    if config_mod.particle_dense():
        return _step_polypic_dense(cfg, g, ctx, s, dt, order)
    cfldt = g.h / max_vel(s.u, s.v)
    p = _advect_particles(g, s.particles, s.u, s.v, cfldt, dt)
    p = part.bin_sort(g, p)  # see _step_flip
    u, v, rho, T = part.p2g_poly(g, p, order, sorted_bins=True)
    u, v, iters, res = _buoyancy_project(cfg, g, ctx, s, u, v, rho, T, dt)
    pu, pv, prho, pT = part.g2p_sample(g, u, v, rho, T, p.pos)
    p = p.replace(vel=jnp.stack([pu, pv], -1), rho=prho, T=pT)
    p = part.update_cp_all(g, p, u, v, rho, T)
    return s.replace(u=u, v=v, rho=rho, T=T, particles=p, frame=s.frame + 1,
                     cfl=max_vel(s.u, s.v) * dt / g.h,
                     proj_iters=iters, proj_res=res)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


class Smoke2D:
    def __init__(self, cfg: Smoke2DConfig):
        self.cfg = cfg
        self.grid = cfg.grid
        self.ctx = poisson.MGContext(self.grid.shape_c, cfg.bc)
        step = {
            Scheme.SEMILAG: _step_semilag,
            Scheme.MACCORMACK: partial(_step_highorder, solver=advect.maccormack_2d),
            Scheme.BFECC: partial(_step_highorder, solver=advect.bfecc_2d),
            Scheme.MAC_REFLECTION: _step_reflection,
            Scheme.FLIP: _step_flip,
            Scheme.APIC: partial(_step_polypic, order="apic"),
            Scheme.POLYPIC: partial(_step_polypic, order="polypic"),
            Scheme.BIMOCQ: _step_bimocq,
        }[cfg.scheme]

        def _stepper(state, dt):
            with config_mod.engine_mode_scope(cfg.engine_mode):
                return step(cfg, self.grid, self.ctx, state, dt)

        self._step = jax.jit(_stepper, donate_argnums=0)
        self._raw_step = step
        self._fallback_step = None
        self._copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    def init_state(self) -> Smoke2DState:
        return init_state(self.cfg)

    def step(self, state: Smoke2DState, dt: float) -> Smoke2DState:
        return self._step(state, jnp.float32(dt))

    def step_checked(self, state: Smoke2DState, dt: float):
        """Contract-enforcing step: recompute the frame through the
        exact-gather engine when the fast-interp displacement contract
        tripped (see Smoke3D.step_checked). Returns (state, retried)."""
        with config_mod.engine_mode_scope(self.cfg.engine_mode):
            fast = config_mod.use_fast_interp()
        if not fast:
            return self._step(state, jnp.float32(dt)), False
        backup = self._copy_state(state)
        out = self._step(state, jnp.float32(dt))
        if int(getattr(out, "interp_overflow", 0)) > 0:
            if self._fallback_step is None:
                mode = dataclasses.replace(
                    self.cfg.engine_mode or config_mod.EngineMode(),
                    fast_interp=False, particle_dense=False)

                def _scoped_fb(st, dt_):
                    with config_mod.engine_mode_scope(mode):
                        return self._raw_step(self.cfg, self.grid, self.ctx,
                                              st, dt_)

                self._fallback_step = jax.jit(_scoped_fb, donate_argnums=0)
            for leaf in jax.tree.leaves(out):
                leaf.delete()
            return self._fallback_step(backup, jnp.float32(dt)), True
        for leaf in jax.tree.leaves(backup):
            leaf.delete()
        return out, False

    # grid <- particles bootstrap for FLIP/APIC/POLYPIC (main.cpp:64,95)
    def sample_particles_from_grid(self, state: Smoke2DState) -> Smoke2DState:
        g = self.grid
        p = state.particles
        pu, pv, prho, pT = part.g2p_sample(g, state.u, state.v, state.rho,
                                           state.T, p.pos)
        p = p.replace(vel=jnp.stack([pu, pv], -1), rho=prho, T=pT)
        p = part.update_cp_all(g, p, state.u, state.v, state.rho, state.T)
        return state.replace(particles=p)
