"""3D smoke solver — the flagship model. One `jax.jit`-compiled step with
donated state; every field lives in HBM for the whole run (the device-resident
loop of BimocqGPUSolver, BimocqGPUSolver.cpp:108-230, minus its ~0 host
round-trips; the hybrid BimocqSolver's ~30 staging copies per frame,
SURVEY.md §3.2, have no equivalent here by construction).

Schemes: BIMOCQ, MAC_REFLECTION, MACCORMACK, SEMILAG
(BimocqSolver.cpp:67-86 dispatch). BIMOCQ supports three reinit policies:
  reinit_mode='always'   — the GPU solver's unconditional per-frame
                           reinitialization (`if (1)` blocks,
                           BimocqGPUSolver.cpp:218-229); the 10/30-frame
                           counters only steer proj_coeff 2 -> 1
                           (BimocqGPUSolver.cpp:200-211)
  reinit_mode='counter'  — reinit gated purely on the frame counters
                           (every vel_reinit_gap+1 / scalar_reinit_gap+1
                           frames; round-1's mislabeled 'always')
  reinit_mode='adaptive' — the hybrid solver's distortion/frame-gap test
                           (BimocqSolver.cpp:175-185) via lax.cond
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gpufluidsimulation_tpu import config as config_mod
from gpufluidsimulation_tpu.bimocq import mapping as mp
from gpufluidsimulation_tpu.core import interp
from gpufluidsimulation_tpu.core.grids import Grid3D
from gpufluidsimulation_tpu.ops import advect, forces, poisson
from gpufluidsimulation_tpu.solvers.schemes import Scheme


@dataclasses.dataclass(frozen=True)
class Emitter3D:
    """Smoke emitter — analytic sphere by default (gpu_emit_smoke,
    GPU_kernel.cu:736-802: rho/T set inside `radius`, theta-modulated
    x-velocity sign*0.06*(1 + 0.01*cos(8 theta)), v/w zeroed), generalized
    to the reference `Emitter`'s full surface (BimocqSolver.h:31-59):

    * `sdf_grid`: a voxel level set (cell lattice x = i*h, voxel size =
      the simulation h — use io_utils.mesh.mesh_to_sdf for OBJ meshes);
      emission happens where the translated SDF <= 0, mirroring the VDB
      wsSample loop of emitSmoke (BimocqSolver.cpp:697-815).
    * `trans(frame)` -> (dx, dy, dz): closed-form world offset of the
      emitter at a frame (the e_pos integration of Emitter::update;
      must be jnp-traceable).
    * `emit_velocity(X, Y, Z)` -> (u, v, w): emission velocity field
      evaluated at world coordinates (the emit_velocity lambda,
      bimocq3D/main.cpp:56-66); defaults to the analytic theta form.
    """

    center: Tuple[float, float, float]
    radius: float = 0.015
    density: float = 1.0
    temperature: float = 50.0
    sign: float = 1.0
    emit_frames: int = 10
    sdf_grid: object = dataclasses.field(default=None, compare=False)
    trans: object = dataclasses.field(default=None, compare=False)
    emit_velocity: object = dataclasses.field(default=None, compare=False)

    def offset_at(self, frame, dt):
        if self.trans is None:
            return (0.0, 0.0, 0.0)
        o = self.trans(frame.astype(jnp.float32)
                       if hasattr(frame, "astype") else float(frame))
        return (o[0], o[1], o[2])


@dataclasses.dataclass(frozen=True)
class Boundary3D:
    """Moving rigid obstacle — the TPU counterpart of the reference's VDB
    `Boundary` (BimocqSolver.h:61-80): cells inside get flag 3 + the
    boundary's rigid velocity; a shell of `half_width` cells outside blends
    the advected fields with the semi-Lagrangian fallback (blendBoundary,
    BimocqSolver.cpp:879-912).

    Shapes: analytic sphere/box, or a voxel `sdf_grid` level set (cell
    lattice, voxel size = simulation h; io_utils.mesh.mesh_to_sdf converts
    OBJ meshes — the readMeshToLevelset role). Motion: constant `velocity`,
    or a closed-form `trans(frame)` world offset (the b_pos integration of
    Boundary::update) whose rigid velocity is taken as the one-frame
    finite difference."""

    center: Tuple[float, float, float]
    radius: float = 0.02
    velocity: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    half_width: float = 3.0     # shell width in cells (main.cpp:49)
    kind: str = "sphere"        # 'sphere' | 'box' | 'voxel'
    half_extents: Tuple[float, float, float] = (0.0, 0.0, 0.0)
    sdf_grid: object = dataclasses.field(default=None, compare=False)
    trans: object = dataclasses.field(default=None, compare=False)

    def sdf(self, x, y, z, pos, h=None):
        dx = x - pos[0]
        dy = y - pos[1]
        dz = z - pos[2]
        if self.sdf_grid is not None or self.kind == "voxel":
            # voxel level set: lattice x = center + trans + i*h
            from gpufluidsimulation_tpu.core import interp

            grid_vals = jnp.asarray(self.sdf_grid, jnp.float32)
            # uniformly shifted lattice: separable exact lookup (the
            # windowed fast path would misclassify far-outside nodes)
            return interp.sample3_separable(grid_vals, dx, dy, dz, h)
        if self.kind == "sphere":
            return jnp.sqrt(dx * dx + dy * dy + dz * dz) - self.radius
        ax = jnp.abs(dx) - self.half_extents[0]
        ay = jnp.abs(dy) - self.half_extents[1]
        az = jnp.abs(dz) - self.half_extents[2]
        outside = jnp.sqrt(
            jnp.maximum(ax, 0.0) ** 2 + jnp.maximum(ay, 0.0) ** 2
            + jnp.maximum(az, 0.0) ** 2
        )
        return outside + jnp.minimum(jnp.maximum(ax, jnp.maximum(ay, az)), 0.0)

    def pose_at(self, frame, dt):
        """(position, rigid velocity) at a frame: constant-velocity motion
        or the trans(frame) closed form."""
        t = frame.astype(jnp.float32) * dt
        if self.trans is not None:
            f = frame.astype(jnp.float32)
            o0 = self.trans(f)
            o1 = self.trans(f + 1.0)
            pos = tuple(self.center[i] + o0[i] for i in range(3))
            vel = tuple((o1[i] - o0[i]) / dt for i in range(3))
            return pos, vel
        pos = tuple(self.center[i] + self.velocity[i] * t for i in range(3))
        return pos, self.velocity


@dataclasses.dataclass(frozen=True)
class Smoke3DConfig:
    ni: int
    nj: int
    nk: int
    L: float                      # domain length in x (h = L/ni, main.cpp:36-38)
    dt: float = 0.08
    scheme: Scheme = Scheme.BIMOCQ
    viscosity: float = 1e-6
    blend_coeff: float = 1.0
    alpha: float = 0.0            # smoke drop  (density weight)
    beta: float = 0.0             # smoke rise  (temperature weight)
    emitters: Tuple[Emitter3D, ...] = ()
    boundaries: Tuple[Boundary3D, ...] = ()
    bc: str = "dirichlet"         # 3D GPU solver's open-boundary behavior
    proj_tol: float = 1e-4
    proj_max_iters: int = 50
    reinit_mode: str = "always"   # 'always' (GPU) | 'counter' | 'adaptive' (hybrid)
    vel_reinit_gap: int = 10      # BimocqGPUSolver.cpp:200 / BimocqSolver.cpp:175
    scalar_reinit_gap: int = 30
    vel_distortion_limit: float = 1.0    # BimocqSolver.cpp:175
    scalar_distortion_limit: float = 5.0
    # per-solver engine mode (config.EngineMode; None = process defaults).
    # Entered around every trace of this solver's step, so solvers with
    # different modes (fast vs exact interp, spectral vs iterative
    # projection, ...) coexist in one process without global cross-talk.
    engine_mode: "config_mod.EngineMode | None" = None

    @property
    def h(self) -> float:
        return self.L / self.ni

    @property
    def grid(self) -> Grid3D:
        return Grid3D(self.ni, self.nj, self.nk, self.h)


@flax.struct.dataclass
class Smoke3DState:
    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    u_init: jnp.ndarray
    v_init: jnp.ndarray
    w_init: jnp.ndarray
    u_prev: jnp.ndarray
    v_prev: jnp.ndarray
    w_prev: jnp.ndarray
    rho: jnp.ndarray
    rho_init: jnp.ndarray
    rho_prev: jnp.ndarray
    T: jnp.ndarray
    T_init: jnp.ndarray
    T_prev: jnp.ndarray
    vel_map: mp.MappingState
    scalar_map: mp.MappingState
    frame: jnp.ndarray              # int32
    vel_last_reinit: jnp.ndarray    # int32
    scalar_last_reinit: jnp.ndarray
    # diagnostics of the last step (cfl, proj iters, proj residual, distortion)
    cfl: jnp.ndarray
    proj_iters: jnp.ndarray
    proj_res: jnp.ndarray
    # per-iteration relative-residual trace of the last pressure solve
    # (reference scoreboard offsets 2000+, BimocqGPUSolver.cpp:447-452);
    # entries past proj_iters are -1
    proj_res_hist: jnp.ndarray
    # fast-interp bounded-displacement contract monitor, 0 = the windowed
    # kernels were exact this step. Sum of (a) per-launch violating-block
    # counts reported free by every pull-back sampler's prepass and (b) the
    # fused DMC substep kernel's in-kernel clamped-displacement counts
    # (interp_fast.overflow_sink) — every launch, every frame. Only
    # evaluated on the fast-interp path.
    interp_overflow: jnp.ndarray


def _aux_dead(cfg: Smoke3DConfig) -> bool:
    """True when the two-level blend tier is statically dead: under
    per-frame reinitialization with blend_coeff == 1.0 (exactly the
    reference GPU solver's configuration, BimocqGPUSolver.cpp + main.cpp:47)
    the *_prev buffers and bwd_prev maps carry weight 0 forever, and the
    scalar advector's maps are bitwise copies of the velocity advector's.
    Those leaves are elided from the state (None): ~17 field-sized buffers
    of HBM (1.1 GB at 256^3, 3.9 GB at 384^3) plus their per-step writes."""
    return (cfg.scheme == Scheme.BIMOCQ and cfg.reinit_mode == "always"
            and cfg.blend_coeff == 1.0)


def init_state(cfg: Smoke3DConfig) -> Smoke3DState:
    g = cfg.grid
    z = g.zeros
    dead = _aux_dead(cfg)
    zp = (lambda kind: None) if dead else z
    # counters start so that frame 0 triggers both reinit deadlines
    # (BimocqGPUSolver.h:109-110: vel=-11, scalar=-31)
    state = Smoke3DState(
        u=z("u"), v=z("v"), w=z("w"),
        u_init=z("u"), v_init=z("v"), w_init=z("w"),
        u_prev=zp("u"), v_prev=zp("v"), w_prev=zp("w"),
        rho=z("c"), rho_init=z("c"), rho_prev=zp("c"),
        T=z("c"), T_init=z("c"), T_prev=zp("c"),
        vel_map=mp.init_mapping(g, 3, with_prev=not dead),
        scalar_map=mp.init_mapping(g, 3, with_maps=not dead),
        frame=jnp.int32(0),
        vel_last_reinit=jnp.int32(-11),
        scalar_last_reinit=jnp.int32(-31),
        cfl=jnp.float32(0.0),
        proj_iters=jnp.int32(0),
        proj_res=jnp.float32(0.0),
        proj_res_hist=jnp.full((cfg.proj_max_iters,), -1.0, jnp.float32),
        interp_overflow=jnp.int32(0),
    )
    # force every leaf onto a distinct buffer: XLA interns constants and the
    # mapping state shares one identity array, which breaks donate_argnums
    return jax.tree.map(lambda x: x + jnp.zeros_like(x), state)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _interp_overflow_check(g: Grid3D, vel_map, u=None, v=None, w=None,
                           cfldt=None, check_level2=True) -> jnp.ndarray:
    """Runtime enforcement of the fast-interp bounded-displacement contract
    (ops/interp_fast.py): counts samples whose in-block residual exceeds the
    kernel's reach for (a) the level-1 backward-map pull-back positions,
    (b) the level-2 composed (bwd_prev o bwd) positions — the two largest
    displacement chains in the step — and (c) the fused DMC substep
    kernel's map-gather displacements (its STATIC window has no per-block
    base shift, so its reach condition is |disp| <= Rr + 0.5 outright;
    the exponential integrator can exceed it under extreme shear,
    |a*dt| ~ 2). 0 = windowed sampling was exact."""
    from gpufluidsimulation_tpu import config as _cfg

    if not _cfg.use_fast_interp():
        return jnp.int32(0)
    from gpufluidsimulation_tpu.ops import interp_fast

    h = g.h
    rr = _cfg.interp_rr()
    b = vel_map.bwd
    ov = interp_fast.residual_overflow(b[0], b[1], b[2], h, (0, 0, 0), Rr=rr)
    ov2 = jnp.int32(0)
    if check_level2 and vel_map.bwd_prev is not None:
        # level-2 chain is only sampled when blend_coeff < 1 (the prevs
        # stage is statically skipped otherwise, mapping.bimocq_advect_3d)
        px, py, pz = g.node_coords("c")
        bx, by, bz = mp._map_sample_3d(g, b, px, py, pz, 1.0, 1.0)
        ox, oy, oz = mp._map_sample_3d(g, vel_map.bwd_prev, bx, by, bz,
                                       1.0, 1.0)
        ov2 = interp_fast.residual_overflow(ox, oy, oz, h, (0, 0, 0), Rr=rr)
    ov3 = jnp.int32(0)
    if u is not None and rr <= 2:
        ov3 = _dmc_displacement_overflow(g, u, v, w, cfldt, rr)
    return ov + ov2 + ov3


def _dmc_displacement_overflow(g: Grid3D, u, v, w, cfldt, rr) -> jnp.ndarray:
    """Per-axis count of DMC exponential-step displacements beyond the fused
    DMC kernel's static window reach (one representative substep at cfldt;
    exact mirror of the kernel's math via advect.dmc_displacements_3d)."""
    dx, dy, dz = advect.dmc_displacements_3d(g, u, v, w, cfldt)
    thresh = rr + 0.5
    return (
        jnp.sum(jnp.abs(dx) > thresh, dtype=jnp.int32)
        + jnp.sum(jnp.abs(dy) > thresh, dtype=jnp.int32)
        + jnp.sum(jnp.abs(dz) > thresh, dtype=jnp.int32)
    )


def _max_velocity(u, v, w):
    """max |component| with the reference's 1e-4 floor (BimocqGPUSolver.cpp:350)."""
    m = jnp.maximum(
        jnp.max(jnp.abs(u)), jnp.maximum(jnp.max(jnp.abs(v)), jnp.max(jnp.abs(w)))
    )
    return jnp.maximum(m, 1e-4)


def _emit_smoke(cfg: Smoke3DConfig, g: Grid3D, u, v, w, rho, T, frame, dt):
    """Smoke emission; per-emitter gating on frame < emit_frames.

    Analytic emitters use the theta-modulated sphere kernels
    (GPU_kernel.cu:736-802); voxel-SDF emitters mirror the hybrid solver's
    wsSample loop (BimocqSolver.cpp:697-815): rho/T and each velocity
    component set where the (translated) SDF <= 0, velocity from the
    emitter's emit_velocity(pos) lambda."""
    h = g.h
    for em in cfg.emitters:
        if em.sdf_grid is not None:
            u, v, w, rho, T = _emit_voxel(em, g, u, v, w, rho, T, frame, dt)
            continue
        cx, cy, cz = em.center
        if em.trans is not None:
            ox_, oy_, oz_ = em.offset_at(frame, dt)
            cx, cy, cz = cx + ox_, cy + oy_, cz + oz_
        active = frame < em.emit_frames

        def field_mask(shape, x_is_staggered):
            nx, ny, nz = shape
            ii = (jnp.arange(nx, dtype=jnp.float32) - (0.5 if x_is_staggered else 0.0))
            # emit_smoke_velocity_kernel uses (i-0.5)h on x for every velocity
            # component; the scalar kernel uses i*h (GPU_kernel.cu:746,770)
            x = ii * h - cx
            y = jnp.arange(ny, dtype=jnp.float32) * h - cy
            z = jnp.arange(nz, dtype=jnp.float32) * h - cz
            X = x[:, None, None]
            Y = y[None, :, None]
            Z = z[None, None, :]
            r = jnp.sqrt(X**2 + Y**2 + Z**2)
            band = mp._band3(shape, (1, 1, 1), (2, 2, 2))
            return (r < em.radius) & band, Y, Z

        # u: theta-modulated emission velocity
        inside_u, Yu, Zu = field_mask(u.shape, True)
        hyp = jnp.sqrt(Yu**2 + Zu**2)
        theta = jnp.arccos(jnp.clip(Yu / jnp.maximum(hyp, 1e-12), -1.0, 1.0))
        vel_x = em.sign * 0.06 * (1.0 + 0.01 * jnp.cos(8.0 * theta))
        u = jnp.where(active & inside_u, vel_x + 0.0 * u, u)
        # v, w zeroed inside (kernel called with emiter=0)
        inside_v, _, _ = field_mask(v.shape, True)
        v = jnp.where(active & inside_v, 0.0, v)
        inside_w, _, _ = field_mask(w.shape, True)
        w = jnp.where(active & inside_w, 0.0, w)
        # scalars (cell lattice, no x staggering)
        inside_c, _, _ = field_mask(rho.shape, False)
        rho = jnp.where(active & inside_c, em.density, rho)
        T = jnp.where(active & inside_c, em.temperature, T)
    return u, v, w, rho, T


def _emit_voxel(em: Emitter3D, g: Grid3D, u, v, w, rho, T, frame, dt):
    """Voxel-SDF emitter: sample the translated level set on every field
    lattice; inside (<= 0) set rho/T and the emit_velocity components."""
    from gpufluidsimulation_tpu.core import interp as _interp

    active = frame < em.emit_frames
    grid_vals = jnp.asarray(em.sdf_grid, jnp.float32)
    ox_, oy_, oz_ = em.offset_at(frame, dt)
    pos = (em.center[0] + ox_, em.center[1] + oy_, em.center[2] + oz_)

    def inside_at(kind):
        x, y, z = g.node_coords(kind)
        sd = _interp.sample3_separable(
            grid_vals, x - pos[0], y - pos[1], z - pos[2], g.h)
        return (sd <= 0.0), (x, y, z)

    def evel(coords):
        if em.emit_velocity is None:
            return (jnp.zeros_like(coords[0]),) * 3
        return em.emit_velocity(*coords)

    ins_u, cu = inside_at("u")
    u = jnp.where(active & ins_u, evel(cu)[0], u)
    ins_v, cv = inside_at("v")
    v = jnp.where(active & ins_v, evel(cv)[1], v)
    ins_w, cw = inside_at("w")
    w = jnp.where(active & ins_w, evel(cw)[2], w)
    ins_c, _ = inside_at("c")
    rho = jnp.where(active & ins_c, em.density, rho)
    T = jnp.where(active & ins_c, em.temperature, T)
    return u, v, w, rho, T


def _update_boundary(cfg: Smoke3DConfig, g: Grid3D, frame, dt):
    """Per-frame voxel boundary state (updateBoundary, BimocqSolver.cpp:936-1060):
    flags 0=fluid, 1=air (open top), 2=domain wall, 3=moving object; staggered
    solid velocities on faces inside each object's SDF. Returns
    (flags, u_solid, v_solid, w_solid, shell_masks)."""
    import numpy as _np

    ni, nj, nk = g.ni, g.nj, g.nk
    ii = _np.arange(ni)[:, None, None]
    jj = _np.arange(nj)[None, :, None]
    kk = _np.arange(nk)[None, None, :]
    base = _np.zeros((ni, nj, nk), _np.int32)
    wall = _np.broadcast_to(
        (ii < 1) | (kk < 1) | (ii >= ni - 1) | (kk >= nk - 1) | (jj < 1),
        (ni, nj, nk),
    )
    base[wall] = poisson.SOLID
    top = _np.broadcast_to(jj >= nj - 1, (ni, nj, nk))
    base[top] = poisson.AIR  # open top (BimocqSolver.cpp:947)
    flags = jnp.asarray(base)

    u_solid = g.zeros("u")
    v_solid = g.zeros("v")
    w_solid = g.zeros("w")
    shells = {k: jnp.zeros(getattr(g, f"shape_{k}"), bool)
              for k in ("c", "u", "v", "w")}
    for bd in cfg.boundaries:
        pos, bvel = bd.pose_at(frame, dt)
        xc, yc, zc = g.node_coords("c")
        sd_c = bd.sdf(xc, yc, zc, pos, g.h)
        flags = jnp.where(sd_c <= 0.0, poisson.OBJECT, flags)
        shell_w = bd.half_width * g.h
        shells["c"] = shells["c"] | ((sd_c > 0.0) & (sd_c < shell_w))
        for kind in ("u", "v", "w"):
            x, y, z = g.node_coords(kind)
            sd = bd.sdf(x, y, z, pos, g.h)
            inside = sd <= 0.0
            if kind == "u":
                u_solid = jnp.where(inside, bvel[0], u_solid)
            elif kind == "v":
                v_solid = jnp.where(inside, bvel[1], v_solid)
            else:
                w_solid = jnp.where(inside, bvel[2], w_solid)
            shells[kind] = shells[kind] | ((sd > 0.0) & (sd < shell_w))
    return flags, u_solid, v_solid, w_solid, shells


def _project3(cfg, g, ctx, bnd, u, v, w):
    """Plain or voxel-boundary-aware projection depending on cfg.boundaries."""
    if cfg.boundaries:
        flags, us, vs, ws, _ = bnd
        return poisson.project_masked_3d(
            u, v, w, flags, us, vs, ws, ctx, cfg.proj_tol, cfg.proj_max_iters
        )
    return poisson.project_3d(u, v, w, ctx, cfg.proj_tol, cfg.proj_max_iters)


def _blend_boundary(bnd, kind, field, fallback):
    """Replace `field` with the semi-Lagrangian `fallback` in the SDF shell
    just outside solid objects (blendBoundary, BimocqSolver.cpp:879-912)."""
    if bnd is None:
        return field
    return jnp.where(bnd[4][kind], fallback, field)


def _clear_boundary(bnd, field):
    """Zero a cell field inside solid objects (clearBoundary, :914-933)."""
    if bnd is None:
        return field
    return jnp.where(bnd[0] == poisson.OBJECT, 0.0, field)


def _forces_and_project(cfg, g, ctx, u, v, w, rho, T, frame, dt):
    """emit + buoyancy + viscosity + projection; returns fields and deltas."""
    u, v, w, rho, T = _emit_smoke(cfg, g, u, v, w, rho, T, frame, dt)
    v = forces.buoyancy_3d(v, rho, T, cfg.alpha, cfg.beta, dt)
    if cfg.viscosity:
        coef = cfg.viscosity * dt / (g.h * g.h)
        u = forces.diffuse_3d(u, 20, coef)
        v = forces.diffuse_3d(v, 20, coef)
        w = forces.diffuse_3d(w, 20, coef)
    return u, v, w, rho, T


def _vel_pack(g, u, v, w):
    """One padded MAC pack keyed to the (ni+1, nj+1, nk+1) union lattice —
    covers every kind's trace (block geometry comes from the position
    arrays, the pack only needs covering extent), so the semilag family
    materializes ONE padded triplet per step instead of one per kind."""
    return interp.mac_pack_3d(u, v, w, (g.ni + 1, g.nj + 1, g.nk + 1))


def _semilag_vel(g, u, v, w, au, av, aw, cfldt, dt, packed=None):
    """Advect the (au,av,aw) staggered triplet by tracing in (u,v,w) —
    one fused multi-kind trace for all three lattices
    (advect.semilag_kinds_3d)."""
    if packed is None:
        packed = _vel_pack(g, u, v, w)
    (nu,), (nv,), (nw,) = advect.semilag_kinds_3d(
        g, [("u", [au]), ("v", [av]), ("w", [aw])],
        u, v, w, cfldt, dt, packed)
    return nu, nv, nw


def _maccormack_vel(g, u, v, w, au, av, aw, cfldt, dt, packed=None):
    """MacCormack of the staggered triplet (fields == tracing velocity is the
    common case; reflection's second half advects the reflected field).
    Forward and backward semilag stages each run as one fused multi-kind
    trace; the clamp is the velocity variant (27-pt neighborhood,
    clampExtrema_kernel GPU_kernel.cu:146-167)."""
    if packed is None:
        packed = _vel_pack(g, u, v, w)
    (cu,), (cv,), (cw,) = advect.maccormack_kinds_3d(
        g, [("u", [au], "neighborhood"), ("v", [av], "neighborhood"),
            ("w", [aw], "neighborhood")],
        u, v, w, cfldt, dt, packed)
    return cu, cv, cw


# ---------------------------------------------------------------------------
# Scheme steps
# ---------------------------------------------------------------------------


def _step_semilag(cfg, g, ctx, s: Smoke3DState) -> Smoke3DState:
    dt = cfg.dt
    cfldt = g.h / _max_velocity(s.u, s.v, s.w)
    packed = _vel_pack(g, s.u, s.v, s.w)
    # all four lattice kinds share ONE fused multi-kind backtrace per
    # substep (advect.semilag_kinds_3d)
    (rho, T), (u,), (v,), (w,) = advect.semilag_kinds_3d(
        g, [("c", [s.rho, s.T]), ("u", [s.u]), ("v", [s.v]), ("w", [s.w])],
        s.u, s.v, s.w, cfldt, -dt, packed)
    u, v, w, rho, T = _forces_and_project(cfg, g, ctx, u, v, w, rho, T, s.frame, dt)
    bnd = _update_boundary(cfg, g, s.frame, dt) if cfg.boundaries else None
    rho = _clear_boundary(bnd, rho)
    u, v, w, _, iters, res, hist = _project3(cfg, g, ctx, bnd, u, v, w)
    return s.replace(
        u=u, v=v, w=w, rho=rho, T=T, frame=s.frame + 1,
        cfl=_max_velocity(s.u, s.v, s.w) * dt / g.h, proj_iters=iters, proj_res=res,
        proj_res_hist=hist,
    )


def _step_maccormack(cfg, g, ctx, s: Smoke3DState) -> Smoke3DState:
    dt = cfg.dt
    cfldt = g.h / _max_velocity(s.u, s.v, s.w)
    packed = _vel_pack(g, s.u, s.v, s.w)  # one pack for every trace below
    # one fused 4-kind trace per semilag stage (forward AND backward);
    # scalars keep the trace clamp, velocities the neighborhood clamp
    (rho, T), (u,), (v,), (w,) = advect.maccormack_kinds_3d(
        g, [("c", [s.rho, s.T], "trace"), ("u", [s.u], "neighborhood"),
            ("v", [s.v], "neighborhood"), ("w", [s.w], "neighborhood")],
        s.u, s.v, s.w, cfldt, dt, packed)
    u, v, w, rho, T = _forces_and_project(cfg, g, ctx, u, v, w, rho, T, s.frame, dt)
    bnd = _update_boundary(cfg, g, s.frame, dt) if cfg.boundaries else None
    rho = _clear_boundary(bnd, rho)
    u, v, w, _, iters, res, hist = _project3(cfg, g, ctx, bnd, u, v, w)
    return s.replace(
        u=u, v=v, w=w, rho=rho, T=T, frame=s.frame + 1,
        cfl=_max_velocity(s.u, s.v, s.w) * dt / g.h, proj_iters=iters, proj_res=res,
        proj_res_hist=hist,
    )


def _step_reflection(cfg, g, ctx, s: Smoke3DState) -> Smoke3DState:
    """advanceReflection (BimocqGPUSolver.cpp:232-337): MacCormack scalars,
    half-step velocity advection, project, reflect u* = 2u - u_hat, advect the
    reflected field another half step, force+project again."""
    dt = cfg.dt
    cfldt = g.h / _max_velocity(s.u, s.v, s.w)
    packed = _vel_pack(g, s.u, s.v, s.w)  # shared by every s.u/v/w trace
    # rho and T share every c-kind trace (fwd, bwd, clamp backtrace):
    # traces are ~20x the per-field sample launches they feed
    rho, T = advect.maccormack_multi_3d(
        g, "c", [s.rho, s.T], s.u, s.v, s.w, cfldt, dt, packed)

    # first half-step velocity advection (tracing in the original field)
    u, v, w = _maccormack_vel(g, s.u, s.v, s.w, s.u, s.v, s.w, cfldt,
                              0.5 * dt, packed)

    u, v, w, rho, T = _forces_and_project(
        cfg, g, ctx, u, v, w, rho, T, s.frame, 0.5 * dt
    )
    bnd = _update_boundary(cfg, g, s.frame, dt) if cfg.boundaries else None
    rho = _clear_boundary(bnd, rho)
    u_save, v_save, w_save = u, v, w
    u, v, w, _, it1, res1, _ = _project3(cfg, g, ctx, bnd, u, v, w)
    # reflect
    ru = 2.0 * u - u_save
    rv = 2.0 * v - v_save
    rw = 2.0 * w - w_save
    # advect the reflected field a half step, tracing in the projected field
    u2, v2, w2 = _maccormack_vel(g, u, v, w, ru, rv, rw, cfldt, 0.5 * dt)

    v2 = forces.buoyancy_3d(v2, rho, T, cfg.alpha, cfg.beta, 0.5 * dt)
    if cfg.viscosity:
        coef = cfg.viscosity * (0.5 * dt) / (g.h * g.h)
        u2 = forces.diffuse_3d(u2, 20, coef)
        v2 = forces.diffuse_3d(v2, 20, coef)
        w2 = forces.diffuse_3d(w2, 20, coef)
    u2, v2, w2, _, it2, res2, hist2 = _project3(cfg, g, ctx, bnd, u2, v2, w2)
    return s.replace(
        u=u2, v=v2, w=w2, rho=rho, T=T, frame=s.frame + 1,
        cfl=_max_velocity(s.u, s.v, s.w) * dt / g.h,
        proj_iters=it1 + it2, proj_res=jnp.maximum(res1, res2),
        proj_res_hist=hist2,
    )


def _step_bimocq(cfg, g, ctx, s: Smoke3DState) -> Smoke3DState:
    """advanceBimocq (BimocqGPUSolver.cpp:129-230 with the hybrid solver's
    adaptive reinit available, BimocqSolver.cpp:88-229)."""
    dt = cfg.dt
    maxvel = _max_velocity(s.u, s.v, s.w)
    cfldt = g.h / maxvel

    bnd = _update_boundary(cfg, g, s.frame, dt) if cfg.boundaries else None

    # Contract monitoring — every launch self-reports, every frame
    # (ops/interp_fast.py): the pull-back sampler launches report their
    # violation counts as a free byproduct of the _origins prepass block
    # stats, and the fused DMC substep kernel counts its own clamped
    # displacements in-kernel (advect.update_backward_map_3d appends the
    # march's total to the same sink). No periodic XLA mirror pass.
    from gpufluidsimulation_tpu.ops import interp_fast

    with interp_fast.overflow_sink() as ovf_counts:
        # ONE MAC pack serves every trace of this frame's velocity: both
        # map marches, and (with boundaries) the semilag fallbacks — keyed
        # to the union lattice only when the fallbacks need it
        packed = (_vel_pack(g, s.u, s.v, s.w) if cfg.boundaries
                  else interp.mac_pack_3d(s.u, s.v, s.w, g.shape_c))
        vel_map = mp.update_mapping_3d(
            s.vel_map, g, s.u, s.v, s.w, cfldt, dt,
            # 'always' reinitializes both maps to identity at the END of
            # every step, so at entry they are statically identity: the
            # backward march's first substep runs gather-free
            from_identity=(cfg.reinit_mode == "always"),
            packed=packed,
        )
        if cfg.reinit_mode == "always":
            # both maps are reset to identity every frame and marched with
            # the same velocity -> they are bitwise identical; march once.
            # (The reference runs two identical MapperBaseGPU updates,
            # BimocqGPUSolver.cpp:138-139 — pure redundancy on TPU.)
            if s.scalar_map.fwd is None:
                # dieted state (_aux_dead): the scalar advector is a
                # counter-only alias; sampling uses vel_map directly
                scalar_map = s.scalar_map
            else:
                scalar_map = s.scalar_map.replace(
                    fwd=vel_map.fwd, bwd=vel_map.bwd,
                    bwd_prev=s.scalar_map.bwd_prev,
                    reinit_count=s.scalar_map.reinit_count,
                )
        else:
            scalar_map = mp.update_mapping_3d(s.scalar_map, g, s.u, s.v,
                                              s.w, cfldt, dt, packed=packed)

        if cfg.boundaries:
            # semi-Lagrangian fallbacks for the boundary shell
            # (semilagAdvect + blendBoundary, BimocqSolver.cpp:106,122-126)
            sl_u, sl_v, sl_w = _semilag_vel(
                g, s.u, s.v, s.w, s.u, s.v, s.w, cfldt, -dt, packed
            )
            sl_rho, sl_T = advect.semilag_multi_3d(
                g, "c", [s.rho, s.T], s.u, s.v, s.w, cfldt, -dt, packed)

        # --- velocity pull-back + compensation + two-level blend ---
        # (fused per lattice kind: shared static map positions + one window
        # launch per stage, mp.bimocq_advect_3d)
        # blend_coeff == 1.0 (the reference default, main.cpp:47) makes the
        # level-2 pull-back a zero-weight term: None marks it statically
        # dead
        blend_v = (None if cfg.blend_coeff == 1.0 else
                   jnp.where(vel_map.reinit_count != 0, cfg.blend_coeff,
                             1.0))
        blend_s = (None if cfg.blend_coeff == 1.0 else
                   jnp.where(scalar_map.reinit_count != 0, cfg.blend_coeff,
                             1.0))
        (u,) = mp.bimocq_advect_3d(
            g, "u", [s.u], [s.u_init], [s.u_prev],
            vel_map.bwd, vel_map.bwd_prev, vel_map.fwd, blend_v)
        (v,) = mp.bimocq_advect_3d(
            g, "v", [s.v], [s.v_init], [s.v_prev],
            vel_map.bwd, vel_map.bwd_prev, vel_map.fwd, blend_v)
        (w,) = mp.bimocq_advect_3d(
            g, "w", [s.w], [s.w_init], [s.w_prev],
            vel_map.bwd, vel_map.bwd_prev, vel_map.fwd, blend_v)

        # --- scalar pull-back (rho and T share every map sample) ---
        smaps = vel_map if scalar_map.fwd is None else scalar_map
        rho, T = mp.bimocq_advect_3d(
            g, "c", [s.rho, s.T], [s.rho_init, s.T_init],
            [s.rho_prev, s.T_prev],
            smaps.bwd, smaps.bwd_prev, smaps.fwd, blend_s)
    overflow = sum(ovf_counts) if ovf_counts else jnp.int32(0)

    if cfg.boundaries:
        u = _blend_boundary(bnd, "u", u, sl_u)
        v = _blend_boundary(bnd, "v", v, sl_v)
        w = _blend_boundary(bnd, "w", w, sl_w)
        rho = _blend_boundary(bnd, "c", rho, sl_rho)
        T = _blend_boundary(bnd, "c", T, sl_T)
        rho = _clear_boundary(bnd, rho)

    # --- external forces (captured as deltas for accumulation) ---
    u_t, v_t, w_t = u, v, w
    rho_t, T_t = rho, T
    u, v, w, rho, T = _forces_and_project(cfg, g, ctx, u, v, w, rho, T, s.frame, dt)
    du_ext, dv_ext, dw_ext = u - u_t, v - v_t, w - w_t
    drho_ext, dT_ext = rho - rho_t, T - T_t

    # --- projection ---
    u_t, v_t, w_t = u, v, w
    u, v, w, _, iters, res, hist = _project3(cfg, g, ctx, bnd, u, v, w)
    du_p, dv_p, dw_p = u - u_t, v - v_t, w - w_t

    # --- reinit decision ---
    vel_gap = s.frame - s.vel_last_reinit > cfg.vel_reinit_gap
    scalar_gap = s.frame - s.scalar_last_reinit > cfg.scalar_reinit_gap
    if cfg.reinit_mode == "adaptive":
        excl = (bnd[0] == poisson.OBJECT) if cfg.boundaries else None
        d_vel = mp.estimate_distortion_3d(g, vel_map, excl) / (maxvel * dt)
        d_sc = mp.estimate_distortion_3d(g, scalar_map, excl) / (maxvel * dt)
        vel_reinit = (d_vel > cfg.vel_distortion_limit) | vel_gap
        scalar_reinit = (d_sc > cfg.scalar_distortion_limit) | scalar_gap
        proj_coeff = jnp.where(vel_reinit, 1.0, 2.0)
    elif cfg.reinit_mode == "counter":
        vel_reinit = vel_gap
        scalar_reinit = scalar_gap
        proj_coeff = jnp.where(vel_reinit, 1.0, 2.0)
    else:  # 'always': reinit EVERY frame; counters steer only proj_coeff
        vel_reinit = vel_gap       # counter bookkeeping (BimocqGPUSolver.cpp:200-205)
        scalar_reinit = scalar_gap
        proj_coeff = jnp.where(vel_gap, 1.0, 2.0)

    # --- accumulate deltas into init buffers through the forward map ---
    # (ext + proj deltas of one kind share one launch, mp.accumulate_multi_3d)
    # Under reinit_mode='always' + blend_coeff==1.0 (the reference GPU
    # solver's exact configuration) these accumulated inits only ever
    # become the zero-weighted *_prev buffers — statically dead; the
    # reference runs its gpu_accumulate_* launches anyway
    # (BimocqGPUSolver.cpp:213-216).
    accum_dead = cfg.reinit_mode == "always" and cfg.blend_coeff == 1.0
    if accum_dead:
        u_init, v_init, w_init = s.u_init, s.v_init, s.w_init
        rho_init, T_init = s.rho_init, s.T_init
    else:
        (u_init,) = mp.accumulate_multi_3d(
            g, "u", [(s.u_init, [(du_ext, 1.0), (du_p, proj_coeff)])],
            vel_map.fwd)
        (v_init,) = mp.accumulate_multi_3d(
            g, "v", [(s.v_init, [(dv_ext, 1.0), (dv_p, proj_coeff)])],
            vel_map.fwd)
        (w_init,) = mp.accumulate_multi_3d(
            g, "w", [(s.w_init, [(dw_ext, 1.0), (dw_p, proj_coeff)])],
            vel_map.fwd)
        rho_init, T_init = mp.accumulate_multi_3d(
            g, "c",
            [(s.rho_init, [(drho_ext, 1.0)]), (s.T_init, [(dT_ext, 1.0)])],
            scalar_map.fwd)

    # --- reinitialization ---
    def do_vel_reinit(args):
        vel_map_, u_init_, v_init_, w_init_ = args
        vm = mp.reinitialize(vel_map_, g)
        if s.u_prev is None:  # dieted state: the prev tier stays elided
            u_prev, v_prev, w_prev = None, None, None
        else:
            u_prev, v_prev, w_prev = u_init_, v_init_, w_init_
        # Init <- current velocity, then one more proj accumulation through
        # the (now identity) forward map (BimocqGPUSolver.cpp:220-222,
        # BimocqSolver.cpp:212-214); identity=True skips the sampler
        (nu,) = mp.accumulate_multi_3d(
            g, "u", [(u, [(du_p, 1.0)])], vm.fwd, identity=True)
        (nv,) = mp.accumulate_multi_3d(
            g, "v", [(v, [(dv_p, 1.0)])], vm.fwd, identity=True)
        (nw,) = mp.accumulate_multi_3d(
            g, "w", [(w, [(dw_p, 1.0)])], vm.fwd, identity=True)
        return vm, nu, nv, nw, u_prev, v_prev, w_prev

    def no_vel_reinit(args):
        vel_map_, u_init_, v_init_, w_init_ = args
        return vel_map_, u_init_, v_init_, w_init_, s.u_prev, s.v_prev, s.w_prev

    def do_scalar_reinit(args):
        scalar_map_, rho_init_, T_init_ = args
        sm = mp.reinitialize(scalar_map_, g)
        if s.rho_prev is None:
            return sm, rho, T, None, None
        return sm, rho, T, rho_init_, T_init_

    def no_scalar_reinit(args):
        scalar_map_, rho_init_, T_init_ = args
        return scalar_map_, rho_init_, T_init_, s.rho_prev, s.T_prev

    if cfg.reinit_mode == "always":
        # unconditional per-frame reinit — statically inlined (no lax.cond),
        # the `if (1)` blocks of BimocqGPUSolver.cpp:218-229
        vel_map, u_init, v_init, w_init, u_prev, v_prev, w_prev = do_vel_reinit(
            (vel_map, u_init, v_init, w_init)
        )
        scalar_map, rho_init, T_init, rho_prev, T_prev = do_scalar_reinit(
            (scalar_map, rho_init, T_init)
        )
    else:
        vel_map, u_init, v_init, w_init, u_prev, v_prev, w_prev = jax.lax.cond(
            vel_reinit, do_vel_reinit, no_vel_reinit,
            (vel_map, u_init, v_init, w_init),
        )
        scalar_map, rho_init, T_init, rho_prev, T_prev = jax.lax.cond(
            scalar_reinit, do_scalar_reinit, no_scalar_reinit,
            (scalar_map, rho_init, T_init),
        )

    return s.replace(
        u=u, v=v, w=w,
        u_init=u_init, v_init=v_init, w_init=w_init,
        u_prev=u_prev, v_prev=v_prev, w_prev=w_prev,
        rho=rho, rho_init=rho_init, rho_prev=rho_prev,
        T=T, T_init=T_init, T_prev=T_prev,
        vel_map=vel_map, scalar_map=scalar_map,
        frame=s.frame + 1,
        vel_last_reinit=jnp.where(vel_reinit, s.frame, s.vel_last_reinit),
        scalar_last_reinit=jnp.where(scalar_reinit, s.frame, s.scalar_last_reinit),
        cfl=maxvel * dt / g.h, proj_iters=iters, proj_res=res,
        proj_res_hist=hist, interp_overflow=overflow,
    )


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

_STEPS = {
    Scheme.SEMILAG: _step_semilag,
    Scheme.MACCORMACK: _step_maccormack,
    Scheme.MAC_REFLECTION: _step_reflection,
    Scheme.BIMOCQ: _step_bimocq,
}


class Smoke3D:
    """Driver object: owns the static config, MG context and the jitted step."""

    def __init__(self, cfg: Smoke3DConfig):
        if cfg.scheme not in _STEPS:
            raise ValueError(f"3D solver does not support {cfg.scheme!r}")
        self.cfg = cfg
        self.grid = cfg.grid
        self.ctx = poisson.MGContext(self.grid.shape_c, cfg.bc)
        step_fn = _STEPS[cfg.scheme]

        def _scoped_step(cfg_, grid_, ctx_, state):
            # the scope is live exactly when jit traces the body, which is
            # where every config_mod.* mode read happens; retraces re-enter
            with config_mod.engine_mode_scope(cfg_.engine_mode), \
                    mp.vol9_stats_cache_scope():
                return step_fn(cfg_, grid_, ctx_, state)

        self._step = jax.jit(
            partial(_scoped_step, cfg, self.grid, self.ctx), donate_argnums=0
        )
        # lazily-built exact-path twin + device state copier for
        # step_checked's contract-violation retry
        self._fallback_step = None
        self._copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))

    def init_state(self) -> Smoke3DState:
        return init_state(self.cfg)

    def step(self, state: Smoke3DState) -> Smoke3DState:
        return self._step(state)

    def _fast_interp_active(self) -> bool:
        with config_mod.engine_mode_scope(self.cfg.engine_mode):
            return config_mod.use_fast_interp()

    def step_checked(self, state: Smoke3DState):
        """Contract-ENFORCING step (VERDICT r1 item 7): if the fast-interp
        displacement contract tripped anywhere in the frame
        (interp_overflow > 0, monitored on every windowed launch), the
        frame is recomputed from the saved pre-step state through the
        exact-gather engine — a correct frame instead of a warn-and-commit
        of clamped samples. Costs one device-side state copy per frame
        (~1.5% of a 256^3 step) and a host sync on the counter; the CLI
        frame loop already syncs per frame for its diagnostics. The exact
        twin compiles lazily on first violation.

        Returns (state, retried).
        """
        if not self._fast_interp_active():
            return self._step(state), False
        backup = self._copy_state(state)
        out = self._step(state)
        if int(out.interp_overflow) > 0:
            if self._fallback_step is None:
                mode = dataclasses.replace(
                    self.cfg.engine_mode or config_mod.EngineMode(),
                    fast_interp=False)
                step_fn = _STEPS[self.cfg.scheme]

                def _scoped_fb(st):
                    with config_mod.engine_mode_scope(mode):
                        return step_fn(self.cfg, self.grid, self.ctx, st)

                self._fallback_step = jax.jit(_scoped_fb, donate_argnums=0)
            for leaf in jax.tree.leaves(out):
                leaf.delete()
            return self._fallback_step(backup), True
        for leaf in jax.tree.leaves(backup):  # free HBM promptly
            leaf.delete()
        return out, False

    def step_fn(self):
        return self._step
