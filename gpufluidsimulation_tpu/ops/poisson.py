"""Pressure projection: MAC divergence/gradient + a geometric-multigrid
preconditioned CG solver, fully jit-resident (no host sync per iteration).

This replaces BOTH reference pressure stacks with one TPU-native design:
* the CPU AMG-PCG (utils/AlgebraicMultigrid.h:289-423, Galerkin RAP hierarchy,
  red-black GS smoothing) — here: geometric MG with damped-Jacobi smoothing
  (Jacobi = the parallel-correct smoother; red-black lives in the Pallas
  variant), matrix-free 5/7-point stencils instead of CSR SpMV;
* the GPU MG-CG (GPU_kernel.cu:1764-1815: fixed 50 iterations, double
  precision, device-scoreboard alpha/beta) — here: `lax.while_loop` CG with a
  residual-based exit (improving on the fixed iteration count), f32 fields,
  scalars carried in the loop state so XLA keeps everything on-chip.

Conventions (grid units — the h factors cancel through the solve):
  div  = sum of face differences            (h * physical divergence)
  L p  = (2*ndim) p - sum(neighbors)        (unscaled Laplacian, = -h^2 lap p)
  projection solves L p = div, then subtracts face gradients (p_i - p_{i-1}),
  which zeroes the discrete divergence exactly — unlike the GPU reference's
  halfrdx=0.5 scaling (BimocqGPUSolver.cpp:445) which only removes part of it
  per call (compensated there by MAC_REFLECTION's double projection).

Boundary conditions:
  bc='neumann'   closed box (solid walls), the 2D PURE_NEUMANN mode incl.
                 null-space mean subtraction (AlgebraicMultigrid.h:376-413);
  bc='dirichlet' open boundary p=0 ghost (the 2D !PURE_NEUMANN wall term,
                 BimocqSolver2D.cpp:2187-2221, and the 3D GPU solver's
                 zero-boundary behavior).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# ---------------------------------------------------------------------------
# Divergence / gradient (GPU_kernel.cu:967-1041, grid units)
# ---------------------------------------------------------------------------


def divergence_2d(u, v):
    return (u[1:, :] - u[:-1, :]) + (v[:, 1:] - v[:, :-1])


def divergence_3d(u, v, w):
    return (
        (u[1:, :, :] - u[:-1, :, :])
        + (v[:, 1:, :] - v[:, :-1, :])
        + (w[:, :, 1:] - w[:, :, :-1])
    )


def subtract_gradient_2d(u, v, p, bc):
    if bc == "neumann":
        u = u.at[1:-1, :].add(-(p[1:, :] - p[:-1, :]))
        v = v.at[:, 1:-1].add(-(p[:, 1:] - p[:, :-1]))
    else:  # dirichlet: ghost p = 0 outside, update every face
        gp = jnp.pad(p, ((1, 1), (0, 0)))
        u = u - (gp[1:, :] - gp[:-1, :])
        gp = jnp.pad(p, ((0, 0), (1, 1)))
        v = v - (gp[:, 1:] - gp[:, :-1])
    return u, v


def subtract_gradient_3d(u, v, w, p, bc):
    if bc == "neumann":
        u = u.at[1:-1, :, :].add(-(p[1:, :, :] - p[:-1, :, :]))
        v = v.at[:, 1:-1, :].add(-(p[:, 1:, :] - p[:, :-1, :]))
        w = w.at[:, :, 1:-1].add(-(p[:, :, 1:] - p[:, :, :-1]))
    else:
        gp = jnp.pad(p, ((1, 1), (0, 0), (0, 0)))
        u = u - (gp[1:, :, :] - gp[:-1, :, :])
        gp = jnp.pad(p, ((0, 0), (1, 1), (0, 0)))
        v = v - (gp[:, 1:, :] - gp[:, :-1, :])
        gp = jnp.pad(p, ((0, 0), (0, 0), (1, 1)))
        w = w - (gp[:, :, 1:] - gp[:, :, :-1])
    return u, v, w


# ---------------------------------------------------------------------------
# Matrix-free Laplacian and Jacobi smoothing
# ---------------------------------------------------------------------------


def _neighbor_sum(p, bc):
    """Sum of the 2*ndim axis neighbors; edge-replicate encodes Neumann
    (outside neighbor := center, so its stencil pair vanishes), zero-pad
    encodes Dirichlet ghost cells."""
    mode = "edge" if bc == "neumann" else "constant"
    total = jnp.zeros_like(p)
    for axis in range(p.ndim):
        padw = [(0, 0)] * p.ndim
        padw[axis] = (1, 1)
        pp = jnp.pad(p, padw, mode=mode)
        lo = [slice(None)] * p.ndim
        hi = [slice(None)] * p.ndim
        lo[axis] = slice(0, -2)
        hi[axis] = slice(2, None)
        total = total + pp[tuple(lo)] + pp[tuple(hi)]
    return total


def laplacian(p, bc):
    """L p = (2*ndim) p - neighbor_sum (SPD for dirichlet, SPSD for neumann).

    Matches calc_poisson_value (GPU_kernel.cu:1048-1060) up to overall sign
    (the reference uses sum(nbr) - 6c; we use the positive-definite form).
    """
    return (2 * p.ndim) * p - _neighbor_sum(p, bc)


def _diag(shape, bc):
    """Diagonal of L (neighbor count for neumann, 2*ndim for dirichlet)."""
    ndim = len(shape)
    if bc == "dirichlet":
        return np.float32(2 * ndim) * np.ones(shape, np.float32)
    d = np.zeros(shape, np.float32)
    for axis in range(ndim):
        cnt = np.full(shape[axis], 2.0, np.float32)
        cnt[0] = 1.0
        cnt[-1] = 1.0
        bshape = [1] * ndim
        bshape[axis] = shape[axis]
        d = d + cnt.reshape(bshape)
    return d


def jacobi_smooth(x, b, bc, diag, iters, omega=0.8):
    """Damped Jacobi x <- x + w D^-1 (b - L x); ping-pong-free (functional)."""

    def body(_, x):
        return x + omega * (b - laplacian(x, bc)) / diag

    return lax.fori_loop(0, iters, body, x)


# ---------------------------------------------------------------------------
# Geometric multigrid (restriction = 2x mean pool, prolongation = linear)
# ---------------------------------------------------------------------------


def _coarse_shape(shape):
    return tuple(max((n + 1) // 2, 2) for n in shape)


def mg_shapes(shape, min_size=8, max_levels=8):
    """Static level list, coarsened until every axis <= min_size.

    Mirrors LEVEL_COUNT=6 (GPU_Advection.h:14) / <=16^2 (GeometricLevelGen.h:143)
    but adapts to the grid rather than hard-coding six levels.
    """
    shapes = [tuple(shape)]
    while len(shapes) < max_levels and max(shapes[-1]) > min_size:
        nxt = _coarse_shape(shapes[-1])
        if nxt == shapes[-1]:
            break
        shapes.append(nxt)
    return shapes


def restrict_full(r, coarse_shape):
    """Mean-pool 2x restriction with edge padding for odd sizes.

    Strided-slice adds instead of the (c0,2,c1,2,...) reshape+mean — the
    6-D relayout costs real HBM passes at fine levels on TPU."""
    ndim = r.ndim
    padw = []
    for n, cn in zip(r.shape, coarse_shape):
        padw.append((0, 2 * cn - n))
    rp = jnp.pad(r, padw, mode="edge")
    for axis in range(ndim):
        lo = [slice(None)] * ndim
        hi = [slice(None)] * ndim
        lo[axis] = slice(0, None, 2)
        hi[axis] = slice(1, None, 2)
        rp = rp[tuple(lo)] + rp[tuple(hi)]
    return rp * (0.5 ** ndim)


def prolong_linear(e, fine_shape):
    return jax.image.resize(e, fine_shape, method="linear")


def _restrict_matrix(fn, cn):
    """Per-axis mean-pool-2x restriction as a (cn, fn) matrix, edge-padded
    for odd sizes — exactly restrict_full's action along one axis."""
    m = np.zeros((cn, fn), np.float32)
    for c in range(cn):
        m[c, min(2 * c, fn - 1)] += 0.5
        m[c, min(2 * c + 1, fn - 1)] += 0.5
    return m  # host numpy: see MGContext.__init__ on device-constant cost


def _prolong_matrix(cn, fn):
    """Per-axis linear-interp prolongation as a (fn, cn) matrix, built to
    match jax.image.resize(method='linear') exactly (half-pixel centers)."""
    m = np.zeros((fn, cn), np.float32)
    for i in range(fn):
        x = (i + 0.5) * cn / fn - 0.5
        x0 = int(np.floor(x))
        f = x - x0
        a = min(max(x0, 0), cn - 1)
        b_ = min(max(x0 + 1, 0), cn - 1)
        m[i, a] += 1.0 - f
        m[i, b_] += f
    return m  # host numpy: see MGContext.__init__ on device-constant cost


def _apply_axis_mats(x, mats):
    """Contract x's three axes with three (out_n, in_n) matrices — per-axis
    MXU matmuls (a 2x strided lane slice or linear resize costs a relayout
    ~10x slower than these dots at 256^3, measured)."""
    # precision="highest": TPU dots round inputs to bf16 by default, which
    # costs real preconditioner quality on the transfer operators
    x = jnp.einsum("Xx,xyz->Xyz", mats[0], x, precision="highest",
                   preferred_element_type=jnp.float32)
    x = jnp.einsum("Yy,xyz->xYz", mats[1], x, precision="highest",
                   preferred_element_type=jnp.float32)
    return jnp.einsum("Zz,xyz->xyZ", mats[2], x, precision="highest",
                      preferred_element_type=jnp.float32)


class MGContext:
    """Static per-resolution data: level shapes + Jacobi diagonals +
    per-axis restriction/prolongation matrices (3D)."""

    def __init__(self, shape, bc):
        self.bc = bc
        self.shapes = mg_shapes(shape)
        # HOST numpy constants on purpose: device-array constants closed
        # over by a jitted step must be fetched back (D2H) when the trace
        # is lowered to MLIR — ~7 s per constant through the axon tunnel
        # (measured: 15 such constants made a 32^3 step take 484 s to
        # lower). numpy constants inline from host memory instantly.
        self.diags = [_diag(s, bc) for s in self.shapes]
        self.rmats = None
        self.pmats = None
        if len(shape) == 3:
            self.rmats = [
                tuple(_restrict_matrix(f, c) for f, c in zip(fs, cs))
                for fs, cs in zip(self.shapes[:-1], self.shapes[1:])
            ]
            self.pmats = [
                tuple(_prolong_matrix(c, f) for f, c in zip(fs, cs))
                for fs, cs in zip(self.shapes[:-1], self.shapes[1:])
            ]

    def _smooth(self, x, b, level, iters, omega, reverse=False):
        """Per-level smoother hook. On TPU (config.use_rbgs) the pre/post
        smoothing runs the blocked Pallas red-black Gauss-Seidel kernel —
        one HBM round-trip per 2 sweeps and ~2x the smoothing power of
        damped Jacobi per sweep (the RBGS role of
        utils/AlgebraicMultigrid.h:22-151). Coarse levels (< 16 cells an
        axis) and long coarse solves stay on the fused XLA Jacobi; the
        sharded override lives in parallel/sharding.ShardedMGContext."""
        from gpufluidsimulation_tpu import config as _cfg

        shape = self.shapes[level]
        # 3D fine levels only (coarse grids are cheap on XLA Jacobi).
        # Any z extent: the launch rounds the lane axis up to 128 and
        # masks the pad lanes invalid in-kernel. `x=None` = statically-
        # zero initial guess (the pre-smoother): the RBGS path skips the
        # x pad + window DMA of its first launch.
        if (_cfg.use_rbgs() and iters <= 4 and len(shape) == 3
                and min(shape) >= 16):
            from gpufluidsimulation_tpu.ops.pallas_kernels import rbgs_smooth

            return rbgs_smooth(
                x, b, bc=self.bc, iters=iters,
                interpret=_cfg.interp_interpret(), reverse=reverse,
            )
        if x is None:
            x = jnp.zeros_like(b)
        return jacobi_smooth(x, b, self.bc, self.diags[level], iters, omega)

    def v_cycle(self, r, level=0, n_pre=2, n_post=2, n_coarse=40, omega=0.8):
        """Approximately solve L e = r; returns e. The 4x residual scaling per
        level accounts for the unscaled stencil under 2x coarsening (the
        reference's alpha*8 'scale' hack, GPU_kernel.cu:1639-1673, plays the
        same role)."""
        bc = self.bc
        if level == len(self.shapes) - 1:
            return self._smooth(None, r, level, n_coarse, omega)
        e = self._smooth(None, r, level, n_pre, omega)
        rr = r - laplacian(e, bc)
        rmats = getattr(self, "rmats", None)
        pmats = getattr(self, "pmats", None)
        if rmats is not None:
            rc = 4.0 * _apply_axis_mats(rr, rmats[level])
        else:
            rc = 4.0 * restrict_full(rr, self.shapes[level + 1])
        ec = self.v_cycle(rc, level + 1, n_pre, n_post, n_coarse, omega)
        if pmats is not None:
            e = e + _apply_axis_mats(ec, pmats[level])
        else:
            e = e + prolong_linear(ec, self.shapes[level])
        # black-then-red post sweeps: the V-cycle then equals its own
        # transpose (Jacobi levels are symmetric already), keeping the
        # outer PCG's SPD-preconditioner assumption honest
        return self._smooth(e, r, level, n_post, omega, reverse=True)


# ---------------------------------------------------------------------------
# Solvers
# ---------------------------------------------------------------------------


def _dot(a, b):
    return jnp.sum(a * b, dtype=jnp.float32)


def mgpcg(b, ctx: MGContext, tol=1e-6, max_iters=100):
    """MG-preconditioned CG on L p = b. Returns (p, iters, rel_res_inf, hist).

    The whole loop (V-cycles included) runs inside one lax.while_loop: the
    TPU analogue of the reference's device-resident scoreboard CG
    (GPU_kernel.cu:1764-1815) with a tolerance exit instead of iter=50.
    `hist` is the per-iteration relative-residual trace, the role of the
    reference scoreboard offsets 2000+ (GPU_kernel.cu:1781,1798, printed at
    BimocqGPUSolver.cpp:447-452); entries past `iters` stay at -1.
    """
    bc = ctx.bc
    if bc == "neumann":
        b = b - jnp.mean(b)
    b_inf = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)

    p0 = jnp.zeros_like(b)
    r0 = b
    z0 = ctx.v_cycle(r0)
    if bc == "neumann":
        z0 = z0 - jnp.mean(z0)
    s0 = z0
    rz0 = _dot(r0, z0)
    hist0 = jnp.full((int(max_iters),), -1.0, jnp.float32)

    def cond(carry):
        _, r, _, _, k, _, _ = carry
        return (k < max_iters) & (jnp.max(jnp.abs(r)) > tol * b_inf)

    def body(carry):
        p, r, s, rz, k, _, hist = carry
        As = laplacian(s, bc)
        alpha = rz / jnp.maximum(_dot(s, As), 1e-30)
        p = p + alpha * s
        r = r - alpha * As
        if bc == "neumann":
            r = r - jnp.mean(r)
        z = ctx.v_cycle(r)
        if bc == "neumann":
            z = z - jnp.mean(z)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        s = z + beta * s
        res = jnp.max(jnp.abs(r)) / b_inf
        hist = hist.at[k].set(res)
        return (p, r, s, rz_new, k + 1, res, hist)

    init_res = jnp.max(jnp.abs(r0)) / b_inf
    p, r, _, _, iters, res, hist = lax.while_loop(
        cond, body, (p0, r0, s0, rz0, jnp.int32(0), init_res, hist0)
    )
    return p, iters, jnp.max(jnp.abs(r)) / b_inf, hist


def cg(b, bc, tol=1e-6, max_iters=400):
    """Plain CG (gpu_conjugate_gradient parity, GPU_kernel.cu:1336-1416)."""
    if bc == "neumann":
        b = b - jnp.mean(b)
    b_inf = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
    p0 = jnp.zeros_like(b)
    r0 = b
    s0 = r0
    rr0 = _dot(r0, r0)

    def cond(carry):
        _, r, _, _, k = carry
        return (k < max_iters) & (jnp.max(jnp.abs(r)) > tol * b_inf)

    def body(carry):
        p, r, s, rr, k = carry
        As = laplacian(s, bc)
        alpha = rr / jnp.maximum(_dot(s, As), 1e-30)
        p = p + alpha * s
        r = r - alpha * As
        rr_new = _dot(r, r)
        s = r + (rr_new / jnp.maximum(rr, 1e-30)) * s
        return (p, r, s, rr_new, k + 1)

    p, r, _, _, iters = lax.while_loop(cond, body, (p0, r0, s0, rr0, jnp.int32(0)))
    return p, iters, jnp.max(jnp.abs(r)) / b_inf


def pcg(b, bc, tol=1e-6, max_iters=400, order=3, omega=0.8):
    """PCG with a truncated-Neumann (k-step damped-Jacobi) polynomial
    preconditioner — the role of the reference's MIC(0) PCG
    (utils/pcg_solver.h:18-312; declared but unused by its solvers).

    MIC(0)'s sequential triangular solves are hostile to SIMD/TPU lanes; a
    fixed-degree polynomial approximate inverse
        M^-1 r = sum_{j<k} (I - w D^-1 L)^j w D^-1 r
    is SPD for 0 < w < 2/rho(D^-1 L), applies as k fully-parallel stencil
    passes, and keeps the PCG structure (and its convergence advantage over
    plain CG) intact. Returns (p, iters, rel_res_inf)."""
    if bc == "neumann":
        b = b - jnp.mean(b)
    diag = _diag(b.shape, bc)
    b_inf = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)

    def precond(r):
        x = omega * r / diag
        for _ in range(order - 1):
            x = x + omega * (r - laplacian(x, bc)) / diag
        if bc == "neumann":
            x = x - jnp.mean(x)
        return x

    p0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    s0 = z0
    rz0 = _dot(r0, z0)

    def cond(carry):
        _, r, _, _, k = carry
        return (k < max_iters) & (jnp.max(jnp.abs(r)) > tol * b_inf)

    def body(carry):
        p, r, s, rz, k = carry
        As = laplacian(s, bc)
        alpha = rz / jnp.maximum(_dot(s, As), 1e-30)
        p = p + alpha * s
        r = r - alpha * As
        if bc == "neumann":
            r = r - jnp.mean(r)
        z = precond(r)
        rz_new = _dot(r, z)
        s = z + (rz_new / jnp.maximum(rz, 1e-30)) * s
        return (p, r, s, rz_new, k + 1)

    p, r, _, _, iters = lax.while_loop(cond, body, (p0, r0, s0, rz0, jnp.int32(0)))
    return p, iters, jnp.max(jnp.abs(r)) / b_inf


def jacobi_solve(b, bc, iters=100):
    """Plain Jacobi projection solver (gpu_projection_jacobi parity,
    GPU_kernel.cu:1818-1895)."""
    diag = _diag(b.shape, bc)
    p = jacobi_smooth(jnp.zeros_like(b), b, bc, diag, iters, omega=1.0)
    return p


# ---------------------------------------------------------------------------
# Full projection ops
# ---------------------------------------------------------------------------


def _spectral_solve(b, bc, tol, max_iters):
    """Direct DST/DCT eigenbasis solve (ops/spectral.py) with the same
    (p, iters, res, hist) contract as mgpcg. The relative residual is
    measured honestly against the stencil operator; if f32 transform
    rounding leaves it above `tol` (seen in 2D at tol=1e-6: ~5e-5 direct),
    ONE iterative-refinement pass (p += solve(r)) squares it — `iters`
    then reports 2 and hist carries both residuals."""
    from gpufluidsimulation_tpu.ops import spectral

    sctx = spectral.get_context(tuple(b.shape), bc)
    if bc == "neumann":
        # the zero mode is projected out in the eigenbasis; measure the
        # residual against the compatible (mean-free) rhs, like mgpcg
        b = b - jnp.mean(b)
    b_inf = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)
    p = sctx.solve(b)
    r = b - laplacian(p, bc)
    res0 = jnp.max(jnp.abs(r)) / b_inf
    refine = res0 > tol

    def _refine(args):
        p, r = args
        p2 = p + sctx.solve(r)
        return p2, b - laplacian(p2, bc)

    p, r = lax.cond(refine, _refine, lambda args: args, (p, r))
    res = jnp.max(jnp.abs(r)) / b_inf
    iters = jnp.int32(1) + refine.astype(jnp.int32)
    hist = jnp.full((int(max_iters),), -1.0, jnp.float32).at[0].set(res0)
    if int(max_iters) > 1:
        hist = hist.at[1].set(jnp.where(refine, res, -1.0))
    return p, iters, res, hist


def project_2d(u, v, ctx: MGContext, tol=1e-6, max_iters=200):
    """rhs = -div (the 2D reference solves -div/h with 1/h^2 matrix,
    BimocqSolver2D.cpp:356-385 — identical p up to units)."""
    from gpufluidsimulation_tpu import config as _cfg

    div = divergence_2d(u, v)
    if _cfg.use_spectral_poisson():
        p, iters, res, _ = _spectral_solve(-div, ctx.bc, tol, max_iters)
    else:
        p, iters, res, _ = mgpcg(-div, ctx, tol, max_iters)
    u, v = subtract_gradient_2d(u, v, p, ctx.bc)
    return u, v, p, iters, res


def project_3d(u, v, w, ctx: MGContext, tol=1e-4, max_iters=100):
    from gpufluidsimulation_tpu import config as _cfg

    div = divergence_3d(u, v, w)
    if _cfg.use_spectral_poisson():
        p, iters, res, hist = _spectral_solve(-div, ctx.bc, tol, max_iters)
    else:
        p, iters, res, hist = mgpcg(-div, ctx, tol, max_iters)
    u, v, w = subtract_gradient_3d(u, v, w, p, ctx.bc)
    return u, v, w, p, iters, res, hist


# ---------------------------------------------------------------------------
# Boundary-aware (masked) projection — the hybrid solver's voxelized BCs
# (BimocqSolver::projection, BimocqSolver.cpp:1120-1407): cell flags
# 0=fluid, 1=air (Dirichlet p=0), 2=domain solid, 3=moving solid object.
# ---------------------------------------------------------------------------

FLUID, AIR, SOLID, OBJECT = 0, 1, 2, 3


def _shift(x, axis, d, fill):
    """x shifted so result[i] = x[i+d] along axis; `fill` outside."""
    pad = [(0, 0)] * x.ndim
    sl = [slice(None)] * x.ndim
    if d > 0:
        pad[axis] = (0, d)
        sl[axis] = slice(d, None)
    else:
        pad[axis] = (-d, 0)
        sl[axis] = slice(0, d)
    return jnp.pad(x, pad, constant_values=fill)[tuple(sl)]


def masked_laplacian(p, flags):
    """L p on fluid rows: sum over neighbors of (p_c - p_n) for fluid
    neighbors, + p_c for air neighbors (ghost p=0), + 0 for solid neighbors
    (Neumann). Non-fluid rows return p (identity) so the operator stays SPD
    on the full lattice."""
    fluid = flags == FLUID
    out = jnp.zeros_like(p)
    for axis in range(3):
        for d in (-1, 1):
            nf = _shift(flags, axis, d, SOLID)
            pn = _shift(p, axis, d, 0.0)
            n_fluid = nf == FLUID
            n_air = nf == AIR
            out = out + jnp.where(n_fluid, p - pn, 0.0) + jnp.where(n_air, p, 0.0)
    return jnp.where(fluid, out, p)


def masked_divergence_3d(u, v, w, flags, u_solid, v_solid, w_solid):
    """MAC divergence with solid-face velocities overridden by the boundary
    velocity; zero on non-fluid cells."""
    solid = (flags == SOLID) | (flags == OBJECT)

    def face_sub(vel, vel_solid, axis):
        lo = (flags == flags)  # placeholder
        # face f between cell c- (index-1) and c+ (index): solid if either side solid
        s_hi = jnp.pad(solid, [(0, 1) if a == axis else (0, 0) for a in range(3)],
                       constant_values=True)
        s_lo = jnp.pad(solid, [(1, 0) if a == axis else (0, 0) for a in range(3)],
                       constant_values=True)
        face_solid = s_hi | s_lo
        return jnp.where(face_solid, vel_solid, vel)

    ue = face_sub(u, u_solid, 0)
    ve = face_sub(v, v_solid, 1)
    we = face_sub(w, w_solid, 2)
    div = divergence_3d(ue, ve, we)
    return jnp.where(flags == FLUID, div, 0.0), ue, ve, we


def coarsen_flags(flags, coarse_shape):
    """2x coarsening of the cell-flag field for the masked MG hierarchy
    (the role of the Compressed/Sparse AMG level builds,
    utils/AlgebraicMultigrid.h:733-970): a coarse cell is AIR if any child
    is air (Dirichlet dominates), else FLUID if any child is fluid, else
    solid. Traced — the flags move with the boundary every frame."""
    padw = [(0, 2 * cn - n) for n, cn in zip(flags.shape, coarse_shape)]
    fp = jnp.pad(flags, padw, mode="edge")
    newshape = []
    for cn in coarse_shape:
        newshape.extend([cn, 2])
    fp = fp.reshape(newshape)
    axes = tuple(range(1, 6, 2))
    any_air = jnp.any(fp == AIR, axis=axes)
    any_fluid = jnp.any(fp == FLUID, axis=axes)
    return jnp.where(any_air, AIR, jnp.where(any_fluid, FLUID, SOLID))


def _masked_diag(flags):
    """Row diagonal of masked_laplacian: (# fluid or air neighbors) on fluid
    rows, 1 on identity (non-fluid) rows."""
    fluid = flags == FLUID
    d = jnp.zeros(flags.shape, jnp.float32)
    for axis in range(3):
        for s in (-1, 1):
            nf = _shift(flags, axis, s, SOLID)
            d = d + ((nf == FLUID) | (nf == AIR)).astype(jnp.float32)
    return jnp.where(fluid, jnp.maximum(d, 1.0), 1.0)


def masked_jacobi_smooth(x, b, flags, diag, iters, omega=0.8):
    def body(_, x):
        return x + omega * (b - masked_laplacian(x, flags)) / diag

    return lax.fori_loop(0, iters, body, x)


def _masked_smooth(x, r, flags, diag, iters, omega, shape, reverse=False):
    """Per-level masked smoother: the blocked Pallas masked red-black
    Gauss-Seidel (pallas_kernels.masked_rbgs_smooth — the
    RBGS_with_pattern role, utils/AlgebraicMultigrid.h:609) on fine 3D
    levels under config.use_rbgs, masked damped Jacobi elsewhere.
    `x=None` = statically-zero initial guess."""
    from gpufluidsimulation_tpu import config as _cfg

    if (_cfg.use_rbgs() and iters <= 4 and len(shape) == 3
            and min(shape) >= 16):
        from gpufluidsimulation_tpu.ops.pallas_kernels import (
            masked_rbgs_smooth)

        return masked_rbgs_smooth(x, r, flags, iters=iters,
                                  interpret=_cfg.interp_interpret(),
                                  reverse=reverse)
    if x is None:
        x = jnp.zeros_like(r)
    return masked_jacobi_smooth(x, r, flags, diag, iters, omega)


def masked_v_cycle(r, flag_levels, diag_levels, shapes, level=0,
                   n_pre=2, n_post=2, n_coarse=40, omega=0.8):
    """Boundary-aware MG V-cycle on the masked operator — the preconditioner
    role of RBGS_with_pattern + the masked AMG builds
    (utils/AlgebraicMultigrid.h:609, 733+). Flags/diagonals are traced
    per-level arrays (the boundary moves every frame)."""
    flags = flag_levels[level]
    diag = diag_levels[level]
    fluid = flags == FLUID
    r = jnp.where(fluid, r, 0.0)
    if level == len(shapes) - 1:
        e = jnp.zeros_like(r)
        e = masked_jacobi_smooth(e, r, flags, diag, n_coarse, omega)
        return jnp.where(fluid, e, 0.0)
    e = _masked_smooth(None, r, flags, diag, n_pre, omega, shapes[level])
    rr = jnp.where(fluid, r - masked_laplacian(e, flags), 0.0)
    rc = 4.0 * restrict_full(rr, shapes[level + 1])
    ec = masked_v_cycle(rc, flag_levels, diag_levels, shapes, level + 1,
                        n_pre, n_post, n_coarse, omega)
    e = e + prolong_linear(ec, shapes[level])
    e = _masked_smooth(e, r, flags, diag, n_post, omega, shapes[level],
                       reverse=True)
    return jnp.where(fluid, e, 0.0)


def build_masked_hierarchy(flags, shapes):
    flag_levels = [flags]
    for s in shapes[1:]:
        flag_levels.append(coarsen_flags(flag_levels[-1], s))
    diag_levels = [_masked_diag(f) for f in flag_levels]
    return flag_levels, diag_levels


def project_masked_3d(u, v, w, flags, u_solid, v_solid, w_solid,
                      ctx: MGContext, tol=1e-4, max_iters=100):
    """Pressure projection with voxel boundary conditions.

    CG on the masked operator, preconditioned by a boundary-aware masked
    MG V-cycle (per-level coarsened flags + masked Jacobi smoothing) so the
    preconditioner tracks the operator even at large solid fractions.
    After the solve: subtract gradients on fluid/air faces, then overwrite
    solid-adjacent faces with the boundary velocity
    (BimocqSolver.cpp:1276-1407's solid overwrite)."""
    div, ue, ve, we = masked_divergence_3d(u, v, w, flags, u_solid, v_solid, w_solid)
    b = -div
    b_inf = jnp.maximum(jnp.max(jnp.abs(b)), 1e-30)

    flag_levels, diag_levels = build_masked_hierarchy(flags, ctx.shapes)

    def precond(r):
        return masked_v_cycle(r, flag_levels, diag_levels, ctx.shapes)

    def A(x):
        return masked_laplacian(x, flags)

    p0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    s0 = z0
    rz0 = _dot(r0, z0)
    hist0 = jnp.full((int(max_iters),), -1.0, jnp.float32)

    def cond(carry):
        _, r, _, _, k, _, _ = carry
        return (k < max_iters) & (jnp.max(jnp.abs(r)) > tol * b_inf)

    def body(carry):
        p, r, s, rz, k, _, hist = carry
        As = A(s)
        alpha = rz / jnp.maximum(_dot(s, As), 1e-30)
        p = p + alpha * s
        r = r - alpha * As
        z = precond(r)
        rz_new = _dot(r, z)
        beta = rz_new / jnp.maximum(rz, 1e-30)
        s = z + beta * s
        res = jnp.max(jnp.abs(r)) / b_inf
        hist = hist.at[k].set(res)
        return (p, r, s, rz_new, k + 1, res, hist)

    init_res = jnp.max(jnp.abs(r0)) / b_inf
    p, r, _, _, iters, res, hist = lax.while_loop(
        cond, body, (p0, r0, s0, rz0, jnp.int32(0), init_res, hist0)
    )
    p = jnp.where(flags == FLUID, p, 0.0)

    fluid = flags == FLUID
    air = flags == AIR
    solid = (flags == SOLID) | (flags == OBJECT)

    def update_faces(vel, vel_solid, axis):
        padc = [(1, 1) if a == axis else (0, 0) for a in range(3)]
        gp = jnp.pad(p, padc)
        f_lo = jnp.pad(fluid, padc, constant_values=False)
        a_lo = jnp.pad(air, padc, constant_values=False)
        s_lo = jnp.pad(solid, padc, constant_values=True)
        sl_m = [slice(None)] * 3
        sl_p = [slice(None)] * 3
        sl_m[axis] = slice(0, -1)
        sl_p[axis] = slice(1, None)
        p_m, p_p = gp[tuple(sl_m)], gp[tuple(sl_p)]
        fl_m, fl_p = f_lo[tuple(sl_m)], f_lo[tuple(sl_p)]
        ai_m, ai_p = a_lo[tuple(sl_m)], a_lo[tuple(sl_p)]
        so_m, so_p = s_lo[tuple(sl_m)], s_lo[tuple(sl_p)]
        # faces with at least one fluid side and no solid side get the
        # gradient update (air side contributes ghost p=0, already in gp)
        active = (fl_m | fl_p) & ~(so_m | so_p)
        vel = jnp.where(active, vel - (p_p - p_m), vel)
        # solid-adjacent faces take the boundary velocity
        vel = jnp.where(so_m | so_p, vel_solid, vel)
        return vel

    u2 = update_faces(ue, u_solid, 0)
    v2 = update_faces(ve, v_solid, 1)
    w2 = update_faces(we, w_solid, 2)
    return u2, v2, w2, p, iters, res, hist
