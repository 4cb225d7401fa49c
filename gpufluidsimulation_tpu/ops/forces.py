"""Body forces, viscosity, and vorticity diagnostics.

Parity map:
* buoyancy_2d  <-> BimocqSolver2D::applyBuoyancyForce (BimocqSolver2D.cpp:330-347)
* buoyancy_3d  <-> add_buoyancy_kernel (GPU_kernel.cu:804-832); we implement
  the intended center-pair average (the CUDA kernel indexes the cell fields
  with the v-grid stride — an out-of-bounds defect we do not reproduce).
* diffuse      <-> gpu_diffuse_field 20-iter damped Jacobi (GPU_kernel.cu:834-876)
* curl_2d      <-> calculateCurl (BimocqSolver2D.cpp:2256-2267)
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def buoyancy_2d(v, rho, temperature, alpha, beta, dt):
    """v-face force 0.5*dt*(-alpha*rho - beta*T) added from BOTH adjacent
    cells (the two TBB loops at BimocqSolver2D.cpp:335-346): interior faces
    receive the average of the two neighbor cells; the wall faces get the
    single adjacent cell's half-contribution."""
    f = 0.5 * dt * (-alpha * rho - beta * temperature)
    v = v.at[:, :-1].add(f)
    v = v.at[:, 1:].add(f)
    return v


def buoyancy_3d(v, rho, temperature, alpha, beta, dt):
    """v(i,j,k) += 0.5*dt*(beta*(T0+T1) - alpha*(rho0+rho1)) for interior j
    (add_buoyancy_kernel guard j>0; the j=nj face is also skipped here,
    matching the intended in-bounds span)."""
    f0 = beta * temperature - alpha * rho
    v = v.at[:, 1:-1, :].add(0.5 * dt * (f0[:, 1:, :] + f0[:, :-1, :]))
    return v


def diffuse_3d(field, iters, coef):
    """Damped-Jacobi viscosity solve (I + coef*L)x = field, 3D interior only.

    field_out = (field + coef*sum(6 nbrs of x)) / (1 + 6 coef); ping-pong is
    expressed functionally (XLA double-buffers for us). Boundary ring holds
    the original values (kernel guard i>0 && i<ni-1, GPU_kernel.cu:840).

    On TPU (config.use_pallas_diffuse) the loop runs as the blocked Pallas
    kernel pallas_kernels.jacobi_diffuse — 4 sweeps per VMEM window
    round-trip instead of one HBM pass per sweep, bitwise-identical
    neighbor-sum ordering.
    """
    from gpufluidsimulation_tpu import config as _cfg

    if _cfg.use_pallas_diffuse() and field.ndim == 3:
        from gpufluidsimulation_tpu.ops.pallas_kernels import jacobi_diffuse

        return jacobi_diffuse(field, field, iters=int(iters),
                              coef=float(coef),
                              interpret=_cfg.interp_interpret())
    denom = 1.0 + 6.0 * coef
    b = field
    nx, ny, nz = field.shape
    ii = jnp.arange(nx)[:, None, None]
    jj = jnp.arange(ny)[None, :, None]
    kk = jnp.arange(nz)[None, None, :]
    interior = ((ii > 0) & (ii < nx - 1) & (jj > 0) & (jj < ny - 1)
                & (kk > 0) & (kk < nz - 1))

    def body(_, x):
        # pad ONCE + 6 static slices of the one padded array (a single fused
        # stencil pass; per-axis pads materialize intermediates)
        xp = jnp.pad(x, 1)
        nb = (
            lax.slice(xp, (0, 1, 1), (nx, ny + 1, nz + 1))
            + lax.slice(xp, (2, 1, 1), (nx + 2, ny + 1, nz + 1))
            + lax.slice(xp, (1, 0, 1), (nx + 1, ny, nz + 1))
            + lax.slice(xp, (1, 2, 1), (nx + 1, ny + 2, nz + 1))
            + lax.slice(xp, (1, 1, 0), (nx + 1, ny + 1, nz))
            + lax.slice(xp, (1, 1, 2), (nx + 1, ny + 1, nz + 2))
        )
        # boundary ring held (kernel guard i>0 && i<ni-1): one fused select
        # instead of six dynamic-update-slices per iteration
        return jnp.where(interior, (b + coef * nb) / denom, x)

    return lax.fori_loop(0, iters, body, field)


def diffuse_2d(field, nu, dt, h, iters=20):
    """2D red-black Gauss-Seidel viscosity (diffuseField,
    BimocqSolver2D.cpp:1717-1757): out-of-domain neighbors contribute 0."""
    coef = nu * dt / (h * h)
    denom = 1.0 + 4.0 * coef
    ni, nj = field.shape
    ii = jnp.arange(ni)[:, None]
    jj = jnp.arange(nj)[None, :]
    red = (ii + jj) % 2 == 0
    b = field

    def nbr(x):
        return (
            jnp.pad(x, ((1, 1), (0, 0)))[:-2, :]
            + jnp.pad(x, ((1, 1), (0, 0)))[2:, :]
            + jnp.pad(x, ((0, 0), (1, 1)))[:, :-2]
            + jnp.pad(x, ((0, 0), (1, 1)))[:, 2:]
        )

    def body(_, x):
        x = jnp.where(red, (b + coef * nbr(x)) / denom, x)
        x = jnp.where(~red, (b + coef * nbr(x)) / denom, x)
        return x

    return lax.fori_loop(0, iters, body, field)


def curl_2d(u, v, h):
    """Node vorticity curl(i,j) = (u(i,j)-u(i,j-1) + v(i-1,j)-v(i,j))/h on the
    (ni+1, nj+1) corner lattice; boundary ring stays zero."""
    ni = v.shape[0]
    nj = u.shape[1]
    curl = jnp.zeros((ni + 1, nj + 1), u.dtype)
    # in-bounds span of the reference loop: i in [1, ni-1], j in [1, nj-1]
    inner = (
        u[1:ni, 1:nj] - u[1:ni, 0 : nj - 1] + v[0 : ni - 1, 1:nj] - v[1:ni, 1:nj]
    ) / h
    curl = curl.at[1:ni, 1:nj].set(inner)
    return curl
