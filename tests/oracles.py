"""Pure-NumPy oracles implementing the reference semantics point-for-point.

These are deliberately written loop-style (slow, scalar) and independent of
the JAX code so kernel tests have a second implementation to diff against —
the role the GPU_Mapping_Test A/B flag plays in the reference
(bimocq3D/BimocqSolver.h:26-27).
"""

import numpy as np


def sample2(field, px, py, h, off):
    """bilinear with boundedAt clamping (BimocqSolver2D.cpp:2328-2334)."""
    nx, ny = field.shape
    gx = px / h - off[0]
    gy = py / h - off[1]
    i0 = int(np.floor(gx))
    j0 = int(np.floor(gy))
    fx = gx - i0
    fy = gy - j0

    def at(i, j):
        return field[min(max(i, 0), nx - 1), min(max(j, 0), ny - 1)]

    return (1 - fy) * ((1 - fx) * at(i0, j0) + fx * at(i0 + 1, j0)) + fy * (
        (1 - fx) * at(i0, j0 + 1) + fx * at(i0 + 1, j0 + 1)
    )


def sample3(field, px, py, pz, h, off):
    nx, ny, nz = field.shape
    gx = px / h - off[0]
    gy = py / h - off[1]
    gz = pz / h - off[2]
    i0, j0, k0 = int(np.floor(gx)), int(np.floor(gy)), int(np.floor(gz))
    fx, fy, fz = gx - i0, gy - j0, gz - k0

    def at(i, j, k):
        return field[
            min(max(i, 0), nx - 1), min(max(j, 0), ny - 1), min(max(k, 0), nz - 1)
        ]

    c00 = (1 - fx) * at(i0, j0, k0) + fx * at(i0 + 1, j0, k0)
    c10 = (1 - fx) * at(i0, j0 + 1, k0) + fx * at(i0 + 1, j0 + 1, k0)
    c01 = (1 - fx) * at(i0, j0, k0 + 1) + fx * at(i0 + 1, j0, k0 + 1)
    c11 = (1 - fx) * at(i0, j0 + 1, k0 + 1) + fx * at(i0 + 1, j0 + 1, k0 + 1)
    c0 = (1 - fy) * c00 + fy * c10
    c1 = (1 - fy) * c01 + fy * c11
    return (1 - fz) * c0 + fz * c1


def mac_velocity_2d(u, v, px, py, h):
    """getVelocity (BimocqSolver2D.cpp:2307-2325): zero outside band."""
    ni = v.shape[0]
    nj = u.shape[1]
    ux, uy = px, py - 0.5 * h
    i, j = int(np.floor(ux / h)), int(np.floor(uy / h))
    if not (0 <= i <= ni - 1 and 0 <= j <= nj - 2):
        us = 0.0
    else:
        fx, fy = ux / h - i, uy / h - j
        us = (1 - fy) * ((1 - fx) * u[i, j] + fx * u[i + 1, j]) + fy * (
            (1 - fx) * u[i, j + 1] + fx * u[i + 1, j + 1]
        )
    vx, vy = px - 0.5 * h, py
    i, j = int(np.floor(vx / h)), int(np.floor(vy / h))
    if not (0 <= i <= ni - 2 and 0 <= j <= nj - 1):
        vs = 0.0
    else:
        fx, fy = vx / h - i, vy / h - j
        vs = (1 - fy) * ((1 - fx) * v[i, j] + fx * v[i + 1, j]) + fy * (
            (1 - fx) * v[i, j + 1] + fx * v[i + 1, j + 1]
        )
    return us, vs


def mac_velocity_3d(u, v, w, px, py, pz, h):
    return (
        sample3(u, px, py, pz, h, (-0.5, 0, 0)),
        sample3(v, px, py, pz, h, (0, -0.5, 0)),
        sample3(w, px, py, pz, h, (0, 0, -0.5)),
    )


def trace_rk3_3d(u, v, w, h, dt, p):
    ni, nj, nk = v.shape[0], u.shape[1], u.shape[2]
    c1, c2, c3 = 2 / 9 * dt, 3 / 9 * dt, 4 / 9 * dt
    v1 = np.array(mac_velocity_3d(u, v, w, *p, h))
    m1 = np.array(p) + 0.5 * dt * v1
    v2 = np.array(mac_velocity_3d(u, v, w, *m1, h))
    m2 = np.array(p) + 0.75 * dt * v2
    v3 = np.array(mac_velocity_3d(u, v, w, *m2, h))
    out = np.array(p) + c1 * v1 + c2 * v2 + c3 * v3
    lims = np.array([ni * h, nj * h, nk * h])
    return np.clip(out, h, lims - h)


def trace_3d(u, v, w, h, cfldt, dt, p):
    total = abs(dt)
    sign = 1.0 if dt >= 0 else -1.0
    t = 0.0
    p = np.array(p, np.float64)
    while t < total:
        sub = min(cfldt, total - t)
        p = trace_rk3_3d(u, v, w, h, sign * sub, p)
        t += sub
    return p


def divergence_3d(u, v, w):
    return (
        u[1:, :, :] - u[:-1, :, :]
        + v[:, 1:, :] - v[:, :-1, :]
        + w[:, :, 1:] - w[:, :, :-1]
    )


def laplacian_neumann(p):
    out = np.zeros_like(p)
    ndim = p.ndim
    for axis in range(ndim):
        for d in (-1, 1):
            src = np.roll(p, -d, axis=axis)
            sl = [slice(None)] * ndim
            sl[axis] = 0 if d == -1 else -1
            valid = np.ones_like(p, bool)
            valid[tuple(sl)] = False
            out += np.where(valid, p - src, 0.0)
    return out
