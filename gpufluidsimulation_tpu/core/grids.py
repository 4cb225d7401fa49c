"""MAC-grid descriptors and staggered-field conventions.

The reference keeps two *different* staggering conventions, which we reproduce
exactly (they matter for bit-level parity):

* 3D (ref src/bimocq3D/BimocqSolver.cpp:13-15, GPU_kernel.cu:64-72):
  cell centers sit at world position ``i*h`` (offset 0), u-faces at
  ``(i-0.5)*h`` (sampling offset ``-0.5h`` in x), v at ``-0.5h`` in y,
  w at ``-0.5h`` in z.  A staggered field's *own* node positions are
  ``(i - 0.5*dim)*h`` per axis (GPU_kernel.cu:212-226 ``buffer_origin``).

* 2D (ref src/bimocq2D/BimocqSolver2D.cpp:102,119,2311-2318):
  cell centers at ``(i+0.5)*h``, u at ``(i, j+0.5)*h``, v at ``(i+0.5, j)*h``.

Fields are plain ``jnp.float32`` arrays of shape (ni[+1], nj[+1], nk[+1]),
k-fastest; all state stays device-resident across the jitted step.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Offset2 = Tuple[float, float]
Offset3 = Tuple[float, float, float]


@dataclasses.dataclass(frozen=True)
class Grid3D:
    """3D MAC grid: ni x nj x nk cells of size h (domain [0, ni*h] x ...)."""

    ni: int
    nj: int
    nk: int
    h: float

    # Sampling offsets in units of h (world_offset = off * h), per field kind.
    # ref: BimocqSolver.cpp:13-15 (buffer init offsets), GPU_kernel.cu:67-69.
    OFF_C: Offset3 = (0.0, 0.0, 0.0)
    OFF_U: Offset3 = (-0.5, 0.0, 0.0)
    OFF_V: Offset3 = (0.0, -0.5, 0.0)
    OFF_W: Offset3 = (0.0, 0.0, -0.5)

    @property
    def shape_c(self) -> Tuple[int, int, int]:
        return (self.ni, self.nj, self.nk)

    @property
    def shape_u(self) -> Tuple[int, int, int]:
        return (self.ni + 1, self.nj, self.nk)

    @property
    def shape_v(self) -> Tuple[int, int, int]:
        return (self.ni, self.nj + 1, self.nk)

    @property
    def shape_w(self) -> Tuple[int, int, int]:
        return (self.ni, self.nj, self.nk + 1)

    def dim_of(self, kind: str) -> Offset3:
        """Face-extension vector 'dim' as used by the reference kernels."""
        return {"c": (0, 0, 0), "u": (1, 0, 0), "v": (0, 1, 0), "w": (0, 0, 1)}[kind]

    def off_of(self, kind: str) -> Offset3:
        return {"c": self.OFF_C, "u": self.OFF_U, "v": self.OFF_V, "w": self.OFF_W}[kind]

    def node_coords(self, kind: str, dtype=jnp.float32):
        """World coordinates (X, Y, Z) of every node of a field of `kind`.

        Matches GPU_kernel.cu:224-226: point = i*h + buffer_origin with
        buffer_origin = -dim*0.5*h, i.e. x = (i - 0.5*dim_x)*h.
        """
        dim = self.dim_of(kind)
        nx, ny, nz = self.ni + dim[0], self.nj + dim[1], self.nk + dim[2]
        x = (jnp.arange(nx, dtype=dtype) - 0.5 * dim[0]) * self.h
        y = (jnp.arange(ny, dtype=dtype) - 0.5 * dim[1]) * self.h
        z = (jnp.arange(nz, dtype=dtype) - 0.5 * dim[2]) * self.h
        return (
            x[:, None, None] * jnp.ones((1, ny, nz), dtype),
            y[None, :, None] * jnp.ones((nx, 1, nz), dtype),
            z[None, None, :] * jnp.ones((nx, ny, 1), dtype),
        )

    def zeros(self, kind: str, dtype=jnp.float32):
        shape = {"c": self.shape_c, "u": self.shape_u, "v": self.shape_v, "w": self.shape_w}[kind]
        return jnp.zeros(shape, dtype)

    def interior_mask(self, kind: str, lo: int = 2, hi: int = 3,
                      hi_add_dim: bool = False):
        """Boolean mask of nodes the reference kernels actually update.

        The CUDA kernels guard with ``i > 1 && i < n-2`` style bands (e.g.
        GPU_kernel.cu:135, 178); `lo`/`hi` encode that band (update iff
        lo <= idx <= n-hi). With ``hi_add_dim`` the upper margin grows by the
        field's staggering dim per axis — semilag_kernel's
        ``i < buffer-2-dim`` guard (GPU_kernel.cu:222), which retains one
        extra face plane on the staggered axis. The '2+dim<i && i<n-3'
        variant of advect_kernel (GPU_kernel.cu:268,341) is produced with
        lo=3+dim, hi=3 per-axis by callers.
        """
        dim = self.dim_of(kind)
        nx, ny, nz = self.ni + dim[0], self.nj + dim[1], self.nk + dim[2]
        hx, hy, hz = (
            (hi + dim[0], hi + dim[1], hi + dim[2]) if hi_add_dim
            else (hi, hi, hi)
        )
        # iota compares (not a materialized pred constant): XLA computes the
        # mask inside the consuming fusion — free ALU work vs an HBM load
        shape = (nx, ny, nz)
        ii = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        kk = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        return (
            (ii >= lo) & (ii <= nx - hx) &
            (jj >= lo) & (jj <= ny - hy) &
            (kk >= lo) & (kk <= nz - hz)
        )


@dataclasses.dataclass(frozen=True)
class Grid2D:
    """2D MAC grid: ni x nj cells of size h; 2D reference conventions."""

    ni: int
    nj: int
    h: float

    # ref: BimocqSolver2D.cpp:102 (cell centers +0.5), :2311-2318 (u/v offsets).
    OFF_C: Offset2 = (0.5, 0.5)
    OFF_U: Offset2 = (0.0, 0.5)
    OFF_V: Offset2 = (0.5, 0.0)

    @property
    def shape_c(self) -> Tuple[int, int]:
        return (self.ni, self.nj)

    @property
    def shape_u(self) -> Tuple[int, int]:
        return (self.ni + 1, self.nj)

    @property
    def shape_v(self) -> Tuple[int, int]:
        return (self.ni, self.nj + 1)

    @property
    def shape_curl(self) -> Tuple[int, int]:
        return (self.ni + 1, self.nj + 1)

    def off_of(self, kind: str) -> Offset2:
        return {"c": self.OFF_C, "u": self.OFF_U, "v": self.OFF_V}[kind]

    def node_coords(self, kind: str, dtype=jnp.float32):
        """World coords of a field's own nodes: pos = (i + off)*h."""
        off = self.off_of(kind)
        shape = {"c": self.shape_c, "u": self.shape_u, "v": self.shape_v}[kind]
        nx, ny = shape
        x = (jnp.arange(nx, dtype=dtype) + off[0]) * self.h
        y = (jnp.arange(ny, dtype=dtype) + off[1]) * self.h
        return (
            jnp.broadcast_to(x[:, None], (nx, ny)),
            jnp.broadcast_to(y[None, :], (nx, ny)),
        )

    def zeros(self, kind: str, dtype=jnp.float32):
        shape = {"c": self.shape_c, "u": self.shape_u, "v": self.shape_v}[kind]
        return jnp.zeros(shape, dtype)
