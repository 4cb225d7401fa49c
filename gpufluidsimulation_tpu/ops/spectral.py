"""Direct spectral Poisson solver — the MXU path for the pressure solve.

The unmasked pressure system L p = b on a full box has constant
coefficients, so it is DIAGONAL in a per-axis sine/cosine eigenbasis:

* bc='dirichlet' (zero ghost cells — the 3D GPU solver's boundary
  behavior, GPU_kernel.cu:1048-1084): the 1D operator tridiag(-1, 2, -1)
  with zero ghosts has eigenvectors sin(pi (i+1)(k+1)/(n+1)) (DST-I) and
  eigenvalues 2 - 2 cos(pi (k+1)/(n+1)).
* bc='neumann' (edge-replicated ghosts — the closed box, incl. the 2D
  PURE_NEUMANN nullspace handling of AlgebraicMultigrid.h:376-413): the
  1D operator with neighbor-count diagonal has eigenvectors
  cos(pi k (i+0.5)/n) (DCT-II) and eigenvalues 2 - 2 cos(pi k/n). The
  k=0 nullspace mode is projected out — exactly the reference's
  mean-subtraction, performed in the eigenbasis.

The transforms are dense (n, n) matrices applied per axis — six matmuls
for a 3D volume, ~50 GFLOP at 256^3, which the MXU executes in a couple
of milliseconds where the 7-9-iteration MG-PCG spends ~40 ms of
VPU/HBM-bound work. The solve is DIRECT: measured relative residuals are
~1e-6 (f32 transforms at HIGHEST matmul precision), strictly tighter
than the reference's 1e-4 (GPU) / 1e-6 (CPU) iterative exits.

This replaces nothing semantically: masked/voxelized-boundary domains
(project_masked_3d) keep the MG-PCG — the spectral operator only matches
the full-box stencil. The gate is config.use_spectral_poisson()
(GFS_SPECTRAL, default: on for TPU backends, off on CPU, mirroring the
fast-interp policy).

Design notes: the transform matrices are built in HOST numpy — device-
array constants closed over by a jitted step cost ~7 s EACH to lower
through the TPU tunnel (see MGContext.__init__). Eigenvalues stay 1D per
axis and broadcast-add in-trace, so no O(volume) constant is embedded.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def _dst1(n: int):
    """DST-I pair for the Dirichlet (zero-ghost) 1D operator.

    fwd[k, i] = sin(pi (i+1)(k+1)/(n+1));  S S = (n+1)/2 I, S symmetric,
    so inv = S * 2/(n+1). Eigenvalues lam[k] = 2 - 2 cos(pi (k+1)/(n+1))."""
    i = np.arange(n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)
    S = np.sin(np.pi * np.outer(k + 1, i + 1) / (n + 1))
    lam = 2.0 - 2.0 * np.cos(np.pi * (k + 1) / (n + 1))
    fwd = S.astype(np.float32)
    inv = (S.T * (2.0 / (n + 1))).astype(np.float32)
    return fwd, inv, lam.astype(np.float32)


def _dct2(n: int):
    """DCT-II pair for the Neumann (edge-replicated) 1D operator.

    fwd[k, i] = cos(pi k (i+0.5)/n); inverse weights w_0 = 1/n, w_k = 2/n.
    Eigenvalues lam[k] = 2 - 2 cos(pi k/n); lam[0] = 0 is the nullspace."""
    i = np.arange(n, dtype=np.float64)
    k = np.arange(n, dtype=np.float64)
    C = np.cos(np.pi * np.outer(k, i + 0.5) / n)
    lam = 2.0 - 2.0 * np.cos(np.pi * k / n)
    w = np.full(n, 2.0 / n)
    w[0] = 1.0 / n
    fwd = C.astype(np.float32)
    inv = (C.T * w[None, :]).astype(np.float32)
    return fwd, inv, lam.astype(np.float32)


def _apply_axis(m, x, axis):
    """Contract matrix m (out, in) against x's `axis` — one MXU matmul."""
    t = jnp.tensordot(m, x, axes=((1,), (axis,)),
                      precision=lax.Precision.HIGHEST)
    return jnp.moveaxis(t, 0, axis)


class SpectralContext:
    """Per-shape/bc transform matrices + eigenvalues (all host numpy)."""

    def __init__(self, shape, bc: str):
        if bc not in ("dirichlet", "neumann"):
            raise ValueError(f"spectral solver: unknown bc {bc!r}")
        self.shape = tuple(int(n) for n in shape)
        self.bc = bc
        make = _dst1 if bc == "dirichlet" else _dct2
        mats = [make(n) for n in self.shape]
        self.fwd = [m[0] for m in mats]
        self.inv = [m[1] for m in mats]
        self.lam = [m[2] for m in mats]

    def solve(self, b):
        """Direct solve of L p = b (ops.poisson.laplacian's L).

        For 'neumann' the rhs nullspace component (its mean) is projected
        out in the eigenbasis — the result is the exact mean-free solution
        of the compatible system, matching mgpcg's mean-subtraction."""
        nd = b.ndim
        assert nd == len(self.shape)
        t = b
        for ax in range(nd):
            t = _apply_axis(self.fwd[ax], t, ax)
        lam = jnp.zeros((), jnp.float32)
        for ax, l1 in enumerate(self.lam):
            bshape = [1] * nd
            bshape[ax] = len(l1)
            lam = lam + jnp.asarray(l1).reshape(bshape)
        # zero-mode guard: for pure Neumann lam == 0 only at the all-zero
        # mode (the pressure nullspace); Dirichlet lam is bounded below
        t = jnp.where(lam > 1e-12, t / jnp.maximum(lam, 1e-30), 0.0)
        for ax in range(nd):
            t = _apply_axis(self.inv[ax], t, ax)
        return t


@functools.lru_cache(maxsize=64)
def get_context(shape, bc: str) -> SpectralContext:
    """Cached per-(shape, bc) context (host matrices; trivial to build)."""
    return SpectralContext(shape, bc)
