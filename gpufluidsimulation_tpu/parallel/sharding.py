"""Multi-chip scaling over a jax Mesh — a NEW capability (the reference is
single-process single-GPU; its only 'communication backend' is the
cudaMemcpy staging fabric, GPU_Advection.h:249-326, cf. SURVEY.md §2.9).

Design: 1D mesh over axis 'z'; every simulation field is sharded along its
last (k) grid axis. Stencil ops then need a 1-2 cell halo along z, and
semi-Lagrangian gathers reach at most CFL-bounded distances. Two layers:

* GSPMD path (`sharded_step`): jit the unmodified step with sharded inputs;
  XLA inserts collectives for stencils (collective-permute halos) and
  gathers (all-gathers where displacement is unbounded). Correct everywhere,
  used by the driver dry-run.
* shard_map path (`halo.py`, `halo_exchange` + `laplacian_sharded`): explicit
  ppermute halo exchange for the Poisson smoother — the bandwidth-critical
  inner loop — so the hot path rides ICI with 1-cell halos instead of
  all-gathers.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int, axis: str = "z") -> Mesh:
    avail = jax.devices()
    if len(avail) < n_devices:
        raise RuntimeError(
            f"make_mesh: {n_devices} devices requested but only "
            f"{len(avail)} visible ({avail[0].platform} backend)"
        )
    return Mesh(np.array(avail[:n_devices]), (axis,))


def _spec_for(x, n_devices, axis_name="z"):
    if not hasattr(x, "ndim") or x.ndim < 3:
        return P()  # scalars / small arrays replicated
    # shard the innermost grid axis whose extent divides the mesh: staggered
    # fields carry one extra face plane (e.g. w is (ni,nj,nk+1)), so fall
    # back to the next axis for those (GSPMD reshards at op boundaries)
    spec = [None] * x.ndim
    for axis in range(x.ndim - 1, 0, -1):
        if x.shape[axis] % n_devices == 0:
            spec[axis] = axis_name
            break
    return P(*spec)


def shard_state(state, mesh: Mesh):
    """device_put every leaf with its z-sharding (fields) or replicated."""

    n = mesh.size

    def put(x):
        return jax.device_put(x, NamedSharding(mesh, _spec_for(x, n)))

    return jax.tree.map(put, state)


class ShardedMGContext:
    """MGContext whose fine-level smoothing rides explicit ppermute halos
    (parallel/halo.jacobi_smooth_sharded) instead of whatever collectives
    GSPMD picks for the pad/slice stencil — the bandwidth-critical inner
    loop of the projection stays neighbor-only on ICI. Levels whose z
    extent no longer divides the mesh fall back to the GSPMD form (they
    are tiny)."""

    def __init__(self, shape, bc, mesh: Mesh):
        from gpufluidsimulation_tpu.ops import poisson

        self._base = poisson.MGContext(shape, bc)
        self.bc = self._base.bc
        self.shapes = self._base.shapes
        self.diags = self._base.diags
        self.mesh = mesh

    def _smooth(self, x, b, level, iters, omega, reverse=False):
        # `reverse` (black-then-red post sweeps) is an RBGS ordering knob;
        # the sharded smoother is damped Jacobi, which is symmetric — the
        # flag is accepted for interface parity and has nothing to do
        del reverse
        from gpufluidsimulation_tpu.ops import poisson
        from gpufluidsimulation_tpu.parallel import halo

        if x is None:  # pre-smoother's statically-zero initial guess
            x = jnp.zeros_like(b)
        nz = self.shapes[level][2]
        if nz % self.mesh.size == 0 and nz // self.mesh.size >= 2:
            return halo.jacobi_smooth_sharded(
                x, b, self.mesh, self.bc, self.diags[level], iters, omega
            )
        return poisson.jacobi_smooth(
            x, b, self.bc, self.diags[level], iters, omega
        )

    def v_cycle(self, r, level=0, n_pre=2, n_post=2, n_coarse=40, omega=0.8):
        from gpufluidsimulation_tpu.ops import poisson

        return poisson.MGContext.v_cycle(
            self, r, level, n_pre, n_post, n_coarse, omega
        )


def sharded_step(solver, mesh: Mesh, halo_smoother: bool = True,
                 fast_sampling: bool | None = None, halo: int = 8):
    """Jit the full solver step with in/out shardings pinned to the mesh.

    With halo_smoother=True (default) the projection's MG smoothing runs
    through the shard_map ppermute-halo path (ShardedMGContext); otherwise
    the unmodified step is jitted and GSPMD chooses all collectives.

    fast_sampling routes the BiMocq pull-back samplers through the
    shard_map windowed-DMA path (parallel/sharded_interp.py): each device
    runs the single-chip Pallas window kernels on its halo-extended slab,
    with only `halo` z-planes crossing the interconnect. Default (None):
    on for accelerator backends, off on CPU — mirroring the single-chip
    fast-interp auto mode. Everything else (traces, DMC, projection
    stencils) stays on exact/GSPMD paths."""
    from functools import partial

    import jax as _jax

    from gpufluidsimulation_tpu.solvers import smoke3d

    step_fn = smoke3d._STEPS[solver.cfg.scheme]
    ctx = solver.ctx
    if halo_smoother:
        ctx = ShardedMGContext(solver.grid.shape_c, solver.cfg.bc, mesh)
    if fast_sampling is None:
        fast_sampling = _jax.default_backend() not in ("cpu",)

    from gpufluidsimulation_tpu import config

    # scoped engine mode (no process-global mutation): single-chip Pallas
    # fast-interp OFF — sampling either rides the shard_map halo path or
    # exact gathers; () force-disables sharded sampling within the scope
    mode = dataclasses.replace(
        solver.cfg.engine_mode or config.EngineMode(),
        fast_interp=False,
        sharded_sampling=(mesh, halo) if fast_sampling else (),
    )

    def fn(state):
        with config.engine_mode_scope(mode):
            return step_fn(solver.cfg, solver.grid, ctx, state)

    example = solver.init_state()
    shardings = jax.tree.map(
        lambda x: NamedSharding(mesh, _spec_for(x, mesh.size)), example
    )
    return jax.jit(fn, in_shardings=(shardings,), out_shardings=shardings)
