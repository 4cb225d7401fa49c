"""Full-step fidelity acceptance tests: engine vs the independent NumPy
oracle (tests/oracle3d.py) of the 3D BiMocq frame.

Three layers (BASELINE.md: density L-inf <= 1e-3 after 100 steps):

1. `test_bimocq_matches_oracle_strict` — the vortex-collision scene with its
   discontinuous emitters, compared per-step at tight bounds for 6 steps.
   Any semantic drift (band guard off by one, wrong blend order, wrong
   reinit rotation) shows up here at >1e-2 immediately; the residual
   tolerance absorbs only f32 op-ordering noise amplified at the emitter's
   density discontinuity (verified: the backward maps agree to 0.0 ulps and
   the error support is the emitter shell).
2. `test_bimocq_smooth_100steps` — smooth initial data (no emitters, no
   discontinuities), 100 full steps, density L-inf <= 1e-3: rounding noise
   stays linear without a discontinuity to amplify it, so this holds the
   BASELINE bar over the full horizon.
3. `test_fast_interp_matches_exact_end_to_end` — the windowed-DMA fast
   interpolation path (interpret mode on CPU) vs the exact gather path
   over full steps at the prefilter mode's documented accuracy model
   (O(h^2) on smooth fields, ~1-2% at discontinuities), plus
   `test_volume_exact_mode_matches_gathers` pinning the GFS_VOLUME_EXACT
   strict-parity path against gathers.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.scenes.scenes3d import vortex_collision_config
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke3d import Emitter3D, Smoke3D

import tests.oracle3d as oc


def _build(n, dt_scale=0.025, with_emitters=True, proj_tol=1e-8):
    emitters = (
        Emitter3D(center=(0.04, 0.10, 0.10), radius=0.015, sign=1.0),
        Emitter3D(center=(0.16, 0.101, 0.10), radius=0.015, sign=-1.0),
    ) if with_emitters else ()
    cfg = vortex_collision_config(
        ni=n, nj=n, nk=n, scheme=Scheme.BIMOCQ, dt=8.0 / n * dt_scale,
        emitters=emitters, proj_tol=proj_tol, proj_max_iters=400,
        viscosity=1e-6,
    )
    solver = Smoke3D(cfg)
    ocfg = dict(
        dt=cfg.dt, blend_coeff=cfg.blend_coeff, alpha=cfg.alpha,
        beta=cfg.beta, viscosity=cfg.viscosity,
        vel_reinit_gap=cfg.vel_reinit_gap,
        scalar_reinit_gap=cfg.scalar_reinit_gap,
        emitters=[
            dict(center=e.center, radius=e.radius, sign=e.sign,
                 density=e.density, temperature=e.temperature,
                 emit_frames=e.emit_frames)
            for e in cfg.emitters
        ],
    )
    ogrid = oc.OGrid(n, n, n, cfg.h)
    return solver, ocfg, ogrid


def _linf(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())


def test_bimocq_matches_oracle_strict():
    config.set_fast_interp(False)
    try:
        n = 32
        solver, ocfg, og = _build(n)
        state = solver.init_state()
        ostate = oc.make_state(og)
        # tolerances grow with the f32 noise amplification at the emitter
        # edge (measured growth ~4x/step); semantics bugs overshoot these
        # by orders of magnitude
        rho_tol = [1e-6, 5e-4, 1e-3, 2e-3, 4e-3, 8e-3]
        ostates = oc.cached_trajectory(ocfg, og, ostate, 6, "strict32")
        for step in range(6):
            state = solver.step(state)
            ostate = ostates[step]
            # the maps are smooth — they must agree essentially exactly
            assert _linf(state.vel_map.bwd[0], ostate["vel_bwd"][0]) < 1e-5
            # under reinit='always' + blend==1.0 the level-2 tier is
            # statically dead and ELIDED from the state (smoke3d._aux_dead)
            assert state.vel_map.bwd_prev is None
            assert state.u_prev is None and state.rho_prev is None
            assert state.scalar_map.fwd is None
            assert _linf(state.rho, ostate["rho"]) < rho_tol[step], step
            assert _linf(state.u, ostate["u"]) < rho_tol[step], step
            assert _linf(state.rho_init, ostate["rho_init"]) < rho_tol[step]
            # u_prev is intentionally NOT asserted here: with the scene's
            # blend_coeff == 1.0 the prev buffers are zero-weighted forever
            # and the solver statically skips the accumulates that would
            # refresh them (smoke3d accum_dead); live-prev semantics are
            # covered by test_bimocq_prev_buffers_live_when_blended below.
    finally:
        config.set_fast_interp(None)


def test_bimocq_prev_buffers_live_when_blended():
    """With blend_coeff < 1 the two-level machinery is live: prev buffers
    and the blended fields must still track the oracle (guards the static
    dead-stage elimination against over-pruning)."""
    config.set_fast_interp(False)
    try:
        n = 16
        solver, ocfg, og = _build(n)
        cfg = dataclasses.replace(solver.cfg, blend_coeff=0.5)
        solver = Smoke3D(cfg)
        ocfg["blend_coeff"] = 0.5
        state = solver.init_state()
        ostate = oc.make_state(og)
        tol = [1e-6, 5e-4, 1e-3, 2e-3]
        for step in range(4):
            state = solver.step(state)
            ostate = oc.step_bimocq(ocfg, og, ostate)
            assert _linf(state.rho, ostate["rho"]) < tol[step], step
            assert _linf(state.u, ostate["u"]) < tol[step], step
            assert _linf(state.u_prev, ostate["u_prev"]) < tol[step], step
            assert _linf(state.rho_prev, ostate["rho_prev"]) < tol[step], step
    finally:
        config.set_fast_interp(None)


def _smooth_fields(grid: oc.OGrid):
    """Smooth solenoidal-ish velocity + Gaussian density, f32."""
    F = np.float32
    h = F(grid.h)
    L = grid.ni * h

    def coords(kind):
        return oc.OGrid.node_coords(grid, kind)

    k = F(2 * np.pi / L)
    xu, yu, zu = coords("u")
    u = (0.05 * np.sin(k * xu) * np.cos(k * yu) * np.cos(k * zu)).astype(F)
    xv, yv, zv = coords("v")
    v = (-0.05 * np.cos(k * xv) * np.sin(k * yv) * np.cos(k * zv)).astype(F)
    xw, yw, zw = coords("w")
    w = (0.02 * np.cos(k * xw) * np.cos(k * yw) * np.sin(k * zw)).astype(F)
    xc, yc, zc = coords("c")
    c0 = F(0.5) * L
    r2 = (xc - c0) ** 2 + (yc - c0) ** 2 + (zc - c0) ** 2
    rho = np.exp(-r2 / F((0.2 * L) ** 2)).astype(F)
    return u, v, w, rho


@pytest.mark.slow
def test_bimocq_smooth_100steps():
    config.set_fast_interp(False)
    try:
        n = 24
        solver, ocfg, og = _build(n, with_emitters=False)
        u, v, w, rho = _smooth_fields(og)
        state = solver.init_state()
        state = state.replace(
            u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w),
            rho=jnp.asarray(rho), rho_init=jnp.asarray(rho),
            u_init=jnp.asarray(u), v_init=jnp.asarray(v), w_init=jnp.asarray(w),
        )
        ostate = oc.make_state(og)
        ostate["u"], ostate["v"], ostate["w"] = u.copy(), v.copy(), w.copy()
        ostate["rho"] = rho.copy()
        ostate["rho_init"] = rho.copy()
        ostate["u_init"], ostate["v_init"], ostate["w_init"] = (
            u.copy(), v.copy(), w.copy())
        ostate = oc.cached_trajectory(
            ocfg, og, ostate, 100, "smooth100", keep="final")[-1]
        for _ in range(100):
            state = solver.step(state)
        err = _linf(state.rho, ostate["rho"])
        assert err <= 1e-3, f"density L-inf after 100 steps: {err}"
        err_u = _linf(state.u, ostate["u"])
        assert err_u <= 1e-3, f"u L-inf after 100 steps: {err_u}"
    finally:
        config.set_fast_interp(None)


@pytest.mark.slow
def test_fast_interp_matches_exact_end_to_end():
    """Fast windowed-DMA interpolation vs exact gathers over full steps.

    Under the default env the fast path runs the DUAL volume mode (the
    production default since round 4 — mapping._volume_mode), whose
    accuracy model vs the exact 9-position composition is: post-map
    corners with the map Jacobian taken as identity, so the residual is
    the corners-through-the-map term — zero where the map is locally
    affine, largest at sharp density edges. Two regimes, bounds set from
    measured errors at this 16^3/8-step configuration (round-5 sweep:
    smooth rho 2.7e-3 / u 8.9e-5; emitter rho 1.6e-2 / u 1.2e-4):
    * smooth fields — bound 4e-3 (rho), 5e-4 (u): velocity is essentially
      exact (the dual form IS the exact separable corner average when
      J = I), density carries the small J != I residual;
    * emitter scene (density discontinuities) — the documented ~1-2%
      edge-class residual; bound 2.2e-2. Exact composition parity on the
      fast path is available via GFS_VOLUME_VOL9=1 / GFS_VOLUME_EXACT
      (test_volume_exact_mode_matches_gathers covers the machinery).

    Runs the Pallas kernels in interpreter mode (no TPU in CI) at Rr=1 and
    16^3 — interpret-mode compilation of the window kernels dominates the
    cost, so the grid is kept minimal; the TPU-native path at production Rr
    is exercised by bench.py and scripts/validate_fast_vs_exact.py."""
    n = 16
    steps = 8
    old_rr = config.interp_rr()

    def run(fast: bool, emitters: bool):
        config.set_fast_interp(fast)
        config.set_interp_interpret(fast)  # no TPU in CI — interpret mode
        config.set_interp_rr(1)
        try:
            solver, _, og = _build(n, proj_tol=1e-6, with_emitters=emitters)
            state = solver.init_state()
            if not emitters:
                u, v, w, rho = _smooth_fields(og)
                state = state.replace(
                    u=jnp.asarray(u), v=jnp.asarray(v), w=jnp.asarray(w),
                    rho=jnp.asarray(rho), rho_init=jnp.asarray(rho),
                    u_init=jnp.asarray(u), v_init=jnp.asarray(v),
                    w_init=jnp.asarray(w),
                )
            for _ in range(steps):
                state = solver.step(state)
            return (np.asarray(state.rho), np.asarray(state.u),
                    int(state.interp_overflow))
        finally:
            config.set_fast_interp(None)
            config.set_interp_interpret(False)
            config.set_interp_rr(old_rr)

    # smooth fields: the dual J != I residual at 16^3 (measured 2.7e-3 /
    # 8.9e-5)
    rho_e, u_e, _ = run(False, emitters=False)
    rho_f, u_f, overflow = run(True, emitters=False)
    assert overflow == 0  # the bounded-displacement contract held
    assert float(np.abs(rho_f - rho_e).max()) <= 4e-3
    assert float(np.abs(u_f - u_e).max()) <= 5e-4

    # discontinuous emitter scene: the dual edge-class residual
    # (measured 1.6e-2)
    rho_e, u_e, _ = run(False, emitters=True)
    rho_f, u_f, overflow = run(True, emitters=True)
    assert overflow == 0
    assert float(np.abs(rho_f - rho_e).max()) <= 2.2e-2


def test_volume_exact_mode_matches_gathers():
    """GFS_VOLUME_EXACT fast path: the 9-offset windowed evaluation must
    reproduce the exact-gather volume composition tightly (no prefilter
    approximation), single op at 16^3."""
    from gpufluidsimulation_tpu.core.grids import Grid3D
    from gpufluidsimulation_tpu.bimocq import mapping as mp

    n = 16
    g = Grid3D(n, n, n, 0.2 / n)
    rng = np.random.default_rng(3)
    field = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    cur = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    x, y, z = g.node_coords("c")
    wob = 0.3 * g.h * jnp.sin(x / 0.05) * jnp.cos(z / 0.07)
    bwd = jnp.stack([x + wob, y, z - 0.5 * wob])

    config.set_fast_interp(False)
    want = mp.advect_with_map_3d(g, "c", cur, field, bwd)
    config.set_fast_interp(True)
    config.set_interp_interpret(True)
    config.set_volume_exact(True)
    try:
        got = mp.advect_with_map_3d(g, "c", cur, field, bwd)
    finally:
        config.set_fast_interp(None)
        config.set_interp_interpret(False)
        config.set_volume_exact(False)
    assert float(jnp.abs(want - got).max()) < 5e-4


def test_interp_overflow_flags_violent_flow():
    """Runtime enforcement of the fast-interp contract: a violent flow
    (huge dt -> large in-block displacement variation) must be flagged by
    the interp_overflow diagnostic (VERDICT round-1 item 5)."""
    from gpufluidsimulation_tpu.core.grids import Grid3D
    from gpufluidsimulation_tpu.bimocq import mapping as mp
    from gpufluidsimulation_tpu.solvers.smoke3d import _interp_overflow_check

    config.set_fast_interp(True)
    config.set_interp_interpret(True)
    try:
        n = 16
        g = Grid3D(n, n, n, 0.2 / n)
        # a backward map with violent in-block variation: alternating
        # +-4-cell displacement breaks the Rr=2 residual budget
        x, y, z = g.node_coords("c")
        wiggle = 4.0 * g.h * jnp.asarray(
            np.random.default_rng(0).choice([-1.0, 1.0], size=(n, n, n)),
            jnp.float32)
        bad = mp.MappingState(
            fwd=jnp.stack([x, y, z]),
            bwd=jnp.stack([x + wiggle, y, z]),
            bwd_prev=jnp.stack([x, y, z]),
            reinit_count=jnp.int32(1),
        )
        ov = int(_interp_overflow_check(g, bad))
        assert ov > 0
        good = mp.MappingState(
            fwd=jnp.stack([x, y, z]), bwd=jnp.stack([x, y, z]),
            bwd_prev=jnp.stack([x, y, z]), reinit_count=jnp.int32(1))
        assert int(_interp_overflow_check(g, good)) == 0

        # the free launch-level monitor (interp_fast.overflow_sink) flags
        # the same map when it is actually sampled through the pull-back
        from gpufluidsimulation_tpu.ops import interp_fast

        field = jnp.zeros(g.shape_c, jnp.float32)
        for m, expect_bad in ((bad, True), (good, False)):
            pos = mp.map_at_lattice_3d(g, m.bwd, "c", 1.0, 1.0)
            with interp_fast.overflow_sink() as counts:
                mp._sample_fields_at(g, "c", [field], pos)
            assert counts, "fast path did not report a launch count"
            assert (int(sum(counts)) > 0) == expect_bad
    finally:
        config.set_fast_interp(None)
        config.set_interp_interpret(False)


def test_2d_step_fast_matches_exact():
    """The lifted 2D windowed path (interp_fast.sample2_fast/mac2_fast,
    wired through sample2_lattice/mac_velocity_2d_lattice): a few BiMocq
    steps on the Taylor-vortex scene must track the exact-gather step
    (the 2D step was scalar-core gather-bound on TPU before the lift)."""
    from gpufluidsimulation_tpu.scenes import scenes2d
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D, Smoke2DConfig
    import math

    cfg = Smoke2DConfig(ni=64, nj=64, L=2 * math.pi, scheme=Scheme.BIMOCQ,
                        blend_coeff=1.0, pure_neumann=False)
    solver = Smoke2D(cfg)
    st0 = solver.init_state()
    st0 = scenes2d.init_taylor_vortex(solver, st0, 0.81)[0]
    st0 = jax.tree.map(np.asarray, st0)   # host copy: step donates buffers
    dt = 0.025

    sa = jax.tree.map(jnp.asarray, st0)
    for _ in range(3):
        sa = solver.step(sa, dt)

    config.set_fast_interp(True)
    config.set_interp_interpret(True)
    try:
        sb = jax.tree.map(jnp.asarray, st0)
        for _ in range(3):
            sb = solver.step(sb, dt)
    finally:
        config.set_fast_interp(None)
        config.set_interp_interpret(False)

    ua, ub = np.asarray(sa.u), np.asarray(sb.u)
    assert np.isfinite(ub).all()
    np.testing.assert_allclose(ub, ua, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(sb.vel_map.bwd),
                               np.asarray(sa.vel_map.bwd),
                               rtol=1e-4, atol=1e-4)
