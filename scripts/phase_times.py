"""Per-phase wall times of the 256^3 BiMocq step: each phase jitted and
timed standalone (block_until_ready over several reps). Complements
scripts/profile_step.py when while-loop bodies hide inside single trace
events."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    ms = (time.time() - t0) / reps * 1e3
    print(f"{ms:9.2f} ms  {name}", flush=True)
    return out


def main(n=256):
    from bench import build
    from gpufluidsimulation_tpu.bimocq import mapping as mp
    from gpufluidsimulation_tpu.ops import advect, forces, poisson
    from gpufluidsimulation_tpu.core import interp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    solver = build(n)
    g = solver.grid
    cfg = solver.cfg
    s = solver.init_state()
    s = solver.step(s)  # warm state with real flow
    s = solver.step(s)
    jax.block_until_ready(s.u)
    dt = cfg.dt
    maxvel = float(jnp.max(jnp.abs(s.u)))
    cfldt = g.h / max(maxvel, 1e-6)

    um = jax.jit(lambda st: mp.update_mapping_3d(
        st.vel_map, g, st.u, st.v, st.w, g.h / jnp.maximum(
            jnp.max(jnp.abs(st.u)), 1e-6), dt))
    vel_map = timeit("update_mapping (DMC backward + forward trace)", um, s)

    bwd_only = jax.jit(lambda st: advect.update_backward_map_3d(
        g, st.u, st.v, st.w,
        (st.vel_map.bwd[0], st.vel_map.bwd[1], st.vel_map.bwd[2]),
        cfldt, dt))
    timeit("  backward map (DMC substeps)", bwd_only, s)

    fwd_only = jax.jit(lambda st: advect.update_forward_map_3d(
        g, st.u, st.v, st.w,
        (st.vel_map.fwd[0], st.vel_map.fwd[1], st.vel_map.fwd[2]),
        cfldt, dt))
    timeit("  forward map (fused RK3 trace)", fwd_only, s)

    # mirror the solver's own level-2 logic (solvers/smoke3d.py): at the
    # default blend_coeff==1.0 the level-2 pull-back is statically dead —
    # blend=None marks it, prev buffers are elided (None) in the dieted
    # state. Passing a live blend here would crash on the None prevs AND
    # time a path the solver never runs.
    blend = None if cfg.blend_coeff == 1.0 else jnp.float32(cfg.blend_coeff)

    def adv_kind(kind, cur, init, prev, vm):
        if blend is None:
            prev = [None] * len(cur)
        return mp.bimocq_advect_3d(g, kind, cur, init, prev,
                                   vm.bwd, vm.bwd_prev, vm.fwd, blend)

    av = jax.jit(lambda st, vm: adv_kind("u", [st.u], [st.u_init], [st.u_prev], vm))
    timeit("bimocq_advect u", av, s, vel_map)
    av2 = jax.jit(lambda st, vm: adv_kind("v", [st.v], [st.v_init], [st.v_prev], vm))
    timeit("bimocq_advect v", av2, s, vel_map)
    av4 = jax.jit(lambda st, vm: adv_kind(
        "c", [st.rho, st.T], [st.rho_init, st.T_init], [st.rho_prev, st.T_prev], vm))
    timeit("bimocq_advect c (rho+T)", av4, s, vel_map)

    diff = jax.jit(lambda st: forces.diffuse_3d(
        st.u, 20, cfg.viscosity * dt / (g.h * g.h)))
    timeit("diffuse u (20-iter jacobi)", diff, s)

    proj = jax.jit(lambda st: poisson.project_3d(
        st.u, st.v, st.w, solver.ctx, cfg.proj_tol, cfg.proj_max_iters))
    timeit("projection", proj, s)

    acc = jax.jit(lambda st, vm: mp.accumulate_multi_3d(
        g, "u", [(st.u_init, [(st.u, 1.0), (st.u * 0.5, 2.0)])], vm.fwd))
    timeit("accumulate u (2 changes)", acc, s, vel_map)

    from gpufluidsimulation_tpu.solvers import smoke3d as s3
    ovf = jax.jit(lambda st, vm: s3._interp_overflow_check(g, vm))
    timeit("interp_overflow_check", ovf, s, vel_map)

    pref = jax.jit(lambda st: mp.volume_prefilter_3d(st.rho))
    timeit("volume_prefilter (1 field)", pref, s)

    # non-donating wrapper: solver.step donates its argument, so repeated
    # timeit calls with the same state would hit deleted buffers on TPU
    full = jax.jit(lambda st: solver.step(st))
    timeit("FULL STEP", full, s)


if __name__ == "__main__":
    main(int(os.environ.get("PROF_N", "256")))
