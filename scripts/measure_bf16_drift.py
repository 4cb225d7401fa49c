"""Measure the end-to-end drift of the bf16-window knob (GFS_INTERP_BF16)
against the f32-window fast path on the real backend: same scene, N steps,
density/velocity L-inf deltas. Run on TPU; the knob is flipped in-process
(the jitted step retraces with the new window dtype)."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(n, steps, bf16):
    from gpufluidsimulation_tpu import config
    from bench import build

    config.set_interp_bf16(bf16)
    solver = build(n)
    state = solver.init_state()
    state = solver.step(state)
    jax.block_until_ready(state.u)
    t0 = time.time()
    for _ in range(steps - 1):
        state = solver.step(state)
    jax.block_until_ready(state.u)
    ms = (time.time() - t0) / max(steps - 1, 1) * 1e3
    config.set_interp_bf16(False)
    return state, ms


def main(n=64, steps=40):
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    s32, ms32 = run(n, steps, False)
    s16, ms16 = run(n, steps, True)
    drho = float(jnp.max(jnp.abs(s32.rho - s16.rho)))
    du = float(jnp.max(jnp.abs(s32.u - s16.u)))
    rho_scale = float(jnp.max(jnp.abs(s32.rho)))
    print(f"{n}^3, {steps} steps: f32 {ms32:.1f} ms/step, bf16 {ms16:.1f} "
          f"ms/step")
    print(f"density L-inf drift {drho:.3e} (field max {rho_scale:.2f}), "
          f"u L-inf drift {du:.3e}")


if __name__ == "__main__":
    main(int(os.environ.get("N", "64")), int(os.environ.get("STEPS", "40")))
