"""Microbench the blocked Pallas viscosity Jacobi (jacobi_diffuse) at the
bench resolution: sweeps-per-launch / halo variants, per-staggered-shape.

Usage: python scripts/micro_diffuse.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.time() - t0) / reps * 1e3
    print(f"{ms:9.2f} ms  {name}", flush=True)
    return out


def main(n=256):
    from gpufluidsimulation_tpu.ops.pallas_kernels import jacobi_diffuse

    coef = 1e-6 * (8.0 / n) / (0.2 / n) ** 2
    for shape in ((n + 1, n, n), (n, n, n + 1)):
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        f = jax.jit(lambda x: jacobi_diffuse(x, x, iters=20, coef=coef))
        timeit(f"jacobi_diffuse 20it {shape}", f, x)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 256)
