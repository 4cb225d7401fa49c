"""Micro-benchmark: volume_prefilter_3d forms at 256^3 on the TPU.

a) current separable pad+slice XLA passes
b) banded-matrix matmuls on the MXU (one dot_general per axis)
c) Pallas windowed kernel (interp_fast.volume_prefilter_fast)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def band_matrix(n):
    m = np.zeros((n, n), np.float32)
    for i in range(n):
        m[i, max(i - 1, 0)] += 0.125
        m[i, i] += 0.75
        m[i, min(i + 1, n - 1)] += 0.125
    return jnp.asarray(m)


def prefilter_mxu(f, Sx, Sy, Sz):
    t = jnp.einsum("xX,xyz->Xyz", Sx, f, preferred_element_type=jnp.float32)
    t = jnp.einsum("yY,xyz->xYz", Sy, t, preferred_element_type=jnp.float32)
    t = jnp.einsum("zZ,xyz->xyZ", Sz, t, preferred_element_type=jnp.float32)
    return 0.5 * f + 0.5 * t


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{(time.time()-t0)/reps*1e3:8.3f} ms  {name}", flush=True)
    return out


def main(n=256):
    from gpufluidsimulation_tpu.bimocq import mapping as mp
    from gpufluidsimulation_tpu.ops import interp_fast

    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (n, n, n), jnp.float32)
    Sx = band_matrix(n)

    a = timeit("separable pad+slice (current)",
               jax.jit(mp.volume_prefilter_3d), f)
    b = timeit("banded matmul (MXU)",
               jax.jit(lambda x: prefilter_mxu(x, Sx, Sx, Sx)), f)
    c = timeit("Pallas windowed kernel",
               jax.jit(interp_fast.volume_prefilter_fast), f)
    print("max |a-b| =", float(jnp.max(jnp.abs(a - b))))
    print("max |a-c| =", float(jnp.max(jnp.abs(a - c))))


if __name__ == "__main__":
    main(int(os.environ.get("N", "256")))
