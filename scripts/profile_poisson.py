"""Standalone timings of the 256^3 projection pieces: laplacian apply,
RBGS smooth launches, MG transfer einsums, one full V-cycle, dots, and the
whole mgpcg solve — to see where the ~10 ms/CG-iter goes vs the ~1.5 ms
HBM speed-of-light of its ~14 fine-level passes."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, reps=5):
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
    from gpufluidsimulation_tpu.ops import poisson
    from gpufluidsimulation_tpu.ops.pallas_kernels import rbgs_smooth

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass

    shape = (n, n, n)
    bc = "neumann"
    ctx = poisson.MGContext(shape, bc)
    key = jax.random.PRNGKey(0)
    b = jax.random.normal(key, shape, jnp.float32)
    b = b - jnp.mean(b)
    x = jnp.zeros_like(b)

    lap = jax.jit(lambda p: poisson.laplacian(p, bc))
    timeit("laplacian apply (fine)", lap, b)

    sm2 = jax.jit(lambda xx, bb: rbgs_smooth(xx, bb, bc=bc,
                                             iters=2))
    timeit("RBGS 2 sweeps (fine, 1 launch)", sm2, x, b)

    jac2 = jax.jit(lambda xx, bb: poisson.jacobi_smooth(xx, bb, bc,
                                                        ctx.diags[0], 2))
    timeit("XLA Jacobi 2 iters (fine)", jac2, x, b)

    rst = jax.jit(lambda r: poisson._apply_axis_mats(r, ctx.rmats[0]))
    rc = timeit("restrict einsum (fine->128^3)", rst, b)

    prl = jax.jit(lambda e: poisson._apply_axis_mats(e, ctx.pmats[0]))
    timeit("prolong einsum (128^3->fine)", prl, rc)

    vc = jax.jit(lambda r: ctx.v_cycle(r))
    timeit("full V-cycle", vc, b)

    vc1 = jax.jit(lambda r: ctx.v_cycle(r, level=1))
    timeit("V-cycle from level 1 (128^3)", vc1, rc)

    dot = jax.jit(lambda aa, bb: poisson._dot(aa, bb))
    timeit("dot (fine)", dot, b, b)

    slv = jax.jit(lambda bb: poisson.mgpcg(bb, ctx, tol=1e-4, max_iters=30))
    p, iters, res, _ = timeit("mgpcg to 1e-4", slv, b)
    print("iters", int(iters), "res", float(res))


if __name__ == "__main__":
    main(int(os.environ.get("PROF_N", "256")))
