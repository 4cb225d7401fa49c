"""Micro-bench: ppermute-halo Jacobi smoothing vs naive GSPMD smoothing on
a virtual CPU mesh — the bandwidth-critical inner loop of the sharded
projection (parallel/halo.py vs letting GSPMD partition ops/poisson's
pad/slice stencil).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/bench_sharding.py [--n 128] [--devices 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=96)
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax._src.xla_bridge as _xb

    if _xb.backends_are_initialized():
        _xb._clear_backends()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpufluidsimulation_tpu.ops import poisson
    from gpufluidsimulation_tpu.parallel import halo
    from gpufluidsimulation_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(args.devices)
    shape = (args.n, args.n, args.n)
    rng = np.random.default_rng(0)
    sharding = NamedSharding(mesh, P(None, None, "z"))
    b = jax.device_put(rng.standard_normal(shape).astype(np.float32), sharding)
    x = jax.device_put(np.zeros(shape, np.float32), sharding)
    diag = jax.device_put(np.asarray(poisson._diag(shape, "dirichlet")),
                          sharding)

    gspmd = jax.jit(
        lambda x, b, d: poisson.jacobi_smooth(x, b, "dirichlet", d, args.iters),
        in_shardings=(sharding,) * 3, out_shardings=sharding,
    )
    halo_fn = jax.jit(
        lambda x, b, d: halo.jacobi_smooth_sharded(
            x, b, mesh, "dirichlet", d, args.iters),
        in_shardings=(sharding,) * 3, out_shardings=sharding,
    )

    def bench(f, name):
        out = f(x, b, diag)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(args.reps):
            out = f(x, b, diag)
        jax.block_until_ready(out)
        ms = (time.time() - t0) / args.reps * 1e3
        print(f"{name:24s} {ms:8.2f} ms / {args.iters} sweeps")
        return ms, out

    ms_g, out_g = bench(gspmd, "GSPMD jacobi")
    ms_h, out_h = bench(halo_fn, "ppermute-halo jacobi")
    err = float(jnp.abs(out_g - out_h).max())
    print(f"max |diff| = {err:.2e}   speedup halo vs GSPMD: {ms_g / ms_h:.2f}x")


if __name__ == "__main__":
    main()
