"""On-device validation: the fast (windowed-kernel + source-prefilter) path
vs the exact gather path, full BiMocq steps at 32^3.

The BASELINE.md fidelity bar is density L-inf <= 1e-3 after 100 steps of f32
physics; this script reports the L-inf drift between the two interpolation
backends over N steps on whatever backend is active (TPU by default).

Usage: python scripts/validate_fast_vs_exact.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.scenes.scenes3d import vortex_collision_config
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke3d import Emitter3D, Smoke3D


def run(steps, fast):
    config.set_fast_interp(fast)
    try:
        cfg = vortex_collision_config(
            ni=32, nj=32, nk=32, scheme=Scheme.BIMOCQ, dt=8.0 / 32,
            emitters=(
                Emitter3D(center=(0.04, 0.10, 0.10), radius=0.03, sign=1.0),
                Emitter3D(center=(0.16, 0.101, 0.10), radius=0.03, sign=-1.0),
            ),
            viscosity=1e-6, proj_tol=1e-5, proj_max_iters=80,
        )
        solver = Smoke3D(cfg)
        s = solver.init_state()
        for _ in range(steps):
            s = solver.step(s)
        return np.asarray(s.rho), np.asarray(s.u)
    finally:
        config.set_fast_interp(None)


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rho_fast, u_fast = run(steps, True)
    rho_exact, u_exact = run(steps, False)
    dr = np.abs(rho_fast - rho_exact).max()
    du = np.abs(u_fast - u_exact).max()
    umax = max(np.abs(u_exact).max(), 1e-9)
    print(f"steps={steps}  density Linf drift={dr:.4e}  "
          f"velocity Linf drift={du:.4e} (rel {du/umax:.3e})")
    print("PASS" if dr <= 1e-3 else "FAIL: drift above the 1e-3 acceptance bound")


if __name__ == "__main__":
    main()
