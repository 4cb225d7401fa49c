"""Fidelity vs the ACTUAL reference binary (round-2 verdict Missing #1).

Builds and runs the UNMODIFIED reference 2D solver (BimocqSolver2D, via
scripts/refbaseline/main_dump.cpp) on a density-carrying example, dumps its
raw float32 u/v/rho at checkpoint frames, then marches OUR 2D solver on the
same scene/scheme and records L-inf / L1 difference curves — the first
fidelity artifact whose comparator is the reference binary itself rather
than our own NumPy oracle.

Examples: 2 = Rayleigh-Taylor (256x1280, dt=0.01, the reference's own
outputDensity scene, main.cpp:108-132); 0 = Taylor vortex (velocity only).

Usage: python scripts/fidelity_ref2d.py [--example 2] [--frames 100]
       [--modes exact,default] [--round 3]
Writes FIDELITY_REF2D_r{round}.json at the repo root.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
DUMP_FRAMES = (1, 2, 5, 10, 20, 50, 100)


def run_reference(example: int, frames: int, outdir: str):
    exe = "/tmp/refbaseline/ref2d_dump"
    if not os.path.exists(exe):
        subprocess.run(["bash", os.path.join(HERE, "refbaseline",
                                             "build_and_run.sh"), "7"],
                       check=True, capture_output=True)
    os.makedirs(outdir, exist_ok=True)
    t0 = time.time()
    subprocess.run([exe, "7", str(example), str(frames), outdir], check=True)
    print(f"reference binary: {frames} frames in {time.time()-t0:.0f} s",
          flush=True)


def load_ref(outdir: str, frame: int, shape):
    ni, nj = shape
    out = {}
    for name, sh in (("u", (ni + 1, nj)), ("v", (ni, nj + 1)),
                     ("rho", (ni, nj))):
        path = os.path.join(outdir, f"f{frame:04d}_{name}.bin")
        # reference Array2f is (i fastest) row-major over (j, i): a[j*ni+i]
        arr = np.fromfile(path, dtype=np.float32)
        out[name] = arr.reshape(sh[1], sh[0]).T
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--example", type=int, default=2, choices=[0, 2])
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--modes", default="exact,default")
    ap.add_argument("--round", type=int, default=3)
    ap.add_argument("--skip-reference", action="store_true",
                    help="reuse an existing dump directory")
    args = ap.parse_args()

    outdir = f"/tmp/refdump_ex{args.example}"
    if not args.skip_reference:
        run_reference(args.example, args.frames, outdir)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass
    import dataclasses as _dc

    import jax.numpy as jnp

    from gpufluidsimulation_tpu import config
    from gpufluidsimulation_tpu.scenes import scenes2d
    from gpufluidsimulation_tpu.solvers.smoke2d import Scheme, Smoke2D

    scene = scenes2d.make_scene_2d(args.example, Scheme.BIMOCQ)
    shape = (scene.cfg.ni, scene.cfg.nj)
    ref0 = load_ref(outdir, 0, shape)

    results = {}
    for mode_name in args.modes.split(","):
        emode = {
            "exact": config.EngineMode(fast_interp=False),
            "default": None,
        }[mode_name]
        cfg = scene.cfg
        if emode is not None:
            cfg = _dc.replace(cfg, engine_mode=emode)
        solver = Smoke2D(cfg)
        state = solver.init_state()
        state = scene.init(solver, state)
        # init parity gate: both engines must start from identical numbers
        init_err = max(
            float(np.abs(np.asarray(state.u) - ref0["u"]).max()),
            float(np.abs(np.asarray(state.v) - ref0["v"]).max()),
            float(np.abs(np.asarray(state.rho) - ref0["rho"]).max()),
        )
        print(f"[{mode_name}] init field L-inf vs reference: {init_err:.3e}",
              flush=True)
        curve = []
        t0 = time.time()
        for f in range(1, args.frames + 1):
            state = solver.step(state, jnp.float32(scene.dt))
            if f in DUMP_FRAMES and f <= args.frames:
                ref = load_ref(outdir, f, shape)
                u = np.asarray(state.u)
                rho = np.asarray(state.rho)
                rec = dict(
                    frame=f,
                    u_linf=float(np.abs(u - ref["u"]).max()),
                    u_l1=float(np.abs(u - ref["u"]).mean()),
                    rho_linf=float(np.abs(rho - ref["rho"]).max()),
                    rho_l1=float(np.abs(rho - ref["rho"]).mean()),
                    rho_scale=float(np.abs(ref["rho"]).max()),
                )
                curve.append(rec)
                print(f"[{mode_name}] frame {f:4d}: "
                      f"rho_linf {rec['rho_linf']:.3e} "
                      f"rho_l1 {rec['rho_l1']:.3e} "
                      f"u_linf {rec['u_linf']:.3e}", flush=True)
        results[mode_name] = dict(init_linf=init_err, curve=curve,
                                  seconds=time.time() - t0)

    out = dict(
        example=args.example,
        scene=scene.name,
        scheme="BIMOCQ",
        frames=args.frames,
        comparator="unmodified reference BimocqSolver2D binary "
                   "(scripts/refbaseline/main_dump.cpp)",
        bar=1e-3,
        results=results,
    )
    path = os.path.join(os.path.dirname(HERE),
                        f"FIDELITY_REF2D_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
