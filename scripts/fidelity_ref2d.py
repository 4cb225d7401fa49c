"""Fidelity vs the ACTUAL reference binary (round-2 Missing #1; round-4
Next #1 — well-posed comparisons).

Builds and runs the UNMODIFIED reference 2D solver (BimocqSolver2D, via
scripts/refbaseline/main_dump.cpp) on an example, dumps its raw float32
u/v/rho at checkpoint frames, then marches OUR 2D solver on the same
scene/scheme and records L-inf / L1 difference curves.

Examples (main.cpp:40-223):
  0 = Taylor vortex (velocity only)
  1 = vortex leapfrogging — adds a vortex-core count per side (the BiMocq
      paper's qualitative separation metric) from connected components of
      the node curl field
  2 = Rayleigh-Taylor (256x1280, dt=0.01) — CHAOTIC: an L-inf bar here
      measures decorrelation, not solver quality; pair with --noise-floor
  3 = Zalesak's disk (200^2, rigid rotation, levelset) — DETERMINISTIC and
      non-chaotic: the canonical shape-preservation test where an
      L-inf-class bar is well-posed. Reports levelset L-inf (full field and
      a |phi|<3h interface band) and disk area loss over the revolution.

--noise-floor DIR_A DIR_B: skip our engine entirely and difference two
reference dump directories against each other (e.g. the reference binary
vs itself with a 1-ulp initial velocity perturbation, main_dump.cpp's
[perturb] argument) — the reference's OWN self-divergence curve, i.e. the
comparison noise floor any cross-implementation diff must be read against.

Usage: python scripts/fidelity_ref2d.py [--example 3] [--frames 315]
       [--modes exact,default] [--round 5] [--skip-reference]
       [--noise-floor /tmp/refdump_ex2 /tmp/refdump_ex2p]
Writes FIDELITY_REF2D_EX{example}_r{round}.json at the repo root
(--noise-floor writes FIDELITY_NOISEFLOOR_r{round}.json).
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


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


def dumped_frames(outdir: str):
    return sorted(
        int(os.path.basename(p)[1:5])
        for p in glob.glob(os.path.join(outdir, "f*_rho.bin"))
    )


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


def disk_area(sdf, h):
    """Area of {phi < 0} with a linear sub-cell correction at the
    interface: fraction 0.5 - phi/(2h) clipped to [0,1] per cell."""
    frac = np.clip(0.5 - sdf / (2.0 * h), 0.0, 1.0)
    return float(frac.sum()) * h * h


def node_curl(u, v, h):
    """Node curl dv/dx - du/dy on the (ni+1, nj+1) corner lattice
    (calculateCurl, BimocqSolver2D.cpp)."""
    ni, nj = u.shape[0] - 1, v.shape[1] - 1
    c = np.zeros((ni + 1, nj + 1), np.float32)
    c[1:ni, 1:nj] = (
        (v[1:ni, 1:nj] - v[: ni - 1, 1:nj])
        - (u[1:ni, 1:nj] - u[1:ni, : nj - 1])
    ) / h
    return c


def vortex_cores(u, v, h, thresh_frac=0.3, min_cells=4):
    """(positive_cores, negative_cores): connected components of
    curl > +t / curl < -t with t = thresh_frac * max|curl|. The leapfrog
    scene starts with 2 cores per sign; schemes that diffuse the pairs
    merge them (count drops to 1) — the BiMocq paper's separation claim."""
    from scipy import ndimage

    c = node_curl(u, v, h)
    t = thresh_frac * float(np.abs(c).max())
    counts = []
    for mask in (c > t, c < -t):
        lab, n = ndimage.label(mask)
        sizes = ndimage.sum(mask, lab, range(1, n + 1)) if n else []
        counts.append(int(np.sum(np.asarray(sizes) >= min_cells)))
    return counts


def compare(ours, ref, h, levelset: bool):
    u, rho = ours
    rec = dict(
        u_linf=float(np.abs(u - ref["u"]).max()),
        u_l1=float(np.abs(u - ref["u"]).mean()),
        rho_linf=float(np.abs(rho - ref["rho"]).max()),
        rho_l1=float(np.abs(rho - ref["rho"]).mean()),
        rho_scale=float(np.abs(ref["rho"]).max()),
    )
    if levelset:
        band = np.abs(ref["rho"]) < 3.0 * h
        rec["ls_band_linf"] = float(
            np.abs((rho - ref["rho"])[band]).max()) if band.any() else 0.0
        rec["area_ref"] = disk_area(ref["rho"], h)
        rec["area_ours"] = disk_area(rho, h)
    return rec


def run_noise_floor(args):
    dir_a, dir_b = args.noise_floor
    frames = sorted(set(dumped_frames(dir_a)) & set(dumped_frames(dir_b)))
    # infer shape from example 2 (the RT scene is the intended use)
    ni, nj = 256, 1280
    curve = []
    for f in frames:
        a = load_ref(dir_a, f, (ni, nj))
        b = load_ref(dir_b, f, (ni, nj))
        rec = dict(
            frame=f,
            rho_linf=float(np.abs(a["rho"] - b["rho"]).max()),
            rho_l1=float(np.abs(a["rho"] - b["rho"]).mean()),
            u_linf=float(np.abs(a["u"] - b["u"]).max()),
        )
        curve.append(rec)
        print(f"[noise-floor] frame {f:4d}: rho_linf {rec['rho_linf']:.3e} "
              f"rho_l1 {rec['rho_l1']:.3e} u_linf {rec['u_linf']:.3e}",
              flush=True)
    out = dict(
        comparator="unmodified reference binary vs ITSELF with a 1-ulp-"
                   "class initial velocity perturbation (main_dump.cpp "
                   "[perturb]) — the self-divergence / noise floor of any "
                   "cross-implementation L-inf comparison on this scene",
        dirs=[dir_a, dir_b],
        scene="2D_RayleighTaylor",
        curve=curve,
    )
    path = os.path.join(os.path.dirname(HERE),
                        f"FIDELITY_NOISEFLOOR_r{args.round}.json")
    with open(path, "w") as fp:
        json.dump(out, fp, indent=1)
    print(f"wrote {path}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--example", type=int, default=2, choices=[0, 1, 2, 3])
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--modes", default="exact,default")
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--skip-reference", action="store_true",
                    help="reuse an existing dump directory")
    ap.add_argument("--noise-floor", nargs=2, metavar="DIR",
                    help="difference two reference dump dirs; no JAX run")
    args = ap.parse_args()

    if args.noise_floor:
        return run_noise_floor(args)

    outdir = f"/tmp/refdump_ex{args.example}"
    if not args.skip_reference:
        run_reference(args.example, args.frames, outdir)
    ref_frames = [f for f in dumped_frames(outdir) if f > 0]

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
    from gpufluidsimulation_tpu.solvers.smoke2d import (Scheme, Smoke2D,
                                                        max_vel)

    scene = scenes2d.make_scene_2d(args.example, Scheme.BIMOCQ)
    shape = (scene.cfg.ni, scene.cfg.nj)
    h = scene.cfg.L / scene.cfg.ni
    ref0 = load_ref(outdir, 0, shape)
    levelset = scene.output == "levelset"

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
        last = max(ref_frames) if ref_frames else args.frames

        def record(f, state):
            if f not in ref_frames:
                return
            ref = load_ref(outdir, f, shape)
            rec = compare((np.asarray(state.u), np.asarray(state.rho)),
                          ref, h, levelset)
            rec["frame"] = f
            if args.example == 1:
                rec["cores_ours"] = vortex_cores(
                    np.asarray(state.u), np.asarray(state.v), h)
                rec["cores_ref"] = vortex_cores(ref["u"], ref["v"], h)
            curve.append(rec)
            msg = (f"[{mode_name}] frame {f:4d}: "
                   f"rho_linf {rec['rho_linf']:.3e} "
                   f"rho_l1 {rec['rho_l1']:.3e} "
                   f"u_linf {rec['u_linf']:.3e}")
            if levelset:
                msg += (f" band {rec['ls_band_linf']:.3e}"
                        f" area {rec['area_ours']:.5f}/{rec['area_ref']:.5f}")
            if args.example == 1:
                msg += f" cores {rec['cores_ours']}/{rec['cores_ref']}"
            print(msg, flush=True)

        if args.example == 3:
            # main.cpp:159-172 (mirrored by main_dump.cpp): substep from
            # maxVel ONCE per frame, inner loop clips the last substep
            for f in range(1, last + 1):
                frame_dt, T = 2.0, 0.0
                sub = scene.cfl_number * h / float(max_vel(state.u, state.v))
                while T < frame_dt:
                    if T + sub > frame_dt:
                        sub = frame_dt - T
                    state = solver.step(state, jnp.float32(sub))
                    T += sub
                record(f, state)
        else:
            for f in range(1, last + 1):
                state = solver.step(state, jnp.float32(scene.dt))
                record(f, state)
        res = dict(init_linf=init_err, curve=curve,
                   seconds=time.time() - t0)
        if levelset:
            res["area_init"] = disk_area(ref0["rho"], h)
        results[mode_name] = res

    out = dict(
        example=args.example,
        scene=scene.name,
        scheme="BIMOCQ",
        frames=args.frames,
        comparator="unmodified reference BimocqSolver2D binary "
                   "(scripts/refbaseline/main_dump.cpp)",
        results=results,
    )
    path = os.path.join(
        os.path.dirname(HERE),
        f"FIDELITY_REF2D_EX{args.example}_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
