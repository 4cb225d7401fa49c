"""Command-line drivers reproducing both reference executables.

2D (bimocq2D/main.cpp:32-38): two positional ints — scheme, example —
  `python -m gpufluidsimulation_tpu.cli sim2d <scheme> <example> [--frames N]`
3D (bimocq3D/main.cpp:82-91): scheme + cpu-flag (here: a --res override) —
  `python -m gpufluidsimulation_tpu.cli sim3d <scheme3d> [--frames N]`

Outputs land under Out/<scene>/<scheme>/ in the reference's directory shape:
vorticity/density BMPs for 2D, sparse volumes for 3D, plus NPZ checkpoints.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _enable_compile_cache():
    """Persistent XLA compilation cache: the 3D step is a large program
    (~minutes cold at 256^3); repeat CLI invocations should pay it once.
    Opt out with GFS_COMPILE_CACHE=0 or point it elsewhere via
    JAX_COMPILATION_CACHE_DIR."""
    if os.environ.get("GFS_COMPILE_CACHE", "1") in ("0", "false"):
        return
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_comp_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass


def _run_2d(args):
    import jax

    from gpufluidsimulation_tpu.io_utils import bmp, colormap, volume
    from gpufluidsimulation_tpu.ops import forces
    from gpufluidsimulation_tpu.scenes import scenes2d
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D
    from gpufluidsimulation_tpu.utils import timing

    scheme = Scheme(args.scheme)
    scene = scenes2d.make_scene_2d(args.example, scheme)
    solver = Smoke2D(scene.cfg)
    state = solver.init_state()
    state = scene.init(solver, state)
    if scheme in (Scheme.FLIP, Scheme.APIC, Scheme.POLYPIC):
        state = solver.sample_particles_from_grid(state)

    out_dir = os.path.join(args.out, scene.name, scheme.display_name())
    os.makedirs(out_dir, exist_ok=True)
    frames = args.frames or scene.total_frames
    timer = timing.FrameTimer()
    g = solver.grid

    from gpufluidsimulation_tpu.solvers.smoke2d import max_vel

    # strict contract mode (default): a frame whose fast-interp
    # displacement contract tripped is recomputed through the exact
    # engine (Smoke3D/Smoke2D.step_checked) instead of committed clamped
    retried = [False]

    def _step(st, *a):
        if args.no_strict_contract:
            return solver.step(st, *a)
        st, r = solver.step_checked(st, *a)
        retried[0] = retried[0] or r
        return st

    for frame in range(frames):
        retried[0] = False
        if scene.dt is not None:
            state, ms = timer.time_step(_step, state, scene.dt)
        else:
            # CFL-driven substepping (Zalesak/VortexBox loops, main.cpp:162-221)
            T = 0.0
            while T < scene.frame_dt:
                mv = float(max_vel(state.u, state.v))
                sub = min(scene.cfl_number * g.h / mv, scene.frame_dt - T)
                state, ms = timer.time_step(_step, state, sub)
                T += sub
        print(timing.BLUE + f"{scheme.display_name()} frame {frame} done "
              + timing.RESET + timer.report(frame,
              {"cfl": f"{float(state.cfl):.3f}",
               "proj_iters": int(state.proj_iters),
               "proj_res": f"{float(state.proj_res):.2e}"}))
        if retried[0]:
            print(timing.YELLOW + "[contract] fast-interp displacement "
                  "budget tripped — frame recomputed on the exact path"
                  + timing.RESET)
        overflow = int(getattr(state, "interp_overflow", 0))
        if overflow:
            print(timing.RED + f"[WARN] fast-interp contract violated in "
                  f"{overflow} blocks this frame — results may be clamped; "
                  f"raise GFS_INTERP_RR or lower dt" + timing.RESET)
        if scene.output == "vorticity":
            curl = forces.curl_2d(state.u, state.v, g.h)
            rgb = colormap.render_vorticity(curl, g.ni, g.nj)
            bmp.write_bmp_rgb(os.path.join(out_dir, f"vort_{frame:04d}.bmp"), rgb)
        elif scene.output == "density":
            bmp.write_bmp_color(
                os.path.join(out_dir, f"density_{frame:04d}.bmp"),
                np.asarray(state.rho), np.asarray(state.T))
        elif scene.output == "levelset":
            volume.write_levelset_txt(out_dir, frame, state.rho)
    return 0


def _run_3d(args):
    import jax

    from gpufluidsimulation_tpu.io_utils import volume, checkpoint
    from gpufluidsimulation_tpu.scenes import scenes3d
    from gpufluidsimulation_tpu.solvers.schemes import SCHEME_3D_ARGV
    from gpufluidsimulation_tpu.utils import timing

    if args.scheme not in SCHEME_3D_ARGV:
        print(f"error: unknown 3D scheme {args.scheme}; valid: "
              + ", ".join(f"{k}={v.display_name()}"
                          for k, v in sorted(SCHEME_3D_ARGV.items())),
              file=sys.stderr)
        return 2
    scheme = SCHEME_3D_ARGV[args.scheme]
    res = args.res
    make_scene = scenes3d.SCENES_3D.get(args.example,
                                        scenes3d.make_vortex_collision)
    solver, state = make_scene(
        scheme=scheme, ni=res, nj=2 * res, nk=2 * res, dt=args.dt
    )
    out_dir = os.path.join(args.out, f"{args.scheme}-{scheme.display_name()}-Tpu")
    os.makedirs(out_dir, exist_ok=True)
    start_frame = 0
    if args.resume:
        state = checkpoint.load_state(args.resume, state)
        start_frame = int(state.frame)
        print(f"resumed from {args.resume} at frame {start_frame}")
    frames = args.frames or scenes3d.TOTAL_FRAMES
    timer = timing.FrameTimer()
    retried = [False]

    def _step(st):
        if args.no_strict_contract:
            return solver.step(st)
        st, r = solver.step_checked(st)
        retried[0] = r
        return st

    for frame in range(start_frame, frames):
        print(f"Frame {frame} Starts !!!")
        state, ms = timer.time_step(_step, state)
        print(timing.YELLOW + f"[ CFL number is: {float(state.cfl):.4f} ] "
              + timing.RESET + timer.report(frame,
              {"proj_iters": int(state.proj_iters),
               "proj_res": f"{float(state.proj_res):.3e}"}))
        if args.residual_trace:
            # the reference prints the per-iteration residual scoreboard
            # every projection (BimocqGPUSolver.cpp:447-452)
            hist = np.asarray(state.proj_res_hist)
            hist = hist[hist >= 0.0]
            print("Residual: " + "   ".join(f"{r:.3e}" for r in hist))
        if retried[0]:
            print(timing.YELLOW + "[contract] fast-interp displacement "
                  "budget tripped — frame recomputed on the exact path"
                  + timing.RESET)
        overflow = int(getattr(state, "interp_overflow", 0))
        if overflow:
            print(timing.RED + f"[WARN] fast-interp contract violated at "
                  f"{overflow} samples this frame — results may be clamped; "
                  f"raise GFS_INTERP_RR or lower dt" + timing.RESET)
        volume.write_volume(frame + 1, out_dir, solver.grid.h, state.rho)
        if args.checkpoint_every and (frame + 1) % args.checkpoint_every == 0:
            checkpoint.save_state(os.path.join(out_dir, f"ckpt_{frame:04d}.npz"),
                                  state)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="gpufluidsimulation_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    p2 = sub.add_parser("sim2d", help="2D solver (bimocq2D parity)")
    p2.add_argument("scheme", type=int,
                    help="0..7: Semilag MacCormack BFECC Reflection FLIP APIC PolyPIC BiMocq")
    p2.add_argument("example", type=int,
                    help="0 Taylor | 1 Leapfrog | 2 RayleighTaylor | 3 Zalesak | 4 VortexBox")
    p2.add_argument("--frames", type=int, default=None)
    p2.add_argument("--out", default="Out")
    p2.add_argument("--no-strict-contract", action="store_true",
                    help="warn instead of recomputing frames whose "
                         "fast-interp displacement contract tripped")
    p2.set_defaults(fn=_run_2d)

    p3 = sub.add_parser("sim3d", help="3D solver (bimocq3D parity)")
    p3.add_argument("scheme", type=int,
                    help="0 BiMocq | 1 Semilag | 2 MacCormack | 3 Reflection")
    p3.add_argument("--res", type=int, default=100, help="ni (nj=nk=2*ni)")
    p3.add_argument("--example", type=int, default=0,
                    help="0 vortex collision (main.cpp:27-80) | "
                         "1 plume + moving sphere obstacle")
    p3.add_argument("--resume", default=None,
                    help="checkpoint NPZ to resume from (new capability; "
                         "the reference has no save/load)")
    p3.add_argument("--dt", type=float, default=0.08)
    p3.add_argument("--frames", type=int, default=None)
    p3.add_argument("--out", default="Out")
    p3.add_argument("--checkpoint-every", type=int, default=0)
    p3.add_argument("--no-strict-contract", action="store_true",
                    help="warn instead of recomputing frames whose "
                         "fast-interp displacement contract tripped")
    p3.add_argument("--residual-trace", action="store_true",
                    help="print the per-iteration pressure residual trace "
                         "(the reference's scoreboard printout)")
    p3.set_defaults(fn=_run_3d)

    args = p.parse_args(argv)
    _enable_compile_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
