"""Engine configuration knobs.

fast_interp: route full-lattice trilinear sampling through the windowed-DMA
Pallas kernel (ops/interp_fast.py) instead of XLA gather. Default: on for
TPU backends, off elsewhere (tests/oracles use the exact gather form).
Override with GFS_FAST_INTERP=0/1. GFS_INTERP_RR sets the residual reach
(default 3; raise for adaptive-reinit BiMocq configs with long remap gaps).

Two layers:

* ``EngineMode`` — a frozen per-solver mode record carried in
  ``Smoke2DConfig/Smoke3DConfig.engine_mode`` and entered (``with
  engine_mode_scope(mode)``) around every trace of that solver's step, so
  two solvers with different modes coexist in one process without
  cross-talk. ``None`` fields defer to the process defaults below.
* Process defaults — env-seeded module state (``GFS_*`` vars) consulted
  when no scope is active or a mode field is ``None``. The ``set_*``
  mutators remain for tests/scripts that A/B a knob process-wide.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os

@dataclasses.dataclass(frozen=True)
class EngineMode:
    """Per-solver engine-mode record (None = defer to process default).

    ``sharded_sampling`` is (mesh, halo) to route full-lattice sampling
    through the shard_map halo kernels, ``()`` to force it OFF within the
    scope regardless of process state, or None to defer.
    """

    fast_interp: bool | None = None
    interp_rr: int | None = None
    interp_adaptive: bool | None = None
    volume_exact: bool | None = None
    volume_dual: bool | None = None
    volume_vol9: bool | None = None
    rbgs: bool | None = None
    interp_bf16: bool | None = None
    spectral_poisson: bool | None = None
    pallas_diffuse: bool | None = None
    interp_interpret: bool | None = None
    particle_dense: bool | None = None
    sharded_sampling: tuple | None = None

    def __hash__(self):  # mesh objects in sharded_sampling aren't hashable
        return hash((self.fast_interp, self.interp_rr, self.interp_adaptive,
                     self.volume_exact, self.volume_dual, self.volume_vol9,
                     self.rbgs,
                     self.interp_bf16,
                     self.spectral_poisson, self.pallas_diffuse,
                     self.interp_interpret, self.particle_dense,
                     self.sharded_sampling is not None
                     and len(self.sharded_sampling)))


_MODE_STACK: list[EngineMode] = []


@contextlib.contextmanager
def engine_mode_scope(mode: EngineMode | None):
    """Activate `mode` for the duration (typically: around one trace)."""
    if mode is None:
        yield
        return
    _MODE_STACK.append(mode)
    try:
        yield
    finally:
        _MODE_STACK.pop()


def _mode_field(name: str):
    for mode in reversed(_MODE_STACK):
        v = getattr(mode, name)
        if v is not None:
            return v
    return None


_FAST_ENV = os.environ.get("GFS_FAST_INTERP")
# Residual reach: per-(8,8,128)-block in-block displacement variation budget
# in cells (the mean shift is unbounded — absorbed by the window base).
# Kernel cost scales ~(2Rr+3)^2 (2Rr+10); 2 is ample for per-frame-reinit
# BiMocq (in-block variation << 1 cell) — raise via env for adaptive-reinit
# configs with long remap gaps. Enforced at runtime by residual_overflow.
_RR = int(os.environ.get("GFS_INTERP_RR", "2"))
_RZ = int(os.environ.get("GFS_INTERP_RZ", "8"))
_FORCED: bool | None = None if _FAST_ENV is None else _FAST_ENV not in ("0", "false")


def use_fast_interp() -> bool:
    m = _mode_field("fast_interp")
    if m is not None:
        return m
    if _FORCED is not None:
        return _FORCED
    import jax

    return jax.default_backend() not in ("cpu",)


def set_fast_interp(value: bool | None) -> None:
    """Programmatic override (None = auto by backend)."""
    global _FORCED
    _FORCED = value


def interp_rr() -> int:
    m = _mode_field("interp_rr")
    return _RR if m is None else m


def set_interp_rr(value: int) -> None:
    global _RR
    _RR = int(value)


def interp_rz() -> int:
    return _RZ


_ADAPTIVE = os.environ.get("GFS_INTERP_ADAPTIVE", "1") not in ("0", "false")


def interp_adaptive() -> bool:
    """Window kernels loop only over each block's live tap range (dynamic
    fori_loop + pow2 rolls) instead of the full static (2Rr+3)^3 stencil.
    Bit-identical results (skipped taps have exactly-zero hat weight);
    typically ~5x fewer VPU ops. GFS_INTERP_ADAPTIVE=0 restores the
    fully-unrolled static form."""
    m = _mode_field("interp_adaptive")
    return _ADAPTIVE if m is None else m


def set_interp_adaptive(value: bool) -> None:
    global _ADAPTIVE
    _ADAPTIVE = bool(value)


_VOLUME_EXACT = os.environ.get("GFS_VOLUME_EXACT", "0") not in ("0", "false")


def volume_exact() -> bool:
    """Evaluate the reference's 9-point volume-composition average exactly
    on the fast path (one windowed sample per stencil offset) instead of
    the O(h^2) source-prefilter approximation. ~3-5x slower step; use when
    strict volume-average parity matters more than speed. The prefilter
    default matches the exact form to ~1-2% at density discontinuities and
    to O(h^2) on smooth fields (tests/test_fidelity3d.py)."""
    m = _mode_field("volume_exact")
    return _VOLUME_EXACT if m is None else m


def set_volume_exact(value: bool) -> None:
    global _VOLUME_EXACT
    _VOLUME_EXACT = bool(value)


_VOLUME_DUAL = os.environ.get("GFS_VOLUME_DUAL", "1") not in ("0", "false")


def volume_dual() -> bool:
    """Evaluate the reference's 9-point volume composition as a DUAL-KERNEL
    windowed sample — 0.5*prod-of-g + 0.5*prod-of-hat per axis with
    g(t) = 0.5*(hat(t-1/4)+hat(t+1/4)) — which equals the corner average
    applied to the MAPPED position exactly (mean_c trilerp(p+c) is
    separable). One launch, no source prefilter. Approximation vs the
    reference's pre-map corners (field(M(p+c))): the map Jacobian is taken
    as identity across the +-0.25h corner cube — measured ~10x closer to
    the exact composition than the old source-prefilter commutation
    (FIDELITY_r2.json). The production default. GFS_VOLUME_DUAL=0 restores
    the prefilter (disabling vol9 too — the vol9 fixup overlays the dual
    launch). volume_exact and volume_vol9 win over this knob."""
    m = _mode_field("volume_dual")
    return _VOLUME_DUAL if m is None else m


def set_volume_dual(value: bool) -> None:
    global _VOLUME_DUAL
    _VOLUME_DUAL = bool(value)


_VOLUME_VOL9 = os.environ.get("GFS_VOLUME_VOL9", "0") not in ("0", "false")


def volume_vol9() -> bool:
    """Evaluate the reference's 9-point volume composition EXACTLY as a
    dual launch + sparse exact fixup (interp_fast.vol9_fixup): every
    +-0.25h corner offset is mapped through the map's trilinear
    interpolation in-kernel (a static ring-1 map window), so the map
    Jacobian acts on the corner cube — the term the 'dual' separable
    kernel drops (J taken as identity). OFF by default (GFS_VOLUME_VOL9=1
    enables): the adaptive dual/exact routing operates on
    16x16xfull-depth-z blocks, and on developed flows (map corner
    deviation ~0.3-1 cell at CFL 2.6) every active block exceeds any
    useful tolerance, so vol9 degenerates to exact-everywhere — measured
    470 ms/step & 294 s compile vs dual's 213 ms & 23 s at 256^3, for a
    ~3x emitter-edge density-fidelity gain (FIDELITY_r4.json). Use it
    when volume-composition exactness matters more than speed; it is
    cheaper than GFS_VOLUME_EXACT's 9 separate windowed evaluations.
    volume_exact wins over this; requires volume_dual."""
    m = _mode_field("volume_vol9")
    return _VOLUME_VOL9 if m is None else m


def set_volume_vol9(value: bool) -> None:
    global _VOLUME_VOL9
    _VOLUME_VOL9 = bool(value)


_RBGS_ENV = os.environ.get("GFS_RBGS")
_RBGS: bool | None = None if _RBGS_ENV is None else _RBGS_ENV not in ("0", "false")


def use_rbgs() -> bool:
    """Use the blocked Pallas red-black Gauss-Seidel smoother for the MG
    pre/post smoothing (ops/pallas_kernels.py). Default: on for TPU
    backends (where it halves smoother HBM traffic), off elsewhere."""
    m = _mode_field("rbgs")
    if m is not None:
        return m
    if _RBGS is not None:
        return _RBGS
    return use_fast_interp()


def set_rbgs(value: bool | None) -> None:
    global _RBGS
    _RBGS = value


_BF16_ENV = os.environ.get("GFS_INTERP_BF16")
_INTERP_BF16: bool = _BF16_ENV is not None and _BF16_ENV not in ("0", "false")


def interp_window_dtype():
    """Storage dtype for FIELD-VALUE windows in the Pallas samplers
    (GFS_INTERP_BF16=1 -> bfloat16: halves the window-DMA bytes that bound
    the pull-back sampler tier, at ~2^-9 relative quantization of sampled
    values). Map/position windows always stay f32 — their absolute-coord
    ulp in bf16 would be ~1 cell. Off by default; see PERF.md for the
    measured speed/drift trade."""
    import jax.numpy as jnp

    m = _mode_field("interp_bf16")
    bf16 = _INTERP_BF16 if m is None else m
    return jnp.bfloat16 if bf16 else jnp.float32


def set_interp_bf16(value: bool) -> None:
    global _INTERP_BF16
    _INTERP_BF16 = bool(value)


_SPECTRAL_ENV = os.environ.get("GFS_SPECTRAL")
_SPECTRAL: bool | None = (
    None if _SPECTRAL_ENV is None else _SPECTRAL_ENV not in ("0", "false")
)


def use_spectral_poisson() -> bool:
    """Solve the unmasked full-box pressure system DIRECTLY in the DST/DCT
    eigenbasis (ops/spectral.py) — six (n,n) matmuls on the MXU instead of
    the MG-PCG iteration. Exact to f32 transform rounding (~1e-6 relative
    residual, tighter than any iterative exit). Default: on for TPU
    backends, off on CPU (tests/oracles compare against the iterative
    path). Masked/voxelized-boundary projections always use MG-PCG."""
    m = _mode_field("spectral_poisson")
    if m is not None:
        return m
    if _SPECTRAL is not None:
        return _SPECTRAL
    # backend-only default (NOT use_fast_interp(): tests force fast-interp
    # on/off on CPU to A/B the samplers and must not flip the solver too)
    import jax

    return jax.default_backend() not in ("cpu",)


def set_spectral_poisson(value: bool | None) -> None:
    global _SPECTRAL
    _SPECTRAL = value


_DIFFUSE_ENV = os.environ.get("GFS_PALLAS_DIFFUSE")
_PALLAS_DIFFUSE: bool | None = (
    None if _DIFFUSE_ENV is None else _DIFFUSE_ENV not in ("0", "false")
)


def use_pallas_diffuse() -> bool:
    """Use the blocked Pallas multi-sweep Jacobi kernel for the viscosity
    diffusion loops (ops/pallas_kernels.jacobi_diffuse). Default: on for
    TPU backends — in-step the XLA while-loop runs ~2x slower than the
    same loop standalone (cost-model tiling regression); the Pallas kernel
    holds ~0.37 ms/sweep either way."""
    m = _mode_field("pallas_diffuse")
    if m is not None:
        return m
    if _PALLAS_DIFFUSE is not None:
        return _PALLAS_DIFFUSE
    return use_fast_interp()


def set_pallas_diffuse(value: bool | None) -> None:
    global _PALLAS_DIFFUSE
    _PALLAS_DIFFUSE = value


# (mesh, halo) when the sharded step should route full-lattice sampling
# through the shard_map windowed kernels (parallel/sharded_interp.py)
# instead of exact gathers; set by parallel.sharding.sharded_step.
_SHARDED_SAMPLING: tuple | None = None


def sharded_sampling():
    m = _mode_field("sharded_sampling")
    if m is not None:
        return m if m else None  # () forces OFF within the scope
    return _SHARDED_SAMPLING


def set_sharded_sampling(mesh, halo: int = 8) -> None:
    """Route fast-lattice sampling through the shard_map halo path on
    `mesh` (None disables). The fields/positions must be z-shardable
    (extent divisible by mesh.size, halo <= local slab)."""
    global _SHARDED_SAMPLING
    _SHARDED_SAMPLING = None if mesh is None else (mesh, int(halo))


_PDENSE_ENV = os.environ.get("GFS_PARTICLE_DENSE")
_PDENSE: bool | None = (
    None if _PDENSE_ENV is None else _PDENSE_ENV not in ("0", "false")
)
_PARTICLE_K = int(os.environ.get("GFS_PARTICLE_K", "0"))
_PARTICLE_R = int(os.environ.get("GFS_PARTICLE_R", "3"))


def particle_dense() -> bool:
    """Route the FLIP/APIC/PolyPIC steps through the dense-binned transfer
    path (solvers/particles_dense.py): particles packed per home cell into
    K slots, every P2G/G2P/trace a static-shift window op — no 1M-index
    gathers/scatters (XLA serializes those at ~10 ms each on TPU; they
    were ~95% of the flat path's frame time). Default: on for TPU
    backends, off elsewhere (tests compare both). Bin overflow (>K per
    cell) and window escapes (stage displacement > R cells) are counted
    into interp_overflow; step_checked retries through the flat path."""
    m = _mode_field("particle_dense")
    if m is not None:
        return m
    if _PDENSE is not None:
        return _PDENSE
    import jax

    return jax.default_backend() not in ("cpu",)


def set_particle_dense(value: bool | None) -> None:
    global _PDENSE
    _PDENSE = value


def particle_k(ppc: int) -> int:
    """Dense-bin slot capacity K. Default 2x the seeded per-cell count
    (incompressible scenes hold occupancy near the seeded density; the
    overflow counter guards the tail). GFS_PARTICLE_K overrides."""
    if _PARTICLE_K > 0:
        return _PARTICLE_K
    return 2 * ppc


def set_particle_k(value: int) -> None:
    """Process-wide K override (0 restores the 2x-seeded default)."""
    global _PARTICLE_K
    _PARTICLE_K = int(value)


def particle_r() -> int:
    """Dense-path trace window radius R in cells (must cover the frame's
    total CFL + 1; escapes are counted when it doesn't).
    GFS_PARTICLE_R overrides (default 3)."""
    return _PARTICLE_R


_PARTICLE_SIDE = int(os.environ.get("GFS_PARTICLE_SIDE", "8192"))


def particle_side() -> int:
    """Sidecar budget: overflow particles (>K per cell — the boundary-ring
    pile-up the reference's domain clamp creates) handled EXACTLY through
    the flat scatter/gather path, which is sub-ms at this size. Only the
    tail beyond the budget trips the overflow contract.
    GFS_PARTICLE_SIDE overrides (default 8192; 0 disables)."""
    return _PARTICLE_SIDE


def set_particle_side(value: int) -> None:
    global _PARTICLE_SIDE
    _PARTICLE_SIDE = int(value)


_INTERPRET = os.environ.get("GFS_INTERP_INTERPRET", "0") not in ("0", "false")


def interp_interpret() -> bool:
    """Run the Pallas window kernels in interpreter mode (CPU testing of the
    fast-interp path; see tests/test_fidelity3d.py)."""
    m = _mode_field("interp_interpret")
    return _INTERPRET if m is None else m


def set_interp_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)
