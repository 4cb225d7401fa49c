"""Multi-kind fused traces (round-5): semilag_kinds_3d /
maccormack_kinds_3d must reproduce the per-kind forms — the concatenated
launch is a scheduling change, not a numerics change (positions are
absolute world coordinates; sections are BX-padded with edge-replicated
rows that are sliced away).

Runs the windowed kernels in interpreter mode (no TPU in CI) at a small
grid; the TPU-native path at production size is exercised by bench.py and
scripts/bench_matrix.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from gpufluidsimulation_tpu import config
from gpufluidsimulation_tpu.core.grids import Grid3D
from gpufluidsimulation_tpu.ops import advect


@pytest.fixture(autouse=True)
def _force_multikind(monkeypatch):
    # the concat path is a measured-neutral experiment, default OFF
    # (GFS_MULTIKIND) — force it on so these tests exercise the real
    # concatenated launch rather than the per-kind fallback. The concat
    # launch cannot run the identity peel (sections carry different node
    # offsets), so disable the peel on the per-kind comparator too —
    # like-for-like (the peel's own equivalence is covered on-device by
    # scripts/validate_fast_vs_exact.py and the fidelity suites).
    monkeypatch.setattr(advect, "_MULTIKIND", True)
    monkeypatch.setattr(advect, "_SEMILAG_PEEL", False)


def _fields(n):
    rng = np.random.default_rng(7)
    g = Grid3D(n, n, n, 0.2 / n)

    def smooth(shape, k):
        x = np.linspace(0, 1, shape[0])[:, None, None]
        y = np.linspace(0, 1, shape[1])[None, :, None]
        z = np.linspace(0, 1, shape[2])[None, None, :]
        return (np.sin(2 * np.pi * (k + 1) * x) * np.cos(2 * np.pi * y)
                * np.sin(2 * np.pi * z)).astype(np.float32)

    u = jnp.asarray(0.05 * smooth((n + 1, n, n), 0))
    v = jnp.asarray(0.05 * smooth((n, n + 1, n), 1))
    w = jnp.asarray(0.05 * smooth((n, n, n + 1), 2))
    rho = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    T = jnp.asarray(rng.standard_normal((n, n, n)).astype(np.float32))
    return g, u, v, w, rho, T


@pytest.mark.parametrize("fast", [False, True])
def test_semilag_kinds_matches_per_kind(fast):
    n = 16
    g, u, v, w, rho, T = _fields(n)
    dt = jnp.float32(-0.04)
    cfldt = jnp.float32(0.02)
    config.set_fast_interp(fast)
    config.set_interp_interpret(fast)
    try:
        groups = [("c", [rho, T]), ("u", [u]), ("v", [v]), ("w", [w])]
        got = advect.semilag_kinds_3d(g, groups, u, v, w, cfldt, dt)
        want = [advect.semilag_multi_3d(g, k, fs, u, v, w, cfldt, dt)
                for k, fs in groups]
    finally:
        config.set_fast_interp(None)
        config.set_interp_interpret(False)
    for gg, wg, (kind, _) in zip(got, want, groups):
        for a, b in zip(gg, wg):
            err = float(jnp.abs(a - b).max())
            assert err <= 1e-6, (kind, err)


@pytest.mark.parametrize("fast", [False, True])
def test_maccormack_kinds_matches_per_kind(fast):
    n = 16
    g, u, v, w, rho, T = _fields(n)
    dt = jnp.float32(0.04)
    cfldt = jnp.float32(0.02)
    config.set_fast_interp(fast)
    config.set_interp_interpret(fast)
    try:
        got = advect.maccormack_kinds_3d(
            g, [("c", [rho, T], "trace"), ("u", [u], "neighborhood"),
                ("v", [v], "neighborhood"), ("w", [w], "neighborhood")],
            u, v, w, cfldt, dt)
        want_c = advect.maccormack_multi_3d(g, "c", [rho, T], u, v, w,
                                            cfldt, dt)
        want_vel = []
        for kind, f in (("u", u), ("v", v), ("w", w)):
            fw = advect.semilag_multi_3d(g, kind, [f], u, v, w, cfldt, -dt)
            bk = advect.semilag_multi_3d(g, kind, fw, u, v, w, cfldt, dt)
            want_vel.append([advect.clamp_extrema_neighborhood(
                f, fw[0] + 0.5 * (f - bk[0]))])
    finally:
        config.set_fast_interp(None)
        config.set_interp_interpret(False)
    want = [want_c] + want_vel
    for gg, wg in zip(got, want):
        for a, b in zip(gg, wg):
            assert float(jnp.abs(a - b).max()) <= 1e-6
