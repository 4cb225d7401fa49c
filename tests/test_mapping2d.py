"""NumPy loop oracles for the 2D BiMocq mapping ops.

advect_bimocq_2d / correct_2d / accumulate_2d transcribe the reference's
hand-inlined per-field loops (BimocqSolver2D.cpp:727-1424: 5-point volume
stencil w = [1/8 x4, 1/2] at +-0.25h, dual-map blend, back-and-forth error
correction, push-forward accumulation, per-loop guard bands). These tests
re-express each op as an explicit per-node Python loop over the stencil
with the independent bilinear oracle (tests/oracles.sample2) and compare.
"""

import numpy as np
import jax.numpy as jnp

from gpufluidsimulation_tpu.bimocq import mapping as mp
from gpufluidsimulation_tpu.core.grids import Grid2D
from tests import oracles

_VOL2 = [(-0.25, -0.25), (0.25, -0.25), (-0.25, 0.25), (0.25, 0.25)]


def _grid_and_fields(seed=0, ni=12, nj=10):
    r = np.random.default_rng(seed)
    g = Grid2D(ni, nj, 1.0 / max(ni, nj))
    fields = {
        k: {
            name: r.standard_normal(shape).astype(np.float32)
            for name in ("semi", "init", "origin", "d", "dprev", "change")
        }
        for k, shape in (("u", g.shape_u), ("v", g.shape_v),
                         ("c", g.shape_c))
    }
    # smoothly perturbed identity maps (values at cell centers)
    x, y = [np.asarray(a) for a in g.node_coords("c")]
    h = g.h

    def pmap(s):
        return np.stack([
            x + 0.35 * h * np.sin(x * 9 + s) * np.cos(y * 7),
            y + 0.3 * h * np.cos(y * 8 - s) * np.sin(x * 5),
        ]).astype(np.float32)

    maps = {"bwd": pmap(0.3), "bwd_prev": pmap(1.1), "fwd": pmap(2.0)}
    return g, fields, maps


def _map_sample_oracle(g, maps, px, py):
    h = g.h
    mx = oracles.sample2(maps[0], px, py, h, (0.5, 0.5))
    my = oracles.sample2(maps[1], px, py, h, (0.5, 0.5))
    return (np.clip(mx, h, g.ni * h - h), np.clip(my, h, g.nj * h - h))


def _vol_nodes(g, kind, ev):
    px, py = [np.asarray(a) for a in g.node_coords(kind)]
    out = np.zeros(px.shape, np.float32)
    h = g.h
    for i in range(px.shape[0]):
        for j in range(px.shape[1]):
            acc = 0.5 * ev(px[i, j], py[i, j])
            for dx, dy in _VOL2:
                acc += 0.125 * ev(px[i, j] + dx * h, py[i, j] + dy * h)
            out[i, j] = acc
    return out


def _band_mask(shape, a, b):
    ii = np.arange(shape[0])[:, None]
    jj = np.arange(shape[1])[None, :]
    return (ii > a[0]) & (ii < shape[0] - b[0]) & (jj > a[1]) & (jj < shape[1] - b[1])


def test_advect_bimocq_2d_matches_loop_oracle():
    g, fields, maps = _grid_and_fields()
    blend = 0.6
    for kind in ("u", "v", "c"):
        f = fields[kind]
        off = g.off_of(kind)
        h = g.h

        def ev(px, py):
            p1 = _map_sample_oracle(g, maps["bwd"], px, py)
            p2 = _map_sample_oracle(g, maps["bwd_prev"], *p1)
            one = (oracles.sample2(f["init"], *p1, h, off)
                   + oracles.sample2(f["d"], *p1, h, off))
            two = (oracles.sample2(f["origin"], *p2, h, off)
                   + oracles.sample2(f["d"], *p1, h, off)
                   + oracles.sample2(f["dprev"], *p2, h, off))
            return blend * one + (1.0 - blend) * two

        want = _vol_nodes(g, kind, ev)
        a, b = mp._BANDS_2D_ADVECT[kind]
        band = _band_mask(f["semi"].shape, a, b)
        want = np.where(band, want, f["semi"])

        got = np.asarray(mp.advect_bimocq_2d(
            g, kind, *[jnp.asarray(f[n]) for n in
                       ("semi", "init", "origin", "d", "dprev")],
            jnp.asarray(maps["bwd"]), jnp.asarray(maps["bwd_prev"]),
            blend))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_correct_2d_matches_loop_oracle():
    g, fields, maps = _grid_and_fields(seed=5)
    for kind in ("u", "v", "c"):
        f = fields[kind]
        off = g.off_of(kind)
        h = g.h
        a, b = mp._BANDS_2D_CORRECT[kind]
        band = _band_mask(f["semi"].shape, a, b)

        def ev_fwd(px, py):
            m = _map_sample_oracle(g, maps["fwd"], px, py)
            return oracles.sample2(f["semi"], *m, h, off)

        tmp = _vol_nodes(g, kind, ev_fwd) - f["d"]
        tmp = np.where(band, tmp, 0.0)
        tmp = (0.5 * (tmp - f["init"])).astype(np.float32)

        def ev_bwd(px, py):
            m = _map_sample_oracle(g, maps["bwd"], px, py)
            return oracles.sample2(tmp, *m, h, off)

        corr = _vol_nodes(g, kind, ev_bwd)
        out = np.where(band, f["semi"] - corr, f["semi"])
        # 9-point neighborhood clamp around the pre-correction field
        want = np.empty_like(out)
        nx, ny = out.shape
        for i in range(nx):
            for j in range(ny):
                nb = f["semi"][max(i - 1, 0): i + 2, max(j - 1, 0): j + 2]
                want[i, j] = min(max(out[i, j], nb.min()), nb.max())

        got = np.asarray(mp.correct_2d(
            g, kind, jnp.asarray(f["semi"]), jnp.asarray(f["init"]),
            jnp.asarray(f["d"]), jnp.asarray(maps["fwd"]),
            jnp.asarray(maps["bwd"])))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_accumulate_2d_matches_loop_oracle():
    g, fields, maps = _grid_and_fields(seed=9)
    coeff = 2.0
    for kind in ("u", "v", "c"):
        f = fields[kind]
        off = g.off_of(kind)
        h = g.h

        def ev(px, py):
            m = _map_sample_oracle(g, maps["fwd"], px, py)
            return coeff * oracles.sample2(f["change"], *m, h, off)

        delta = _vol_nodes(g, kind, ev)
        a, b = mp._BANDS_2D_ACCUM[kind]
        band = _band_mask(f["d"].shape, a, b)
        want = np.where(band, f["d"] + delta, f["d"])

        got = np.asarray(mp.accumulate_2d(
            g, kind, jnp.asarray(f["d"]), jnp.asarray(f["change"]),
            jnp.asarray(maps["fwd"]), coeff))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_dmc_backward_step_2d_matches_loop_oracle():
    """dmc_backward_step_2d (semiLagAdvectDMC, BimocqSolver2D.cpp:45-107):
    per-node upwind tap at +-h, a = dvel/dx, exponential step with the
    |a| > 1e-4 Euler fallback, position clamp to [h, L-h], map gather."""
    g, _, maps = _grid_and_fields(seed=13)
    r = np.random.default_rng(13)
    u = r.standard_normal(g.shape_u).astype(np.float32)
    v = r.standard_normal(g.shape_v).astype(np.float32)
    h = g.h
    sub = 0.4 * h  # sub-CFL at max|v|~2.5
    mx, my = maps["bwd"][0], maps["bwd"][1]

    def vel_at(px, py):
        # getVelocity 2D semantics: out-of-band samples are ZERO (not
        # clamped) — u valid for floor(px/h) in [0, ni-1] and
        # floor(py/h-0.5) in [0, nj-2]; v symmetric
        iu, ju = np.floor(px / h), np.floor(py / h - 0.5)
        vu = (oracles.sample2(u, px, py, h, (0.0, 0.5))
              if 0 <= iu <= g.ni - 1 and 0 <= ju <= g.nj - 2 else 0.0)
        iv, jv = np.floor(px / h - 0.5), np.floor(py / h)
        vv = (oracles.sample2(v, px, py, h, (0.5, 0.0))
              if 0 <= iv <= g.ni - 2 and 0 <= jv <= g.nj - 1 else 0.0)
        return vu, vv

    px, py = [np.asarray(a) for a in g.node_coords("c")]
    want_x = np.empty_like(px)
    want_y = np.empty_like(py)
    for i in range(px.shape[0]):
        for j in range(px.shape[1]):
            x0, y0 = px[i, j], py[i, j]
            vu, vv = vel_at(x0, y0)
            tx = x0 - h if vu > 0 else x0 + h
            ty = y0 - h if vv > 0 else y0 + h
            tu, tv = vel_at(tx, ty)
            ax = (vu - tu) / (x0 - tx)
            ay = (vv - tv) / (y0 - ty)

            def newpos(p0, vel, a):
                if abs(a) > 1e-4:
                    return p0 - (1.0 - np.exp(-a * sub)) * vel / a
                return p0 - vel * sub

            nx_ = np.clip(newpos(x0, vu, ax), h, g.ni * h - h)
            ny_ = np.clip(newpos(y0, vv, ay), h, g.nj * h - h)
            want_x[i, j] = oracles.sample2(mx, nx_, ny_, h, (0.5, 0.5))
            want_y[i, j] = oracles.sample2(my, nx_, ny_, h, (0.5, 0.5))

    from gpufluidsimulation_tpu.ops import advect

    got_x, got_y = advect.dmc_backward_step_2d(
        g, jnp.asarray(u), jnp.asarray(v), jnp.asarray(mx), jnp.asarray(my),
        sub)
    np.testing.assert_allclose(np.asarray(got_x), want_x, rtol=2e-5,
                               atol=2e-4 * h)
    np.testing.assert_allclose(np.asarray(got_y), want_y, rtol=2e-5,
                               atol=2e-4 * h)
