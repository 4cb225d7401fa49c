import os

import pytest

import numpy as np
import jax.numpy as jnp

from gpufluidsimulation_tpu.io_utils import bmp, checkpoint, colormap, volume


def test_bmp_roundtrip_header(tmp_path, rng):
    field = rng.random((7, 5)).astype(np.float32)
    path = tmp_path / "t.bmp"
    bmp.write_bmp(str(path), field)
    data = path.read_bytes()
    assert data[:2] == b"BM"
    # 24bpp, width 7, height 5
    import struct

    w, h = struct.unpack_from("<ii", data, 18)
    assert (w, h) == (7, 5)
    bpp = struct.unpack_from("<H", data, 28)[0]
    assert bpp == 24


def test_colormap_matches_reference_stops():
    rgb = colormap.vorticity_to_rgb(np.array([0.0]))
    np.testing.assert_array_equal(rgb[0], [0, 1, 66])  # stop 0 * 255
    rgb = colormap.vorticity_to_rgb(np.array([100.0]))  # clamps to 0.99
    # lerp(stop9, stop10, 0.9): (0.9 -> 0.36, 0, 0)
    assert rgb[0][0] == int((0.1 * 0.9 + 0.9 * 0.3) * 255)


@pytest.mark.parametrize("fmt,suffix", [
    (None, "0003.vdb"),            # default: real .vdb (io_utils/vdb.py)
    ("gfsvol", ("0003.gfsvol", "0003.npz")),  # native async sparse COO
])
def test_sparse_volume_roundtrip(tmp_path, rng, fmt, suffix):
    dense = np.zeros((6, 5, 4), np.float32)
    dense[2, 3, 1] = 0.7
    dense[1, 1, 1] = 0.5
    dense[0, 0, 0] = 1e-6  # below threshold -> dropped
    out = volume.write_volume(3, str(tmp_path), 0.01, dense, fmt=fmt)
    assert out.endswith(suffix)
    assert volume.flush_volumes() == 0
    back, h = volume.read_volume(out)
    assert h == np.float32(0.01)
    assert back[2, 3, 1] == np.float32(0.7)
    assert back[0, 0, 0] == 0.0


def test_levelset_txt(tmp_path):
    sdf = np.arange(6, dtype=np.float32).reshape(2, 3)
    out = volume.write_levelset_txt(str(tmp_path), 0, sdf)
    rows = open(out).read().strip().split("\n")
    assert len(rows) == 2
    assert rows[0].split() == ["0", "1", "2"]


def test_checkpoint_roundtrip(tmp_path):
    from gpufluidsimulation_tpu.solvers.schemes import Scheme
    from gpufluidsimulation_tpu.solvers.smoke2d import Smoke2D, Smoke2DConfig

    cfg = Smoke2DConfig(ni=8, nj=8, L=1.0, scheme=Scheme.SEMILAG)
    solver = Smoke2D(cfg)
    s = solver.init_state()
    s = s.replace(rho=s.rho.at[3, 3].set(1.0), frame=jnp.int32(7))
    p = str(tmp_path / "ck.npz")
    checkpoint.save_state(p, s)
    restored = checkpoint.load_state(p, solver.init_state())
    assert float(restored.rho[3, 3]) == 1.0
    assert int(restored.frame) == 7
