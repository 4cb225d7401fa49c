"""The dependency-free .vdb writer (io_utils/vdb.py) — the writeVDB format
parity path (utils/volumeMeshTools.h:33-60). No OpenVDB exists in this
image, so correctness is established by: exact round-trips through the
module's own independent reader, byte-level header/structure assertions
against the published format constants, and semantic parity with the
.gfsvol threshold path."""

import struct

import numpy as np
import pytest

from gpufluidsimulation_tpu.io_utils import vdb


def _roundtrip(dense, voxel=0.5, **kw):
    data = vdb.pack_vdb(dense, voxel, **kw)
    out, v = vdb.read_vdb(data)
    return data, out, v


@pytest.mark.parametrize("compress", [vdb.COMPRESS_NONE, vdb.COMPRESS_ZIP])
@pytest.mark.parametrize("shape", [(8, 8, 8), (5, 9, 13), (32, 16, 24),
                                   (130, 7, 140)])
def test_roundtrip_random(rng, shape, compress):
    dense = (rng.random(shape) < 0.2).astype(np.float32) * rng.random(shape)
    dense = dense.astype(np.float32)
    _, out, v = _roundtrip(dense, voxel=0.25, compress=compress)
    assert v == 0.25
    nx, ny, nz = dense.shape
    sub = out[:nx, :ny, :nz] if out.size else np.zeros_like(dense)
    full = np.zeros_like(dense)
    full[:sub.shape[0], :sub.shape[1], :sub.shape[2]] = sub
    np.testing.assert_array_equal(full, dense)
    # nothing active outside the original extent
    assert out.size == 0 or float(np.abs(out).sum()) == pytest.approx(
        float(np.abs(dense).sum()))


def test_empty_volume():
    data, out, _ = _roundtrip(np.zeros((16, 16, 16), np.float32))
    assert out.size == 0
    # header still parses: magic + version
    assert struct.unpack("<q", data[:8])[0] == vdb.MAGIC
    assert struct.unpack("<I", data[8:12])[0] == vdb.FILE_VERSION


def test_threshold_semantics():
    dense = np.full((8, 8, 8), 1e-5, np.float32)
    dense[0, 0, 0] = 0.5
    _, out, _ = _roundtrip(dense, threshold=1e-4)
    # below-threshold voxels are background, not stored values
    assert out[0, 0, 0] == np.float32(0.5)
    assert np.count_nonzero(out) == 1


def test_multi_internal_block_ordering():
    """Active voxels in different 128-span internal nodes must serialize in
    nested (block, leaf) traversal order — plain lexicographic voxel order
    would scramble the leaves between blocks."""
    dense = np.zeros((160, 16, 160), np.float32)
    pts = [(0, 0, 136), (8, 0, 0), (129, 3, 2), (0, 2, 129), (130, 0, 131)]
    for i, p in enumerate(pts):
        dense[p] = 1.0 + i
    _, out, _ = _roundtrip(dense)
    for i, p in enumerate(pts):
        assert out[p] == np.float32(1.0 + i)
    assert np.count_nonzero(out) == len(pts)


def test_header_layout():
    data = vdb.pack_vdb(np.ones((8, 8, 8), np.float32), 0.1, name="rho")
    magic, version, maj, mnr = struct.unpack("<qIII", data[:20])
    assert magic == 0x56444220
    assert data[:4] == b" BDV"                  # little-endian magic text
    assert version == 224
    assert data[20:21] == b"\x01"               # has grid offsets
    uuid = data[21:57].decode()
    assert len(uuid) == 36 and uuid.count("-") == 4
    n_filemeta, n_grids = struct.unpack("<II", data[57:65])
    assert n_filemeta == 0 and n_grids == 1
    # grid descriptor: name, type, instance parent
    ln = struct.unpack("<I", data[65:69])[0]
    assert data[69:69 + ln] == b"rho"
    o = 69 + ln
    ln = struct.unpack("<I", data[o:o + 4])[0]
    assert data[o + 4:o + 4 + ln] == b"Tree_float_5_4_3"
    o += 4 + ln
    assert struct.unpack("<I", data[o:o + 4])[0] == 0   # no instance parent
    o += 4
    grid_pos, block_pos, end_pos = struct.unpack("<qqq", data[o:o + 24])
    assert grid_pos == o + 24
    assert grid_pos < block_pos <= end_pos == len(data)


def test_leaf_mask_popcount_matches_active(rng):
    dense = (rng.random((24, 24, 24)) < 0.3).astype(np.float32)
    data = vdb.pack_vdb(dense, 1.0, compress=vdb.COMPRESS_NONE)
    out, _ = vdb.read_vdb(data)
    assert np.count_nonzero(out) == np.count_nonzero(dense)


def test_write_volume_vdb_path(tmp_path, rng):
    from gpufluidsimulation_tpu.io_utils import volume

    dense = np.zeros((16, 16, 16), np.float32)
    dense[4:8, 4:8, 4:8] = rng.random((4, 4, 4)).astype(np.float32) + 0.5
    out = volume.write_volume(3, str(tmp_path), 0.125, dense, fmt="vdb")
    assert out.endswith("0003.vdb")
    volume.flush_volumes()
    back, vox = volume.read_volume(out)
    assert vox == 0.125
    full = np.zeros_like(dense)
    full[:back.shape[0], :back.shape[1], :back.shape[2]] = back
    np.testing.assert_array_equal(full, dense)
