"""External-style validation of the .vdb writer (VERDICT r1 item 9):
parse written archives with tests/vdb_spec_reader.py — a minimal reader
implemented from the OpenVDB serialization spec, independent of the
writer's own code — plus golden-bytes assertions on the archive header
and grid descriptor, which would fail if any format constant drifted."""

import struct

import numpy as np
import pytest

from gpufluidsimulation_tpu.io_utils import vdb

from tests.vdb_spec_reader import read_vdb_spec


def _tiny_grid():
    dense = np.zeros((8, 8, 8), np.float32)
    dense[1, 2, 3] = 0.75
    dense[7, 7, 7] = 0.25
    return dense


def test_golden_header_bytes():
    buf = vdb.pack_vdb(_tiny_grid(), voxel_size=0.5, name="density")

    # int64 magic 0x56444220 (" BDV") little-endian — openvdb/io/Archive
    assert buf[0:8] == bytes([0x20, 0x42, 0x44, 0x56, 0, 0, 0, 0])
    file_version = struct.unpack("<I", buf[8:12])[0]
    assert file_version == 224  # archive format the reference era writes
    lib_major, lib_minor = struct.unpack("<II", buf[12:20])
    assert (lib_major, lib_minor) >= (8, 0)  # format-224 library line
    assert buf[20] in (0, 1)  # has-grid-offsets bool byte
    uuid = buf[21:57].decode("ascii")  # 36 raw ASCII chars since fmt 218
    assert len(uuid) == 36 and uuid.count("-") == 4
    for i, ch in enumerate(uuid):
        if i in (8, 13, 18, 23):
            assert ch == "-"
        else:
            assert ch in "0123456789abcdefABCDEF"


def test_golden_grid_descriptor():
    buf = vdb.pack_vdb(_tiny_grid(), voxel_size=0.5, name="density")
    # walk: header(57) + archive MetaMap + grid count, all from the spec
    pos = 57
    (n_meta,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    for _ in range(n_meta):
        for _s in range(2):  # name, type strings
            (ln,) = struct.unpack_from("<I", buf, pos)
            pos += 4 + ln
        (sz,) = struct.unpack_from("<I", buf, pos)
        pos += 4 + sz
    (n_grids,) = struct.unpack_from("<I", buf, pos)
    pos += 4
    assert n_grids == 1
    (ln,) = struct.unpack_from("<I", buf, pos)
    assert buf[pos + 4:pos + 4 + ln] == b"density"  # unique name
    pos += 4 + ln
    (ln,) = struct.unpack_from("<I", buf, pos)
    assert buf[pos + 4:pos + 4 + ln] == b"Tree_float_5_4_3"  # grid type
    pos += 4 + ln
    (ln,) = struct.unpack_from("<I", buf, pos)  # instance parent (empty)
    assert ln == 0
    pos += 4
    grid_pos, block_pos, end_pos = struct.unpack_from("<qqq", buf, pos)
    assert 0 < grid_pos <= block_pos <= end_pos <= len(buf)


def test_spec_reader_roundtrip_tiny():
    dense = _tiny_grid()
    buf = vdb.pack_vdb(dense, voxel_size=0.5, name="density")
    header, grids = read_vdb_spec(buf)
    assert header["file_version"] == 224
    (g,) = grids
    assert g["name"] == "density"
    assert g["voxel_size"] == pytest.approx(0.5)
    o = g["origin"]
    got = g["dense"]
    assert got[1 - o[0], 2 - o[1], 3 - o[2]] == pytest.approx(0.75)
    assert got[7 - o[0], 7 - o[1], 7 - o[2]] == pytest.approx(0.25)
    assert float(np.abs(got).sum()) == pytest.approx(1.0)


def test_spec_reader_multi_leaf_internal_offsets():
    """17^3 grid spans multiple leaves AND multiple Internal<4> nodes —
    exercises the child-offset formula n = cx<<2L | cy<<L | cz and the
    depth-first leaf-buffer order at both internal levels."""
    rng = np.random.default_rng(7)
    dense = (rng.random((17, 17, 17)) < 0.2).astype(np.float32)
    dense *= rng.random((17, 17, 17)).astype(np.float32) + 0.5
    buf = vdb.pack_vdb(dense, voxel_size=0.1, name="density")
    _, (g,) = read_vdb_spec(buf)
    o = g["origin"]
    got = g["dense"]
    sub = got[-o[0]:-o[0] + 17, -o[1]:-o[1] + 17, -o[2]:-o[2] + 17] \
        if any(v < 0 for v in o) else got[:17, :17, :17]
    # embed the source into the leaf-aligned box for comparison
    box = np.zeros_like(got)
    box[(0 - o[0]):(17 - o[0]), (0 - o[1]):(17 - o[1]),
        (0 - o[2]):(17 - o[2])] = dense
    np.testing.assert_allclose(got, box, rtol=0, atol=0)


def test_spec_reader_uncompressed():
    dense = _tiny_grid()
    buf = vdb.pack_vdb(dense, voxel_size=0.5, name="density", compress=0)
    _, (g,) = read_vdb_spec(buf)
    assert g["compression"] == 0
    o = g["origin"]
    assert g["dense"][1 - o[0], 2 - o[1], 3 - o[2]] == pytest.approx(0.75)
