"""Minimal OpenVDB `.vdb` reader written FROM THE SPEC — the external
validation oracle for io_utils/vdb.py (VERDICT r1 item 9).

Deliberately implemented from the OpenVDB serialization format itself
(openvdb/io/Archive.cc, GridDescriptor.cc, tree node serialization as
documented for archive format 224 / openvdb 8.x), NOT from the repo
writer's code: the point is that a wrong format constant in the writer
makes THIS parser (or its golden-bytes assertions) fail, where the
writer's bundled reader would happily round-trip the same mistake.

Scope: single- or multi-grid archives of `Tree_float_5_4_3` FloatGrids,
zip (1) or no (0) per-grid compression, no blosc, no half floats, no
instancing.

Format walked here, top to bottom:

* header: int64 magic 0x56444220; uint32 file version; uint32 library
  major, minor; 1-byte has-grid-offsets; 36 ASCII chars of UUID
  (written raw, not length-prefixed, since format 218).
* archive MetaMap: uint32 entry count; each entry = name string, type
  string, uint32 byte size, payload. Strings are uint32 length + bytes.
* uint32 grid count; per grid a GridDescriptor: unique-name string,
  grid-type string, instance-parent string, int64 grid/block/end
  absolute stream offsets.
* at grid offset: uint32 per-grid compression flags (bit0 = zip);
  grid MetaMap; transform = map-type string + map doubles (AffineMap:
  16; UniformScaleMap and friends are accepted by name and skipped by
  their documented double counts); tree topology:
    - uint32 buffer count (1 for modern archives)
    - root: float background, uint32 tile count, uint32 child count,
      then per child: int32 x,y,z origin + InternalNode<5> topology.
    - internal node Log2Dim L (5 then 4): child bitmask then value
      bitmask, each 2^(3L) bits as little-endian uint64 words; then
      compressed tile values (1 metadata byte + float array, zipped if
      the grid compression says so); then children in ascending
      bit-offset order. Offset n for local coords (cx,cy,cz) in child
      units: n = cx<<2L | cy<<L | cz.
    - leaf (Log2Dim 3): value bitmask only (64 bytes).
* at block offset, per leaf in the same depth-first order: value
  bitmask again, then 1 metadata byte + 512 floats (zipped per the
  compression flags).
  metadata byte 6 = NO_MASK_AND_ALL_VALS (all 512 values present).

Zip framing (io::writeCompressedData): int64 byte count, then zlib
stream; a NEGATIVE count means the bytes are stored uncompressed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

OPENVDB_MAGIC = 0x56444220

# documented double counts of the map types a linear transform can write
_MAP_DOUBLES = {
    "AffineMap": 16,
    "UniformScaleMap": 1,
    "ScaleMap": 3,
    "UniformScaleTranslateMap": 4,
    "ScaleTranslateMap": 6,
    "TranslationMap": 3,
    "UnitaryMap": 16,
}

COMPRESS_ZIP = 1
COMPRESS_ACTIVE_MASK = 2


class Cursor:
    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def bytes(self, n):
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated archive")
        self.pos += n
        return b

    def u8(self):
        return self.bytes(1)[0]

    def u32(self):
        return struct.unpack("<I", self.bytes(4))[0]

    def i32x3(self):
        return struct.unpack("<iii", self.bytes(12))

    def i64(self):
        return struct.unpack("<q", self.bytes(8))[0]

    def f32(self):
        return struct.unpack("<f", self.bytes(4))[0]

    def f64s(self, n):
        return struct.unpack(f"<{n}d", self.bytes(8 * n))

    def string(self):
        return self.bytes(self.u32()).decode("ascii")


def _read_mask_bits(c: Cursor, log2dim: int) -> np.ndarray:
    """A NodeMask<Log2Dim>: 2^(3*Log2Dim) bits as LE uint64 words,
    bit n = linear offset n (LSB-first within each word)."""
    nbits = 1 << (3 * log2dim)
    words = np.frombuffer(c.bytes(nbits // 8), dtype="<u8")
    bits = np.unpackbits(words.view(np.uint8), bitorder="little")
    return bits.astype(bool)


def _read_compressed_floats(c: Cursor, count: int, zipped: bool) -> np.ndarray:
    if zipped:
        n = c.i64()
        if n < 0:  # negative count = stored raw
            raw = c.bytes(-n)
        else:
            raw = zlib.decompress(c.bytes(n))
    else:
        raw = c.bytes(4 * count)
    vals = np.frombuffer(raw, dtype="<f4")
    if vals.size != count:
        raise ValueError(f"value array has {vals.size} floats, wanted {count}")
    return vals


def _read_values_section(c: Cursor, count: int, zipped: bool,
                         mask_compressed: bool) -> np.ndarray:
    """writeCompressedValues: 1 metadata byte then the value array.

    Without the ACTIVE_MASK compression flag the reader consumes all
    `count` values regardless of metadata (Compression.h semantics), so
    metadata 0 (NO_MASK_OR_INACTIVE_VALS) and 6 (NO_MASK_AND_ALL_VALS)
    are both full arrays; the mask-compaction codes (1-5) would change
    the stored count and are rejected — the repo writer must never emit
    them."""
    meta = c.u8()
    if mask_compressed or meta not in (0, 6):
        raise ValueError(f"unsupported value-compression metadata {meta}")
    return _read_compressed_floats(c, count, zipped)


class _Leaf:
    __slots__ = ("origin", "mask", "values")

    def __init__(self, origin):
        self.origin = origin
        self.mask = None
        self.values = None


def _read_internal_topology(c: Cursor, log2dim: int, child_log2sum: int,
                            origin, zipped: bool, leaves: list):
    """InternalNode<Log2Dim>: child mask, value mask, tile values,
    children ascending by bit offset. child_log2sum = total log2 extent
    of one child (e.g. 7 for the level-2 node whose children span 2^7)."""
    nbits = 1 << (3 * log2dim)
    child_mask = _read_mask_bits(c, log2dim)
    _value_mask = _read_mask_bits(c, log2dim)
    # the FULL union value table is serialized (all 2^(3L) slots,
    # including child slots — InternalNode::writeTopology)
    _tiles = _read_values_section(c, nbits, zipped, mask_compressed=False)
    dim = 1 << log2dim
    for n in np.nonzero(child_mask)[0]:
        cx = (n >> (2 * log2dim)) & (dim - 1)
        cy = (n >> log2dim) & (dim - 1)
        cz = n & (dim - 1)
        corigin = (origin[0] + (int(cx) << child_log2sum),
                   origin[1] + (int(cy) << child_log2sum),
                   origin[2] + (int(cz) << child_log2sum))
        if child_log2sum == 3:  # child is a leaf
            leaf = _Leaf(corigin)
            leaf.mask = _read_mask_bits(c, 3)
            leaves.append(leaf)
        elif child_log2sum == 7:  # child is Internal<4> spanning 2^7
            _read_internal_topology(c, 4, 3, corigin, zipped, leaves)
        else:
            raise ValueError(f"unexpected child span 2^{child_log2sum}")


def read_vdb_spec(path_or_bytes):
    """Parse a .vdb archive; returns (header_info, [grids]) where each
    grid is a dict with name, voxel_size, background and a dense numpy
    box (origin + array) covering its active leaves."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        buf = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    c = Cursor(buf)
    magic = c.i64()
    if magic != OPENVDB_MAGIC:
        raise ValueError(f"bad magic {magic:#x}")
    file_version = c.u32()
    lib_major, lib_minor = c.u32(), c.u32()
    has_offsets = c.u8()
    uuid = c.bytes(36).decode("ascii")
    header = dict(file_version=file_version, library=(lib_major, lib_minor),
                  has_grid_offsets=bool(has_offsets), uuid=uuid)

    for _ in range(c.u32()):  # archive MetaMap
        _name = c.string()
        _typ = c.string()
        c.bytes(c.u32())

    grids = []
    for _ in range(c.u32()):
        name = c.string()
        grid_type = c.string()
        _instance_parent = c.string()
        grid_pos, block_pos, _end_pos = c.i64(), c.i64(), c.i64()
        if not grid_type.startswith("Tree_float_5_4_3"):
            raise ValueError(f"unsupported grid type {grid_type}")

        g = Cursor(buf, grid_pos)
        compression = g.u32()
        if compression & ~(COMPRESS_ZIP | COMPRESS_ACTIVE_MASK):
            raise ValueError(f"unsupported compression flags {compression}")
        zipped = bool(compression & COMPRESS_ZIP)
        meta = {}
        for _ in range(g.u32()):  # grid MetaMap
            mname = g.string()
            mtyp = g.string()
            payload = g.bytes(g.u32())
            meta[mname] = (mtyp, payload)
        map_type = g.string()
        if map_type not in _MAP_DOUBLES:
            raise ValueError(f"unknown transform map {map_type}")
        map_data = g.f64s(_MAP_DOUBLES[map_type])
        if map_type == "AffineMap":
            voxel_size = map_data[0]  # m[0][0] of the 4x4, uniform scale
        else:
            voxel_size = map_data[0]

        buffer_count = g.u32()
        if buffer_count != 1:
            raise ValueError(f"multi-buffer trees unsupported ({buffer_count})")
        background = g.f32()
        n_tiles = g.u32()
        n_children = g.u32()
        if n_tiles:
            raise ValueError("root tiles unsupported")
        leaves: list[_Leaf] = []
        for _ in range(n_children):
            origin = g.i32x3()
            # root child = InternalNode<5> spanning 2^12, its children
            # are InternalNode<4> each spanning 2^7
            _read_internal_topology(g, 5, 7, origin, zipped, leaves)

        b = Cursor(buf, block_pos)
        for leaf in leaves:
            leaf.mask = _read_mask_bits(b, 3)
            leaf.values = _read_values_section(b, 512, zipped,
                                               mask_compressed=False)

        if leaves:
            orgs = np.array([lf.origin for lf in leaves])
            lo = orgs.min(axis=0)
            hi = (orgs + 8).max(axis=0)
            dense = np.zeros(tuple(hi - lo), np.float32)
            for lf in leaves:
                block = lf.values.reshape(8, 8, 8)  # x-major, z fastest
                block = np.where(lf.mask.reshape(8, 8, 8), block, 0.0)
                o = np.array(lf.origin) - lo
                dense[o[0]:o[0] + 8, o[1]:o[1] + 8, o[2]:o[2] + 8] = block
        else:
            lo = np.zeros(3, np.int64)
            dense = np.zeros((0, 0, 0), np.float32)
        grids.append(dict(name=name, grid_type=grid_type,
                          compression=compression, meta=meta,
                          map_type=map_type, voxel_size=voxel_size,
                          background=background, origin=tuple(lo),
                          dense=dense))
    return header, grids
