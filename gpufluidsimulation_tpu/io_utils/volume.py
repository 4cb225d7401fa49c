"""Sparse volume export — the role of writeVDB (utils/volumeMeshTools.h:33-60):
dense density -> sparse voxel set thresholded at 1e-4, one file per frame.

OpenVDB is not available in this environment, so the canonical container is a
compressed NPZ holding the COO voxel set + transform metadata (loadable by
any DCC pipeline via a 10-line script); when `pyopenvdb` IS importable we
write a real .vdb FOG volume with the same name/threshold semantics.
"""

from __future__ import annotations

import os
import struct

import numpy as np

DENSITY_THRESHOLD = 1e-4  # volumeMeshTools.h:46

try:  # native async IO runtime (see native/gfs_io.c; build with native/build.sh)
    from gpufluidsimulation_tpu.native import gfs_io as _gfs_io
except ImportError:  # pure-python fallback
    _gfs_io = None


def write_volume(frame: int, filepath: str, voxel_size: float, density,
                 name: str = "density", fmt: str | None = None) -> str:
    """Matches writeVDB's signature (frame, path, dx, field); returns the
    written filename. File pattern follows the reference: `<path>/%04d.vdb`
    (volumeMeshTools.h:37-40). Default format is a real .vdb written by
    the dependency-free io_utils.vdb serializer (pyopenvdb used instead
    when importable); `fmt` / GFS_VOLUME_FORMAT selects 'vdb', 'gfsvol'
    (native async sparse COO) or 'npz'.
    """
    os.makedirs(filepath, exist_ok=True)
    dense = np.asarray(density, np.float32)
    fmt = fmt or os.environ.get("GFS_VOLUME_FORMAT", "auto")
    if fmt in ("auto", "vdb"):
        try:
            import pyopenvdb as vdb  # pragma: no cover - not in CI image

            grid = vdb.FloatGrid()
            grid.copyFromArray(dense, tolerance=DENSITY_THRESHOLD)
            grid.transform = vdb.createLinearTransform(voxelSize=voxel_size)
            grid.name = name
            grid.gridClass = vdb.GridClass.FOG_VOLUME
            out = os.path.join(filepath, f"{frame:04d}.vdb")
            vdb.write(out, grids=[grid])
            return out
        except ImportError:
            pass
        from gpufluidsimulation_tpu.io_utils import vdb as _vdb

        payload = _vdb.pack_vdb(dense, voxel_size, name=name,
                                threshold=DENSITY_THRESHOLD)
        out = os.path.join(filepath, f"{frame:04d}.vdb")
        if _gfs_io is not None:
            _gfs_io.async_write(out, payload)   # background writer thread
        else:
            with open(out, "wb") as f:
                f.write(payload)
        return out
    if _gfs_io is not None and fmt == "gfsvol":
        # native path: C single-pass packer + background writer thread, so
        # the frame loop never blocks on disk (flush_volumes() to drain)
        payload = _gfs_io.pack_sparse(
            np.ascontiguousarray(dense).tobytes(), dense.shape,
            float(voxel_size), DENSITY_THRESHOLD,
        )
        out = os.path.join(filepath, f"{frame:04d}.gfsvol")
        _gfs_io.async_write(out, payload)
        return out
    mask = dense > DENSITY_THRESHOLD
    idx = np.argwhere(mask).astype(np.int32)
    vals = dense[mask]
    out = os.path.join(filepath, f"{frame:04d}.npz")
    np.savez_compressed(
        out,
        indices=idx,
        values=vals,
        shape=np.asarray(dense.shape, np.int32),
        voxel_size=np.float32(voxel_size),
        name=name,
        active_count=np.int64(vals.size),  # voxel count log (h:49)
    )
    return out


def flush_volumes() -> int:
    """Drain the native writer queue; returns the error count (0 = ok)."""
    if _gfs_io is not None:
        return int(_gfs_io.flush())
    return 0


def read_volume(path: str):
    """Load a sparse volume back to dense (for tests / resume)."""
    if path.endswith(".vdb"):
        from gpufluidsimulation_tpu.io_utils import vdb as _vdb

        return _vdb.read_vdb(path)
    if path.endswith(".gfsvol"):
        raw = open(path, "rb").read()
        magic, ver, nx, ny, nz, vox, count = struct.unpack("<4sIIIIfQ", raw[:32])
        if magic != b"GFSV" or ver != 1:
            raise ValueError(f"bad gfsvol header in {path}")
        off = 32
        idx = np.frombuffer(raw, np.uint32, count, off)
        vals = np.frombuffer(raw, np.float32, count, off + 4 * count)
        dense = np.zeros(nx * ny * nz, np.float32)
        dense[idx] = vals
        return dense.reshape(nx, ny, nz), float(vox)
    with np.load(path, allow_pickle=False) as z:
        dense = np.zeros(tuple(z["shape"]), np.float32)
        idx = z["indices"]
        dense[idx[:, 0], idx[:, 1], idx[:, 2]] = z["values"]
        return dense, float(z["voxel_size"])


def write_levelset_txt(path: str, frame: int, sdf) -> str:
    """outputLevelset parity (BimocqSolver2D.cpp:2369-2386): rows = i, cols
    = j, space-separated."""
    os.makedirs(path, exist_ok=True)
    out = os.path.join(path, f"levelset_{frame:04d}.txt")
    a = np.asarray(sdf, np.float32)
    with open(out, "w") as f:
        lines = [" ".join(f"{v:g}" for v in row) + " " for row in a]
        f.write("\n".join(lines))
    return out
