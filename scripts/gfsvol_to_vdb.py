#!/usr/bin/env python
"""Convert .gfsvol / .npz sparse volume frames to real OpenVDB .vdb files.

The simulation container has no OpenVDB bindings, so the engine writes its
own sparse container (io_utils/volume.py — the writeVDB role,
utils/volumeMeshTools.h:33-60). Run THIS script wherever `pyopenvdb` (or
the `openvdb` wheel) is installed to produce FOG-volume .vdb files that
match the reference's output semantics (grid name, 1e-4 threshold,
uniform-scale transform):

    python scripts/gfsvol_to_vdb.py Out/3D-BiMocq-Tpu/*.gfsvol -o vdb_out/
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_any(path):
    from gpufluidsimulation_tpu.io_utils.volume import read_volume

    if path.endswith(".npz"):
        import numpy as np

        z = np.load(path)
        dense = np.zeros(tuple(z["shape"]), np.float32)
        dense[tuple(z["indices"].T)] = z["values"]
        return dense, float(z["voxel_size"])
    return read_volume(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-o", "--out-dir", default=".")
    ap.add_argument("--name", default="density")
    args = ap.parse_args()

    try:
        import pyopenvdb as vdb
    except ImportError:
        try:
            import openvdb as vdb
        except ImportError:
            vdb = None  # fall back to the in-tree serializer

    os.makedirs(args.out_dir, exist_ok=True)
    for path in args.inputs:
        dense, voxel = load_any(path)
        out = os.path.join(
            args.out_dir,
            os.path.splitext(os.path.basename(path))[0] + ".vdb")
        if vdb is None:
            from gpufluidsimulation_tpu.io_utils.vdb import write_vdb

            write_vdb(out, dense, voxel, name=args.name, threshold=1e-4)
        else:
            grid = vdb.FloatGrid()
            grid.copyFromArray(dense, tolerance=1e-4)
            grid.transform = vdb.createLinearTransform(voxelSize=voxel)
            grid.name = args.name
            grid.gridClass = vdb.GridClass.FOG_VOLUME
            vdb.write(out, grids=[grid])
        print(out)


if __name__ == "__main__":
    main()
