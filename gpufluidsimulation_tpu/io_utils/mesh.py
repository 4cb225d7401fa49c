"""Mesh <-> level-set utilities — the role of utils/volumeMeshTools.h without
OpenVDB:

* read_obj / write_obj      <-> writeObj (volumeMeshTools.h:20-31) and the
                                OBJ loading half of readMeshToLevelset
* mesh_to_sdf               <-> readMeshToLevelset (volumeMeshTools.h:62-110,
                                meshToLevelSet): triangle mesh -> signed
                                distance sampled on the solver's cell
                                lattice (x = i*h, the 3D convention)
* sdf_to_mesh               <-> the volumeToMesh half of the boundary-mesh
                                export (BimocqSolver.cpp:1428): marching
                                tetrahedra over the SDF's zero set

Pure NumPy, vectorized: unsigned distance by chunked exact point-triangle
distance, sign by z-column ray-crossing parity (robust for closed meshes).
"""

from __future__ import annotations

import numpy as np


def read_obj(path: str):
    """Minimal OBJ reader: v/f records (f may be polygonal — fan-split)."""
    verts = []
    faces = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("v "):
                verts.append([float(t) for t in line.split()[1:4]])
            elif line.startswith("f "):
                idx = [int(t.split("/")[0]) - 1 for t in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return (np.asarray(verts, np.float32),
            np.asarray(faces, np.int32).reshape(-1, 3))


def write_obj(path: str, verts, faces) -> str:
    """writeObj parity (volumeMeshTools.h:20-31): v lines then 1-based f
    lines; quads are passed through, triangles as-is."""
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int64)
    with open(path, "w") as fh:
        for v in verts:
            fh.write(f"v {v[0]:g} {v[1]:g} {v[2]:g}\n")
        for f in faces:
            fh.write("f " + " ".join(str(int(i) + 1) for i in f) + "\n")
    return path


def _point_triangle_distance(p, a, b, c):
    """Exact unsigned distance from points p (N,3) to ONE triangle (a,b,c).
    Vectorized region classification (Ericson, Real-Time Collision
    Detection §5.1.5)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = ap @ ab
    d2 = ap @ ac
    bp = p - b
    d3 = bp @ ab
    d4 = bp @ ac
    cp = p - c
    d5 = cp @ ab
    d6 = cp @ ac
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_bc = (d4 - d3) + (d5 - d6)
    w_bc = np.where(np.abs(denom_bc) > 1e-30, (d4 - d3) / np.where(
        np.abs(denom_bc) > 1e-30, denom_bc, 1.0), 0.0)
    w_bc = np.clip(w_bc, 0.0, 1.0)

    dot_ab = ab @ ab
    dot_ac = ac @ ac
    t_ab = np.clip(d1 / np.maximum(dot_ab, 1e-30), 0.0, 1.0)
    t_ac = np.clip(d2 / np.maximum(dot_ac, 1e-30), 0.0, 1.0)

    # interior projection
    denom = np.maximum(va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom
    proj = a + v[:, None] * ab + w[:, None] * ac

    cand_a = a + t_ab[:, None] * ab            # edge AB
    cand_b = a + t_ac[:, None] * ac            # edge AC
    cand_c = b + w_bc[:, None] * (c - b)       # edge BC

    in_face = (vc >= 0) & (vb >= 0) & (va >= 0)
    best = np.where(in_face[:, None], proj, cand_a)
    d_best = np.einsum("ij,ij->i", p - best, p - best)
    for cand in (cand_b, cand_c):
        d_c = np.einsum("ij,ij->i", p - cand, p - cand)
        better = d_c < d_best
        best = np.where(better[:, None], cand, best)
        d_best = np.where(better, d_c, d_best)
    return np.sqrt(d_best)


def mesh_to_sdf(verts, faces, shape, h, origin=(0.0, 0.0, 0.0),
                band=np.inf):
    """Signed distance of a closed triangle mesh on the cell lattice
    x = origin + i*h (the solver's 3D convention).

    Unsigned part: exact min point-triangle distance (chunked over
    triangles). Sign: parity of triangle crossings below each sample along
    +z (robust for watertight meshes). `band` caps the unsigned distance
    (values beyond are clamped — the narrow-band role of meshToLevelSet's
    halfWidth)."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces, np.int64)
    nx, ny, nz = shape
    xs = origin[0] + h * np.arange(nx)
    ys = origin[1] + h * np.arange(ny)
    zs = origin[2] + h * np.arange(nz)
    P = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    pts = P.reshape(-1, 3)

    dist = np.full(pts.shape[0], np.inf)
    tri = verts[faces]  # (M, 3, 3)
    # prune triangles per chunk by bounding-sphere distance
    tri_c = tri.mean(axis=1)
    tri_r = np.sqrt(((tri - tri_c[:, None]) ** 2).sum(-1)).max(axis=1)
    for m in range(tri.shape[0]):
        a, b, c = tri[m]
        lb = np.sqrt(((pts - tri_c[m]) ** 2).sum(-1)) - tri_r[m]
        sel = lb < np.minimum(dist, band)
        if not sel.any():
            continue
        d = _point_triangle_distance(pts[sel], a, b, c)
        dist[sel] = np.minimum(dist[sel], d)
    dist = np.minimum(dist, band)

    # sign by +z ray parity per (x, y) column
    inside = np.zeros((nx, ny, nz), bool)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    for m in range(tri.shape[0]):
        a, b, c = tri[m]
        # 2D (x, y) point-in-triangle test for every column node
        x0, y0 = a[0], a[1]
        x1, y1 = b[0], b[1]
        x2, y2 = c[0], c[1]
        det = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)
        if abs(det) < 1e-30:
            continue
        l0 = ((y1 - y2) * (X - x2) + (x2 - x1) * (Y - y2)) / det
        l1 = ((y2 - y0) * (X - x2) + (x0 - x2) * (Y - y2)) / det
        l2 = 1.0 - l0 - l1
        hit = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        if not hit.any():
            continue
        zhit = l0 * a[2] + l1 * b[2] + l2 * c[2]
        # toggle all cells with z < crossing (crossing above -> inside flips)
        cross = hit[:, :, None] & (zs[None, None, :] < zhit[:, :, None])
        inside ^= cross
    sdf = dist.reshape(shape)
    sdf[inside] = -sdf[inside]
    return sdf.astype(np.float32)


# marching-tetrahedra edge pairs for the 6-tet cube decomposition
_TETS = np.asarray([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
])
_CUBE = np.asarray([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
])


def sdf_to_mesh(sdf, h, origin=(0.0, 0.0, 0.0), iso=0.0):
    """Triangulate the iso-surface of a voxel SDF by marching tetrahedra
    (the volumeToMesh role in the reference's boundary-mesh export,
    BimocqSolver.cpp:1422-1428). Returns (verts, tris)."""
    sdf = np.asarray(sdf, np.float32)
    nx, ny, nz = sdf.shape
    verts = []
    tris = []
    # cube corner values for all cells, vectorized gather
    ii, jj, kk = np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                             np.arange(nz - 1), indexing="ij")
    cell_idx = np.stack([ii, jj, kk], axis=-1).reshape(-1, 3)
    corner_vals = np.stack(
        [sdf[cell_idx[:, 0] + dx, cell_idx[:, 1] + dy, cell_idx[:, 2] + dz]
         for dx, dy, dz in _CUBE], axis=-1)  # (C, 8)
    active = (corner_vals.min(axis=1) < iso) & (corner_vals.max(axis=1) > iso)
    cell_idx = cell_idx[active]
    corner_vals = corner_vals[active]
    org = np.asarray(origin, np.float64)
    for cell, vals in zip(cell_idx, corner_vals):
        corners = (cell[None, :] + _CUBE) * h + org
        for tet in _TETS:
            tv = vals[tet]
            tp = corners[tet]
            neg = tv < iso
            n = int(neg.sum())
            if n == 0 or n == 4:
                continue
            ins = np.where(neg)[0]
            outs = np.where(~neg)[0]

            def edge_pt(i_in, i_out):
                t = (iso - tv[i_in]) / (tv[i_out] - tv[i_in])
                return tp[i_in] + t * (tp[i_out] - tp[i_in])

            base = len(verts)
            if n == 1 or n == 3:
                apex = ins[0] if n == 1 else outs[0]
                ring = outs if n == 1 else ins
                pts = [edge_pt(apex, r) if n == 1 else edge_pt(r, apex)
                       for r in ring]
                verts.extend(pts)
                tris.append([base, base + 1, base + 2])
            else:  # n == 2: quad -> two triangles
                p00 = edge_pt(ins[0], outs[0])
                p01 = edge_pt(ins[0], outs[1])
                p10 = edge_pt(ins[1], outs[0])
                p11 = edge_pt(ins[1], outs[1])
                verts.extend([p00, p01, p11, p10])
                tris.append([base, base + 1, base + 2])
                tris.append([base, base + 2, base + 3])
    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    return (np.asarray(verts, np.float32), np.asarray(tris, np.int32))
