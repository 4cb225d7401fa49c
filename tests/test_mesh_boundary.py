"""Mesh -> level-set -> simulation pipeline (the readMeshToLevelset /
writeObj tier, utils/volumeMeshTools.h:20-110) and the generalized
voxel-SDF emitters/boundaries with motion (BimocqSolver.h:31-80)."""

import os
import tempfile

import numpy as np
import pytest
import jax.numpy as jnp

from gpufluidsimulation_tpu.io_utils import mesh as M
from gpufluidsimulation_tpu.solvers.schemes import Scheme
from gpufluidsimulation_tpu.solvers.smoke3d import (
    Boundary3D,
    Emitter3D,
    Smoke3D,
    Smoke3DConfig,
)


def _octasphere(r, sub=2):
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0],
                      [0, 0, 1], [0, 0, -1]], float)
    faces = [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
             [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]]
    for _ in range(sub):
        vl = verts.tolist()
        cache = {}

        def mid(i, j):
            key = (min(i, j), max(i, j))
            if key not in cache:
                m = (np.array(vl[i]) + np.array(vl[j])) / 2
                m = m / np.linalg.norm(m)
                cache[key] = len(vl)
                vl.append(m.tolist())
            return cache[key]

        nf = []
        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        faces = nf
        verts = np.array(vl)
    return (verts * r).astype(np.float32), np.asarray(faces, np.int32)


def test_mesh_to_sdf_matches_analytic_sphere():
    r = 0.05
    v, f = _octasphere(r, sub=3)
    n = 20
    h = 0.2 / n
    c = 0.08
    sdf = M.mesh_to_sdf(v + c, f, (n, n, n), h)
    x = np.arange(n) * h
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    exact = np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2) - r
    assert np.abs(sdf - exact).max() < 0.25 * h
    # sign agreement away from the surface
    far = np.abs(exact) > 0.5 * h
    assert (np.sign(sdf[far]) == np.sign(exact[far])).all()


def test_obj_roundtrip_and_remesh(tmp_path):
    r = 0.05
    v, f = _octasphere(r, sub=2)
    p = os.path.join(tmp_path, "sphere.obj")
    M.write_obj(p, v, f)
    v2, f2 = M.read_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    assert f2.shape == f.shape
    # sdf -> mesh (the volumeToMesh half of the boundary export)
    n = 24
    h = 0.2 / n
    sdf = M.mesh_to_sdf(v + 0.1, f, (n, n, n), h)
    rv, rt = M.sdf_to_mesh(sdf, h)
    assert len(rt) > 100
    rad = np.sqrt(((rv - 0.1) ** 2).sum(axis=1))
    assert abs(float(rad.mean()) - r) < 1.5 * h


@pytest.mark.slow
def test_mesh_boundary_in_simulation():
    """An OBJ-derived moving obstacle runs through the full BiMocq step
    (VERDICT round-1 item 8)."""
    n = 16
    h = 0.2 / n
    r = 0.03
    v, f = _octasphere(r, sub=2)
    m = 10
    csd = (m - 1) * h / 2
    sdf = M.mesh_to_sdf(v + csd, f, (m, m, m), h)

    cfg = Smoke3DConfig(
        ni=n, nj=n, nk=n, L=0.2, dt=0.02, scheme=Scheme.BIMOCQ,
        viscosity=0.0, proj_tol=1e-4, proj_max_iters=60,
        emitters=(Emitter3D(center=(0.04, 0.1, 0.1), radius=0.03, sign=1.0),),
        boundaries=(Boundary3D(
            center=(0.10, 0.06, 0.06), kind="voxel", sdf_grid=sdf,
            trans=lambda fr: (0.0, 0.0005 * fr, 0.0),
        ),),
    )
    solver = Smoke3D(cfg)
    s = solver.init_state()
    for _ in range(3):
        s = solver.step(s)
    rho = np.asarray(s.rho)
    assert np.all(np.isfinite(rho))
    # density cleared inside the (moved) obstacle center
    g = solver.grid
    x, y, z = [np.asarray(c) for c in g.node_coords("c")]
    cx, cy = 0.10 + csd, 0.06 + csd + 0.0005 * 2
    cz = 0.06 + csd
    inside = np.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2) < 0.8 * r
    assert np.abs(rho[inside]).max() < 1e-5


def test_voxel_emitter_with_motion_and_velocity_lambda():
    n = 16
    h = 0.2 / n
    m = 8
    x = np.arange(m) * h
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    c = (m - 1) * h / 2
    sdf = (np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2)
           - 0.03).astype(np.float32)

    def em_vel(X, Y, Z):
        return (0.05 * jnp.ones_like(X), jnp.zeros_like(Y),
                jnp.zeros_like(Z))

    cfg = Smoke3DConfig(
        ni=n, nj=n, nk=n, L=0.2, dt=0.02, scheme=Scheme.SEMILAG,
        viscosity=0.0, proj_tol=1e-4, proj_max_iters=40,
        emitters=(Emitter3D(center=(0.02, 0.06, 0.06), sdf_grid=sdf,
                            emit_velocity=em_vel,
                            trans=lambda fr: (0.002 * fr, 0.0, 0.0)),),
    )
    solver = Smoke3D(cfg)
    s = solver.init_state()
    for _ in range(3):
        s = solver.step(s)
    rho = np.asarray(s.rho)
    assert np.all(np.isfinite(rho))
    assert rho.max() > 0.5  # emission happened
    assert np.abs(np.asarray(s.u)).max() > 1e-3  # emitted velocity acted
