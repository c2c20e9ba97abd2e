import numpy as np
import pytest

from dreammesh4d_tpu.export.isosurface import (
    extract_isosurface,
    marching_cubes,
    remove_small_components,
)
from dreammesh4d_tpu.export.mesh_io import MeshData


def sphere_density(res=48, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    r = np.sqrt(x**2 + y**2 + z**2)
    return (radius - r).astype(np.float32)  # positive inside


def test_sphere_extraction():
    density = sphere_density()
    mesh = extract_isosurface(density, threshold=0.0)
    assert mesh.n_verts > 200 and mesh.n_faces > 400
    r = np.linalg.norm(mesh.v_pos, axis=-1)
    # all vertices near the radius-0.6 sphere
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert r.std() < 0.02


def test_orientation_outward():
    density = sphere_density()
    mesh = extract_isosurface(density, threshold=0.0)
    v = mesh.v_pos[mesh.t_pos_idx]
    n = np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0])
    centers = v.mean(1)
    dots = (n * centers).sum(-1)
    # outward normals on a sphere point along the position vector
    assert (dots > 0).mean() > 0.99


def test_watertight_connectivity():
    density = sphere_density(res=24)
    verts, faces = marching_cubes(density, 0.0)
    # every edge appears exactly twice (closed surface)
    edges = {}
    for (a, b, c) in faces:
        for (u, v) in ((a, b), (b, c), (c, a)):
            key = (min(u, v), max(u, v))
            edges[key] = edges.get(key, 0) + 1
    counts = np.asarray(list(edges.values()))
    assert (counts == 2).all()
    # Euler characteristic of a sphere: V - E + F = 2
    assert len(verts) - len(edges) + len(faces) == 2


def test_auto_threshold():
    density = sphere_density()
    density = np.maximum(density, 0.0) * 10  # density-style field
    mesh = extract_isosurface(density, threshold=None)
    assert mesh.n_verts > 100
    r = np.linalg.norm(mesh.v_pos, axis=-1)
    assert 0.2 < r.mean() < 0.6


def test_remove_small_components():
    density = sphere_density()
    # add a tiny blob in a corner
    density[2:5, 2:5, 2:5] = 0.5
    mesh_keep = extract_isosurface(density, threshold=0.0, remove_outliers=False)
    mesh_clean = extract_isosurface(density, threshold=0.0, remove_outliers=True)
    assert mesh_clean.n_faces < mesh_keep.n_faces
    r = np.linalg.norm(mesh_clean.v_pos, axis=-1)
    assert r.max() < 0.95  # corner blob (near sqrt(3)) removed
