"""Quadric edge-collapse decimation (export/decimate.py + native qem_decimate.cpp)."""

import numpy as np
import pytest

from dreammesh4d_tpu.export.decimate import quadric_decimate
from dreammesh4d_tpu.export.mesh_io import MeshData
from dreammesh4d_tpu.utils.procedural import make_icosphere


def _euler_closed(nv, ne, nf):
    return nv - ne + nf


def _edge_count(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    return len(np.unique(e, axis=0))


def test_sphere_decimation_hits_target_and_stays_closed():
    mesh = make_icosphere(3, radius=1.0)  # 642 verts, 1280 faces
    out = quadric_decimate(mesh, target_faces=320)
    assert out.n_faces <= 330
    assert out.n_faces >= 100
    # still a closed 2-manifold sphere: Euler characteristic 2
    chi = _euler_closed(out.n_verts, _edge_count(out.t_pos_idx), out.n_faces)
    assert chi == 2
    # vertices stay near the unit sphere (QEM optimal placement, no drift)
    r = np.linalg.norm(out.v_pos, axis=1)
    assert abs(float(r.mean()) - 1.0) < 0.05
    # faces index valid vertices, no degenerates
    f = out.t_pos_idx
    assert f.min() >= 0 and f.max() < out.n_verts
    assert np.all((f[:, 0] != f[:, 1]) & (f[:, 1] != f[:, 2]) & (f[:, 0] != f[:, 2]))


def test_planar_grid_boundary_preserved():
    # flat 9x9 grid in z=0: decimation must keep the outer boundary square.
    n = 9
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n), indexing="ij")
    v = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], axis=1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + n, a + 1])
            faces.append([a + 1, a + n, a + n + 1])
    mesh = MeshData(v_pos=v, t_pos_idx=np.asarray(faces, np.int32))
    out = quadric_decimate(mesh, target_faces=24)
    assert out.n_faces <= 40
    # all surviving vertices still inside (or on) the unit square, z == 0
    assert np.all(out.v_pos[:, 2] == 0)
    assert out.v_pos[:, :2].min() >= -1e-4 and out.v_pos[:, :2].max() <= 1 + 1e-4
    # the 4 extreme corners must survive (boundary constraint quadrics)
    for cx, cy in [(0, 0), (0, 1), (1, 0), (1, 1)]:
        d = np.linalg.norm(out.v_pos[:, :2] - np.array([cx, cy]), axis=1)
        assert d.min() < 1e-3


def test_color_carry():
    mesh = make_icosphere(2, radius=1.0)
    rgb = (mesh.v_pos * 0.5 + 0.5).astype(np.float32)
    mesh = MeshData(v_pos=mesh.v_pos, t_pos_idx=mesh.t_pos_idx, v_rgb=rgb)
    out = quadric_decimate(mesh, ratio=0.3)
    assert out.v_rgb is not None and out.v_rgb.shape == (out.n_verts, 3)
    # colors encode position: carried colors should still roughly match
    expect = out.v_pos * 0.5 + 0.5
    assert float(np.abs(out.v_rgb - expect).mean()) < 0.08


def test_ratio_and_validation():
    mesh = make_icosphere(2, radius=1.0)
    out = quadric_decimate(mesh, ratio=0.5)
    assert out.n_faces <= int(mesh.n_faces * 0.5) + 2
    with pytest.raises(ValueError):
        quadric_decimate(mesh)
