import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.export.mesh_io import (
    MeshData,
    load_mesh,
    load_obj,
    load_ply_mesh,
    save_obj,
    save_ply_mesh,
)
from dreammesh4d_tpu.ops.knn import dist_knn3_mean, knn
from dreammesh4d_tpu.utils.procedural import make_icosphere

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_knn_vs_bruteforce():
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (300, 3))
    qs = jax.random.normal(jax.random.PRNGKey(1), (77, 3))
    d, i = knn(qs, pts, k=4, chunk=32)
    # numpy brute force
    D = ((np.asarray(qs)[:, None] - np.asarray(pts)[None]) ** 2).sum(-1)
    ref_i = np.argsort(D, axis=1)[:, :4]
    ref_d = np.take_along_axis(D, ref_i, 1)
    np.testing.assert_allclose(np.sort(np.asarray(d), 1), np.sort(ref_d, 1), rtol=1e-4, atol=1e-5)
    # index sets match
    for a, b in zip(np.asarray(i), ref_i):
        assert set(a) == set(b)


def test_knn_exclude_self():
    pts = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [10.0, 0, 0]])
    d, i = knn(pts, pts, k=1, chunk=4, exclude_self=True)
    np.testing.assert_array_equal(np.asarray(i)[:, 0], [1, 0, 1, 2])


def test_dist_knn3():
    # 4 points on a unit segment: check mean 3-nn sq distance of point 0
    pts = jnp.asarray([[0.0, 0, 0], [1.0, 0, 0], [2.0, 0, 0], [3.0, 0, 0]])
    d = dist_knn3_mean(pts, chunk=4)
    np.testing.assert_allclose(float(d[0]), (1 + 4 + 9) / 3, rtol=1e-5)


def test_obj_roundtrip(tmp_path):
    m = make_icosphere(1)
    p = str(tmp_path / "m.obj")
    save_obj(p, m)
    m2 = load_obj(p)
    np.testing.assert_allclose(m2.v_pos, m.v_pos, atol=1e-5)
    np.testing.assert_array_equal(m2.t_pos_idx, m.t_pos_idx)
    np.testing.assert_allclose(m2.v_rgb, m.v_rgb, atol=1e-5)


def test_ply_roundtrip_binary_and_ascii(tmp_path):
    m = make_icosphere(1)
    for binary in (True, False):
        p = str(tmp_path / f"m_{binary}.ply")
        save_ply_mesh(p, m, binary=binary)
        m2 = load_ply_mesh(p)
        np.testing.assert_allclose(m2.v_pos, m.v_pos, atol=1e-5)
        np.testing.assert_array_equal(m2.t_pos_idx, m.t_pos_idx)
        np.testing.assert_allclose(m2.v_rgb, m.v_rgb, atol=1 / 255 + 1e-5)


def test_obj_with_texture(tmp_path):
    m = make_icosphere(0)
    V = m.n_verts
    m.v_tex = np.random.RandomState(0).rand(V, 2).astype(np.float32)
    m.t_tex_idx = m.t_pos_idx.copy()
    tex = np.random.RandomState(1).rand(16, 16, 3).astype(np.float32)
    p = str(tmp_path / "t.obj")
    save_obj(p, m, mtl_name="mat", texture_map=tex)
    m2 = load_obj(p)
    np.testing.assert_allclose(m2.v_tex, m.v_tex, atol=1e-5)
    np.testing.assert_array_equal(m2.t_tex_idx, m.t_tex_idx)
    assert (tmp_path / "mat.mtl").exists() and (tmp_path / "mat.png").exists()
