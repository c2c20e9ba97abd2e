import pytest
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.ops.cameras import (

    binary_cross_entropy,
    c2w_to_w2c,
    camera_position_from_spherical,
    get_cam_info_gaussian,
    get_mvp_matrix,
    get_projection_matrix,
    get_ray_directions,
    get_rays,
    look_at_c2w,
)

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_ray_directions_center_pixel():
    H = W = 64
    focal = 50.0
    d = get_ray_directions(H, W, focal)
    assert d.shape == (H, W, 3)
    # central pixel points straight down -z
    c = np.asarray(d[H // 2, W // 2])
    assert abs(c[0]) < 1.0 / focal and abs(c[1]) < 1.0 / focal and c[2] == -1.0
    # x increases rightward, y decreases downward (OpenGL)
    assert d[0, -1, 0] > 0 and d[0, 0, 0] < 0
    assert d[0, 0, 1] > 0 and d[-1, 0, 1] < 0


def test_look_at_and_rays():
    pos = camera_position_from_spherical(jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(2.0))
    np.testing.assert_allclose(np.asarray(pos), [2.0, 0.0, 0.0], atol=1e-6)
    c2w = look_at_c2w(pos)
    # camera at (2,0,0) looking at origin: forward (-z col) = (-1,0,0)
    fwd = -np.asarray(c2w[:3, 2])
    np.testing.assert_allclose(fwd, [-1.0, 0.0, 0.0], atol=1e-6)
    dirs = get_ray_directions(16, 16, 20.0)
    rays_o, rays_d = get_rays(dirs, c2w)
    np.testing.assert_allclose(np.asarray(rays_o[0]), [2.0, 0.0, 0.0], atol=1e-6)
    # central rays point towards origin
    center_d = np.asarray(rays_d.reshape(16, 16, 3)[8, 8])
    assert center_d[0] < -0.99


def test_w2c_inverse():
    c2w = look_at_c2w(jnp.asarray([1.0, 2.0, 3.0]))
    w2c = c2w_to_w2c(c2w)
    np.testing.assert_allclose(np.asarray(w2c @ c2w), np.eye(4), atol=1e-5)


def test_mvp_shape_and_projection():
    fovy = jnp.asarray([0.8])
    proj = get_projection_matrix(fovy, 1.0, 0.1, 100.0)
    c2w = look_at_c2w(jnp.asarray([[0.0, -3.0, 0.0]]))
    mvp = get_mvp_matrix(c2w, proj)
    assert mvp.shape == (1, 4, 4)
    # origin projects to screen center with positive depth
    p = np.asarray(mvp[0] @ np.array([0, 0, 0, 1.0]))
    ndc = p[:3] / p[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)


def test_gs_cam_info():
    c2w = look_at_c2w(jnp.asarray([0.0, -3.0, 0.0]))
    info = get_cam_info_gaussian(c2w, 0.7, 0.7, 0.1, 100.0)
    np.testing.assert_allclose(np.asarray(info.camera_center), [0.0, -3.0, 0.0], atol=1e-5)
    # world origin in view space: z = +3 (COLMAP +z forward), row-major transform
    origin_h = np.array([0.0, 0.0, 0.0, 1.0])
    view = origin_h @ np.asarray(info.world_view_transform)
    np.testing.assert_allclose(view[:3], [0.0, 0.0, 3.0], atol=1e-5)
    clip = origin_h @ np.asarray(info.full_proj_transform)
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc[:2], 0.0, atol=1e-5)
    assert 0.0 < ndc[2] < 1.0


def test_bce():
    x = jnp.asarray([0.9, 0.1])
    t = jnp.asarray([1.0, 0.0])
    v = float(binary_cross_entropy(x, t))
    assert abs(v - (-np.log(0.9))) < 1e-4
