import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.geometry.sugar import (
    SuGaRConfig,
    create_sugar,
    face_frame_quaternions,
    gaussian_attributes,
    gaussian_centers,
)
from dreammesh4d_tpu.ops.meshops import face_normals
from dreammesh4d_tpu.ops.quaternion import quat_apply
from dreammesh4d_tpu.ops.sh import sh_dc_to_rgb
from dreammesh4d_tpu.utils.procedural import make_icosphere

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def build(G=6, sub=1):
    mesh = make_icosphere(sub)
    cfg = SuGaRConfig(n_gaussians_per_surface_triangle=G)
    return create_sugar(cfg, mesh), mesh


def test_counts_and_shapes():
    (params, static), mesh = build(G=6)
    F = mesh.n_faces
    attrs = gaussian_attributes(params, static)
    assert attrs.means3d.shape == (F * 6, 3)
    assert attrs.quats.shape == (F * 6, 4)
    assert attrs.scales.shape == (F * 6, 3)
    assert attrs.sh.shape == (F * 6, 3, 16)


def test_centers_on_surface():
    (params, static), mesh = build(G=3)
    centers = np.asarray(gaussian_centers(params.points, static))
    # barycentric points of a sphere triangle lie slightly inside radius 1
    r = np.linalg.norm(centers, axis=-1)
    assert (r < 1.0 + 1e-5).all() and (r > 0.8).all()


def test_quaternion_first_axis_is_normal():
    (params, static), mesh = build(G=6)
    q = face_frame_quaternions(params.points, params.complex_rot, static)
    n = np.repeat(np.asarray(face_normals(params.points, static.faces)), 6, axis=0)
    # rotating e_x by q gives the first column of R = face normal
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (q.shape[0], 3))
    out = np.asarray(quat_apply(q, ex))
    np.testing.assert_allclose((out * n).sum(-1), 1.0, atol=1e-4)


def test_rotated_complex_number_spins_in_plane():
    (params, static), mesh = build(G=1)
    theta = 0.7
    rot = jnp.tile(jnp.asarray([[np.cos(theta), np.sin(theta)]]), (params.complex_rot.shape[0], 1))
    q0 = face_frame_quaternions(params.points, params.complex_rot, static)
    q1 = face_frame_quaternions(params.points, rot.astype(jnp.float32), static)
    # normal axis unchanged
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), (q0.shape[0], 3))
    np.testing.assert_allclose(np.asarray(quat_apply(q0, ex)), np.asarray(quat_apply(q1, ex)), atol=1e-4)
    # in-plane axis rotated by theta
    ey = jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0]), (q0.shape[0], 3))
    a0 = np.asarray(quat_apply(q0, ey))
    a1 = np.asarray(quat_apply(q1, ey))
    cos = (a0 * a1).sum(-1)
    np.testing.assert_allclose(cos, np.cos(theta), atol=1e-4)


def test_scales_thickness_axis():
    (params, static), _ = build(G=6)
    attrs = gaussian_attributes(params, static)
    s = np.asarray(attrs.scales)
    np.testing.assert_allclose(s[:, 0], static.surface_mesh_thickness, rtol=1e-6)
    assert (s[:, 1:] > s[:, :1]).all()  # flat pancakes


def test_opacity_init():
    (params, static), _ = build()
    attrs = gaussian_attributes(params, static)
    np.testing.assert_allclose(np.asarray(attrs.opacities), 0.9999, atol=1e-5)


def test_sh_dc_from_vertex_colors():
    (params, static), mesh = build(G=1)
    attrs = gaussian_attributes(params, static)
    rgb = np.asarray(sh_dc_to_rgb(attrs.sh[:, :, 0]))
    # color of face-center gaussian ~ mean of vertex colors, which encode position
    centers = np.asarray(gaussian_centers(params.points, static))
    expected = (centers / np.linalg.norm(centers, axis=-1, keepdims=True) + 1) / 2
    np.testing.assert_allclose(rgb, expected, atol=0.1)


def test_render_sugar_end_to_end():
    """Render the mesh-bound Gaussians: the image should show the colored
    sphere, and gradients flow back to vertex positions and colors."""
    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical,
        get_cam_info_gaussian,
        look_at_c2w,
    )
    from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize

    (params, static), mesh = build(G=3, sub=2)
    FOV = 0.8
    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(20.0), jnp.asarray(3.0))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    t = float(np.tan(FOV / 2))
    cfg = RasterizerConfig(64, 64, t, t, tile_capacity=640, chunk=32)

    def render(p):
        attrs = gaussian_attributes(p, static)
        return rasterize(
            attrs.means3d, attrs.opacities, cam, cfg, jnp.zeros(3),
            sh=attrs.sh, sh_degree=static.sh_degree,
            scales=attrs.scales, quats=attrs.quats,
        )

    out = render(params)
    alpha = np.asarray(out.alpha)
    assert alpha.max() > 0.95  # opaque surface
    assert alpha[0, 0, 0] < 1e-3  # corner empty
    # silhouette roughly round: count coverage
    cov = (alpha[:, :, 0] > 0.5).mean()
    assert 0.15 < cov < 0.7

    g = jax.grad(lambda p: render(p).rgb.mean())(params)
    assert float(jnp.abs(g.points).max()) > 0
    assert float(jnp.abs(g.sh_dc).max()) > 0
    assert float(jnp.abs(g.complex_rot).max()) >= 0
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
