import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.ops.cameras import (
    camera_position_from_spherical,
    get_cam_info_gaussian,
    look_at_c2w,
)
from dreammesh4d_tpu.ops.mesh_raster import interpolate_attribute, rasterize_mesh
from dreammesh4d_tpu.utils.procedural import make_icosphere

FOV = 0.8


def make_cam(d=3.0, az=0.0, el=0.0):
    pos = camera_position_from_spherical(jnp.asarray(el), jnp.asarray(az), jnp.asarray(d))
    return get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)


def test_sphere_coverage_and_depth():
    m = make_icosphere(2, radius=0.8)
    cam = make_cam()
    out = rasterize_mesh(jnp.asarray(m.v_pos), jnp.asarray(m.t_pos_idx), cam, 64, 64)
    fi = np.asarray(out.face_idx)
    # circular silhouette: center hit, corners empty
    assert fi[32, 32] >= 0
    assert fi[2, 2] == -1 and fi[-2, -2] == -1
    cov = (fi >= 0).mean()
    assert 0.2 < cov < 0.8
    # front-surface depth = distance to camera minus radius
    d = np.asarray(out.depth)
    np.testing.assert_allclose(d[32, 32], 3.0 - 0.8, atol=0.05)
    # background depth inf
    assert np.isinf(d[0, 0])


def test_barycentric_interpolation_position():
    """Interpolating vertex positions at hits reproduces surface points."""
    m = make_icosphere(2, radius=0.8)
    cam = make_cam(az=30.0, el=20.0)
    out = rasterize_mesh(jnp.asarray(m.v_pos), jnp.asarray(m.t_pos_idx), cam, 64, 64)
    pos = np.asarray(interpolate_attribute(out, jnp.asarray(m.t_pos_idx), jnp.asarray(m.v_pos)))
    hit = np.asarray(out.face_idx) >= 0
    r = np.linalg.norm(pos[hit], axis=-1)
    # interpolated points lie near the sphere surface (flat faces slightly inside)
    assert (np.abs(r - 0.8) < 0.05).mean() > 0.95
    # barycentric coords sum to 1 at hits
    b = np.asarray(out.bary)
    np.testing.assert_allclose(b[hit].sum(-1), 1.0, atol=1e-4)


def test_occlusion_front_face_wins():
    """Two stacked triangles: the nearer one owns the pixel."""
    # camera at +x looking -x; triangle A at x=0.5 (near), B at x=-0.5 (far)
    verts = jnp.asarray([
        [0.5, -1.0, -1.0], [0.5, 1.0, -1.0], [0.5, 0.0, 1.5],   # A
        [-0.5, -1.0, -1.0], [-0.5, 1.0, -1.0], [-0.5, 0.0, 1.5],  # B
    ])
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    cam = make_cam(d=3.0)
    out = rasterize_mesh(verts, faces, cam, 32, 32)
    center_face = int(out.face_idx[16, 16])
    assert center_face == 0  # the near triangle
