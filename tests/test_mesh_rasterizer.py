"""nvdiff-rasterizer-equivalent mesh renderer + patch renderer."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.renderers.mesh_rasterizer import MeshRasterizer, PatchRenderer
from dreammesh4d_tpu.ops.cameras import (
    camera_position_from_spherical,
    get_cam_info_gaussian,
    look_at_c2w,
)
from dreammesh4d_tpu.utils.procedural import make_icosphere


def _camera(elev=10.0, azim=30.0, dist=2.5, fov=0.7):
    pos = camera_position_from_spherical(
        jnp.asarray(elev), jnp.asarray(azim), jnp.asarray(dist))
    return get_cam_info_gaussian(look_at_c2w(pos), fov, fov, 0.01, 100.0), pos


def test_mesh_rasterizer_renders_sphere():
    mesh = make_icosphere(3, radius=0.8)
    verts = jnp.asarray(mesh.v_pos)
    faces = jnp.asarray(mesh.t_pos_idx)
    cam, pos = _camera()
    r = MeshRasterizer()
    out = r(verts, faces, [cam], pos[None], 64, 64)
    assert out["comp_rgb"].shape == (1, 64, 64, 3)
    assert out["opacity"].shape == (1, 64, 64, 1)
    cov = float(out["opacity"].mean())
    assert 0.05 < cov < 0.9  # sphere covers part of the frame
    # normals on the silhouette face the camera region: center pixel normal
    # should be roughly +towards camera; at least valid range [0,1]
    n = np.asarray(out["comp_normal"])
    assert n.min() >= 0 and n.max() <= 1
    # background is white where no hit
    bgpix = np.asarray(out["comp_rgb"])[0, 0, 0]
    assert np.allclose(bgpix, 1.0)


def test_mesh_rasterizer_gradients_wrt_vertices():
    mesh = make_icosphere(2, radius=0.8)
    faces = jnp.asarray(mesh.t_pos_idx)
    cam, pos = _camera()
    r = MeshRasterizer()

    def loss(verts):
        out = r.render_view(verts, faces, cam, pos, 32, 32)
        return out["comp_rgb"].mean()

    g = jax.grad(loss)(jnp.asarray(mesh.v_pos))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_patch_renderer_composites_patch():
    B, H, W, PS = 1, 32, 32, 8

    calls = []

    def base(rays_o, rays_d):
        calls.append(rays_o.shape)
        # rgb encodes the ray direction so patch vs global content differs
        # only by resolution
        return {"comp_rgb": rays_d * 0.5 + 0.5,
                "aux_scalar": jnp.asarray(1.0)}

    o = jnp.zeros((B, H, W, 3))
    yy, xx = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W), indexing="ij")
    d = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)[None]
    pr = PatchRenderer(patch_size=PS, global_downsample=2)
    out = pr(base, o, d, rng=jax.random.PRNGKey(0), training=True)
    assert out["comp_rgb"].shape == (B, H, W, 3)
    assert calls[0] == (B, H // 2, W // 2, 3) and calls[1] == (B, PS, PS, 3)
    # the patch region is exact (not blurred by the up-down resample)
    py, px = [int(v) for v in np.asarray(out["patch_yx"])]
    exact = np.asarray(d * 0.5 + 0.5)[:, py:py + PS, px:px + PS]
    got = np.asarray(out["comp_rgb"])[:, py:py + PS, px:px + PS]
    assert np.allclose(got, exact, atol=1e-6)
    # eval mode: single full-res call, untouched output
    calls.clear()
    out_eval = pr(base, o, d, training=False)
    assert calls == [(B, H, W, 3)]
    assert np.allclose(np.asarray(out_eval["comp_rgb"]), np.asarray(d * 0.5 + 0.5))
