import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.ops.cameras import get_cam_info_gaussian, look_at_c2w
from dreammesh4d_tpu.ops.gs import (
    RasterizerConfig,
    bin_gaussians,
    compute_cov3d,
    project_gaussians,
    rasterize,
    render_with_screen_grads,
)

FOV = 0.8


def make_camera(distance=3.0, elevation=0.0, azimuth=0.0):
    from dreammesh4d_tpu.ops.cameras import camera_position_from_spherical

    pos = camera_position_from_spherical(
        jnp.asarray(elevation), jnp.asarray(azimuth), jnp.asarray(distance)
    )
    c2w = look_at_c2w(pos)
    return get_cam_info_gaussian(c2w, FOV, FOV, 0.01, 100.0)


def make_cfg(W=64, H=64, **kw):
    t = float(np.tan(FOV / 2))
    return RasterizerConfig(width=W, height=H, tan_fovx=t, tan_fovy=t, **kw)


def identity_quats(n):
    return jnp.tile(jnp.asarray([[1.0, 0.0, 0.0, 0.0]]), (n, 1))


def test_projection_center():
    cam = make_camera(distance=3.0)
    cfg = make_cfg()
    means = jnp.zeros((1, 3))
    cov3d = compute_cov3d(jnp.full((1, 3), 0.1), identity_quats(1))
    proj = project_gaussians(
        means, cov3d, cam.world_view_transform, cam.full_proj_transform,
        cfg.tan_fovx, cfg.tan_fovy, cfg.width, cfg.height,
    )
    # origin gaussian projects to image center, depth = camera distance
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [31.5, 31.5], atol=0.51)
    np.testing.assert_allclose(float(proj.depths[0]), 3.0, atol=1e-4)
    assert bool(proj.mask[0]) and int(proj.radii[0]) > 0


def test_projection_culls_behind():
    cam = make_camera(distance=3.0, azimuth=0.0)  # camera at +x looking -x
    cfg = make_cfg()
    means = jnp.asarray([[10.0, 0.0, 0.0]])  # behind the camera
    cov3d = compute_cov3d(jnp.full((1, 3), 0.1), identity_quats(1))
    proj = project_gaussians(
        means, cov3d, cam.world_view_transform, cam.full_proj_transform,
        cfg.tan_fovx, cfg.tan_fovy, cfg.width, cfg.height,
    )
    assert not bool(proj.mask[0]) and int(proj.radii[0]) == 0


def test_binning_centers_tile():
    W = H = 64
    means2d = jnp.asarray([[8.0, 8.0], [40.0, 40.0]])
    radii = jnp.asarray([4, 4], jnp.int32)
    depths = jnp.asarray([1.0, 2.0])
    mask = jnp.asarray([True, True])
    assign = bin_gaussians(means2d, radii, depths, mask, W, H, tile_capacity=32)
    counts = np.asarray(assign.tile_counts).reshape(4, 4)
    assert counts[0, 0] == 1  # gaussian 0 in tile (0,0)
    assert counts[2, 2] == 1  # gaussian 1 in tile (2,2)
    assert counts.sum() == 2
    assert int(assign.tile_gauss[0, 0]) == 0
    assert int(assign.tile_gauss[2 * 4 + 2, 0]) == 1


def test_binning_depth_order():
    W = H = 16  # single tile
    means2d = jnp.asarray([[8.0, 8.0], [8.0, 8.0], [8.0, 8.0]])
    radii = jnp.asarray([2, 2, 2], jnp.int32)
    depths = jnp.asarray([3.0, 1.0, 2.0])
    mask = jnp.asarray([True, True, True])
    assign = bin_gaussians(means2d, radii, depths, mask, W, H, tile_capacity=32)
    order = np.asarray(assign.tile_gauss[0, :3])
    np.testing.assert_array_equal(order, [1, 2, 0])  # front-to-back


def test_single_gaussian_alpha_profile():
    """Opaque isotropic Gaussian at origin: center-pixel alpha equals the
    clamped opacity and falls off with the analytic 2D Gaussian profile."""
    cam = make_camera(distance=3.0)
    cfg = make_cfg(tile_capacity=32)
    out = rasterize(
        means3d=jnp.zeros((1, 3)),
        opacities=jnp.asarray([0.9]),
        camera=cam,
        cfg=cfg,
        background=jnp.zeros(3),
        colors=jnp.asarray([[1.0, 0.5, 0.25]]),
        scales=jnp.full((1, 3), 0.05),
        quats=identity_quats(1),
    )
    alpha = np.asarray(out.alpha[:, :, 0])
    # peak at center
    iy, ix = np.unravel_index(alpha.argmax(), alpha.shape)
    assert abs(ix - 31.5) < 1.1 and abs(iy - 31.5) < 1.1
    # analytic peak: 0.9 * exp(-0.5 * d2 / (sigma_px^2 + 0.3)) with the pixel
    # grid offset d2 = 0.5 from the true center (31.5, 31.5): sigma_px =
    # focal*0.05/3 = 1.26 -> peak = 0.9*exp(-0.25/1.89) = 0.789
    np.testing.assert_allclose(alpha.max(), 0.789, atol=0.015)
    assert alpha[0, 0] < 1e-3
    # monotone falloff INSIDE the 3σ support (sigma_eff = sqrt(1.89) = 1.37 px
    # -> 3σ ≈ 4.1 px); beyond it the live mask's 3σ Mahalanobis cutoff
    # (pallas_blend._group_geometry / blend.chunk_step) zeroes the tail
    r2 = alpha[iy, ix + 2]
    r4 = alpha[iy, ix + 4]
    assert alpha.max() > r2 > r4 > 0
    assert alpha[iy, ix + 6] == 0.0  # ≈4.4σ: culled by the 3σ cutoff
    # color at peak = color * alpha (black background)
    rgb = np.asarray(out.rgb)
    np.testing.assert_allclose(rgb[iy, ix] / alpha[iy, ix], [1.0, 0.5, 0.25], atol=1e-4)


def test_analytic_center_alpha():
    """Center alpha matches exp(-0.5 * r^2 / sigma_px^2) profile computed from
    the projection formula (pinhole: sigma_px = focal * sigma / z)."""
    cam = make_camera(distance=2.0)
    W = H = 64
    cfg = make_cfg(tile_capacity=32)
    sigma = 0.08
    out = rasterize(
        means3d=jnp.zeros((1, 3)),
        opacities=jnp.asarray([1.0]),
        camera=cam,
        cfg=cfg,
        background=jnp.zeros(3),
        colors=jnp.ones((1, 3)),
        scales=jnp.full((1, 3), sigma),
        quats=identity_quats(1),
    )
    focal = W / (2 * cfg.tan_fovx)
    sigma_px = focal * sigma / 2.0  # depth 2.0
    alpha = np.asarray(out.alpha[:, :, 0])
    # sample at a few radii along x through the center
    cy = cx = 31.5
    for r_px in [3, 6, 9]:
        x = int(round(cx + r_px))
        d2 = (x - cx) ** 2 + 0.25  # y offset 0.5 from true center
        # 0.3-pixel dilation inflates sigma^2 by 0.3
        expected = np.exp(-0.5 * d2 / (sigma_px**2 + 0.3))
        got = alpha[32, x]
        np.testing.assert_allclose(got, min(expected, 0.99), rtol=0.08)


def test_occlusion_order():
    """A red gaussian in front of a blue one: center pixel is mostly red."""
    cam = make_camera(distance=3.0)  # camera on +x axis looking -x
    cfg = make_cfg(tile_capacity=32)
    means = jnp.asarray([[0.5, 0.0, 0.0], [0.0, 0.0, 0.0]])  # first closer to cam
    out = rasterize(
        means3d=means,
        opacities=jnp.asarray([0.95, 0.95]),
        camera=cam,
        cfg=cfg,
        background=jnp.zeros(3),
        colors=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
        scales=jnp.full((2, 3), 0.1),
        quats=identity_quats(2),
    )
    rgb = np.asarray(out.rgb)
    center = rgb[32, 32]
    assert center[0] > 0.85  # red dominates
    assert center[2] < 0.1  # blue mostly occluded
    # swap depths: blue in front now
    means_swapped = jnp.asarray([[-0.5, 0.0, 0.0], [0.0, 0.0, 0.0]])
    out2 = rasterize(
        means3d=means_swapped,
        opacities=jnp.asarray([0.95, 0.95]),
        camera=cam,
        cfg=cfg,
        background=jnp.zeros(3),
        colors=jnp.asarray([[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
        scales=jnp.full((2, 3), 0.1),
        quats=identity_quats(2),
    )
    center2 = np.asarray(out2.rgb)[32, 32]
    assert center2[2] > 0.85 and center2[0] < 0.1


def test_background_composites():
    cam = make_camera()
    cfg = make_cfg(tile_capacity=32)
    bg = jnp.asarray([0.2, 0.4, 0.6])
    out = rasterize(
        means3d=jnp.zeros((1, 3)),
        opacities=jnp.asarray([0.5]),
        camera=cam,
        cfg=cfg,
        background=bg,
        colors=jnp.ones((1, 3)),
        scales=jnp.full((1, 3), 0.02),
        quats=identity_quats(1),
    )
    # corner pixel: pure background
    np.testing.assert_allclose(np.asarray(out.rgb[0, 0]), np.asarray(bg), atol=1e-5)
    assert float(out.alpha[0, 0, 0]) < 1e-5


def test_gradients_flow():
    cam = make_camera()
    cfg = make_cfg(W=32, H=32, tile_capacity=32)
    target = jnp.zeros((32, 32, 3))

    def loss_fn(params):
        out = rasterize(
            means3d=params["means"],
            opacities=jax.nn.sigmoid(params["op"]),
            camera=cam,
            cfg=cfg,
            background=jnp.zeros(3),
            colors=jax.nn.sigmoid(params["col"]),
            scales=jnp.exp(params["log_s"]),
            quats=params["quats"],
        )
        return ((out.rgb - target) ** 2).mean()

    params = {
        "means": jnp.asarray([[0.0, 0.05, -0.02]]),
        "op": jnp.asarray([1.0]),
        "col": jnp.asarray([[2.0, 0.0, 0.0]]),
        "log_s": jnp.log(jnp.full((1, 3), 0.1)),
        "quats": identity_quats(1),
    }
    grads = jax.grad(loss_fn)(params)
    for k in ["means", "op", "col", "log_s"]:
        g = np.asarray(grads[k])
        assert np.isfinite(g).all(), k
        assert np.abs(g).max() > 0, f"zero grad for {k}"
    # rendering white on black target: brighter color increases loss
    assert float(grads["col"][0, 0]) > 0


def test_screen_grad_api():
    cam = make_camera()
    cfg = make_cfg(W=32, H=32, tile_capacity=32)
    out, blend_fn, proj = render_with_screen_grads(
        means3d=jnp.asarray([[0.0, 0.3, 0.0]]),
        opacities=jnp.asarray([0.9]),
        camera=cam,
        cfg=cfg,
        background=jnp.zeros(3),
        colors=jnp.ones((1, 3)),
        scales=jnp.full((1, 3), 0.1),
        quats=identity_quats(1),
    )
    # gradient of mean brightness w.r.t. screen position is finite and nonzero
    g = jax.grad(lambda m2d: blend_fn(m2d).rgb.mean())(proj.means2d)
    g = np.asarray(g)
    assert np.isfinite(g).all() and np.abs(g).max() > 0


def test_vmap_over_cameras():
    cfg = make_cfg(W=32, H=32, tile_capacity=32)
    cams = [make_camera(azimuth=a) for a in (0.0, 90.0)]
    wv = jnp.stack([c.world_view_transform for c in cams])
    fp = jnp.stack([c.full_proj_transform for c in cams])
    cc = jnp.stack([c.camera_center for c in cams])

    def render_one(w, f, c):
        from dreammesh4d_tpu.ops.cameras import GSCameraInfo

        return rasterize(
            means3d=jnp.zeros((4, 3)),
            opacities=jnp.full(4, 0.8),
            camera=GSCameraInfo(w, f, c),
            cfg=cfg,
            background=jnp.zeros(3),
            colors=jnp.ones((4, 3)) * 0.5,
            scales=jnp.full((4, 3), 0.05),
            quats=identity_quats(4),
        ).rgb

    imgs = jax.vmap(render_one)(wv, fp, cc)
    assert imgs.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_projection_sq_matches_matmul_path():
    # the matmul-free covariance path must agree with the reference-style
    # R S S^T R^T formulation to float precision, values and gradients
    import jax
    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical, get_cam_info_gaussian, look_at_c2w)
    from dreammesh4d_tpu.ops.gs.projection import (
        compute_cov3d, project_gaussians, project_gaussians_sq)
    from dreammesh4d_tpu.ops.quaternion import quat_normalize

    N = 256
    k = jax.random.split(jax.random.PRNGKey(3), 4)
    p = jax.random.normal(k[0], (N, 3)) * 0.5
    quats = quat_normalize(jax.random.normal(k[1], (N, 4)))
    scales = 0.02 * jnp.exp(0.3 * jax.random.normal(k[2], (N, 3)))
    pos = camera_position_from_spherical(jnp.asarray(20.0), jnp.asarray(40.0), jnp.asarray(2.5))
    cam = get_cam_info_gaussian(look_at_c2w(pos), 0.7, 0.7, 0.01, 100.0)

    a = project_gaussians(p, compute_cov3d(scales, quats),
                          cam.world_view_transform, cam.full_proj_transform,
                          0.36, 0.36, 128, 128)
    b = project_gaussians_sq(p, scales, quats,
                             cam.world_view_transform, cam.full_proj_transform,
                             0.36, 0.36, 128, 128)
    np.testing.assert_allclose(np.asarray(a.means2d), np.asarray(b.means2d), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.conics), np.asarray(b.conics), rtol=2e-4, atol=1e-3)
    assert np.array_equal(np.asarray(a.radii), np.asarray(b.radii))
    assert np.array_equal(np.asarray(a.mask), np.asarray(b.mask))

    def loss_a(s, q):
        pr = project_gaussians(p, compute_cov3d(s, q), cam.world_view_transform,
                               cam.full_proj_transform, 0.36, 0.36, 128, 128)
        return (pr.conics * pr.mask[:, None]).sum()

    def loss_b(s, q):
        pr = project_gaussians_sq(p, s, q, cam.world_view_transform,
                                  cam.full_proj_transform, 0.36, 0.36, 128, 128)
        return (pr.conics * pr.mask[:, None]).sum()

    ga = jax.grad(loss_a, argnums=(0, 1))(scales, quats)
    gb = jax.grad(loss_b, argnums=(0, 1))(scales, quats)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-2)
