"""Occupancy-grid estimator + resolution milestones + ref depth/normal losses
(VERDICT round-2 items 5 and 6)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _sphere_geometry():
    """An implicit volume trained-free stand-in: use the real implicit volume
    params at init (blob bias gives a dense blob at the origin)."""
    import jax

    from dreammesh4d_tpu.models.geometry.implicit_volume import (
        ImplicitVolumeConfig,
        init_implicit_volume,
    )

    cfg = ImplicitVolumeConfig(radius=1.0, density_blob_scale=10.0,
                               density_blob_std=0.5)
    params = init_implicit_volume(cfg, jax.random.PRNGKey(0))
    return params, cfg


def test_occgrid_update_marks_blob_occupied():
    import jax
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import (
        NeRFRendererConfig,
        init_occgrid,
        make_occgrid_update,
    )

    params, gcfg = _sphere_geometry()
    rcfg = NeRFRendererConfig(radius=1.0, estimator="occgrid", grid_resolution=16)
    state = init_occgrid(rcfg)
    assert float(state.binary.mean()) == 1.0  # dense until first update

    update = make_occgrid_update(gcfg, rcfg)
    state = update(state, params, jax.random.PRNGKey(1))
    binary = np.asarray(state.binary).reshape(16, 16, 16)
    # the magic3d blob concentrates density at the origin: center occupied,
    # corners not
    assert binary[8, 8, 8] == 1.0
    assert binary[0, 0, 0] == 0.0
    frac = binary.mean()
    assert 0.0 < frac < 1.0


def test_occgrid_render_matches_dense_on_blob():
    """Occ-grid rendering must closely match dense importance rendering when
    the grid is (correctly) marking the empty space."""
    import jax
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import (
        NeRFRendererConfig,
        init_occgrid,
        make_occgrid_update,
        render_rays,
    )

    params, gcfg = _sphere_geometry()
    R = 16
    # rays through the blob from z+
    xy = (np.random.RandomState(0).rand(R, 2).astype(np.float32) - 0.5) * 0.6
    rays_o = jnp.asarray(np.concatenate([xy, np.full((R, 1), 2.0, np.float32)], 1))
    rays_d = jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (R, 3))
    light = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 3.0]), (R, 3))
    bg = jnp.ones(3)

    dense_cfg = NeRFRendererConfig(radius=1.0, num_samples_coarse=128,
                                   num_samples_fine=64, randomized=False,
                                   ray_chunk_train=0)
    occ_cfg = NeRFRendererConfig(radius=1.0, estimator="occgrid",
                                 grid_resolution=16, occ_candidates=192,
                                 occ_samples=96, randomized=False,
                                 ray_chunk_train=0)
    occ_state = init_occgrid(occ_cfg)
    occ_state = make_occgrid_update(gcfg, occ_cfg)(occ_state, params,
                                                   jax.random.PRNGKey(1))

    out_d = render_rays(params, gcfg, dense_cfg, rays_o, rays_d, light, bg)
    out_o = render_rays(params, gcfg, occ_cfg, rays_o, rays_d, light, bg,
                        occ_state=occ_state)
    np.testing.assert_allclose(np.asarray(out_o["opacity"]),
                               np.asarray(out_d["opacity"]), atol=0.05)
    np.testing.assert_allclose(np.asarray(out_o["depth"]),
                               np.asarray(out_d["depth"]), atol=0.1)


def test_random_camera_milestones():
    from dreammesh4d_tpu.data.uncond import RandomCameraConfig, RandomCameraSampler

    cfg = RandomCameraConfig(height=[16, 24, 32], width=[16, 24, 32],
                             batch_size=[8, 4, 2], resolution_milestones=[200, 300])
    s = RandomCameraSampler(cfg, seed=0)
    s.update(0)
    b = s.sample()
    assert b["rays_o"].shape == (8, 16, 16, 3)
    s.update(250)
    b = s.sample()
    assert b["rays_o"].shape == (4, 24, 24, 3)
    s.update(300)
    b = s.sample()
    assert b["rays_o"].shape == (2, 32, 32, 3)


def test_single_image_milestones_and_depth_normal(tmp_path):
    import imageio.v2 as imageio

    from dreammesh4d_tpu.data.image import SingleImageConfig, SingleImageDataModule
    from dreammesh4d_tpu.data.uncond import RandomCameraConfig

    rgba = np.zeros((64, 64, 4), np.uint8)
    rgba[16:48, 16:48] = [200, 60, 40, 255]
    imageio.imwrite(str(tmp_path / "obj_rgba.png"), rgba)
    depth = (np.linspace(0, 255, 64 * 64).reshape(64, 64)).astype(np.uint8)
    imageio.imwrite(str(tmp_path / "obj_depth.png"), depth)
    normal = np.full((64, 64, 3), 128, np.uint8)
    imageio.imwrite(str(tmp_path / "obj_normal.png"), normal)

    cfg = SingleImageConfig(
        image_path=str(tmp_path / "obj_rgba.png"),
        height=[16, 32], width=[16, 32], resolution_milestones=[10],
        requires_depth=True, requires_normal=True,
        random_camera=RandomCameraConfig(height=16, width=16, batch_size=2),
    )
    dm = SingleImageDataModule(cfg, seed=0)
    b = dm.train_batch(0)
    assert b["ref_rgb"].shape == (1, 16, 16, 3)
    assert b["ref_depth"].shape == (1, 16, 16, 1)
    assert b["ref_normal"].shape == (1, 16, 16, 3)
    b = dm.train_batch(10)
    assert b["ref_rgb"].shape == (1, 32, 32, 3)


def test_masked_depth_normal_losses():
    import jax.numpy as jnp

    from dreammesh4d_tpu.systems.zero123_system import (
        masked_lstsq_depth_loss,
        masked_pearson,
    )

    rng = np.random.RandomState(0)
    gt = rng.rand(100).astype(np.float32)
    mask = (rng.rand(100) > 0.3).astype(np.float32)
    # pred is an affine transform of gt -> lstsq loss ~0, pearson ~1
    pred = 2.5 * gt + 0.7
    loss = float(masked_lstsq_depth_loss(jnp.asarray(pred), jnp.asarray(gt),
                                         jnp.asarray(mask)))
    assert loss < 1e-8
    r = float(masked_pearson(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert abs(r - 1.0) < 1e-5
    # anti-correlated -> pearson ~ -1
    r2 = float(masked_pearson(jnp.asarray(-pred), jnp.asarray(gt), jnp.asarray(mask)))
    assert abs(r2 + 1.0) < 1e-5
    # masked outliers must not affect the fit
    pred_out = pred.copy()
    pred_out[mask == 0] = 100.0
    loss2 = float(masked_lstsq_depth_loss(jnp.asarray(pred_out), jnp.asarray(gt),
                                          jnp.asarray(mask)))
    assert loss2 < 1e-8


def test_zero123_step_with_new_losses():
    """One jitted zero123 train step with depth/depth_rel/normal/3d-normal-
    smooth all ACTIVE — loss terms present and finite."""
    import jax
    import jax.numpy as jnp
    import optax

    from dreammesh4d_tpu.models.geometry.implicit_volume import (
        ImplicitVolumeConfig,
        init_implicit_volume,
    )
    from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import (
        NeRFRendererConfig,
    )
    from dreammesh4d_tpu.systems.zero123_system import (
        Zero123Losses,
        init_nerf_state,
        make_zero123_train_step,
    )

    gcfg = ImplicitVolumeConfig(radius=1.0)
    params = init_implicit_volume(gcfg, jax.random.PRNGKey(0))
    rcfg = NeRFRendererConfig(radius=1.0, num_samples_coarse=16,
                              num_samples_fine=8, ray_chunk_train=0)
    losses = Zero123Losses(lambda_depth=0.05, lambda_depth_rel=0.05,
                           lambda_normal=0.05)
    opt = optax.adam(1e-3)
    step_fn = make_zero123_train_step(gcfg, rcfg, opt, losses)
    state = init_nerf_state(params, opt)

    R, B, H = 32, 1, 8
    rng = np.random.RandomState(1)
    d = jnp.asarray(rng.randn(R, 3).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    batch = {
        "ref_rays_o": jnp.asarray(rng.randn(R, 3).astype(np.float32)) * 0.1
        + jnp.asarray([0.0, 0.0, 2.0]),
        "ref_rays_d": -d,
        "ref_rgb": jnp.asarray(rng.rand(R, 3).astype(np.float32)),
        "ref_mask": jnp.asarray((rng.rand(R, 1) > 0.5).astype(np.float32)),
        "ref_depth": jnp.asarray(rng.rand(R, 1).astype(np.float32)),
        "ref_normal": jnp.asarray(rng.rand(R, 3).astype(np.float32)),
        "ref_light": jnp.asarray([0.0, 0.0, 3.0]),
        "rand_rays_o": jnp.zeros((B, H, H, 3)) + jnp.asarray([0.0, 0.0, 2.0]),
        "rand_rays_d": jnp.broadcast_to(jnp.asarray([0.0, 0.0, -1.0]), (B, H, H, 3)),
        "light_positions": jnp.asarray([[0.0, 0.0, 3.0]]),
    }
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(2), None, 1.0)
    for k in ("loss_depth", "loss_depth_rel", "loss_normal",
              "loss_3d_normal_smooth", "loss_total"):
        assert k in metrics, sorted(metrics)
        assert np.isfinite(float(metrics[k])), (k, metrics[k])
