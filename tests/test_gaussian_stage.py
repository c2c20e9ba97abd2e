"""End-to-end vanilla-3DGS stage: fit, densify mid-training, keep training."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.data.uncond import RandomCameraConfig, RandomCameraSampler
from dreammesh4d_tpu.models.geometry.gaussian import GaussianConfig, init_random_sphere
from dreammesh4d_tpu.ops.gs import RasterizerConfig
from dreammesh4d_tpu.systems.gaussian_stage import (
    GaussianStageLosses,
    gaussian_optimizer,
    init_gaussian_train_state,
    make_gaussian_train_step,
    make_reg_state,
)


def test_gaussian_stage_trains_and_densifies():
    gcfg = GaussianConfig(capacity=512, init_num=128, max_new_per_step=64,
                          spatial_extent=1.0, init_radius=0.6,
                          densify_grad_threshold=1e-6,  # aggressive for the test
                          max_world_size_ratio=0.0, max_screen_size=0.0)
    fov = np.radians(40.0)
    t = float(np.tan(fov / 2))
    raster_cfg = RasterizerConfig(32, 32, t, t, tile_capacity=512, chunk=32)
    sampler = RandomCameraSampler(RandomCameraConfig(
        height=32, width=32, batch_size=2, camera_distance_range=(2.0, 2.0),
        fovy_range=(40.0, 40.0), eval_fovy_deg=40.0, eval_camera_distance=2.0), 0)

    # gt: a centered disk mask, white
    ys, xs = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    mask = (((xs - 15.5) ** 2 + (ys - 15.5) ** 2) < 100).astype(np.float32)
    ref = sampler.orbit(n_views=2, height=32, width=32)
    gt_mask = jnp.asarray(np.stack([mask] * 2))[..., None]
    gt_rgb = jnp.ones((2, 32, 32, 3)) * gt_mask

    optimizer = gaussian_optimizer(position_lr=0.002, feature_lr=0.02, opacity_lr=0.05)
    losses = GaussianStageLosses(lambda_sds=0.0, lambda_rgb=1000.0, lambda_mask=100.0,
                                 lambda_rgb_tv=0.0)
    train_step, density_step = make_gaussian_train_step(
        gcfg, raster_cfg, optimizer, losses, None, invert_bg_prob=0.0,
        sugar_reg_start=5, n_sdf_samples=128,
    )
    state = init_gaussian_train_state(
        init_random_sphere(gcfg, jax.random.PRNGKey(0)), optimizer
    )
    reg_state = make_reg_state(state)

    batch = {
        "ref_cameras": ref["rand_cameras"], "ref_rgb": gt_rgb, "ref_mask": gt_mask,
        "rand_cameras": sampler.sample()["rand_cameras"],
    }
    rng = jax.random.PRNGKey(0)
    state, m0 = train_step(state, batch, reg_state, rng)
    first = float(m0["loss_rgb"] + m0["loss_mask"])
    n0 = int(state.gaussians.alive.sum())

    for i in range(20):
        rng, k = jax.random.split(rng)
        batch["rand_cameras"] = sampler.sample()["rand_cameras"]
        state, m = train_step(state, batch, reg_state, k)
        if i == 10:
            # stats have accumulated; densify
            assert float(state.stats.denom.max()) > 0
            state, info = density_step(state, jax.random.PRNGKey(7))
            reg_state = make_reg_state(state)
            assert int(info["n_alive"]) > 0
            n_new = int(info["n_cloned"]) + int(info["n_split"])
            assert n_new > 0  # aggressive threshold guarantees growth

    final = float(m["loss_rgb"] + m["loss_mask"])
    assert np.isfinite(final)
    assert final < first, (first, final)
    for leaf in jax.tree.leaves(state.gaussians):
        assert np.isfinite(np.asarray(leaf).astype(np.float32)).all()
    # sugar reg terms active and finite after step 5
    assert np.isfinite(float(m["loss_sugar_density_reg"]))
    assert float(m["loss_opacity_binary"]) > 0
