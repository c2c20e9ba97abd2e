"""dreamfusion / prolificdreamer / magic123 train steps (tiny scenes)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dreammesh4d_tpu.models.geometry.implicit_volume import (
    ImplicitVolumeConfig,
    init_implicit_volume,
)
from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import NeRFRendererConfig
from dreammesh4d_tpu.ops.hashgrid import HashGridConfig
from dreammesh4d_tpu.systems.threestudio_zoo import (
    DreamFusionLosses,
    Magic123Losses,
    ProlificDreamerLosses,
    init_scene_state,
    init_vsd_state,
    make_dreamfusion_train_step,
    make_magic123_train_step,
    make_prolificdreamer_train_step,
)

HW = 16


def _geo():
    cfg = ImplicitVolumeConfig(
        radius=1.0, hashgrid=HashGridConfig(n_levels=4, log2_hashmap_size=8),
        n_neurons=16, n_hidden_layers=1)
    params = init_implicit_volume(cfg, jax.random.PRNGKey(0))
    rcfg = NeRFRendererConfig(num_samples_coarse=16, num_samples_fine=0, radius=1.0)
    return cfg, params, rcfg


def _rand_batch(B=1):
    from dreammesh4d_tpu.ops.cameras import get_ray_directions, get_rays, look_at_c2w, camera_position_from_spherical

    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(30.0), jnp.asarray(2.0))
    dirs = get_ray_directions(HW, HW, 20.0)
    ro, rd = get_rays(dirs, look_at_c2w(pos))
    ro = ro.reshape(HW, HW, 3)
    rd = rd.reshape(HW, HW, 3)
    return {
        "rays_o": jnp.broadcast_to(ro, (B, HW, HW, 3)),
        "rays_d": jnp.broadcast_to(rd, (B, HW, HW, 3)),
        "light_positions": jnp.broadcast_to(pos, (B, 3)),
        "elevation": jnp.full((B,), 10.0),
        "azimuth": jnp.full((B,), 30.0),
        "camera_distances": jnp.full((B,), 2.0),
    }


def _guidance(k, rgb, batch):
    # toy SDS stand-in: pull renders toward gray (differentiable, scalar)
    return ((rgb - 0.5) ** 2).mean()


def test_dreamfusion_step_updates_params():
    cfg, params, rcfg = _geo()
    opt = optax.adam(1e-2)
    step = make_dreamfusion_train_step(cfg, rcfg, opt, DreamFusionLosses(),
                                       guidance_fn=_guidance)
    state = init_scene_state(params, opt)
    batch = _rand_batch()
    s1, m1 = step(state, batch, jax.random.PRNGKey(0))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(1))
    assert int(s2.step) == 2
    assert np.isfinite(float(m1["loss_total"])) and np.isfinite(float(m2["loss_total"]))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                               state.geo_params, s2.geo_params)
    assert sum(jax.tree_util.tree_leaves(d)) > 0


def test_prolificdreamer_two_optimizers():
    cfg, params, rcfg = _geo()
    lora0 = {"A": jnp.ones((4, 2)), "B": jnp.zeros((2, 4))}
    opt, lopt = optax.adam(1e-2), optax.adam(1e-3)

    def vsd_fn(lora, k, rgb, batch):
        # toy: vsd pulls renders to gray; lora loss depends only on lora
        return {"loss_vsd": ((rgb - 0.5) ** 2).mean(),
                "loss_lora": ((lora["A"] @ lora["B"]) ** 2).mean() + lora["A"].mean()}

    step = make_prolificdreamer_train_step(cfg, rcfg, opt, lopt,
                                           ProlificDreamerLosses(), vsd_fn)
    state = init_vsd_state(params, lora0, opt, lopt)
    batch = _rand_batch()
    s1, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_total"]))
    assert np.isfinite(float(m["loss_vsd"])) and np.isfinite(float(m["loss_lora"]))
    # both parameter sets moved
    assert float(jnp.abs(s1.lora_params["A"] - lora0["A"]).sum()) > 0
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                               state.geo_params, s1.geo_params)
    assert sum(jax.tree_util.tree_leaves(d)) > 0


def test_magic123_joint_guidance_and_ref():
    cfg, params, rcfg = _geo()
    opt = optax.adam(1e-2)
    calls = {"g2": 0, "g3": 0}

    def g2(k, rgb, batch):
        calls["g2"] += 1
        return ((rgb - 0.3) ** 2).mean()

    def g3(k, rgb, batch):
        calls["g3"] += 1
        return ((rgb - 0.7) ** 2).mean()

    step = make_magic123_train_step(cfg, rcfg, opt, Magic123Losses(),
                                    guidance_2d_fn=g2, guidance_3d_fn=g3)
    state = init_scene_state(params, opt)
    batch = _rand_batch()
    R = 64
    batch.update({
        "ref_rays_o": batch["rays_o"][0].reshape(-1, 3)[:R],
        "ref_rays_d": batch["rays_d"][0].reshape(-1, 3)[:R],
        "ref_rgb": jnp.full((R, 3), 0.6),
        "ref_mask": jnp.ones((R, 1)),
        "ref_light": jnp.asarray([0.0, 0.0, 2.0]),
    })
    s1, m = step(state, batch, jax.random.PRNGKey(0))
    assert calls["g2"] == 1 and calls["g3"] == 1  # traced once each
    for key in ("loss_sds_2d", "loss_sds_3d", "loss_rgb", "loss_mask", "loss_total"):
        assert np.isfinite(float(m[key])), key


def test_eff_dreamfusion_upsamples_before_sds():
    from dreammesh4d_tpu.systems.threestudio_zoo import make_eff_dreamfusion_train_step

    cfg, params, rcfg = _geo()
    opt = optax.adam(1e-2)
    seen_shapes = []

    def guidance(k, rgb, batch):
        seen_shapes.append(rgb.shape)
        return ((rgb - 0.5) ** 2).mean()

    step = make_eff_dreamfusion_train_step(
        cfg, rcfg, opt, DreamFusionLosses(), guidance_fn=guidance, full_hw=2 * HW)
    state = init_scene_state(params, opt)
    s1, m1 = step(state, _rand_batch(), jax.random.PRNGKey(0))
    # the guidance saw the bilinearly-upsampled full resolution, not HW
    assert seen_shapes[0][1:3] == (2 * HW, 2 * HW)
    assert np.isfinite(float(m1["loss_total"]))
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                               state.geo_params, s1.geo_params)
    assert sum(jax.tree_util.tree_leaves(d)) > 0


def test_image_condition_dreamfusion_is_magic123_with_2d_only():
    from dreammesh4d_tpu.systems.threestudio_zoo import ImageConditionDreamFusionSystem

    cfg, params, rcfg = _geo()
    opt = optax.adam(1e-2)
    step = ImageConditionDreamFusionSystem.make_train_step(
        cfg, rcfg, opt, Magic123Losses(), guidance_fn=_guidance)
    state = init_scene_state(params, opt)
    batch = _rand_batch()
    R = 7
    batch.update({
        "ref_rays_o": jnp.zeros((R, 3)) + jnp.array([0.0, 0.0, 2.0]),
        "ref_rays_d": jnp.concatenate([jnp.zeros((R, 2)), -jnp.ones((R, 1))], -1),
        "ref_rgb": jnp.full((R, 3), 0.3),
        "ref_mask": jnp.ones((R, 1)),
        "ref_light": jnp.array([0.0, 0.0, 2.0]),
    })
    s1, m1 = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m1["loss_total"]))
    assert "loss_sds_2d" in m1 and "loss_rgb" in m1
