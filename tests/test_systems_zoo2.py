"""fantasia3d / latentnerf / sjc / magic3d train steps (tiny scenes)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreammesh4d_tpu.models.geometry.dmtet import TetSDFGridConfig, init_tet_sdf_grid
from dreammesh4d_tpu.models.geometry.implicit_volume import (
    ImplicitVolumeConfig,
    init_implicit_volume,
)
from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import NeRFRendererConfig
from dreammesh4d_tpu.ops.cameras import (
    camera_position_from_spherical,
    get_cam_info_gaussian,
    get_ray_directions,
    get_rays,
    look_at_c2w,
)
from dreammesh4d_tpu.ops.hashgrid import HashGridConfig
from dreammesh4d_tpu.systems.threestudio_zoo import init_scene_state
from dreammesh4d_tpu.systems.threestudio_zoo2 import (
    Fantasia3DLosses,
    LatentNeRFLosses,
    Magic3DLosses,
    SJCLosses,
    make_fantasia3d_train_step,
    make_latentnerf_train_step,
    make_magic3d_refine_train_step,
    make_sjc_train_step,
)

HW = 16


def _nerf(n_feat=3):
    cfg = ImplicitVolumeConfig(
        radius=1.0, n_feature_dims=n_feat,
        hashgrid=HashGridConfig(n_levels=4, log2_hashmap_size=8),
        n_neurons=16, n_hidden_layers=1)
    params = init_implicit_volume(cfg, jax.random.PRNGKey(0))
    rcfg = NeRFRendererConfig(num_samples_coarse=16, num_samples_fine=0, radius=1.0)
    return cfg, params, rcfg


def _ray_batch(B=1):
    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(30.0), jnp.asarray(2.0))
    dirs = get_ray_directions(HW, HW, 20.0)
    ro, rd = get_rays(dirs, look_at_c2w(pos))
    ro, rd = ro.reshape(HW, HW, 3), rd.reshape(HW, HW, 3)
    return {
        "rays_o": jnp.broadcast_to(ro, (B, HW, HW, 3)),
        "rays_d": jnp.broadcast_to(rd, (B, HW, HW, 3)),
        "light_positions": jnp.broadcast_to(pos, (B, 3)),
        "elevation": jnp.full((B,), 10.0),
        "azimuth": jnp.full((B,), 30.0),
        "camera_distances": jnp.full((B,), 2.0),
    }


def _cam_batch():
    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(30.0), jnp.asarray(2.0))
    cam = get_cam_info_gaussian(look_at_c2w(pos), 0.7, 0.7, 0.01, 100.0)
    return {
        "cameras": [cam],
        "camera_positions": pos[None],
        "elevation": jnp.asarray([10.0]),
        "azimuth": jnp.asarray([30.0]),
        "camera_distances": jnp.asarray([2.0]),
    }


def test_fantasia3d_geometry_phase_moves_sdf():
    cfg = TetSDFGridConfig(isosurface_resolution=12,
                           hashgrid=HashGridConfig(n_levels=2, log2_hashmap_size=8),
                           n_neurons=8)
    params = init_tet_sdf_grid(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)

    def guidance(k, inp, batch):
        assert inp.shape[-1] == 4  # normal(3) + opacity(1)
        return ((inp - 0.5) ** 2).mean()

    step = make_fantasia3d_train_step(cfg, opt, Fantasia3DLosses(),
                                      guidance, H=32, W=32)
    state = init_scene_state(params, opt)
    s1, m = step(state, _cam_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_total"]))
    assert np.isfinite(float(m["loss_normal_consistency"]))
    assert float(jnp.abs(s1.geo_params["sdf"] - state.geo_params["sdf"]).sum()) > 0


def test_magic3d_refine_textures_via_features():
    cfg = TetSDFGridConfig(isosurface_resolution=12,
                           hashgrid=HashGridConfig(n_levels=2, log2_hashmap_size=8),
                           n_neurons=8)
    params = init_tet_sdf_grid(cfg, jax.random.PRNGKey(0))
    opt = optax.adam(1e-2)

    def guidance(k, rgb, batch):
        assert rgb.shape[-1] == 3
        return ((rgb - 0.2) ** 2).mean()

    step = make_magic3d_refine_train_step(cfg, opt, Magic3DLosses(),
                                          guidance, H=32, W=32)
    state = init_scene_state(params, opt)
    s1, m = step(state, _cam_batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_total"]))
    # the feature MLP (texture head) received gradient
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                               state.geo_params["feature_mlp"],
                               s1.geo_params["feature_mlp"])
    assert sum(jax.tree_util.tree_leaves(d)) > 0


def test_latentnerf_latent_channels():
    cfg, params, rcfg = _nerf(n_feat=4)
    opt = optax.adam(1e-2)
    seen = {}

    def guidance(k, img, batch, rgb_as_latents):
        seen["C"] = img.shape[-1]
        seen["latents"] = rgb_as_latents
        return (img ** 2).mean()

    step = make_latentnerf_train_step(cfg, rcfg, opt, LatentNeRFLosses(), guidance)
    state = init_scene_state(params, opt)
    s1, m = step(state, _ray_batch(), jax.random.PRNGKey(0))
    assert seen["C"] == 4 and seen["latents"] is True
    assert np.isfinite(float(m["loss_total"]))


def test_sjc_emptiness_and_depth_losses():
    cfg, params, rcfg = _nerf()
    opt = optax.adam(1e-2)
    step = make_sjc_train_step(cfg, rcfg, opt,
                               SJCLosses(lambda_depth=1.0, center_ratio=0.5),
                               lambda k, rgb, b: ((rgb - 0.5) ** 2).mean())
    state = init_scene_state(params, opt)
    s1, m = step(state, _ray_batch(), jax.random.PRNGKey(0))
    for key in ("loss_sds", "loss_emptiness", "loss_depth", "loss_total"):
        assert np.isfinite(float(m[key])), key
    # emptiness is a positive log penalty on weights
    assert float(m["loss_emptiness"]) >= 0


def test_textmesh_neus_sds_with_eikonal():
    import optax
    from dreammesh4d_tpu.models.geometry.implicit_sdf import (
        ImplicitSDFConfig, init_implicit_sdf)
    from dreammesh4d_tpu.models.renderers.neus_volume_renderer import (
        NeuSRendererConfig, init_neus_variance)
    from dreammesh4d_tpu.systems.threestudio_zoo2 import (
        TextMeshLosses, make_textmesh_train_step)

    gcfg = ImplicitSDFConfig(radius=1.0,
                             hashgrid=HashGridConfig(n_levels=2, log2_hashmap_size=8),
                             n_neurons=8, n_hidden_layers=1)
    rcfg = NeuSRendererConfig(num_samples_coarse=12, num_samples_fine=0, radius=1.0)
    params = {
        "geo": init_implicit_sdf(gcfg, jax.random.PRNGKey(0)),
        "var": init_neus_variance(rcfg),
    }
    opt = optax.adam(1e-3)
    step = make_textmesh_train_step(gcfg, rcfg, opt, TextMeshLosses(),
                                    lambda k, rgb, b: ((rgb - 0.5) ** 2).mean())
    state = init_scene_state(params, opt)
    s1, m = step(state, _ray_batch(), jax.random.PRNGKey(0))
    for key in ("loss_sds", "loss_eikonal", "loss_total"):
        assert np.isfinite(float(m[key])), key
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                               state.geo_params, s1.geo_params)
    assert sum(jax.tree_util.tree_leaves(d)) > 0
