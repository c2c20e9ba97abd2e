"""End-to-end dynamic stage: the deformation network learns a moving target."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreammesh4d_tpu.data.uncond import RandomCameraConfig, RandomCameraSampler
from dreammesh4d_tpu.models.geometry.deformation import DeformationConfig, init_deformation
from dreammesh4d_tpu.models.geometry.dynamic_sugar import (
    DynamicSuGaRConfig,
    build_dynamic_static,
)
from dreammesh4d_tpu.models.geometry.sugar import SuGaRConfig, create_sugar, gaussian_attributes
from dreammesh4d_tpu.models.renderers.sugar_rasterizer import render_batch
from dreammesh4d_tpu.ops.gs import RasterizerConfig
from dreammesh4d_tpu.ops.meshops import build_one_ring, cotangent_weights, face_normals
from dreammesh4d_tpu.systems.sugar_4dgen import (
    Sugar4DGenLosses,
    init_dyn_state,
    make_dynamic_render_eval,
    make_dynamic_train_step,
)
from dreammesh4d_tpu.utils.procedural import make_icosphere

DEF_CFG = DeformationConfig(base_resolution=(16, 16, 16, 8), multires=(1, 2))


def setup(W=48):
    mesh = make_icosphere(1, radius=0.7)
    params, sugar_static = create_sugar(SuGaRConfig(n_gaussians_per_surface_triangle=1), mesh)
    cfg = DynamicSuGaRConfig(
        n_dg_nodes=16, dg_node_connectivity=4, skinning_method="hybrid",
        deformation=DEF_CFG, dist_mode="eucdisc",
    )
    static = build_dynamic_static(cfg, sugar_static, np.asarray(params.points))
    dparams = init_deformation(DEF_CFG, jax.random.PRNGKey(0))
    fov = np.radians(40.0)
    t = float(np.tan(fov / 2))
    raster_cfg = RasterizerConfig(W, W, t, t, tile_capacity=512, chunk=32)
    cam_cfg = RandomCameraConfig(
        height=W, width=W, batch_size=2, camera_distance_range=(2.5, 2.5),
        fovy_range=(40.0, 40.0), eval_fovy_deg=40.0, eval_camera_distance=2.5,
    )
    sampler = RandomCameraSampler(cam_cfg, seed=0)
    ring = build_one_ring(np.asarray(static.sugar.faces), len(params.points))
    arap_w = cotangent_weights(np.asarray(params.points), np.asarray(static.sugar.faces), ring)
    return mesh, params, static, cfg, dparams, raster_cfg, sampler, jnp.asarray(arap_w)


def render_gt_frames(params, static, raster_cfg, cameras, offsets):
    """Ground truth: the sphere rigidly translated by ``offsets[t]``."""
    attrs = gaussian_attributes(params, static.sugar)
    fn = face_normals(params.points, static.sugar.faces)
    gs_n = jnp.repeat(fn, static.sugar.n_per_face, axis=0)
    T = offsets.shape[0]
    means_t = attrs.means3d[None] + offsets[:, None, :]
    quats_t = jnp.broadcast_to(attrs.quats, (T,) + attrs.quats.shape)
    scales_t = jnp.broadcast_to(attrs.scales, (T,) + attrs.scales.shape)
    normals_t = jnp.broadcast_to(gs_n, (T,) + gs_n.shape)
    return render_batch(
        attrs.means3d, attrs.quats, attrs.scales, attrs.opacities, attrs.sh,
        static.sugar.sh_degree, None, cameras, jnp.ones(3), raster_cfg,
        timed_attrs=(means_t, quats_t, scales_t, normals_t),
    )


def test_dynamic_train_step_learns_motion():
    mesh, params, static, cfg, dparams, raster_cfg, sampler, arap_w = setup()
    ts = jnp.asarray([0.1, 0.5, 0.9])
    T = 3
    # GT translation along +z over time
    offsets = jnp.stack([jnp.asarray([0.0, 0.0, 0.35 * float(t)]) for t in ts])
    ref = sampler.orbit(n_views=T, height=48, width=48)
    gt = render_gt_frames(params, static, raster_cfg, ref["rand_cameras"], offsets)

    optimizer = optax.adam(2e-3)
    losses = Sugar4DGenLosses(
        lambda_rgb=5000.0, lambda_mask=1000.0, lambda_normal_consistency=1.0,
        lambda_arap_reg_key_frame=0.1, lambda_arap_reg_inter_frame=0.1,
        lambda_plane_tv=0.0001, lambda_time_smoothness=0.001,
    )
    train_step = make_dynamic_train_step(
        params, static, cfg.deformation, raster_cfg, optimizer, losses, arap_w,
        guidance_fn=None, invert_bg_prob=0.0,
    )
    state = init_dyn_state(dparams, optimizer)
    batch = {
        "timestamps": ts,
        "frame_indices": jnp.arange(T, dtype=jnp.int32),
        "ref_cameras": ref["rand_cameras"],
        "ref_rgb": gt["comp_rgb"],
        "ref_mask": (gt["comp_mask"] > 0.5).astype(jnp.float32),
        "rand_cameras": sampler.sample(batch_size=T)["rand_cameras"],
        "inter_timestamps": jnp.linspace(0.2, 0.4, 4),
    }
    rng = jax.random.PRNGKey(0)
    state, m0 = train_step(state, batch, rng)
    first = float(m0["loss_rgb"] + m0["loss_mask"])
    for i in range(60):
        rng, k = jax.random.split(rng)
        batch["rand_cameras"] = sampler.sample(batch_size=T)["rand_cameras"]
        state, metrics = train_step(state, batch, k)
    final = float(metrics["loss_rgb"] + metrics["loss_mask"])
    assert np.isfinite(final)
    assert final < 0.5 * first, (first, final)
    # all deformation grads finite
    for leaf in jax.tree.leaves(state.deform_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_dynamic_eval_render():
    mesh, params, static, cfg, dparams, raster_cfg, sampler, arap_w = setup()
    render_eval = make_dynamic_render_eval(params, static, cfg.deformation, raster_cfg)
    orbit = sampler.orbit(n_views=2, height=48, width=48)
    out = render_eval(dparams, orbit["rand_cameras"], jnp.asarray([0.3, 0.7]))
    assert out["comp_rgb"].shape == (2, 48, 48, 3)
    assert np.isfinite(np.asarray(out["comp_rgb"])).all()
