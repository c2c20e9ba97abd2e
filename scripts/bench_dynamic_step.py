"""Dynamic-stage step wall-clock (the second BASELINE.json metric).

Reproduces the PERF.md workload: 2562-vert / 5120-face mesh, 6 gaussians per
face (30720), 1000 deformation-graph nodes (hybrid skinning), HexPlane at the
full sugar_dynamic_dg.yaml config, 4 ref + 4 random views @512², keyframe +
10-timestamp inter-frame ARAP, 32-frame video device-resident — one jitted
train step on the session accelerator.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np


def main():
    with_sds = "--sds" in sys.argv
    bf16 = "--bf16" in sys.argv
    import jax
    import jax.numpy as jnp
    import optax

    from dreammesh4d_tpu.data.uncond import RandomCameraConfig, RandomCameraSampler
    from dreammesh4d_tpu.models.geometry.deformation import (
        DeformationConfig,
        init_deformation,
    )
    from dreammesh4d_tpu.models.geometry.dynamic_sugar import (
        DynamicSuGaRConfig,
        build_dynamic_static,
    )
    from dreammesh4d_tpu.models.geometry.sugar import SuGaRConfig, create_sugar
    from dreammesh4d_tpu.ops.gs import RasterizerConfig
    from dreammesh4d_tpu.ops.meshops import build_one_ring, cotangent_weights
    from dreammesh4d_tpu.systems.sugar_4dgen import (
        Sugar4DGenLosses,
        init_dyn_state,
        make_dynamic_train_step,
    )
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    W = 512
    T = 4  # frames per step (sugar_dynamic_dg.yaml num_frames)
    L = 32  # video length
    mesh = make_icosphere(4, radius=0.7)  # 2562 verts / 5120 faces
    params, sugar_static = create_sugar(
        SuGaRConfig(n_gaussians_per_surface_triangle=6), mesh)
    print(f"mesh: {params.points.shape[0]} verts, "
          f"{sugar_static.faces.shape[0]} faces, "
          f"{sugar_static.faces.shape[0] * 6} gaussians")
    def_cfg = DeformationConfig()  # full HexPlane defaults
    cfg = DynamicSuGaRConfig(
        n_dg_nodes=1000, dg_node_connectivity=4, skinning_method="hybrid",
        deformation=def_cfg, dist_mode="eucdisc",
    )
    static = build_dynamic_static(cfg, sugar_static, np.asarray(params.points))
    dparams = init_deformation(def_cfg, jax.random.PRNGKey(0))

    fov = np.radians(40.0)
    t = float(np.tan(fov / 2))
    t32 = "--t32" in sys.argv  # 32-px binning tiles (PERF.md round-3)
    tile_kw = (dict(tile_px=32, tile_capacity=2048, max_tiles_per_gaussian=4)
               if t32 else dict(tile_capacity=1024, max_tiles_per_gaussian=8))
    raster_cfg = RasterizerConfig(W, W, t, t, chunk=32,
                                  backend="pallas_resident", **tile_kw)
    cam_cfg = RandomCameraConfig(height=W, width=W, batch_size=T)
    sampler = RandomCameraSampler(cam_cfg, seed=0)

    ring = build_one_ring(np.asarray(static.sugar.faces), len(params.points))
    arap_w = jnp.asarray(cotangent_weights(
        np.asarray(params.points), np.asarray(static.sugar.faces), ring))

    video = (jnp.zeros((L, W, W, 3)), jnp.ones((L, W, W, 1)))
    optimizer = optax.adam(1e-3)

    guidance_fn = None
    if with_sds:
        # FULL-SIZE flax Zero123 (randomly initialized — same compute as the
        # converted checkpoint): VAE encode 256^2 + 860M-param UNet CFG batch
        from dreammesh4d_tpu.models.guidance.zero123.guidance import (
            StableZero123Guidance,
            Zero123Config,
        )

        gcfg = Zero123Config(use_clip=False,
                             dtype=jnp.bfloat16 if bf16 else jnp.float32)
        guid = StableZero123Guidance(gcfg)
        gparams = guid.modules.init_params(jax.random.PRNGKey(7))
        n_unet = sum(x.size for x in jax.tree_util.tree_leaves(gparams["unet"]))
        print(f"UNet params: {n_unet/1e6:.1f}M")
        bank = {
            "c_crossattn": jnp.zeros((L, 768)),
            "c_concat": jnp.zeros((L, 32, 32, 4)),
        }

        def guidance_fn(gstate, rng, rgb, batch):
            gp, bk = gstate
            return guid.sds_loss(
                gp, bk, rng, rgb, batch["elevation"], batch["azimuth"],
                batch["camera_distances"], batch["frame_indices"], 0,
            )["loss_sds"]

    rand_raster_cfg = None
    if with_sds and "--sds256" in sys.argv:
        rand_kw = (dict(tile_px=32, tile_capacity=1536, max_tiles_per_gaussian=4)
                   if t32 else dict(tile_capacity=768, max_tiles_per_gaussian=8))
        rand_raster_cfg = RasterizerConfig(
            256, 256, t, t, chunk=32, backend="pallas_resident", **rand_kw)
    step_fn = make_dynamic_train_step(
        params, static, def_cfg, raster_cfg, optimizer, Sugar4DGenLosses(),
        arap_w, guidance_fn=guidance_fn, video_frames=video,
        rand_raster_cfg=rand_raster_cfg,
    )
    state = init_dyn_state(dparams, optimizer)
    ref = sampler.orbit(n_views=T, height=W, width=W)
    rand = sampler.sample(batch_size=T)
    batch = {
        "timestamps": jnp.linspace(0.1, 0.9, T),
        "frame_indices": jnp.arange(T, dtype=jnp.int32),
        "ref_cameras": ref["rand_cameras"],
        "rand_cameras": rand["rand_cameras"],
        "elevation": rand["elevation"],
        "azimuth": rand["azimuth"],
        "camera_distances": rand["camera_distances"],
        "inter_timestamps": jnp.linspace(0.2, 0.4, 10),
    }
    gstate = (gparams, bank) if with_sds else None
    rng = jax.random.PRNGKey(0)
    state, m = step_fn(state, batch, rng, gstate)
    jax.block_until_ready(m)

    n_iter = 10
    t0 = time.perf_counter()
    for _ in range(n_iter):
        state, m = step_fn(state, batch, rng, gstate)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"dynamic step: {dt*1e3:.1f} ms  -> 2000 steps = {dt*2000/60:.1f} min")


if __name__ == "__main__":
    main()
