"""Static NeRF stage (stable-zero123) step wall-clock on the session chip.

Reference workload (configs/stable-zero123.yaml): hash-grid implicit volume,
ref view + random-camera batch, SDS vs the Zero123 prior.  Flags:
  --sds    full-size flax Zero123 (random weights, same compute as the ckpt)
  --bf16   guidance in bfloat16
  --hw N   random-view resolution (stage milestones use 64/128/256; default 128)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from dreammesh4d_tpu.data.uncond import RandomCameraConfig, RandomCameraSampler
    from dreammesh4d_tpu.models.geometry.implicit_volume import (
        ImplicitVolumeConfig,
        init_implicit_volume,
    )
    from dreammesh4d_tpu.models.materials import DiffuseWithPointLightMaterial
    from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import NeRFRendererConfig
    from dreammesh4d_tpu.ops.cameras import get_ray_directions, get_rays
    from dreammesh4d_tpu.ops.hashgrid import HashGridConfig
    from dreammesh4d_tpu.ops.hashgrid import progressive_level_mask
    from dreammesh4d_tpu.systems.zero123_system import (
        Zero123Losses,
        init_nerf_state,
        make_zero123_train_step,
    )

    with_sds = "--sds" in sys.argv
    bf16 = "--bf16" in sys.argv
    hw = int(sys.argv[sys.argv.index("--hw") + 1]) if "--hw" in sys.argv else 128
    B = 4  # rand views per step at the 128 milestone (stable-zero123.yaml)

    geo_cfg = ImplicitVolumeConfig(hashgrid=HashGridConfig())  # L16 F2 T2^19
    rcfg = NeRFRendererConfig(radius=geo_cfg.radius)
    optimizer = optax.adam(0.01)
    losses = Zero123Losses()
    material = DiffuseWithPointLightMaterial()

    guidance_fn = None
    gstate = None
    if with_sds:
        from dreammesh4d_tpu.models.guidance.zero123.guidance import (
            StableZero123Guidance,
            Zero123Config,
        )

        gcfg = Zero123Config(use_clip=False,
                             dtype=jnp.bfloat16 if bf16 else jnp.float32)
        guid = StableZero123Guidance(gcfg)
        gparams = guid.modules.init_params(jax.random.PRNGKey(7))
        bank = {"c_crossattn": jnp.zeros((1, 768)),
                "c_concat": jnp.zeros((1, 32, 32, 4))}
        gstate = (gparams, bank)

        def guidance_fn(gs, rng, rgb, batch):
            gp, bk = gs
            return guid.sds_loss(
                gp, bk, rng, rgb, batch["elevation"], batch["azimuth"],
                batch["camera_distances"], None, 0,
            )["loss_sds"]

    step_fn = make_zero123_train_step(geo_cfg, rcfg, optimizer, losses,
                                      material, guidance_fn, rand_hw=hw)
    params = init_implicit_volume(geo_cfg, jax.random.PRNGKey(0))
    state = init_nerf_state(params, optimizer)

    cam_cfg = RandomCameraConfig(height=hw, width=hw, batch_size=B)
    sampler = RandomCameraSampler(cam_cfg, seed=0)
    rand = sampler.sample()
    R = 128  # ref rays per step (subsampled ref view)
    fov = np.radians(40.0)
    dirs = get_ray_directions(R, R, 0.5 * R / np.tan(0.5 * fov))
    ro, rd = get_rays(dirs, jnp.eye(4)[None, :3].repeat(1, 0), keepdim=False)
    batch = {
        "ref_rays_o": ro.reshape(-1, 3)[: R * R],
        "ref_rays_d": rd.reshape(-1, 3)[: R * R],
        "ref_rgb": jnp.ones((R * R, 3)) * 0.5,
        "ref_mask": jnp.ones((R * R, 1)),
        "ref_light": jnp.asarray([0.0, 0.0, 3.0]),
        "rand_rays_o": rand["rays_o"],
        "rand_rays_d": rand["rays_d"],
        "light_positions": rand["light_positions"],
        "elevation": rand["elevation"],
        "azimuth": rand["azimuth"],
        "camera_distances": rand["camera_distances"],
    }
    lm = jnp.asarray(progressive_level_mask(geo_cfg.hashgrid, 10_000))
    rng = jax.random.PRNGKey(0)

    state, m = step_fn(state, batch, rng, lm, 0.5, gstate)
    jax.block_until_ready(state)
    print("loss_total:", float(m["loss_total"]), "psnr:", float(m["psnr"]))
    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        rng_i = jax.random.fold_in(rng, i)
        state, m = step_fn(state, batch, rng_i, lm, 0.5, gstate)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / n_iter
    print(f"nerf step @ {hw}^2 x{B} (sds={with_sds}, bf16={bf16}): "
          f"{dt*1e3:.1f} ms -> 600 steps = {dt*600:.1f} s")


if __name__ == "__main__":
    main()
