"""Serving benchmark: timed novel-view rendering of a dynamic SuGaR scene.

Measures the inference path a 4D viewer drives — timestamps + camera →
HexPlane node deltas → skinning → timed gaussians → rasterize — as frames
per second at the given resolution, with everything jitted and
device-resident (no host work per frame beyond the timestamp scalar).

Usage: python scripts/bench_render_4d.py [n_frames] [W]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

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
    from dreammesh4d_tpu.systems.sugar_4dgen import make_dynamic_render_eval
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 512

    # training-scale scene: ~5k-face mesh x 6 gaussians/face ≈ 31k gaussians
    mesh = make_icosphere(4, radius=0.6)
    params, sugar_static = create_sugar(SuGaRConfig(), mesh)
    cfg = DynamicSuGaRConfig(n_dg_nodes=1000, dist_mode="eucdisc",
                             deformation=DeformationConfig())
    static = build_dynamic_static(cfg, sugar_static, np.asarray(params.points))
    dparams = init_deformation(cfg.deformation, jax.random.PRNGKey(0))

    fov = np.radians(40.0)
    t = float(np.tan(fov / 2))
    raster_cfg = RasterizerConfig(W, W, t, t, tile_capacity=1024, chunk=32,
                                  max_tiles_per_gaussian=8,
                                  backend="pallas_resident")
    render_eval = make_dynamic_render_eval(params, static, cfg.deformation, raster_cfg)

    cam_cfg = RandomCameraConfig(height=W, width=W, batch_size=1,
                                 eval_fovy_deg=40.0, eval_camera_distance=2.2)
    sampler = RandomCameraSampler(cam_cfg, seed=0)
    orbit = sampler.orbit(n_views=1, height=W, width=W)
    cams = orbit["rand_cameras"]

    ts0 = jnp.zeros((1,), jnp.float32)
    out = jax.block_until_ready(render_eval(dparams, cams, ts0))  # compile

    t0 = time.perf_counter()
    for i in range(n_frames):
        ts = jnp.full((1,), (i % 32) / 31.0, jnp.float32)
        out = render_eval(dparams, cams, ts)
    jax.block_until_ready(out["comp_rgb"])
    dt = time.perf_counter() - t0
    n_gs = params.points.shape[0]
    print(f"4D playback: {n_frames / dt:.1f} fps @ {W}x{W} "
          f"({static.sugar.faces.shape[0]} faces, "
          f"{static.sugar.faces.shape[0] * static.sugar.n_per_face} gaussians, "
          f"{cfg.n_dg_nodes} nodes)")


if __name__ == "__main__":
    main()
