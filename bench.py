"""Benchmark: 3DGS fwd+bwd rasterize fps @512² (the BASELINE.json metric).

Runs on whatever accelerator JAX sees (the driver runs it on a real TPU chip).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: 100k mesh-bound-scale Gaussians, 512² render, forward + full
backward (grads w.r.t. means/scales/quats/colors/opacity) — comparable to the
diff-gaussian-rasterization fwd+bwd the reference drives per training view.
``vs_baseline`` is the ratio against a 250 fps A100 estimate for the CUDA
rasterizer on this workload — the conservative end of the 200-650 fps range
derived from the published 3DGS training throughput (Kerbl et al. 2023,
30k iters in ~41 min at 1.2-1.6MP/2-5M gaussians) scaled to 100k/512²; see
BASELINE.md "A100 rasterizer-fps denominator" for the arithmetic.
"""

import json
import time

import numpy as np

A100_REFERENCE_FPS = 250.0


SCOPED_VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "112640"}


def main():
    import jax
    import jax.numpy as jnp

    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical,
        get_cam_info_gaussian,
        look_at_c2w,
    )
    from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize
    from dreammesh4d_tpu.ops.quaternion import quat_normalize

    N = 100_000
    W = H = 512
    FOV = 0.8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    # gaussians on a sphere shell (surface-bound-like distribution)
    p = jax.random.normal(ks[0], (N, 3))
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    p = p * (0.8 + 0.05 * jax.random.normal(ks[1], (N, 1)))
    quats = quat_normalize(jax.random.normal(ks[2], (N, 4)))
    log_scales = jnp.log(jnp.full((N, 3), 0.01)) + 0.3 * jax.random.normal(ks[3], (N, 3))
    colors = jax.random.uniform(ks[4], (N, 3))
    opac = jnp.full((N,), 0.9)

    pos = camera_position_from_spherical(jnp.asarray(15.0), jnp.asarray(30.0), jnp.asarray(2.2))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    t = float(np.tan(FOV / 2))
    # t32+cap2048+m4: round-3 sweep winner (PERF.md round-3 notes) — 32-px
    # binning tiles quarter the pair count (sort + RMW + glue all scale with
    # pairs); max tile occupancy on this scene is 1794 < 2048 and m4
    # truncates FEWER gaussian spans than the previous t16/m9 default
    cfg = RasterizerConfig(W, H, t, t, tile_capacity=2048, chunk=32,
                           max_tiles_per_gaussian=4, backend="pallas_resident",
                           bf16_matmuls=True, stream_rows=True, tile_px=32)

    def loss_fn(params):
        out = rasterize(
            params["p"], jax.nn.sigmoid(params["op_logit"]), cam, cfg, jnp.zeros(3),
            colors=params["colors"], scales=jnp.exp(params["log_scales"]),
            quats=params["quats"],
        )
        return out.rgb.mean() + out.depth.mean() * 0.1 + out.alpha.mean() * 0.1

    params = {
        "p": p, "quats": quats, "log_scales": log_scales, "colors": colors,
        "op_logit": jnp.full((N,), 2.0),
    }
    step = jax.jit(jax.grad(loss_fn), compiler_options=SCOPED_VMEM_OPTS)
    g = jax.block_until_ready(step(params))  # compile

    n_iter = 60
    t0 = time.perf_counter()
    for _ in range(n_iter):
        g = step(params)
    jax.block_until_ready(g)
    dt = (time.perf_counter() - t0) / n_iter
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "gs_rasterize_fwd_bwd_fps_512",
        "value": round(fps, 2),
        "unit": "fps (100k gaussians, fwd+bwd)",
        "vs_baseline": round(fps / A100_REFERENCE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
