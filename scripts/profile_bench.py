"""Capture an xprof trace of the bench.py workload (fwd+bwd rasterize).

Writes the trace under /tmp/gsprof; summarize with
scripts/summarize_trace.py (top ops by self time).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    W = H = 512
    FOV = 0.8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    p = jax.random.normal(ks[0], (N, 3))
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    p = p * (0.8 + 0.05 * jax.random.normal(ks[1], (N, 1)))
    quats = quat_normalize(jax.random.normal(ks[2], (N, 4)))
    log_scales = jnp.log(jnp.full((N, 3), 0.01)) + 0.3 * jax.random.normal(ks[3], (N, 3))
    colors = jax.random.uniform(ks[4], (N, 3))

    pos = camera_position_from_spherical(jnp.asarray(15.0), jnp.asarray(30.0), jnp.asarray(2.2))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    t = float(np.tan(FOV / 2))
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
    g = jax.block_until_ready(step(params))

    t0 = time.perf_counter()
    for _ in range(60):
        g = step(params)
    jax.block_until_ready(g)
    print("mean step ms:", (time.perf_counter() - t0) / 60 * 1e3)

    with jax.profiler.trace("/tmp/gsprof"):
        for _ in range(5):
            g = step(params)
        jax.block_until_ready(g)


if __name__ == "__main__":
    main()
