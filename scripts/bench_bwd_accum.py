"""A/B the resident backward: in-kernel accumulator vs sort+gather reduction.

Runs the bench.py workload (100k gaussians, 512², fwd+bwd) on the session
accelerator with both bwd modes and prints timings.
"""

import sys
import time

import numpy as np


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

    params = {
        "p": p, "quats": quats, "log_scales": log_scales, "colors": colors,
        "op_logit": jnp.full((N,), 2.0),
    }

    for accum in (False, True):
        cfg = RasterizerConfig(W, H, t, t, tile_capacity=1024, chunk=32,
                               max_tiles_per_gaussian=9,
                               backend="pallas_resident", bwd_accum=accum)

        def loss_fn(prm):
            out = rasterize(
                prm["p"], jax.nn.sigmoid(prm["op_logit"]), cam, cfg, jnp.zeros(3),
                colors=prm["colors"], scales=jnp.exp(prm["log_scales"]),
                quats=prm["quats"],
            )
            return out.rgb.mean() + out.depth.mean() * 0.1 + out.alpha.mean() * 0.1

        step = jax.jit(jax.grad(loss_fn))
        try:
            g = jax.block_until_ready(step(params))
        except Exception as e:
            print(f"bwd_accum={accum}: FAILED: {type(e).__name__}: {e}")
            continue
        n_iter = 20
        t0 = time.perf_counter()
        for _ in range(n_iter):
            g = step(params)
        jax.block_until_ready(g)
        dt = (time.perf_counter() - t0) / n_iter
        print(f"bwd_accum={accum}: {dt*1e3:.2f} ms/iter  -> {1.0/dt:.1f} fps")
        # stash a grad fingerprint to compare numerics across modes
        fp = float(sum(jnp.abs(v).sum() for v in jax.tree_util.tree_leaves(g)))
        print(f"  grad |sum| fingerprint: {fp:.6e}")


if __name__ == "__main__":
    main()


def trace(n=100_000, outdir="/tmp/gs_trace"):
    """Capture an xprof trace of the fwd+bwd step (bwd_accum=True)."""
    import jax

    sys.argv = ["bench_bwd_accum.py", str(n)]
    # run main once to warm caches? simpler: inline a single-mode version
    import jax.numpy as jnp
    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical, get_cam_info_gaussian, look_at_c2w)
    from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize
    from dreammesh4d_tpu.ops.quaternion import quat_normalize
    N, W, H, FOV = n, 512, 512, 0.8
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    p = jax.random.normal(ks[0], (N, 3))
    p = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    p = p * (0.8 + 0.05 * jax.random.normal(ks[1], (N, 1)))
    params = {
        "p": p, "quats": quat_normalize(jax.random.normal(ks[2], (N, 4))),
        "log_scales": jnp.log(jnp.full((N, 3), 0.01)) + 0.3 * jax.random.normal(ks[3], (N, 3)),
        "colors": jax.random.uniform(ks[4], (N, 3)),
        "op_logit": jnp.full((N,), 2.0),
    }
    pos = camera_position_from_spherical(jnp.asarray(15.0), jnp.asarray(30.0), jnp.asarray(2.2))
    cam = get_cam_info_gaussian(look_at_c2w(pos), FOV, FOV, 0.01, 100.0)
    t = float(np.tan(FOV / 2))
    cfg = RasterizerConfig(W, H, t, t, tile_capacity=1024, chunk=32,
                           max_tiles_per_gaussian=9, backend="pallas_resident")

    def loss_fn(prm):
        out = rasterize(prm["p"], jax.nn.sigmoid(prm["op_logit"]), cam, cfg,
                        jnp.zeros(3), colors=prm["colors"],
                        scales=jnp.exp(prm["log_scales"]), quats=prm["quats"])
        return out.rgb.mean() + out.depth.mean() * 0.1 + out.alpha.mean() * 0.1

    step = jax.jit(jax.grad(loss_fn))
    jax.block_until_ready(step(params))
    with jax.profiler.trace(outdir):
        for _ in range(5):
            g = step(params)
        jax.block_until_ready(g)
    print("trace written to", outdir)
