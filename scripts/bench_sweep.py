"""A/B sweep of rasterizer variants on the bench.py workload (real TPU).

Usage: python scripts/bench_sweep.py [n_iter]
Prints one line per variant: fps for fwd+bwd at 512²/100k gaussians.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCOPED_VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "112640"}


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical,
        get_cam_info_gaussian,
        look_at_c2w,
    )
    from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize
    from dreammesh4d_tpu.ops.quaternion import quat_normalize

    n_iter = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    N = 100_000
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

    variants = [
        ("bf16mm+stream", dict(bf16_matmuls=True, stream_rows=True)),
        # tile_px=32 quarters the pair count (RMW + sort + glue all scale
        # with pairs); spans quarter so max_tiles_per_gaussian drops and
        # capacity grows ~4x.  Round-3 sweep: t32+cap2048+m4 = 113.3 fps
        # (vs 94.5 at t16) — now tuning m (span-truncation fidelity) / cap /
        # group / tile64 around that point.
        ("t32+cap2048+m4", dict(bf16_matmuls=True, stream_rows=True,
                                tile_px=32, max_tiles_per_gaussian=4,
                                tile_capacity=2048)),
        ("t32+cap2048+m6", dict(bf16_matmuls=True, stream_rows=True,
                                tile_px=32, max_tiles_per_gaussian=6,
                                tile_capacity=2048)),
        ("t32+cap3072+m6", dict(bf16_matmuls=True, stream_rows=True,
                                tile_px=32, max_tiles_per_gaussian=6,
                                tile_capacity=3072)),
        ("t32+cap2048+m4+g64", dict(bf16_matmuls=True, stream_rows=True,
                                    tile_px=32, max_tiles_per_gaussian=4,
                                    tile_capacity=2048, group=64)),
        ("t32+cap2048+m4+g256", dict(bf16_matmuls=True, stream_rows=True,
                                     tile_px=32, max_tiles_per_gaussian=4,
                                     tile_capacity=2048, group=256)),
        ("t32+cap2048+m4+nostream", dict(bf16_matmuls=True, stream_rows=False,
                                         tile_px=32, max_tiles_per_gaussian=4,
                                         tile_capacity=2048)),
        ("t32+cap2048+m4+rank", dict(bf16_matmuls=True, stream_rows=True,
                                     tile_px=32, max_tiles_per_gaussian=4,
                                     tile_capacity=2048, binning="rank")),
        ("t32+cap2048+m3", dict(bf16_matmuls=True, stream_rows=True,
                                tile_px=32, max_tiles_per_gaussian=3,
                                tile_capacity=2048)),
        ("t32+cap1536+m4", dict(bf16_matmuls=True, stream_rows=True,
                                tile_px=32, max_tiles_per_gaussian=4,
                                tile_capacity=1536)),
        ("t32+cap2048+m4+g192", dict(bf16_matmuls=True, stream_rows=True,
                                     tile_px=32, max_tiles_per_gaussian=4,
                                     tile_capacity=2048, group=192)),
    ]
    if len(sys.argv) > 2 and sys.argv[2] == "gradreduce":
        variants = [
            ("t32/m4/c2048/vpu", dict(bf16_matmuls=True, stream_rows=True,
                                      tile_px=32, max_tiles_per_gaussian=4,
                                      tile_capacity=2048)),
            ("t32/m4/c2048/packed", dict(bf16_matmuls=True, stream_rows=True,
                                         tile_px=32, max_tiles_per_gaussian=4,
                                         tile_capacity=2048,
                                         grad_reduce="packed")),
            ("t32/m4/c2048/moments", dict(bf16_matmuls=True, stream_rows=True,
                                          tile_px=32, max_tiles_per_gaussian=4,
                                          tile_capacity=2048,
                                          grad_reduce="moments")),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "t64":
        variants += [
            ("t64+cap4096+m2", dict(bf16_matmuls=True, stream_rows=True,
                                    tile_px=64, max_tiles_per_gaussian=2,
                                    tile_capacity=4096)),
            ("t64+cap4096+m4", dict(bf16_matmuls=True, stream_rows=True,
                                    tile_px=64, max_tiles_per_gaussian=4,
                                    tile_capacity=4096)),
        ]
    if len(sys.argv) > 2 and sys.argv[2] == "full":
        variants += [
            ("base-f32-pairs-g0", dict()),
            ("bf16mm", dict(bf16_matmuls=True)),
            ("rank", dict(binning="rank")),
            ("g64", dict(group=64)),
            ("g256", dict(group=256)),
            ("mtpg6", dict(max_tiles_per_gaussian=6)),
        ]
    results = {}
    for name, overrides in variants:
        base = dict(width=W, height=H, tan_fovx=t, tan_fovy=t, tile_capacity=1024,
                    chunk=32, max_tiles_per_gaussian=9, backend="pallas_resident")
        base.update(overrides)
        cfg = RasterizerConfig(**base)

        def loss_fn(pr):
            out = rasterize(
                pr["p"], jax.nn.sigmoid(pr["op_logit"]), cam, cfg, jnp.zeros(3),
                colors=pr["colors"], scales=jnp.exp(pr["log_scales"]),
                quats=pr["quats"],
            )
            return out.rgb.mean() + out.depth.mean() * 0.1 + out.alpha.mean() * 0.1

        try:
            step = jax.jit(jax.grad(loss_fn), compiler_options=SCOPED_VMEM_OPTS)
            g = jax.block_until_ready(step(params))
            t0 = time.perf_counter()
            for _ in range(n_iter):
                g = step(params)
            jax.block_until_ready(g)
            fps = n_iter / (time.perf_counter() - t0)
            results[name] = fps
            print(f"{name:24s} {fps:7.2f} fps", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)
    best = max(results, key=results.get) if results else "none"
    print(f"best: {best} ({results.get(best, 0):.2f} fps)")


if __name__ == "__main__":
    main()
