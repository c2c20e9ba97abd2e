"""SuGaR Gaussian renderer (rgb + normal + depth + mask), batched over views.

TPU-first redesign of the reference ``diff-sugar-rasterizer-normal`` /
``diff-sugar-rasterizer-temporal`` + ``GaussianBatchRenderer``
(custom/threestudio-dreammesh4d/renderer/diff_sugar_rasterizer_normal.py:80-226,
gaussian_batch_renderer.py:9-122).  Differences by design:

- the reference runs the CUDA rasterizer TWICE per view (SH colors, then face
  normals splatted as colors).  Here the per-Gaussian color channels are
  CONCATENATED (rgb ⊕ normal) and blended in ONE pass — same math (identical
  per-Gaussian weights), half the binning/blending work;
- batching over views is ``jax.vmap`` instead of a Python loop;
- outputs are channel-last ``(B, H, W, C)`` matching the dict contract of
  ``batch_forward`` (comp_rgb / comp_normal / comp_normal_from_dist /
  comp_depth / comp_mask + radii/visibility).

Gradient masking parity (diff_sugar_rasterizer_normal.py:198-204): normal and
depth gradients are stopped where alpha ≤ 0.99.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ...ops.cameras import GSCameraInfo
from ...ops.gs import RasterizerConfig, rasterize
from ...ops.sh import sh_to_rgb


class CameraBatch(NamedTuple):
    """Stacked per-view GS camera transforms (leading batch dim B)."""

    world_view: jnp.ndarray  # (B, 4, 4)
    full_proj: jnp.ndarray  # (B, 4, 4)
    camera_center: jnp.ndarray  # (B, 3)


def _grad_mask(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Keep value everywhere, keep gradient only where mask."""
    return jnp.where(mask, x, jax.lax.stop_gradient(x))


from ...ops.safe_math import safe_normalize  # noqa: E402  (shared NaN-free normalize)


def render_view(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    sh_degree: int,
    gs_normals: Optional[jnp.ndarray],
    camera: GSCameraInfo,
    bg_color: jnp.ndarray,
    cfg: RasterizerConfig,
) -> Dict[str, jnp.ndarray]:
    """Render one view with fused rgb+normal channels.

    ``gs_normals=None`` drops the 3 normal channels from the blend (7 -> 4),
    for passes whose losses never read the normal map — the blend kernel's
    matmuls scale with channel count."""
    dirs = means3d - camera.camera_center[None, :]
    dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
    rgb = sh_to_rgb(sh_degree, sh, dirs)  # (N,3)
    if gs_normals is None:
        colors = rgb
        bg = bg_color
    else:
        colors = jnp.concatenate([rgb, gs_normals], -1)  # (N,6)
        bg = jnp.concatenate([bg_color, jnp.zeros(3, bg_color.dtype)], 0)

    out = rasterize(
        means3d, opacities, camera, cfg, bg, colors=colors, quats=quats, scales=scales
    )
    rendered_rgb = jnp.clip(out.rgb[..., :3], 0.0, 1.0)
    alpha = out.alpha
    mask99 = alpha > 0.99
    depth = _grad_mask(out.depth, mask99)
    res = {
        "comp_rgb": rendered_rgb,
        "comp_depth": depth,
        "comp_mask": alpha,
        "radii": out.radii,
        "visibility_filter": out.radii > 0,
    }
    if gs_normals is not None:
        raw_normal = safe_normalize(out.rgb[..., 3:6])
        res["comp_normal"] = _grad_mask(raw_normal * 0.5 * alpha + 0.5, mask99)
        res["raw_normal"] = _grad_mask(raw_normal, mask99)
    return res


def render_batch(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    sh: jnp.ndarray,
    sh_degree: int,
    gs_normals: jnp.ndarray,
    cameras: CameraBatch,
    bg_color: jnp.ndarray,
    cfg: RasterizerConfig,
    timed_attrs: Optional[tuple] = None,
) -> Dict[str, jnp.ndarray]:
    """Per-view render loop (unrolled; XLA runs views sequentially).  If
    ``timed_attrs`` is given (per-view means/quats/normals with a leading B
    dim, the dynamic-stage path, diff_sugar_rasterizer_temporal.py:149-178),
    those are mapped alongside the cameras; otherwise the static attributes
    broadcast.  ``bg_color`` may be (3,) shared or (B, 3) per-view.

    Memory note (round-5 pipeline): a batched rasterizer saves EVERY view's
    kernel buffers for the backward at once; with ``stream_rows`` on, the
    streamed (T, cap, ROW) row dumps dominate and the flagship dynamic stage
    (4 frames x ref/rand x rgb/normal passes @512²) OOM-crashed the v5e
    worker.  The fix is in the CONFIG, not here: the dynamic stage runs
    ``stream_rows: false`` (the backward re-reads the tiny 30k-row VMEM
    table instead of saving per-view streams).  Remat-based alternatives
    (lax.map-of-checkpoint, unrolled checkpoint) were tried and REJECTED:
    both blow up the remote compile (scan-of-remat / 48 rasterizer-kernel
    instances; >35-min compiles that eventually kill the compile service)."""
    B = cameras.world_view.shape[0]
    bg_b = bg_color if bg_color.ndim == 2 else jnp.broadcast_to(
        bg_color, (B,) + bg_color.shape)

    if timed_attrs is None:
        def one(args):
            wv, fp, cc, bg = args
            return render_view(
                means3d, quats, scales, opacities, sh, sh_degree, gs_normals,
                GSCameraInfo(wv, fp, cc), bg, cfg,
            )

        outs = [one((cameras.world_view[i], cameras.full_proj[i],
                     cameras.camera_center[i], bg_b[i])) for i in range(B)]
        return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *outs)

    t_means, t_quats, t_scales, t_normals = timed_attrs

    if t_normals is None:
        def one_timed_nonorm(args):
            wv, fp, cc, bg, m, q, s = args
            return render_view(
                m, q, s, opacities, sh, sh_degree, None,
                GSCameraInfo(wv, fp, cc), bg, cfg,
            )

        outs = [one_timed_nonorm((cameras.world_view[i], cameras.full_proj[i],
                                  cameras.camera_center[i], bg_b[i],
                                  t_means[i], t_quats[i], t_scales[i]))
                for i in range(B)]
        return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *outs)

    def one_timed(args):
        wv, fp, cc, bg, m, q, s, n = args
        return render_view(
            m, q, s, opacities, sh, sh_degree, n,
            GSCameraInfo(wv, fp, cc), bg, cfg,
        )

    outs = [one_timed((cameras.world_view[i], cameras.full_proj[i],
                       cameras.camera_center[i], bg_b[i],
                       t_means[i], t_quats[i], t_scales[i], t_normals[i]))
            for i in range(B)]
    return jax.tree.map(lambda *xs: jnp.stack(xs, 0), *outs)


def depth_to_normal(
    depth: jnp.ndarray, rays_o: jnp.ndarray, rays_d: jnp.ndarray, alpha: jnp.ndarray
) -> jnp.ndarray:
    """Normals from the depth map via world-space position finite differences
    (reference Depth2Normal conv, diff_sugar_rasterizer_normal.py:172-181).
    depth/alpha: (..., H, W, 1); rays: (..., H, W, 3).  Returns normal map in
    [0,1] like the reference (n*0.5*alpha+0.5)."""
    xyz = rays_o + depth * rays_d
    dx = jnp.gradient(xyz, axis=-2)
    dy = jnp.gradient(xyz, axis=-3)
    n = safe_normalize(jnp.cross(dy, dx))
    return n * 0.5 * alpha + 0.5
