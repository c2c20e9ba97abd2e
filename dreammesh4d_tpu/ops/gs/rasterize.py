"""Differentiable 3D Gaussian splatting rasterizer — public API.

TPU-native replacement for the ``diff-gaussian-rasterization`` CUDA extension
(ashawkey fork) used by the reference renderers
(custom/threestudio-dreammesh4d/renderer/diff_sugar_rasterizer_*.py:8-11,
129-178).  Same capability surface:

    rasterize(means3d, quats|cov3d, scales, opacities, colors|sh, camera)
        -> (rgb, radii, depth, alpha)

with full gradients w.r.t. means/cov/opacity/color, plus the ``radii`` /
``visibility`` side outputs the densification logic consumes
(gaussian_base.py:816-820).

Design (TPU-first, static shapes): EWA projection (projection.py) → sort-based
tile binning (binning.py) → chunked scan alpha compositing (blend.py).  The
whole pipeline is jit/vmap-friendly; gradients flow via XLA autodiff with
per-chunk rematerialization.  Screen-space gradient statistics for
densification are exposed by `render_with_screen_grads`, which makes
``means2d`` an explicit input of the blending closure so callers can take
grads w.r.t. it (replacing the reference's retained ``viewspace_points``
tensor, gaussian_base.py:816-820).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..cameras import GSCameraInfo
from ..sh import sh_to_rgb
from .binning import bin_gaussians
from .blend import BlendOutput, blend_tiles
from .projection import (
    ProjectedGaussians,
    compute_cov3d,
    project_gaussians,
    project_gaussians_sq,
)


class RasterizeOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, C)
    radii: jnp.ndarray  # (N,) int32
    depth: jnp.ndarray  # (H, W, 1)
    alpha: jnp.ndarray  # (H, W, 1)


class RasterizerConfig(NamedTuple):
    """Static rasterization settings (shapes baked into the jitted step).

    backend: "pallas_resident" = VMEM-resident row table + per-tile pair
    segments (pallas_resident.py; fastest, default in configs);
    "pallas" = (T, K)-table TPU kernel (pallas_blend.py); "xla" = pure-XLA
    chunked scan (blend.py, also the CPU fallback).  ``interpret`` runs the
    Pallas kernels in interpreter mode (CPU testing)."""

    width: int
    height: int
    tan_fovx: float
    tan_fovy: float
    tile_capacity: int = 512
    max_tiles_per_gaussian: int = 16
    chunk: int = 32
    near: float = 0.2
    backend: str = "xla"
    interpret: bool = False
    # Pallas group size. 0 = auto from the expected pairs-per-tile density:
    # big groups (128) make the cumprod triangular matmuls MXU-sized on
    # dense scenes (measured +15% on the 100k bench) but waste up to a full
    # group of work per sparse tile (measured 4x SLOWER on the 30k-gaussian
    # training step).
    group: int = 0
    # resident backend: accumulate per-gaussian grads inside the backward
    # kernel (VMEM (N+1,16) table) instead of emitting per-pair rows and
    # reducing with a sort + M row-gathers.
    bwd_accum: bool = True
    # bf16 inputs (f32 accumulation) for the color/cotangent matmuls in the
    # Pallas kernels — ONE MXU pass vs ~3 for f32.  Colors/weights are in
    # [0,1] and the gradient rounding (~2^-8 relative) is far below SDS
    # noise; parity tests keep the exact f32 default.
    bf16_matmuls: bool = False
    # pair binning variant for the resident backend: "pairs" = 2-operand
    # quantized-depth sort; "rank" = SINGLE-operand sort keyed by depth rank
    # (the rank doubles as the row-table index; needs bwd_accum)
    binning: str = "pairs"
    # resident backend + bwd_accum: the forward streams each tile's gathered
    # rows to a (T, cap, ROW) buffer so the backward replay reads them as ONE
    # vector load per group instead of `group` indexed sublane reads — and
    # drops the (N+1, ROW) VMEM table from the backward kernel entirely
    # (halves its scoped-VMEM booking; unblocks compiling the rasterizer
    # beside the UNet for guidance-size renders).
    stream_rows: bool = True
    # pixels per tile side for the resident backend (binning + blend kernel).
    # 16 matches the CUDA rasterizer's BLOCK_X/Y; 32 quarters the pair count
    # (RMW + sort + glue all scale with pairs) at +~11% pixel math — the
    # better trade on dense scenes.  The xla/pallas table backends are fixed
    # at 16.
    tile_px: int = 16
    # backward positional-gradient reduction (Pallas kernels, only active
    # with bf16_matmuls): "vpu" = shared-product VPU chain (exact f32);
    # "packed" = the six pixel reductions as ONE stacked bf16 MXU matmul
    # (products stay exact; summands round ~2^-8 relative — same noise class
    # as the mm_bf16 color dots); "moments" = tile-centered shared-basis
    # moment matmul (cheapest VPU-wise but amplifies bf16 noise by
    # (mxc/sigma)^2 in the recombination — A/B only).
    grad_reduce: str = "vpu"


def rasterize(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: GSCameraInfo,
    cfg: RasterizerConfig,
    background: jnp.ndarray,
    colors: Optional[jnp.ndarray] = None,
    sh: Optional[jnp.ndarray] = None,
    sh_degree: int = 0,
    scales: Optional[jnp.ndarray] = None,
    quats: Optional[jnp.ndarray] = None,
    cov3d: Optional[jnp.ndarray] = None,
    means2d_offset: Optional[jnp.ndarray] = None,
) -> RasterizeOutput:
    """Render one view.  Pass either (scales, quats) or a precomputed cov3d,
    and either per-Gaussian colors or SH coefficients (evaluated per-Gaussian
    toward the camera, like the CUDA rasterizer).

    ``means2d_offset`` (N,2): an all-zeros tensor added to the projected
    screen positions — take grads w.r.t. it to obtain the screen-space
    positional gradients that drive densification (the reference's
    ``screenspace_points`` trick, diff_sugar_rasterizer_normal.py:101-111)."""
    if colors is None:
        assert sh is not None
        dirs = means3d - camera.camera_center[None, :]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-8)
        colors = sh_to_rgb(sh_degree, sh, dirs)

    if cov3d is None:
        assert scales is not None and quats is not None
        # matmul-free covariance path (see project_gaussians_sq docstring)
        proj = project_gaussians_sq(
            means3d, scales, quats, camera.world_view_transform,
            camera.full_proj_transform, cfg.tan_fovx, cfg.tan_fovy,
            cfg.width, cfg.height, cfg.near,
        )
    else:
        proj = project_gaussians(
            means3d, cov3d, camera.world_view_transform, camera.full_proj_transform,
            cfg.tan_fovx, cfg.tan_fovy, cfg.width, cfg.height, cfg.near,
        )
    if means2d_offset is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_offset)
    return _rasterize_projected(proj, colors, opacities, cfg, background)


def _auto_group(cfg: RasterizerConfig, n_gaussians: int) -> int:
    """Trace-time group-size heuristic from average pairs per tile."""
    if cfg.group:
        return cfg.group
    tp = cfg.tile_px
    tiles = ((cfg.width + tp - 1) // tp) * ((cfg.height + tp - 1) // tp)
    avg = n_gaussians * cfg.max_tiles_per_gaussian / max(tiles, 1)
    # measured: avg 879 pairs/tile -> group 128 is +15% (MXU-sized matmuls);
    # avg 264 -> groups 64/128 are ~4x SLOWER (sparse tiles pay a full
    # group); only jump to 128 when tiles are clearly dense
    return 128 if avg >= 640 else 32


def _rasterize_projected(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    cfg: RasterizerConfig,
    background: jnp.ndarray,
) -> RasterizeOutput:
    if cfg.backend == "pallas_resident":
        from .binning import bin_gaussians_pairs, bin_gaussians_ranks
        from .pallas_resident import blend_image_resident

        if cfg.binning == "rank":
            assert cfg.bwd_accum, "rank binning requires bwd_accum"
            pa = bin_gaussians_ranks(
                jax.lax.stop_gradient(proj.means2d), proj.radii,
                jax.lax.stop_gradient(proj.depths), proj.mask,
                cfg.width, cfg.height, cfg.max_tiles_per_gaussian,
                conics=jax.lax.stop_gradient(proj.conics),
                opacities=jax.lax.stop_gradient(opacities),
                tile=cfg.tile_px,
            )
        else:
            pa = bin_gaussians_pairs(
                jax.lax.stop_gradient(proj.means2d), proj.radii,
                jax.lax.stop_gradient(proj.depths), proj.mask,
                cfg.width, cfg.height, cfg.max_tiles_per_gaussian,
                need_origpos=not cfg.bwd_accum,
                conics=jax.lax.stop_gradient(proj.conics),
                opacities=jax.lax.stop_gradient(opacities),
                tile=cfg.tile_px,
            )
        rgb, alpha, depth = blend_image_resident(
            pa, proj.means2d, proj.conics,
            colors, opacities, proj.depths, cfg.width, cfg.height, background,
            cap=cfg.tile_capacity, interpret=cfg.interpret,
            group=_auto_group(cfg, proj.means2d.shape[0]),
            bwd_accum=cfg.bwd_accum, mm_bf16=cfg.bf16_matmuls,
            stream_rows=cfg.stream_rows, tile=cfg.tile_px,
            grad_reduce=cfg.grad_reduce,
        )
        return RasterizeOutput(rgb, proj.radii, depth, alpha)
    # tile_px is a resident-backend binning knob; the xla/pallas table
    # backends bin on fixed 16-px tiles and simply ignore it (configs may set
    # tile_px: 32 while tests override backend=xla) — output is identical
    # either way since the per-pixel 3σ live mask makes compositing
    # binning-granularity independent
    assign = bin_gaussians(
        jax.lax.stop_gradient(proj.means2d),
        proj.radii,
        jax.lax.stop_gradient(proj.depths),
        proj.mask,
        cfg.width,
        cfg.height,
        cfg.tile_capacity,
        cfg.max_tiles_per_gaussian,
        conics=jax.lax.stop_gradient(proj.conics),
        opacities=jax.lax.stop_gradient(opacities),
    )
    if cfg.backend == "pallas":
        from .pallas_blend import blend_image_pallas

        rgb, alpha, depth = blend_image_pallas(
            assign.tile_gauss,
            jnp.minimum(assign.tile_counts, cfg.tile_capacity),
            proj.means2d,
            proj.conics,
            colors,
            opacities,
            proj.depths,
            cfg.width,
            cfg.height,
            background,
            interpret=cfg.interpret,
            group=_auto_group(cfg, proj.means2d.shape[0]),
            mm_bf16=cfg.bf16_matmuls,
            grad_reduce=cfg.grad_reduce,
        )
        return RasterizeOutput(rgb, proj.radii, depth, alpha)
    out: BlendOutput = blend_tiles(
        assign.tile_gauss,
        assign.tile_valid,
        proj.means2d,
        proj.conics,
        colors,
        opacities,
        proj.depths,
        cfg.width,
        cfg.height,
        background,
        cfg.chunk,
    )
    return RasterizeOutput(out.rgb, proj.radii, out.depth, out.alpha)


def render_with_screen_grads(
    means3d: jnp.ndarray,
    opacities: jnp.ndarray,
    camera: GSCameraInfo,
    cfg: RasterizerConfig,
    background: jnp.ndarray,
    colors: jnp.ndarray,
    scales: Optional[jnp.ndarray] = None,
    quats: Optional[jnp.ndarray] = None,
    cov3d: Optional[jnp.ndarray] = None,
):
    """Like :func:`rasterize`, but returns ``(output, blend_fn, proj)`` where
    ``blend_fn(means2d)`` re-renders from explicit screen positions.  Taking
    ``jax.grad`` of a loss through ``blend_fn`` w.r.t. ``means2d`` yields the
    screen-space positional gradients that drive adaptive density control
    (parity with the reference's viewspace_points.grad,
    gaussian_base.py:816-820)."""
    if cov3d is None:
        cov3d = compute_cov3d(scales, quats)
    proj = project_gaussians(
        means3d, cov3d, camera.world_view_transform, camera.full_proj_transform,
        cfg.tan_fovx, cfg.tan_fovy, cfg.width, cfg.height, cfg.near,
    )
    assign = bin_gaussians(
        jax.lax.stop_gradient(proj.means2d), proj.radii,
        jax.lax.stop_gradient(proj.depths), proj.mask,
        cfg.width, cfg.height, cfg.tile_capacity, cfg.max_tiles_per_gaussian,
    )

    def blend_fn(means2d):
        out = blend_tiles(
            assign.tile_gauss, assign.tile_valid, means2d, proj.conics, colors,
            opacities, proj.depths, cfg.width, cfg.height, background, cfg.chunk,
        )
        return RasterizeOutput(out.rgb, proj.radii, out.depth, out.alpha)

    return blend_fn(proj.means2d), blend_fn, proj
