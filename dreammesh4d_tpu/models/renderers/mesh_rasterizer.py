"""Mesh rasterization renderer (``nvdiff-rasterizer``) + ``patch-renderer``.

Parity with threestudio/models/renderers/nvdiff_rasterizer.py:18-120 and
patch_renderer.py:15-95 — without nvdiffrast: the rasterization core is the
tile z-buffer in ops/mesh_raster.py (pure XLA, static shapes).  Output keys
match the reference (``opacity``, ``comp_normal`` in [0,1], ``comp_rgb``,
``comp_rgb_bg``).  nvdiffrast's screen-space antialiasing pass is not
reproduced — gradients w.r.t. vertex positions flow through the barycentric
interpolation instead (hard silhouettes; the SuGaR/gaussian path is the
soft-edge renderer in this framework).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds

from ...ops.mesh_raster import interpolate_attribute, rasterize_mesh
from ...ops.meshops import vertex_normals
from ...ops.safe_math import safe_normalize


@ds.register("nvdiff-rasterizer")
@dataclass
class MeshRasterizer:
    """Rasterize a triangle mesh and shade with material + background.

    Call with per-view ``GSCameraInfo`` cameras (list) and callables:
    ``material_fn(features, viewdirs, shading_normal, positions) -> rgb`` and
    ``background_fn(dirs) -> rgb``; ``feature_fn(positions) -> features``
    queries the geometry (reference: ``self.geometry(positions)``)."""

    tile_capacity: int = 256
    max_tiles_per_face: int = 64

    def render_view(
        self,
        verts: jnp.ndarray,
        faces: jnp.ndarray,
        camera,
        camera_position: jnp.ndarray,
        H: int,
        W: int,
        feature_fn: Optional[Callable] = None,
        material_fn: Optional[Callable] = None,
        background_fn: Optional[Callable] = None,
        v_nrm: Optional[jnp.ndarray] = None,
        render_rgb: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        if v_nrm is None:
            v_nrm = vertex_normals(verts, faces)
        rast = rasterize_mesh(verts, faces, camera, W, H,
                              self.tile_capacity, self.max_tiles_per_face)
        mask = (rast.face_idx >= 0)[..., None].astype(jnp.float32)

        gb_normal = safe_normalize(interpolate_attribute(rast, faces, v_nrm))
        out = {
            "opacity": mask,
            "comp_normal": (gb_normal + 1.0) / 2.0 * mask,
            "depth": jnp.where(jnp.isfinite(rast.depth), rast.depth, 0.0)[..., None],
        }
        if not render_rgb:
            return out

        gb_pos = interpolate_attribute(rast, faces, verts)
        gb_viewdirs = safe_normalize(gb_pos - camera_position[None, None, :])
        feats = feature_fn(gb_pos) if feature_fn is not None else gb_pos * 0.5 + 0.5
        if material_fn is not None:
            rgb_fg = material_fn(feats, viewdirs=gb_viewdirs,
                                 shading_normal=gb_normal, positions=gb_pos)
        else:
            rgb_fg = feats[..., :3]
        rgb_bg = (background_fn(gb_viewdirs) if background_fn is not None
                  else jnp.ones_like(rgb_fg))
        out["comp_rgb_bg"] = rgb_bg
        out["comp_rgb"] = rgb_bg * (1 - mask) + rgb_fg * mask
        return out

    def __call__(self, verts, faces, cameras, camera_positions, H, W, **kw):
        """Batched over views (python loop — B is small and each view is one
        fused XLA program; stack results)."""
        outs = [
            self.render_view(verts, faces, cam, camera_positions[i], H, W, **kw)
            for i, cam in enumerate(cameras)
        ]
        return {k: jnp.stack([o[k] for o in outs]) for k in outs[0]}


@ds.register("patch-renderer")
@dataclass
class PatchRenderer:
    """Memory-saving trick (patch_renderer.py:15-95): during training render
    a downsampled global image + one random full-res patch, composite the
    patch into the upsampled global render.  jit-safe: the patch offset is a
    traced value consumed by dynamic_slice, so shapes stay static."""

    patch_size: int = 128
    global_downsample: int = 4
    global_detach: bool = False

    def __call__(
        self,
        base_renderer: Callable[..., Dict[str, jnp.ndarray]],
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        rng: Optional[jax.Array] = None,
        training: bool = True,
        **kwargs,
    ) -> Dict[str, jnp.ndarray]:
        B, H, W, _ = rays_o.shape
        if not training or rng is None:
            return base_renderer(rays_o, rays_d, **kwargs)

        d = self.global_downsample
        g_o = jax.image.resize(rays_o, (B, H // d, W // d, 3), "bilinear")
        g_d = jax.image.resize(rays_d, (B, H // d, W // d, 3), "bilinear")
        out_global = base_renderer(g_o, g_d, **kwargs)

        PS = self.patch_size
        ky, kx = jax.random.split(rng)
        py = jax.random.randint(ky, (), 0, H - PS)
        px = jax.random.randint(kx, (), 0, W - PS)
        p_o = jax.lax.dynamic_slice(rays_o, (0, py, px, 0), (B, PS, PS, 3))
        p_d = jax.lax.dynamic_slice(rays_d, (0, py, px, 0), (B, PS, PS, 3))
        out_patch = base_renderer(p_o, p_d, **kwargs)

        out = {}
        for k, v in out_global.items():
            pv = out_patch.get(k)
            if (pv is None or not hasattr(v, "ndim") or v.ndim != 4
                    or pv.shape[:3] != (B, PS, PS)):
                out[k] = v
                continue
            up = jax.image.resize(v, (B, H, W, v.shape[-1]), "bilinear")
            if self.global_detach:
                up = jax.lax.stop_gradient(up)
            out[k] = jax.lax.dynamic_update_slice(up, pv, (0, py, px, 0))
        out["patch_yx"] = jnp.stack([py, px])
        return out
