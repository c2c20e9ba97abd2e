"""UV texture baking: square-atlas UVs + multi-view render projection.

Port of the reference texture-bake export path
(custom/threestudio-dreammesh4d/system/base.py:72-292): every triangle gets
its own small square in the texture atlas (:72-131), ~120 views are rendered
with the Gaussian renderer at high resolution, the mesh is index-rasterized
per view, and pixel colors are scatter-averaged into the texels their hits
map to (:253-292).  The final 4D export shares ONE baked texture across all
timestamp meshes (sugar_4dgen.py:594-637).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..export.mesh_io import MeshData
from ..ops.cameras import GSCameraInfo
from ..ops.mesh_raster import interpolate_attribute, rasterize_mesh


def build_square_atlas(n_faces: int, tex_size: int = 1024,
                       margin: float = 0.15) -> Tuple[np.ndarray, np.ndarray]:
    """Per-face UV squares: returns (v_tex (3F, 2), t_tex_idx (F, 3)).

    Face i occupies the lower-left triangle of its square (with a margin so
    bilinear lookups don't bleed across faces) — the reference's
    square-atlas construction (system/base.py:72-131)."""
    n = int(np.ceil(np.sqrt(n_faces)))
    side = 1.0 / n
    pad = margin * side
    uvs = np.zeros((n_faces, 3, 2), np.float32)
    idx = np.arange(n_faces)
    cx = (idx % n).astype(np.float32) * side
    cy = (idx // n).astype(np.float32) * side
    uvs[:, 0, 0] = cx + pad
    uvs[:, 0, 1] = cy + pad
    uvs[:, 1, 0] = cx + side - pad
    uvs[:, 1, 1] = cy + pad
    uvs[:, 2, 0] = cx + pad
    uvs[:, 2, 1] = cy + side - pad
    v_tex = uvs.reshape(-1, 2)
    t_tex_idx = np.arange(n_faces * 3, dtype=np.int32).reshape(-1, 3)
    return v_tex, t_tex_idx


def bake_texture(
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    cameras_ww: jnp.ndarray,  # (B, 4, 4) world_view
    cameras_fp: jnp.ndarray,  # (B, 4, 4) full_proj
    cameras_cc: jnp.ndarray,  # (B, 3)
    render_rgb_fn: Callable[[GSCameraInfo], jnp.ndarray],  # -> (H, W, 3)
    W: int,
    H: int,
    tex_size: int = 1024,
    mesh_tile_capacity: int = 256,
    atlas: str = "square",
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (texture (S,S,3) float, v_tex, t_tex_idx).

    Per view: render rgb with the supplied renderer, index-rasterize the mesh,
    map each hit pixel through the face's UVs, scatter-add into the texel
    accumulators.  ``atlas="square"`` is the reference DreamMesh4D bake path
    (per-face squares, system/base.py:72-131); ``atlas="charts"`` is the
    xatlas-style chart unwrap (uv_unwrap.unwrap_uv — contiguous neighbour
    faces, mip/bilinear-friendly, the threestudio mesh-exporter convention,
    threestudio/models/mesh.py:207-250)."""
    F = int(faces.shape[0])
    if atlas == "charts":
        from .uv_unwrap import unwrap_uv

        v_tex_np, t_tex_np = unwrap_uv(np.asarray(verts), np.asarray(faces))
        face_uvs = jnp.asarray(v_tex_np[t_tex_np])  # (F, 3, 2)
    else:
        v_tex_np, t_tex_np = build_square_atlas(F, tex_size)
        face_uvs = jnp.asarray(v_tex_np.reshape(F, 3, 2))

    S = tex_size
    tex_acc = jnp.zeros((S * S, 3), jnp.float32)
    tex_w = jnp.zeros((S * S,), jnp.float32)

    @jax.jit
    def bake_one(tex_acc, tex_w, wv, fp, cc, rgb):
        cam = GSCameraInfo(wv, fp, cc)
        out = rasterize_mesh(verts, faces, cam, W, H, tile_capacity=mesh_tile_capacity)
        hit = out.face_idx >= 0
        f = jnp.maximum(out.face_idx, 0)
        uvs = face_uvs[f]  # (H, W, 3, 2)
        uv = (out.bary[..., None] * uvs).sum(-2)  # (H, W, 2)
        tx = jnp.clip((uv[..., 0] * S).astype(jnp.int32), 0, S - 1)
        ty = jnp.clip((uv[..., 1] * S).astype(jnp.int32), 0, S - 1)
        texel = (ty * S + tx).reshape(-1)
        w = hit.reshape(-1).astype(jnp.float32)
        colors = rgb.reshape(-1, 3)
        tex_acc = tex_acc.at[texel].add(colors * w[:, None])
        tex_w = tex_w.at[texel].add(w)
        return tex_acc, tex_w

    B = cameras_ww.shape[0]
    for i in range(B):
        rgb = render_rgb_fn(GSCameraInfo(cameras_ww[i], cameras_fp[i], cameras_cc[i]))
        tex_acc, tex_w = bake_one(tex_acc, tex_w, cameras_ww[i], cameras_fp[i],
                                  cameras_cc[i], rgb)

    tex = np.array(tex_acc / jnp.maximum(tex_w, 1.0)[:, None]).reshape(S, S, 3)
    filled = np.asarray(tex_w).reshape(S, S) > 0
    if filled.any() and not filled.all():
        # flood unfilled texels with the mean color to avoid black seams
        tex[~filled] = tex[filled].mean(0)
    return tex, v_tex_np, t_tex_np


def export_textured_mesh(path: str, verts: np.ndarray, faces: np.ndarray,
                         texture: np.ndarray, v_tex: np.ndarray,
                         t_tex_idx: np.ndarray, mtl_name: str = "material0") -> None:
    from .mesh_io import MeshData, save_obj

    mesh = MeshData(
        v_pos=np.asarray(verts, np.float32),
        t_pos_idx=np.asarray(faces, np.int32),
        v_tex=np.asarray(v_tex, np.float32),
        t_tex_idx=np.asarray(t_tex_idx, np.int32),
    )
    save_obj(path, mesh, mtl_name=mtl_name, texture_map=texture)
