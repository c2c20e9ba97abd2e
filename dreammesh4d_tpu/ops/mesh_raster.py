"""Small differentiable-enough mesh rasterizer (z-buffer), pure XLA.

Replaces the pytorch3d ``MeshRasterizer`` index-rendering used for UV texture
baking (custom/threestudio-dreammesh4d/system/base.py:212-292) and the
nvdiffrast rasterize/interpolate calls of the threestudio mesh-exporter
(threestudio/utils/rasterize.py:7-78).  Reuses the Gaussian rasterizer's
tile strategy: triangles are binned to 16x16 tiles by their screen AABB
(circumradius), each tile tests its K candidate triangles against its 256
pixels with barycentric inside tests, and a depth argmin yields per-pixel
face index + barycentric coordinates — enough to interpolate any vertex
attribute (UVs, world positions, normals).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cameras import GSCameraInfo
from .gs.binning import TILE, bin_gaussians, num_tiles


class MeshRasterOutput(NamedTuple):
    face_idx: jnp.ndarray  # (H, W) int32, -1 = background
    bary: jnp.ndarray  # (H, W, 3) barycentric coords of the hit
    depth: jnp.ndarray  # (H, W) view z of the hit (inf = background)


def rasterize_mesh(
    verts: jnp.ndarray,  # (V, 3) world
    faces: jnp.ndarray,  # (F, 3) int32
    camera: GSCameraInfo,
    W: int,
    H: int,
    tile_capacity: int = 256,
    max_tiles_per_face: int = 64,
) -> MeshRasterOutput:
    F = faces.shape[0]
    ones = jnp.ones((verts.shape[0], 1), verts.dtype)
    hom = jnp.concatenate([verts, ones], -1)
    p_view = hom @ camera.world_view_transform[:, :3]  # (V, 3)
    p_hom = hom @ camera.full_proj_transform
    p_w = 1.0 / (p_hom[:, 3:4] + 1e-7)
    ndc = p_hom[:, :3] * p_w
    px = ((ndc[:, 0] + 1.0) * W - 1.0) * 0.5
    py = ((ndc[:, 1] + 1.0) * H - 1.0) * 0.5
    pix = jnp.stack([px, py], -1)  # (V, 2)
    z = p_view[:, 2]

    tri_pix = pix[faces]  # (F, 3, 2)
    tri_z = z[faces]  # (F, 3)
    center = tri_pix.mean(1)
    radius = jnp.ceil(
        jnp.linalg.norm(tri_pix - center[:, None, :], axis=-1).max(1)
    ).astype(jnp.int32) + 1
    valid = (tri_z > 0.05).all(-1)
    depth_f = tri_z.mean(-1)

    assign = bin_gaussians(center, radius, depth_f, valid, W, H,
                           tile_capacity, max_tiles_per_face)
    T, K = assign.tile_gauss.shape
    tiles_x, tiles_y = num_tiles(W, H)

    # pad sentinel triangle F (degenerate, never hits)
    tri_pix_p = jnp.concatenate([tri_pix, jnp.full((1, 3, 2), 1e9)], 0)
    tri_z_p = jnp.concatenate([tri_z, jnp.full((1, 3), jnp.inf)], 0)

    g = assign.tile_gauss  # (T, K)
    v_pix = tri_pix_p[g]  # (T, K, 3, 2)
    v_z = tri_z_p[g]  # (T, K, 3)

    t_idx = jnp.arange(T, dtype=jnp.int32)
    tx, ty = t_idx % tiles_x, t_idx // tiles_x
    xs = jnp.arange(TILE, dtype=jnp.float32)
    px_row = tx[:, None].astype(jnp.float32) * TILE + xs[None, :]  # (T, 16)
    py_row = ty[:, None].astype(jnp.float32) * TILE + xs[None, :]
    # pixel order within a tile is (y, x) row-major, matching untile below
    pix_x = jnp.broadcast_to(px_row[:, None, :], (T, TILE, TILE)).reshape(T, TILE * TILE)
    pix_y = jnp.broadcast_to(py_row[:, :, None], (T, TILE, TILE)).reshape(T, TILE * TILE)
    P = TILE * TILE

    # edge functions for barycentric coords: for triangle (a, b, c)
    a = v_pix[:, :, 0, :]  # (T, K, 2)
    b = v_pix[:, :, 1, :]
    c = v_pix[:, :, 2, :]
    det = (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])  # (T, K)
    det_safe = jnp.where(jnp.abs(det) < 1e-9, 1e-9, det)

    dx = pix_x[:, None, :] - a[..., 0:1]  # (T, K, P)
    dy = pix_y[:, None, :] - a[..., 1:2]
    w1 = ((c[..., 1] - a[..., 1])[..., None] * dx - (c[..., 0] - a[..., 0])[..., None] * dy) / det_safe[..., None]
    w2 = (-(b[..., 1] - a[..., 1])[..., None] * dx + (b[..., 0] - a[..., 0])[..., None] * dy) / det_safe[..., None]
    w0 = 1.0 - w1 - w2
    inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & (jnp.abs(det)[..., None] > 1e-9)

    depth = (
        w0 * v_z[..., 0:1] + w1 * v_z[..., 1:2] + w2 * v_z[..., 2:3]
    )  # (T, K, P)
    depth = jnp.where(inside, depth, jnp.inf)

    best = jnp.argmin(depth, axis=1)  # (T, P)
    best_depth = jnp.take_along_axis(depth, best[:, None, :], 1)[:, 0, :]
    hit = jnp.isfinite(best_depth)
    best_face = jnp.take_along_axis(g, best, 1)
    best_face = jnp.where(hit & (best_face < F), best_face, -1)
    bary = jnp.stack(
        [
            jnp.take_along_axis(w0, best[:, None, :], 1)[:, 0, :],
            jnp.take_along_axis(w1, best[:, None, :], 1)[:, 0, :],
            jnp.take_along_axis(w2, best[:, None, :], 1)[:, 0, :],
        ],
        -1,
    )  # (T, P, 3)

    def untile(x, ch=None):
        if ch is None:
            img = x.reshape(tiles_y, tiles_x, TILE, TILE)
            img = img.transpose(0, 2, 1, 3).reshape(tiles_y * TILE, tiles_x * TILE)
            return img[:H, :W]
        img = x.reshape(tiles_y, tiles_x, TILE, TILE, ch)
        img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, ch)
        return img[:H, :W]

    return MeshRasterOutput(
        face_idx=untile(best_face),
        bary=untile(bary, 3),
        depth=untile(jnp.where(hit, best_depth, jnp.inf)),
    )


def interpolate_attribute(out: MeshRasterOutput, faces: jnp.ndarray,
                          vert_attr: jnp.ndarray) -> jnp.ndarray:
    """Interpolate per-vertex attributes at the rasterized hits
    (nvdiffrast ``interpolate`` equivalent)."""
    f = jnp.maximum(out.face_idx, 0)
    tri_attr = vert_attr[faces[f]]  # (H, W, 3, C)
    val = (out.bary[..., None] * tri_attr).sum(-2)
    return jnp.where((out.face_idx >= 0)[..., None], val, 0.0)
