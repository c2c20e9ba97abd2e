"""Differentiable marching tetrahedra (DMTet) + tetrahedra-SDF-grid geometry.

TPU-native equivalent of the reference ``MarchingTetrahedraHelper``
(threestudio/models/isosurface.py:69-253) and ``tetrahedra-sdf-grid``
(threestudio/models/geometry/tetrahedra_sdf_grid.py): per-grid-vertex SDF +
learnable deformation, surface extracted by marching tets with gradients
flowing through the crossing interpolation.

TPU-first design: everything is STATIC-SHAPED so it jits once —
- the tet grid (vertices, tets, unique edges, per-tet edge map) is built
  host-side once per resolution (the reference instead ships
  ``load/tets/{res}_tets.npz`` files; we generate an equivalent 6-tets-per-
  cube grid procedurally, no asset download),
- ``marching_tets`` emits one (possibly degenerate) vertex PER UNIQUE EDGE
  and exactly 2 triangle slots PER TET with a validity mask, instead of the
  reference's dynamic ``torch.unique`` compaction — masked degenerate
  geometry costs nothing downstream (masked rasterization / masked losses)
  and keeps shapes static for XLA.

The sign-configuration tables are the standard public marching-tetrahedra
tables (same convention as NVIDIA kaolin's DMTet).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid

# up to 2 triangles per tet, indices into the tet's 6 local edges; -1 = unused
_TRIANGLE_TABLE = np.array(
    [
        [-1, -1, -1, -1, -1, -1],
        [1, 0, 2, -1, -1, -1],
        [4, 0, 3, -1, -1, -1],
        [1, 4, 2, 1, 3, 4],
        [3, 1, 5, -1, -1, -1],
        [2, 3, 0, 2, 5, 3],
        [1, 4, 0, 1, 5, 4],
        [4, 2, 5, -1, -1, -1],
        [4, 5, 2, -1, -1, -1],
        [4, 1, 0, 4, 5, 1],
        [3, 2, 0, 3, 5, 2],
        [1, 3, 5, -1, -1, -1],
        [4, 1, 2, 4, 3, 1],
        [3, 0, 4, -1, -1, -1],
        [2, 0, 1, -1, -1, -1],
        [-1, -1, -1, -1, -1, -1],
    ],
    np.int32,
)
_NUM_TRIANGLES = np.array([0, 1, 1, 2, 1, 2, 2, 1, 1, 2, 2, 1, 2, 1, 1, 0], np.int32)
# the 6 edges of a tet as (local vertex, local vertex)
_TET_EDGES = np.array([[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], np.int32)

# same 6-tet main-diagonal cube decomposition as native/mc/marching_tets.cpp
_CUBE_TETS = np.array(
    [[0, 1, 3, 7], [0, 1, 5, 7], [0, 2, 3, 7], [0, 2, 6, 7], [0, 4, 5, 7], [0, 4, 6, 7]],
    np.int32,
)


class TetGrid(NamedTuple):
    """Static tet-grid topology (host numpy, hashable by id for jit closure)."""

    verts: np.ndarray      # (V, 3) float32 in [0, 1]^3
    tets: np.ndarray       # (T, 4) int32
    edges: np.ndarray      # (E, 2) int32 unique edges, lo < hi
    tet_edges: np.ndarray  # (T, 6) int32 -> rows of `edges`
    resolution: int


@lru_cache(maxsize=8)
def build_tet_grid(resolution: int) -> TetGrid:
    """Regular grid of ``resolution^3`` cells, 6 tets per cell.

    Equivalent surface to the reference's precomputed ``{res}_tets.npz``
    assets (isosurface.py:80-88) without shipping binary assets."""
    n = resolution + 1
    ii, jj, kk = np.meshgrid(np.arange(n), np.arange(n), np.arange(n), indexing="ij")
    verts = np.stack([ii, jj, kk], -1).reshape(-1, 3).astype(np.float32) / resolution

    def vid(i, j, k):
        return (i * n + j) * n + k

    ci, cj, ck = np.meshgrid(
        np.arange(resolution), np.arange(resolution), np.arange(resolution), indexing="ij"
    )
    ci, cj, ck = ci.ravel(), cj.ravel(), ck.ravel()
    corners = np.stack(
        [vid(ci + (c >> 2 & 1), cj + (c >> 1 & 1), ck + (c & 1)) for c in range(8)], -1
    )  # (C, 8) — corner bit order matches marching_tets.cpp (x<<2 | y<<1 | z)
    tets = corners[:, _CUBE_TETS.reshape(-1)].reshape(-1, 4).astype(np.int32)

    # canonicalize orientation (positive signed volume) — the triangle table
    # only yields consistent winding when every tet is equally oriented
    tv = verts[tets]
    vol = np.einsum(
        "ij,ij->i",
        np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]),
        tv[:, 3] - tv[:, 0],
    )
    flip = vol < 0
    tets[flip] = tets[flip][:, [0, 1, 3, 2]]

    e = tets[:, _TET_EDGES.reshape(-1)].reshape(-1, 2)  # (T*6, 2)
    e = np.sort(e, axis=1)
    ekey = e[:, 0].astype(np.int64) * len(verts) + e[:, 1]
    uniq, inverse = np.unique(ekey, return_inverse=True)
    edges = np.stack([uniq // len(verts), uniq % len(verts)], -1).astype(np.int32)
    tet_edges = inverse.reshape(-1, 6).astype(np.int32)
    return TetGrid(verts, tets, edges, tet_edges, resolution)


class MTOutput(NamedTuple):
    verts: jnp.ndarray      # (E, 3) one per unique edge (degenerate when unused)
    faces: jnp.ndarray      # (2T, 3) int32 indices into verts
    face_mask: jnp.ndarray  # (2T,) bool — True for real triangles
    vert_mask: jnp.ndarray  # (E,) bool — True where the edge crosses the surface


def marching_tets(
    sdf: jnp.ndarray, positions: jnp.ndarray, grid: TetGrid
) -> MTOutput:
    """Differentiable marching tetrahedra (static shapes).

    ``sdf``: (V,) signed distance (negative inside), ``positions``: (V, 3)
    possibly deformed grid-vertex positions.  Gradients flow into both via
    the edge-crossing interpolation t = s_a / (s_a - s_b) — the same
    mechanism as the reference's kaolin-style helper
    (threestudio/models/isosurface.py:120-186)."""
    tets = jnp.asarray(grid.tets)
    edges = jnp.asarray(grid.edges)
    tet_edges = jnp.asarray(grid.tet_edges)

    sa = sdf[edges[:, 0]]
    sb = sdf[edges[:, 1]]
    cross = (sa > 0) != (sb > 0)
    denom = sa - sb
    safe = jnp.where(jnp.abs(denom) < 1e-10, jnp.where(denom < 0, -1e-10, 1e-10), denom)
    t = jnp.clip(sa / safe, 0.0, 1.0)
    va = positions[edges[:, 0]]
    vb = positions[edges[:, 1]]
    verts = va + t[:, None] * (vb - va)  # (E, 3)

    occ = (sdf[tets] > 0).astype(jnp.int32)  # (T, 4)
    code = occ[:, 0] + occ[:, 1] * 2 + occ[:, 2] * 4 + occ[:, 3] * 8  # (T,)
    tri_local = jnp.asarray(_TRIANGLE_TABLE)[code]  # (T, 6) local edge ids or -1
    n_tri = jnp.asarray(_NUM_TRIANGLES)[code]  # (T,)

    # map local edge -> global edge row; -1 slots point at edge 0 (masked)
    gather_local = jnp.maximum(tri_local, 0)  # (T, 6)
    global_edge = jnp.take_along_axis(tet_edges, gather_local, axis=1)  # (T, 6)
    faces = global_edge.reshape(-1, 3)  # (2T, 3)
    slot = jnp.arange(2, dtype=jnp.int32)
    face_mask = (slot[None, :] < n_tri[:, None]).reshape(-1)  # (2T,)
    faces = jnp.where(face_mask[:, None], faces, 0)
    return MTOutput(verts, faces, face_mask, cross)


# ---------------------------------------------------------------------------
# tetrahedra-sdf-grid geometry
# ---------------------------------------------------------------------------


@dataclass
class TetSDFGridConfig:
    """Mirrors threestudio/models/geometry/tetrahedra_sdf_grid.py config."""

    radius: float = 1.0
    isosurface_resolution: int = 64
    isosurface_deformable_grid: bool = True
    n_feature_dims: int = 3
    hashgrid: HashGridConfig = field(default_factory=HashGridConfig)
    n_neurons: int = 64
    n_hidden_layers: int = 1
    init_shape: str = "sphere"  # sphere | none
    init_shape_radius: float = 0.5
    fix_geometry: bool = False


def init_tet_sdf_grid(cfg: TetSDFGridConfig, rng: jax.Array) -> Dict[str, Any]:
    """Learnable per-grid-vertex SDF + deformation + feature network.

    ``init_shape="sphere"`` initializes the SDF to a sphere the way the
    reference's shape-init does (tetrahedra_sdf_grid.py:90-130) but in
    closed form instead of fitting."""
    grid = build_tet_grid(cfg.isosurface_resolution)
    world = (jnp.asarray(grid.verts) * 2.0 - 1.0) * cfg.radius
    if cfg.init_shape == "sphere":
        sdf0 = jnp.linalg.norm(world, axis=-1) - cfg.init_shape_radius
    else:
        sdf0 = jax.random.normal(rng, (len(grid.verts),)) * 0.1
    k1, k2 = jax.random.split(rng)
    enc_dim = cfg.hashgrid.out_dim
    from .implicit_volume import _mlp_init

    return {
        "sdf": sdf0.astype(jnp.float32),
        "deform": jnp.zeros((len(grid.verts), 3), jnp.float32),
        "encoding": init_hashgrid(cfg.hashgrid, k1),
        "feature_mlp": _mlp_init(k2, [enc_dim, cfg.n_neurons] + [cfg.n_neurons] * (cfg.n_hidden_layers - 1) + [cfg.n_feature_dims]),
    }


def tet_grid_positions(params, cfg: TetSDFGridConfig) -> jnp.ndarray:
    """World-space (possibly deformed) grid-vertex positions."""
    grid = build_tet_grid(cfg.isosurface_resolution)
    base = (jnp.asarray(grid.verts) * 2.0 - 1.0) * cfg.radius
    if not cfg.isosurface_deformable_grid:
        return base
    half_cell = cfg.radius * 2.0 / cfg.isosurface_resolution / 2.0
    return base + jnp.tanh(params["deform"]) * half_cell


def isosurface(params, cfg: TetSDFGridConfig) -> MTOutput:
    """Extract the masked static-shape surface (differentiable)."""
    grid = build_tet_grid(cfg.isosurface_resolution)
    sdf = params["sdf"]
    if cfg.fix_geometry:
        sdf = jax.lax.stop_gradient(sdf)
    return marching_tets(sdf, tet_grid_positions(params, cfg), grid)


def forward_features(params, cfg: TetSDFGridConfig, points: jnp.ndarray) -> jnp.ndarray:
    """Per-point feature head (albedo by default), hash-encoded like the
    reference's feature network (tetrahedra_sdf_grid.py:150-170)."""
    from .implicit_volume import _mlp_apply

    x = (points / cfg.radius + 1.0) / 2.0  # [0,1]^3 for the hash encoding
    feat = hashgrid_encode(params["encoding"], cfg.hashgrid, x)
    return jax.nn.sigmoid(_mlp_apply(params["feature_mlp"], feat))


def export_mesh(params, cfg: TetSDFGridConfig) -> Tuple[np.ndarray, np.ndarray]:
    """Compact the masked surface on host → (verts (V',3), faces (F',3))."""
    out = jax.device_get(isosurface(params, cfg))
    faces = out.faces[np.asarray(out.face_mask)]
    used = np.unique(faces.reshape(-1))
    remap = np.full(len(out.verts), -1, np.int64)
    remap[used] = np.arange(len(used))
    return np.asarray(out.verts)[used], remap[faces].astype(np.int32)
