"""Sketch-shape guidance loss (latent-NeRF's ShapeLoss).

Parity with threestudio/utils/ops.py:507-541 (class ShapeLoss): a guide mesh
constrains the NeRF's occupancy — cross-entropy between the rendered
occupancy 1−exp(−δ·σ) and the mesh's inside/outside indicator, weighted DOWN
near the surface (1 − exp(−d²/2σ_p²)) so geometry may deviate close to the
sketch but not far from it.

TPU-first design: the reference calls libigl's fast winding number + exact
point-mesh distance on the CPU for every training batch (with detached
points).  Since the queries are never differentiated through, we instead bake
the guide shape ONCE at setup into two dense grids — winding-number occupancy
and nearest-surface distance — computed on-device in chunks, and the per-step
loss is two trilinear lookups inside the jitted step.  Winding numbers use
the exact van Oosterom–Strackee solid-angle sum; distances use the
nearest-VERTEX metric (guide sketches are dense; the σ_p=0.3 Gaussian makes
the vertex/surface gap negligible).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# same fixed reorientation the reference applies to guide shapes
# (ops.py:516-518): rot_x(90°) @ rot_y(90°)
_GUIDE_ROT = np.array([[1, 0, 0], [0, 0, -1], [0, 1, 0]], np.float32) @ np.array(
    [[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32
)


def winding_number(points: jnp.ndarray, verts: jnp.ndarray,
                   faces: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """Generalized winding number of ``points`` (N,3) w.r.t. a triangle mesh.

    Exact solid-angle sum (van Oosterom–Strackee):
      ω_f(p) = 2·atan2(det[a b c], |a||b||c| + (a·b)|c| + (b·c)|a| + (c·a)|b|)
    with a,b,c the triangle corners relative to p; w = Σ_f ω_f / 4π.
    Evaluated in (chunk, F) blocks — device-friendly, no host libigl."""
    tv = verts[faces]  # (F, 3, 3)

    def one_chunk(p):
        a = tv[None, :, 0] - p[:, None]  # (B, F, 3)
        b = tv[None, :, 1] - p[:, None]
        c = tv[None, :, 2] - p[:, None]
        la = jnp.linalg.norm(a, axis=-1)
        lb = jnp.linalg.norm(b, axis=-1)
        lc = jnp.linalg.norm(c, axis=-1)
        det = jnp.einsum("bfi,bfi->bf", a, jnp.cross(b, c))
        denom = (la * lb * lc + jnp.einsum("bfi,bfi->bf", a, b) * lc
                 + jnp.einsum("bfi,bfi->bf", b, c) * la
                 + jnp.einsum("bfi,bfi->bf", c, a) * lb)
        omega = 2.0 * jnp.arctan2(det, denom)
        return omega.sum(-1) / (4.0 * jnp.pi)

    N = points.shape[0]
    pad = (-N) % chunk
    pts = jnp.concatenate([points, jnp.zeros((pad, 3), points.dtype)], 0)
    out = jax.lax.map(one_chunk, pts.reshape(-1, chunk, 3))
    return out.reshape(-1)[:N]


def _ce_pq(p: jnp.ndarray, q: jnp.ndarray, weight=None, T: float = 1e-4) -> jnp.ndarray:
    """Cross-entropy Σ −[p·log q + (1−p)·log(1−q)] (ops.py:496-504)."""
    qc = jnp.clip(q, T, 1.0 - T)
    ce = -(p * jnp.log(qc) + (1.0 - p) * jnp.log(1.0 - qc))
    if weight is not None:
        ce = ce * weight
    return ce.sum()


@dataclass
class ShapeLoss:
    """Callable (xyzs (N,3) in world space, sigmas (N,)) -> scalar loss."""

    guide_shape: str
    mesh_scale: float = 0.7
    proximal_surface: float = 0.3
    delta: float = 0.2
    grid_res: int = 64
    bound: float = 1.0  # grids cover [-bound, bound]^3

    def __post_init__(self):
        from ..export.mesh_io import load_mesh

        mesh = load_mesh(self.guide_shape)
        v = np.asarray(mesh.v_pos, np.float32)
        f = np.asarray(mesh.t_pos_idx, np.int32)
        # normalize_mesh (ops.py:463-473): center on the vertex mean, scale
        # the max radius to mesh_scale; then the fixed reorientation
        v = v - v.mean(0)
        v = v / max(np.linalg.norm(v, axis=1).max(), 1e-8) * self.mesh_scale
        v = v @ _GUIDE_ROT.T

        R = self.grid_res
        axis = np.linspace(-self.bound, self.bound, R, dtype=np.float32)
        gx, gy, gz = np.meshgrid(axis, axis, axis, indexing="ij")
        pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)

        wn = np.asarray(winding_number(jnp.asarray(pts), jnp.asarray(v), jnp.asarray(f)))
        self.occ_grid = jnp.asarray((wn > 0.5).astype(np.float32).reshape(R, R, R))

        if self.proximal_surface > 0:
            from scipy.spatial import cKDTree

            d2, _ = cKDTree(v).query(pts, k=1)
            d2 = (d2 ** 2).astype(np.float32).reshape(R, R, R)
            # weight = 1 − exp(−d²/2σ²) (ops.py:529-532,484-493)
            self.weight_grid = jnp.asarray(
                1.0 - np.exp(-d2 / (2.0 * self.proximal_surface ** 2)))
        else:
            self.weight_grid = None

    def _lookup(self, grid: jnp.ndarray, xyz: jnp.ndarray) -> jnp.ndarray:
        from ..models.geometry.volume_grid import _trilerp

        u = (xyz + self.bound) / (2.0 * self.bound)
        u = jnp.clip(u, 0.0, 1.0)
        return _trilerp(grid[None], u)[:, 0]

    def __call__(self, xyzs: jnp.ndarray, sigmas: jnp.ndarray) -> jnp.ndarray:
        xyz = jax.lax.stop_gradient(xyzs.reshape(-1, 3))
        indicator = self._lookup(self.occ_grid, xyz)
        weight = (self._lookup(self.weight_grid, xyz)
                  if self.weight_grid is not None else None)
        nerf_occ = jnp.clip(1.0 - jnp.exp(-self.delta * sigmas.reshape(-1)), 0.0, 1.1)
        return _ce_pq(nerf_occ, indicator, weight)
