"""Implicit SDF geometry (hash-grid + MLP signed distance field).

Port of threestudio ``implicit-sdf``
(threestudio/models/geometry/implicit_sdf.py, ~413 LoC): SDF + feature MLPs
over the hash-grid encoding, sphere initialization (either analytic bias or
fitted), finite-difference or analytic normals.  Drives the NeuS renderer and
the SDF-based export paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid
from ...ops.safe_math import safe_normalize
from .implicit_volume import _mlp_apply, _mlp_init


@dataclass
class ImplicitSDFConfig:
    radius: float = 2.0
    n_feature_dims: int = 3
    shape_init: Optional[str] = "sphere"  # sphere | none
    shape_init_params: float = 0.5  # sphere radius
    normal_type: str = "finite_difference"  # analytic | finite_difference
    finite_difference_eps: float = 0.01
    hashgrid: HashGridConfig = field(default_factory=HashGridConfig)
    n_neurons: int = 64
    n_hidden_layers: int = 2


def init_implicit_sdf(cfg: ImplicitSDFConfig, rng: jax.Array) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(rng, 3)
    enc_dim = cfg.hashgrid.out_dim
    dims = [enc_dim] + [cfg.n_neurons] * cfg.n_hidden_layers
    return {
        "encoding": init_hashgrid(cfg.hashgrid, k1),
        "sdf_mlp": _mlp_init(k2, dims + [1]),
        "feature_mlp": _mlp_init(k3, dims + [cfg.n_feature_dims]),
    }


def _contract(cfg: ImplicitSDFConfig, points: jnp.ndarray) -> jnp.ndarray:
    return (points + cfg.radius) / (2 * cfg.radius)


def forward_sdf(params, cfg: ImplicitSDFConfig, points: jnp.ndarray,
                level_mask=None) -> jnp.ndarray:
    """(..., 3) -> (..., 1) signed distance (negative inside).  The sphere
    shape init adds the analytic sphere SDF as a residual bias (the reference
    pretrains toward it; a bias keeps the same zero level set at init)."""
    x = _contract(cfg, points)
    enc = hashgrid_encode(params["encoding"], cfg.hashgrid, x, level_mask)
    raw = _mlp_apply(params["sdf_mlp"], enc)
    if cfg.shape_init == "sphere":
        from ...ops.safe_math import safe_norm

        sphere = safe_norm(points, keepdims=True) - cfg.shape_init_params
        return raw * 0.1 + sphere
    return raw


def forward_field_sdf(params, cfg: ImplicitSDFConfig, points: jnp.ndarray,
                      level_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    x = _contract(cfg, points)
    enc = hashgrid_encode(params["encoding"], cfg.hashgrid, x, level_mask)
    features = _mlp_apply(params["feature_mlp"], enc)
    return forward_sdf(params, cfg, points, level_mask), features


def sdf_gradient(params, cfg: ImplicitSDFConfig, points: jnp.ndarray,
                 level_mask=None) -> jnp.ndarray:
    """Unnormalized ∇sdf (the eikonal-regularized quantity)."""
    if cfg.normal_type == "analytic":
        return jax.grad(lambda p: forward_sdf(params, cfg, p, level_mask).sum())(points)
    eps = cfg.finite_difference_eps
    offsets = jnp.asarray(
        [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0], [0, -eps, 0],
         [0, 0, eps], [0, 0, -eps]], jnp.float32)
    d = forward_sdf(params, cfg, points[..., None, :] + offsets, level_mask)[..., 0]
    return jnp.stack([(d[..., 0] - d[..., 1]), (d[..., 2] - d[..., 3]),
                      (d[..., 4] - d[..., 5])], -1) / (2 * eps)


def sdf_normal(params, cfg: ImplicitSDFConfig, points: jnp.ndarray,
               level_mask=None) -> jnp.ndarray:
    """Outward normals = normalize(∇sdf)."""
    return safe_normalize(sdf_gradient(params, cfg, points, level_mask))


def export_sdf_grid(params, cfg: ImplicitSDFConfig, resolution: int,
                    chunk: int = 65536, level_mask=None) -> np.ndarray:
    """Dense SDF grid for isosurface export (negated so density-style
    above-threshold extraction applies: inside > 0)."""
    lin = np.linspace(-cfg.radius, cfg.radius, resolution, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    out = np.zeros((len(grid),), np.float32)
    fn = jax.jit(lambda p: -forward_sdf(params, cfg, p, level_mask)[..., 0])
    for i in range(0, len(grid), chunk):
        out[i: i + chunk] = np.asarray(fn(jnp.asarray(grid[i: i + chunk])))
    return out.reshape(resolution, resolution, resolution)
