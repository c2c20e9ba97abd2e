"""Implicit density volume (hash-grid NeRF geometry) — functional JAX.

Port of the reference ``implicit-volume``
(threestudio/models/geometry/implicit_volume.py:19-285) driving the static
Zero123 stage (configs/stable-zero123.yaml:46-71): hash-grid encoding (16
levels × 2 feats, replacing tiny-cuda-nn) + density MLP (64×2, softplus) with
``blob_magic3d`` pre-activation bias + feature MLP (3 albedo dims), analytic
normals via autodiff.  Points live in a [-radius, radius]³ bbox.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    hashgrid_encode_cell,
    init_hashgrid,
    init_hashgrid_cell,
)


@dataclass
class ImplicitVolumeConfig:
    radius: float = 2.0
    n_feature_dims: int = 3
    density_activation: str = "softplus"
    density_bias: Any = "blob_magic3d"
    density_blob_scale: float = 10.0
    density_blob_std: float = 0.5
    normal_type: str = "analytic"  # analytic | finite_difference
    finite_difference_eps: float = 0.01
    hashgrid: HashGridConfig = field(default_factory=HashGridConfig)
    n_neurons: int = 64
    n_hidden_layers: int = 2


def _mlp_init(rng, dims):
    params = []
    keys = jax.random.split(rng, len(dims) - 1)
    for k, (n_in, n_out) in zip(keys, zip(dims[:-1], dims[1:])):
        lim = float(np.sqrt(6.0 / (n_in + n_out)))
        params.append({
            "w": jax.random.uniform(k, (n_in, n_out), jnp.float32, -lim, lim),
            "b": jnp.zeros((n_out,), jnp.float32),
        })
    return params


def _mlp_apply(params, x):
    for i, layer in enumerate(params):
        x = x @ layer["w"] + layer["b"]
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


def _use_pallas_encode() -> bool:
    """Cell-layout fast path: the Pallas kernel on TPU, the XLA twin
    elsewhere (CPU tests / fallback)."""
    import jax as _jax

    return _jax.default_backend() not in ("cpu",)


def _encode(params, cfg: ImplicitVolumeConfig, x, level_mask):
    """Dispatch on hashgrid.layout: NGP corner tables (reference
    parameterization) or the TPU-first cell-packed layout."""
    if cfg.hashgrid.layout == "cell":
        if _use_pallas_encode():
            from ...ops.hashgrid_pallas import encode_cell_with_grad

            feats, _ = encode_cell_with_grad(params["encoding"], cfg.hashgrid,
                                             x, level_mask)
            return feats
        return hashgrid_encode_cell(params["encoding"], cfg.hashgrid, x,
                                    level_mask)
    return hashgrid_encode(params["encoding"], cfg.hashgrid, x, level_mask)


def _encode_with_grad(params, cfg: ImplicitVolumeConfig, x, level_mask):
    """(feats, dfeats/dx) for the cell layout (one row pass serves density,
    features AND analytic normals)."""
    if _use_pallas_encode():
        from ...ops.hashgrid_pallas import encode_cell_with_grad

        return encode_cell_with_grad(params["encoding"], cfg.hashgrid, x,
                                     level_mask)
    return hashgrid_encode_cell(params["encoding"], cfg.hashgrid, x,
                                level_mask, with_grad=True)


def init_implicit_volume(cfg: ImplicitVolumeConfig, rng: jax.Array) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(rng, 3)
    enc_dim = cfg.hashgrid.out_dim
    dims = [enc_dim] + [cfg.n_neurons] * cfg.n_hidden_layers
    return {
        "encoding": (init_hashgrid_cell(cfg.hashgrid, k1)
                     if cfg.hashgrid.layout == "cell"
                     else init_hashgrid(cfg.hashgrid, k1)),
        "density_mlp": _mlp_init(k2, dims + [1]),
        "feature_mlp": _mlp_init(k3, dims + [cfg.n_feature_dims]),
    }


def _contract(cfg: ImplicitVolumeConfig, points: jnp.ndarray) -> jnp.ndarray:
    """[-radius, radius] -> [0, 1] (bbox normalization, geometry/base.py:20)."""
    return (points + cfg.radius) / (2 * cfg.radius)


def density_bias(cfg: ImplicitVolumeConfig, points: jnp.ndarray) -> jnp.ndarray:
    """Pre-activation bias (implicit_volume.py:84-104)."""
    if cfg.density_bias == "blob_dreamfusion":
        return cfg.density_blob_scale * jnp.exp(
            -0.5 * (points**2).sum(-1, keepdims=True) / cfg.density_blob_std**2
        )
    if cfg.density_bias == "blob_magic3d":
        return cfg.density_blob_scale * (
            1.0 - jnp.sqrt((points**2).sum(-1, keepdims=True) + 1e-12) / cfg.density_blob_std
        )
    return jnp.asarray(cfg.density_bias)


def _activate_density(cfg: ImplicitVolumeConfig, raw: jnp.ndarray) -> jnp.ndarray:
    if cfg.density_activation == "softplus":
        return jax.nn.softplus(raw)
    if cfg.density_activation == "trunc_exp":
        return jnp.exp(jnp.clip(raw, -15.0, 15.0))
    if cfg.density_activation == "shifted_softplus":
        return jax.nn.softplus(raw - 1.0)
    raise ValueError(cfg.density_activation)


def forward_density(params, cfg: ImplicitVolumeConfig, points: jnp.ndarray,
                    level_mask=None) -> jnp.ndarray:
    """(..., 3) world points -> (..., 1) activated density."""
    x = _contract(cfg, points)
    enc = _encode(params, cfg, x, level_mask)
    raw = _mlp_apply(params["density_mlp"], enc)
    return _activate_density(cfg, raw + density_bias(cfg, points))


def forward_field(params, cfg: ImplicitVolumeConfig, points: jnp.ndarray,
                  level_mask=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """-> (density (...,1), features (...,F))."""
    x = _contract(cfg, points)
    enc = _encode(params, cfg, x, level_mask)
    raw = _mlp_apply(params["density_mlp"], enc)
    density = _activate_density(cfg, raw + density_bias(cfg, points))
    features = _mlp_apply(params["feature_mlp"], enc)
    return density, features


def forward_with_normal(params, cfg: ImplicitVolumeConfig, points: jnp.ndarray,
                        level_mask=None):
    """-> (density, features, normals) with analytic or finite-difference
    normals (implicit_volume.py:137-180); normal = -∇σ normalized."""
    if cfg.hashgrid.layout == "cell" and cfg.normal_type == "analytic":
        # ONE fused row pass serves density, features AND ∇σ: the kernel
        # returns d enc/dx alongside the features, so the analytic normal is
        # chain-ruled through the (tiny) density MLP + bias instead of
        # re-encoding under jax.grad (the corner path encodes TWICE)
        x = _contract(cfg, points)
        enc, denc = _encode_with_grad(params, cfg, x, level_mask)
        raw = _mlp_apply(params["density_mlp"], enc)
        bias = density_bias(cfg, points)
        density = _activate_density(cfg, raw + bias)
        features = _mlp_apply(params["feature_mlp"], enc)

        # ∇_pts σ = act'·(J_mlp·denc / (2r) + ∇bias); per-point chain rule
        # via vjp over (enc, points) keeps everything loss-differentiable
        def sig_fn(e, p):
            return _activate_density(
                cfg, _mlp_apply(params["density_mlp"], e) + density_bias(cfg, p))

        _, vjp = jax.vjp(sig_fn, enc, points)
        d_enc, d_pts = vjp(jnp.ones_like(density))
        # denc is d enc / d x with x the [0,1] contracted coords
        g = (jnp.einsum("...f,...fd->...d", d_enc, denc)
             / (2.0 * cfg.radius) + d_pts)
        from ...ops.safe_math import safe_normalize

        return density, features, -safe_normalize(g)
    density, features = forward_field(params, cfg, points, level_mask)
    if cfg.normal_type == "analytic":
        grad_fn = jax.grad(
            lambda p: forward_density(params, cfg, p, level_mask).sum()
        )
        g = grad_fn(points)
    else:
        eps = cfg.finite_difference_eps
        offsets = jnp.asarray(
            [[eps, 0, 0], [-eps, 0, 0], [0, eps, 0], [0, -eps, 0],
             [0, 0, eps], [0, 0, -eps]], jnp.float32,
        )
        pts = points[..., None, :] + offsets
        d = forward_density(params, cfg, pts, level_mask)[..., 0]
        g = jnp.stack(
            [(d[..., 0] - d[..., 1]) / (2 * eps),
             (d[..., 2] - d[..., 3]) / (2 * eps),
             (d[..., 4] - d[..., 5]) / (2 * eps)], -1,
        )
    from ...ops.safe_math import safe_normalize

    normal = -safe_normalize(g)
    return density, features, normal


def export_density_grid(params, cfg: ImplicitVolumeConfig, resolution: int,
                        chunk: int = 65536, level_mask=None) -> np.ndarray:
    """Dense density grid over the bbox for mc-cpu export
    (geometry/base.py:119-180 coarse pass)."""
    from ...ops.hashgrid_pallas import tpu_jit

    lin = np.linspace(-cfg.radius, cfg.radius, resolution, dtype=np.float32)
    out = np.zeros((resolution**3,), np.float32)
    grid = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
    # tpu_jit: the cell-layout encode kernel needs the raised scoped-vmem
    # limit (the export chunk's whole kernel output can be stack-placed)
    fn = tpu_jit(lambda p: forward_density(params, cfg, p, level_mask)[..., 0])
    for i in range(0, len(grid), chunk):
        out[i: i + chunk] = np.asarray(fn(jnp.asarray(grid[i: i + chunk])))
    return out.reshape(resolution, resolution, resolution)
