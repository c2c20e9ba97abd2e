"""K-Planes/HexPlane deformation field + residual decoder heads (pure JAX).

TPU-first reimplementation of the reference DeformationNetwork
(custom/threestudio-dreammesh4d/geometry/deformation.py:116-554):

- 6 plane grids over (x,y,z,t) — all 2-element combinations of the 4 input
  dims — at multi-resolutions ``[1,2,4,8] × [64,64,64,25]`` (time resolution
  NOT scaled, deformation.py:219-227), 32 channels, bilinear interpolation,
  product over the 6 planes, concat over scales (feat_dim = 32·4 = 128);
- spatial planes init U(0.1, 0.5); time-touching planes init to 1
  (deformation.py:116-139);
- decoder: Linear(128→64) trunk (depth 1) + four residual zero-init heads
  dx(3) / d-strain(6) / drot(4) / dopacity(1)
  (deformation.py:285-305,352-369,430-436);
- the reference's torch ``grid_sample`` becomes a hand-rolled bilinear gather
  (XLA fuses it into a handful of gathers + FMAs).

Everything is a plain pytree of arrays + pure apply functions, so the whole
field lives inside the jitted train step and vmaps over timestamps.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DeformationConfig:
    net_width: int = 64
    defor_depth: int = 1
    grid_channels: int = 32
    base_resolution: Tuple[int, int, int, int] = (64, 64, 64, 25)
    multires: Tuple[int, ...] = (1, 2, 4, 8)
    bounds: float = 1.0
    d_scale: bool = True  # strain head (no_ds=False)
    d_rot: bool = True  # rotation head (no_dr=False)
    d_opacity: bool = True  # hybrid skinning blend weight (no_do False when hybrid)


_COMBS = list(itertools.combinations(range(4), 2))  # [(0,1),(0,2),(0,3),(1,2),(1,3),(2,3)]


def _bilinear_sample(plane: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a (H, W, C) plane at normalized coords uv in [-1, 1] (align_corners
    semantics of torch grid_sample as used by the reference).  uv: (..., 2)
    ordered (x, y) where x indexes W and y indexes H.  Returns (..., C)."""
    H, W, C = plane.shape
    x = (uv[..., 0] + 1.0) * 0.5 * (W - 1)
    y = (uv[..., 1] + 1.0) * 0.5 * (H - 1)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    p00 = plane[y0, x0]
    p01 = plane[y0, x0 + 1]
    p10 = plane[y0 + 1, x0]
    p11 = plane[y0 + 1, x0 + 1]
    return (
        p00 * (1 - fx) * (1 - fy)
        + p01 * fx * (1 - fy)
        + p10 * (1 - fx) * fy
        + p11 * fx * fy
    )


def init_deformation(cfg: DeformationConfig, rng: jax.Array) -> Dict[str, Any]:
    """Build the parameter pytree."""
    keys = jax.random.split(rng, len(cfg.multires) * len(_COMBS) + 16)
    ki = 0
    grids: List[List[jnp.ndarray]] = []
    for res_mult in cfg.multires:
        reso = [r * res_mult for r in cfg.base_resolution[:3]] + [cfg.base_resolution[3]]
        scale_planes = []
        for (a, b) in _COMBS:
            # stored (reso[b], reso[a], C) so uv=(coord_a, coord_b) samples (x=a, y=b)
            shape = (reso[b], reso[a], cfg.grid_channels)
            if 3 in (a, b):
                plane = jnp.ones(shape, jnp.float32)
            else:
                plane = jax.random.uniform(keys[ki], shape, jnp.float32, 0.1, 0.5)
            ki += 1
            scale_planes.append(plane)
        grids.append(scale_planes)

    feat_dim = cfg.grid_channels * len(cfg.multires)
    W = cfg.net_width

    def dense(key, n_in, n_out):
        lim = float(np.sqrt(6.0 / (n_in + n_out)))  # xavier-uniform
        return {
            "w": jax.random.uniform(key, (n_in, n_out), jnp.float32, -lim, lim),
            "b": jnp.zeros((n_out,), jnp.float32),
        }

    trunk = [dense(keys[ki], feat_dim, W)]; ki += 1
    for _ in range(cfg.defor_depth - 1):
        trunk.append(dense(keys[ki], W, W)); ki += 1

    def res_head(n_out):
        # Head_Res_Net: Linear_Res(W) + Linear(W, out), zero-init (residual)
        return {
            "res": {"w": jnp.zeros((W, W), jnp.float32), "b": jnp.zeros((W,), jnp.float32)},
            "out": {"w": jnp.zeros((W, n_out), jnp.float32), "b": jnp.zeros((n_out,), jnp.float32)},
        }

    params = {
        "grids": grids,
        "trunk": trunk,
        "head_dx": res_head(3),
        "head_dstrain": res_head(6),
        "head_drot": res_head(4),
        "head_dopacity": res_head(1),
    }
    return params


def _apply_dense(p, x):
    return x @ p["w"] + p["b"]


def _apply_res_head(p, h):
    x = jax.nn.relu(h)
    x = x + _apply_dense(p["res"], x)
    return _apply_dense(p["out"], x)


def hexplane_features(params: Dict[str, Any], pts: jnp.ndarray, t: jnp.ndarray,
                      bounds: float) -> jnp.ndarray:
    """pts (..., 3) in world coords, t (...,) in [-1, 1].  Returns (..., feat)."""
    xyz = jnp.clip(pts / bounds, -1.0, 1.0)
    coords4 = jnp.concatenate([xyz, t[..., None]], -1)  # (..., 4)
    feats = []
    for scale_planes in params["grids"]:
        interp = None
        for plane, (a, b) in zip(scale_planes, _COMBS):
            uv = jnp.stack([coords4[..., a], coords4[..., b]], -1)
            s = _bilinear_sample(plane, uv)
            interp = s if interp is None else interp * s
        feats.append(interp)
    return jnp.concatenate(feats, -1)


class DeformationDeltas(NamedTuple):
    dx: jnp.ndarray  # (..., 3)
    drot: Optional[jnp.ndarray]  # (..., 4) residual quaternion (added to identity)
    dstrain: Optional[jnp.ndarray]  # (..., 6) strain tensor components
    dopacity: Optional[jnp.ndarray]  # (..., 1)


def forward_dynamic_delta(params: Dict[str, Any], cfg: DeformationConfig,
                          pts: jnp.ndarray, t: jnp.ndarray) -> DeformationDeltas:
    """Query deltas at points/times (deformation.py:430-436 semantics)."""
    h = hexplane_features(params, pts, t, cfg.bounds)
    for layer in params["trunk"][:1]:
        h = _apply_dense(layer, h)
    for layer in params["trunk"][1:]:
        h = _apply_dense(layer, jax.nn.relu(h))
    dx = _apply_res_head(params["head_dx"], h)
    drot = _apply_res_head(params["head_drot"], h) if cfg.d_rot else None
    dstrain = _apply_res_head(params["head_dstrain"], h) if cfg.d_scale else None
    dop = _apply_res_head(params["head_dopacity"], h) if cfg.d_opacity else None
    return DeformationDeltas(dx, drot, dstrain, dop)


def strain_tensor_to_matrix(strain: jnp.ndarray) -> jnp.ndarray:
    """6-vector -> symmetric 3x3 strain matrix I + diag(s[:3]) + off-diag(s[3:])
    (parity with dynamic_sugar.py:29-39)."""
    s_diag = strain[..., :3]
    s_off = strain[..., 3:]
    eye = jnp.eye(3, dtype=strain.dtype)
    m = eye + jnp.zeros(strain.shape[:-1] + (3, 3), strain.dtype)
    m = m.at[..., 0, 0].add(s_diag[..., 0])
    m = m.at[..., 1, 1].add(s_diag[..., 1])
    m = m.at[..., 2, 2].add(s_diag[..., 2])
    m = m.at[..., 0, 1].add(s_off[..., 0])
    m = m.at[..., 1, 0].add(s_off[..., 0])
    m = m.at[..., 0, 2].add(s_off[..., 1])
    m = m.at[..., 2, 0].add(s_off[..., 1])
    m = m.at[..., 1, 2].add(s_off[..., 2])
    m = m.at[..., 2, 1].add(s_off[..., 2])
    return m


def plane_tv_loss(params: Dict[str, Any], only_time_planes: bool = False) -> jnp.ndarray:
    """Total variation over plane grids (the reference exposes
    plane_tv_weight/time_smoothness_weight, deformation.py:58-61)."""
    total = jnp.zeros((), jnp.float32)
    count = 0
    for scale_planes in params["grids"]:
        for plane, (a, b) in zip(scale_planes, _COMBS):
            if only_time_planes and 3 not in (a, b):
                continue
            dh = plane[1:] - plane[:-1]
            dw = plane[:, 1:] - plane[:, :-1]
            total = total + (dh**2).mean() + (dw**2).mean()
            count += 1
    return total / max(count, 1)
