"""NeuS volume renderer over the implicit SDF geometry.

Port of threestudio ``neus-volume-renderer``
(threestudio/models/renderers/neus_volume_renderer.py, ~390 LoC) on the same
static-shape importance-sampling skeleton as the NeRF renderer: NeuS alpha
from SDF section values with a learned inverse standard deviation s,

    α_i = max((Φ_s(sdf_i) − Φ_s(sdf_{i+1})) / Φ_s(sdf_i), 0),  Φ_s = sigmoid(s·x)

(the unbiased first-order estimator from the NeuS paper), composited
front-to-back; ``variance`` is a learnable scalar in log space.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..geometry.implicit_sdf import (
    ImplicitSDFConfig,
    forward_field_sdf,
    forward_sdf,
    sdf_normal,
)
from .nerf_volume_renderer import NeRFRendererConfig, ray_bbox_intersect, sample_pdf


@dataclass
class NeuSRendererConfig:
    num_samples_coarse: int = 64
    num_samples_fine: int = 64
    radius: float = 2.0
    near: float = 0.05
    learned_variance_init: float = 0.3
    cos_anneal_end: int = 0


def init_neus_variance(cfg: NeuSRendererConfig) -> Dict[str, jnp.ndarray]:
    return {"log_s": jnp.asarray(float(jnp.log(1.0 / cfg.learned_variance_init)))}


def neus_alphas(sdf: jnp.ndarray, inv_s: jnp.ndarray) -> jnp.ndarray:
    """sdf (R, S) section values -> alphas (R, S-1) via the CDF ratio."""
    cdf = jax.nn.sigmoid(sdf * inv_s)
    alpha = (cdf[:, :-1] - cdf[:, 1:]) / jnp.maximum(cdf[:, :-1], 1e-6)
    return jnp.clip(alpha, 0.0, 1.0)


def render_rays_neus(
    geo_params,
    var_params,
    geo_cfg: ImplicitSDFConfig,
    rcfg: NeuSRendererConfig,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    bg_color: jnp.ndarray,
    rng: Optional[jax.Array] = None,
    level_mask=None,
) -> Dict[str, jnp.ndarray]:
    R = rays_o.shape[0]
    S1, S2 = rcfg.num_samples_coarse, rcfg.num_samples_fine
    t_near, t_far = ray_bbox_intersect(rays_o, rays_d, rcfg.radius, rcfg.near)
    inv_s = jnp.exp(var_params["log_s"])

    k1 = k2 = None
    if rng is not None:
        k1, k2 = jax.random.split(rng)

    su = (jnp.arange(S1 + 1) / S1)[None, :]
    bins = t_near[:, None] + (t_far - t_near)[:, None] * su
    t_coarse = 0.5 * (bins[:, :-1] + bins[:, 1:])
    if k1 is not None:
        t_coarse = bins[:, :-1] + jax.random.uniform(k1, (R, S1)) * (t_far - t_near)[:, None] / S1
    pts_c = rays_o[:, None] + t_coarse[..., None] * rays_d[:, None]
    sdf_c = jax.lax.stop_gradient(forward_sdf(geo_params, geo_cfg, pts_c, level_mask))[..., 0]
    w_c = neus_alphas(sdf_c, inv_s)
    w_c = jnp.concatenate([w_c, jnp.zeros_like(w_c[:, :1])], -1)

    t_fine = sample_pdf(bins, w_c[:, :-1] + 1e-3, S2, k2)
    t_all = jnp.sort(jnp.concatenate([t_coarse, t_fine], -1), -1)  # (R, S)
    pts = rays_o[:, None] + t_all[..., None] * rays_d[:, None]
    sdf, features = forward_field_sdf(geo_params, geo_cfg, pts, level_mask)
    sdf = sdf[..., 0]

    alpha = neus_alphas(sdf, inv_s)  # (R, S-1)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, -1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    weights = alpha * trans  # (R, S-1)
    opacity = weights.sum(-1, keepdims=True)

    from ..geometry.implicit_sdf import sdf_gradient
    from ...ops.safe_math import safe_normalize as _sn

    grad = sdf_gradient(geo_params, geo_cfg, pts[:, :-1], level_mask)
    normal = _sn(grad)
    albedo = jax.nn.sigmoid(features[:, :-1, :3])
    comp_rgb_fg = (weights[..., None] * albedo).sum(-2)
    depth = (weights * t_all[:, :-1]).sum(-1, keepdims=True)
    from ...ops.safe_math import safe_normalize

    comp_normal = safe_normalize((weights[..., None] * normal).sum(-2))
    comp_rgb = comp_rgb_fg + (1.0 - opacity) * jnp.broadcast_to(bg_color, comp_rgb_fg.shape)

    # eikonal residual on the raw SDF gradient (‖∇sdf‖ -> 1)
    from ...ops.safe_math import safe_norm

    eik = ((safe_norm(grad) - 1.0) ** 2).mean()
    return {
        "comp_rgb": comp_rgb,
        "comp_normal": comp_normal * 0.5 + 0.5,
        "opacity": opacity,
        "depth": depth,
        "weights": weights,
        "normal": normal,
        "t_dirs": jnp.broadcast_to(rays_d[:, None], normal.shape),
        "sdf": sdf,
        "inv_std": inv_s,
        "eikonal": eik,
    }
