"""Volume renderer for the implicit NeRF geometry (static Zero123 stage).

TPU-first replacement for the nerfacc-based renderer
(threestudio/models/renderers/nerf_volume_renderer.py:20-471): instead of
occupancy-grid ray marching with dynamic sample counts (CUDA), rendering uses
hierarchical importance sampling with STATIC shapes — uniform stratified
coarse samples inside the ray/bbox interval, then inverse-CDF resampling from
the coarse density weights (the pure-torch ImportanceEstimator the reference
also ships, threestudio/models/estimators.py:16-118), then one fine
evaluation + front-to-back compositing producing comp_rgb / depth / opacity /
z-variance + per-sample weights/normals for the orientation loss
(nerf_volume_renderer.py:312-349).

Everything vmaps over rays and jits; ray batches are (R, 3) flat.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..geometry.implicit_volume import (
    ImplicitVolumeConfig,
    forward_field,
    forward_with_normal,
)


@dataclass
class NeRFRendererConfig:
    num_samples_coarse: int = 64
    num_samples_fine: int = 64
    radius: float = 2.0
    near: float = 0.05
    randomized: bool = True
    # Differentiable ray chunking: above this many rays, render_rays runs a
    # rematerialized lax.map over ray chunks.  Without it the hash-grid /
    # MLP / analytic-normal intermediates for ALL rays live at once in the
    # backward — 4 views @128² x 128 samples measured 35 GB on a 16 GB chip.
    # 0 disables (tiny-test path).
    ray_chunk_train: int = 8192
    # "importance" = coarse+fine PDF sampling; "occgrid" = occupancy-grid
    # empty-space skipping (nerfacc OccGridEstimator parity,
    # nerf_volume_renderer.py:136-180,430-448) with STATIC shapes: march
    # ``occ_candidates`` cheap grid lookups per ray, keep the first
    # ``occ_samples`` occupied ones for geometry evaluation.
    estimator: str = "importance"
    grid_resolution: int = 32
    occ_candidates: int = 192
    occ_samples: int = 64
    occ_thre: float = 0.01
    grid_decay: float = 0.95
    grid_update_every: int = 16


class OccGridState(NamedTuple):
    occ: jnp.ndarray  # (res^3,) running occupancy (alpha estimate)
    binary: jnp.ndarray  # (res^3,) float32 0/1


def init_occgrid(rcfg: NeRFRendererConfig) -> OccGridState:
    n = rcfg.grid_resolution ** 3
    # start fully occupied: dense sampling until the first update
    return OccGridState(jnp.zeros((n,), jnp.float32), jnp.ones((n,), jnp.float32))


def make_occgrid_update(geo_cfg: ImplicitVolumeConfig, rcfg: NeRFRendererConfig):
    """Jitted occupancy update (nerfacc update_every_n_steps semantics,
    nerf_volume_renderer.py:430-448): occ <- max(occ*decay, sigma*step) at
    jittered cell centers; binarize against min(mean, occ_thre)."""
    res = rcfg.grid_resolution
    r = rcfg.radius
    cell = 2.0 * r / res
    ax = (jnp.arange(res) + 0.5) / res * 2.0 * r - r
    gx, gy, gz = jnp.meshgrid(ax, ax, ax, indexing="ij")
    centers = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # (res^3, 3)
    # nerfacc occ_eval_fn: sigma * render_step_size
    march_step = 2.0 * math.sqrt(3.0) * r / max(rcfg.occ_candidates, 1)

    from ...ops.hashgrid_pallas import tpu_jit

    @tpu_jit
    def update(state: OccGridState, geo_params, rng, level_mask=None):
        jitter = (jax.random.uniform(rng, centers.shape) - 0.5) * cell
        sigma, _ = forward_field(geo_params, geo_cfg, centers + jitter, level_mask)
        occ_new = sigma[:, 0] * march_step
        occ = jnp.maximum(state.occ * rcfg.grid_decay, occ_new)
        thresh = jnp.minimum(occ.mean(), rcfg.occ_thre)
        return OccGridState(occ, (occ > thresh).astype(jnp.float32))

    return update


def _occgrid_lookup(binary: jnp.ndarray, pts: jnp.ndarray, radius: float,
                    res: int) -> jnp.ndarray:
    """Nearest-cell occupancy for (..., 3) points -> (...) float 0/1."""
    ijk = jnp.clip(((pts + radius) / (2.0 * radius) * res).astype(jnp.int32),
                   0, res - 1)
    flat = (ijk[..., 0] * res + ijk[..., 1]) * res + ijk[..., 2]
    return binary[flat]


def ray_bbox_intersect(rays_o, rays_d, radius: float, near: float):
    """Slab test against the [-radius, radius]^3 box -> (t_near, t_far)."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays_d) < 1e-8, 1e-8, rays_d)
    t0 = (-radius - rays_o) * inv_d
    t1 = (radius - rays_o) * inv_d
    t_min = jnp.minimum(t0, t1).max(-1)
    t_max = jnp.maximum(t0, t1).min(-1)
    t_near = jnp.maximum(t_min, near)
    t_far = jnp.maximum(t_max, t_near + 1e-4)
    return t_near, t_far


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               rng: Optional[jax.Array]) -> jnp.ndarray:
    """Inverse-CDF sampling (ImportanceEstimator equivalent,
    estimators.py:60-118).  bins (R, S+1), weights (R, S) -> (R, n)."""
    weights = weights + 1e-5
    pdf = weights / weights.sum(-1, keepdims=True)
    cdf = jnp.concatenate([jnp.zeros_like(pdf[:, :1]), jnp.cumsum(pdf, -1)], -1)
    R = bins.shape[0]
    if rng is not None:
        u = (jnp.arange(n_samples) + jax.random.uniform(rng, (R, n_samples))) / n_samples
    else:
        u = jnp.broadcast_to((jnp.arange(n_samples) + 0.5) / n_samples, (R, n_samples))
    idx = jnp.clip(jax.vmap(jnp.searchsorted)(cdf, u) - 1, 0, weights.shape[-1] - 1)
    cdf_lo = jnp.take_along_axis(cdf, idx, -1)
    cdf_hi = jnp.take_along_axis(cdf, idx + 1, -1)
    bin_lo = jnp.take_along_axis(bins, idx, -1)
    bin_hi = jnp.take_along_axis(bins, idx + 1, -1)
    frac = jnp.clip((u - cdf_lo) / jnp.maximum(cdf_hi - cdf_lo, 1e-8), 0, 1)
    return bin_lo + frac * (bin_hi - bin_lo)


def _composite(density: jnp.ndarray, dt: jnp.ndarray):
    """density (R,S,1), dt (R,S) -> weights (R,S), opacity (R,1)."""
    alpha = 1.0 - jnp.exp(-density[..., 0] * dt)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, -1)
    trans = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], -1)
    weights = alpha * trans
    return weights, weights.sum(-1, keepdims=True)


def render_rays(
    geo_params,
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    rays_o: jnp.ndarray,  # (R, 3)
    rays_d: jnp.ndarray,  # (R, 3) normalized
    light_positions: jnp.ndarray,  # (R, 3)
    bg_color: jnp.ndarray,  # (3,) or (R, 3)
    rng: Optional[jax.Array] = None,
    ambient_ratio: Optional[float] = None,
    shading_normal_only: bool = False,
    level_mask=None,
    material=None,
    return_normal_perturb: bool = False,
    occ_state: Optional[OccGridState] = None,
) -> Dict[str, jnp.ndarray]:
    R = rays_o.shape[0]
    chunk = rcfg.ray_chunk_train
    if chunk and R > chunk:
        # chunked + rematerialized path: peak memory = outputs + ONE chunk's
        # activations (recomputed in the backward), instead of all R rays'
        import dataclasses as _dc

        rcfg_c = _dc.replace(rcfg, ray_chunk_train=0)
        pad = (-R) % chunk
        n_chunks = (R + pad) // chunk

        def _pad(x):
            if pad == 0:
                return x
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], 0)

        ro = _pad(rays_o).reshape(n_chunks, chunk, 3)
        rd = _pad(rays_d).reshape(n_chunks, chunk, 3)
        lp = _pad(light_positions).reshape(n_chunks, chunk, 3)
        per_ray_bg = hasattr(bg_color, "ndim") and bg_color.ndim == 2
        bgs = (_pad(bg_color).reshape(n_chunks, chunk, -1) if per_ray_bg
               else jnp.broadcast_to(bg_color, (n_chunks,) + bg_color.shape))
        idx = jnp.arange(n_chunks)

        def chunk_fn(args):
            i, ro_c, rd_c, lp_c, bg_c = args
            k = None if rng is None else jax.random.fold_in(rng, i)
            return render_rays(
                geo_params, geo_cfg, rcfg_c, ro_c, rd_c, lp_c, bg_c, k,
                ambient_ratio=ambient_ratio,
                shading_normal_only=shading_normal_only,
                level_mask=level_mask, material=material,
                return_normal_perturb=return_normal_perturb,
                occ_state=occ_state,
            )

        out = jax.lax.map(jax.checkpoint(chunk_fn), (idx, ro, rd, lp, bgs))
        return {k: v.reshape((n_chunks * chunk,) + v.shape[2:])[:R]
                for k, v in out.items()}

    S1, S2 = rcfg.num_samples_coarse, rcfg.num_samples_fine
    t_near, t_far = ray_bbox_intersect(rays_o, rays_d, rcfg.radius, rcfg.near)

    k1 = k2 = None
    if rng is not None and rcfg.randomized:
        k1, k2 = jax.random.split(rng)

    if rcfg.estimator == "occgrid" and occ_state is not None:
        # occupancy-grid empty-space skipping with static shapes: S cheap
        # grid lookups per ray, geometry evaluated at only the FIRST K
        # occupied samples (nerfacc OccGridEstimator.sampling parity,
        # nerf_volume_renderer.py:136-180)
        S, K = rcfg.occ_candidates, rcfg.occ_samples
        su = (jnp.arange(S) + 0.5) / S
        if k1 is not None:
            su = (jnp.arange(S)[None] + jax.random.uniform(k1, (R, S))) / S
        else:
            su = jnp.broadcast_to(su[None], (R, S))
        t_cand = t_near[:, None] + (t_far - t_near)[:, None] * su  # (R, S)
        pts_cand = rays_o[:, None] + t_cand[..., None] * rays_d[:, None]
        occ = _occgrid_lookup(occ_state.binary, pts_cand, rcfg.radius,
                              rcfg.grid_resolution)  # (R, S) 0/1
        # first-K-occupied selection: occupied candidates keep their index,
        # unoccupied are pushed past S — one argsort, order preserved
        idx = jax.lax.broadcasted_iota(jnp.int32, (R, S), 1)
        sel = jnp.argsort(jnp.where(occ > 0.5, idx, idx + S), axis=-1)[:, :K]
        t_all = jnp.take_along_axis(t_cand, sel, -1)  # (R, K)
        occ_sel = jnp.take_along_axis(occ, sel, -1)
        pts = rays_o[:, None] + t_all[..., None] * rays_d[:, None]
        density, features, normal = forward_with_normal(
            geo_params, geo_cfg, pts, level_mask)
        density = density * occ_sel[..., None]  # zero out filler samples
        dt = jnp.broadcast_to(((t_far - t_near) / S)[:, None], t_all.shape)
        weights, opacity = _composite(density, dt)
    else:
        # coarse: stratified uniform
        su = (jnp.arange(S1 + 1) / S1)[None, :]
        bins = t_near[:, None] + (t_far - t_near)[:, None] * su  # (R, S1+1)
        if k1 is not None:
            jitter = jax.random.uniform(k1, (R, S1)) / S1
            t_coarse = bins[:, :-1] + (t_far - t_near)[:, None] * jitter
        else:
            t_coarse = 0.5 * (bins[:, :-1] + bins[:, 1:])
        pts_coarse = rays_o[:, None] + t_coarse[..., None] * rays_d[:, None]
        sigma_coarse, _ = forward_field(geo_params, geo_cfg, pts_coarse, level_mask)
        sigma_coarse = jax.lax.stop_gradient(sigma_coarse)
        dt_coarse = jnp.diff(bins, axis=-1)
        w_coarse, _ = _composite(sigma_coarse, dt_coarse)

        # fine: importance resample + merge + sort
        t_fine = sample_pdf(bins, w_coarse, S2, k2)
        t_all = jnp.sort(jnp.concatenate([t_coarse, t_fine], -1), -1)  # (R, S1+S2)
        pts = rays_o[:, None] + t_all[..., None] * rays_d[:, None]
        density, features, normal = forward_with_normal(geo_params, geo_cfg, pts, level_mask)

        dt = jnp.diff(t_all, axis=-1)
        dt = jnp.concatenate([dt, jnp.full_like(dt[:, :1], 1e-3)], -1)
        weights, opacity = _composite(density, dt)

    # shading; n_feature_dims may exceed 3 (latentnerf renders 4 latent
    # channels straight through, latentnerf.py rgb_as_latents path)
    n_ch = bg_color.shape[-1] if hasattr(bg_color, "shape") and bg_color.ndim else 3
    albedo = jax.nn.sigmoid(features[..., :n_ch])
    if material is not None:
        rgb_samples = material.shade(
            albedo, normal, pts, light_positions[:, None, :],
            ambient_ratio=ambient_ratio, shading_normal_only=shading_normal_only,
        )
    else:
        rgb_samples = albedo

    from ...ops.safe_math import safe_normalize

    comp_rgb_fg = (weights[..., None] * rgb_samples).sum(-2)
    depth = (weights * t_all).sum(-1, keepdims=True)
    comp_normal = safe_normalize((weights[..., None] * normal).sum(-2))
    z_mean = depth / jnp.maximum(opacity, 1e-6)
    z_var = (weights * (t_all - z_mean) ** 2).sum(-1, keepdims=True) / jnp.maximum(
        opacity[:, 0], 1e-6
    )[:, None]

    bg = jnp.broadcast_to(bg_color, comp_rgb_fg.shape)
    comp_rgb = comp_rgb_fg + (1.0 - opacity) * bg

    out = {
        "comp_rgb": comp_rgb,
        "comp_rgb_fg": comp_rgb_fg,
        "comp_normal": comp_normal * 0.5 + 0.5,
        "opacity": opacity,
        "depth": depth,
        "z_variance": z_var,
        "weights": weights,
        "normal": normal,
        "t_dirs": jnp.broadcast_to(rays_d[:, None], normal.shape),
    }
    if return_normal_perturb:
        # normals at positions + N(0, 1e-2) noise — the 3d_normal_smooth
        # target (reference nerf_volume_renderer.py:406-411)
        k_pert = rng if rng is not None else jax.random.PRNGKey(0)
        noise = jax.random.normal(k_pert, pts.shape) * 1e-2
        _, _, normal_perturb = forward_with_normal(
            geo_params, geo_cfg, pts + noise, level_mask)
        out["normal_perturb"] = normal_perturb
    return out


def make_image_renderer(geo_cfg, rcfg, material=None, ray_chunk: int = 16384):
    """Render (H, W) images by mapping flat ray chunks (eval path; parity with
    chunk_batch, threestudio/utils/ops.py:113-177)."""

    def render_image(geo_params, rays_o, rays_d, light_position, bg_color,
                     level_mask=None, ambient_ratio=None):
        H, W = rays_o.shape[:2]
        ro = rays_o.reshape(-1, 3)
        rd = rays_d.reshape(-1, 3)
        lp = jnp.broadcast_to(light_position, ro.shape)
        n = ro.shape[0]
        pad = (-n) % ray_chunk
        ro_p = jnp.concatenate([ro, jnp.zeros((pad, 3))], 0)
        rd_p = jnp.concatenate([rd, jnp.ones((pad, 3)) * jnp.asarray([0, 0, 1.0])], 0)
        lp_p = jnp.concatenate([lp, jnp.zeros((pad, 3))], 0)

        def chunk_fn(args):
            o, d, l = args
            out = render_rays(
                geo_params, geo_cfg, rcfg, o, d, l, bg_color, rng=None,
                ambient_ratio=ambient_ratio, level_mask=level_mask,
                material=material,
            )
            return {k: out[k] for k in ("comp_rgb", "comp_normal", "opacity", "depth")}

        chunks = jax.lax.map(
            chunk_fn,
            (ro_p.reshape(-1, ray_chunk, 3), rd_p.reshape(-1, ray_chunk, 3),
             lp_p.reshape(-1, ray_chunk, 3)),
        )
        out = {k: v.reshape(-1, v.shape[-1])[:n].reshape(H, W, -1) for k, v in chunks.items()}
        return out

    from ...ops.hashgrid_pallas import tpu_jit

    # jitted so TPU compiles carry the raised scoped-vmem limit the
    # cell-layout hashgrid kernel needs (validate/export paths reach it)
    return tpu_jit(render_image, static_argnames=("ambient_ratio",))
