"""zero123-system: static NeRF generation stage as one jitted train step.

Functional redesign of the reference Lightning system
(threestudio/systems/zero123.py:17-390) with the stable-zero123 losses
(configs/stable-zero123.yaml:116-127):

- ref substep: rgb·mask MSE + mask MSE on the reference view;
- rand substep: Zero123 SDS (pluggable guidance) on random cameras;
- regularizers: 2D normal smoothness, orientation loss
  (Σ w·max(n·d,0)² / #opaque, zero123.py:172-185), sparsity
  sqrt(o²+0.01), opacity BCE(o,o) (zero123.py:187-194);
- loss weights are C() schedules of the traced step.

Rays are pre-generated host-side by the data modules; the step consumes flat
(R,3) ray bundles for the ref view and (B,H,W,3) bundles for random views.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

import dreammesh4d_tpu as ds

from ..models.geometry.implicit_volume import ImplicitVolumeConfig
from ..models.renderers.nerf_volume_renderer import NeRFRendererConfig, render_rays
from ..ops.cameras import binary_cross_entropy
from ..utils.schedule import C_jax


@dataclass
class Zero123Losses:
    lambda_sds: Any = 0.1
    lambda_rgb: Any = field(default_factory=lambda: [100, 500.0, 1000.0, 400])
    lambda_mask: Any = 50.0
    lambda_depth: Any = 0.0  # lstsq-aligned ref depth MSE (zero123.py:103-113)
    lambda_depth_rel: Any = 0.0  # 1 - Pearson (zero123.py:115-121)
    lambda_normal: Any = 0.0  # ref normal cosine (zero123.py:123-133)
    lambda_normal_smooth: Any = field(default_factory=lambda: [100, 7.0, 5.0, 150, 10.0, 200])
    # ACTIVE schedule in the reference config (stable-zero123.yaml:124)
    lambda_3d_normal_smooth: Any = field(default_factory=lambda: [100, 7.0, 5.0, 150, 10.0, 200])
    lambda_orient: Any = 1.0
    lambda_sparsity: Any = 0.5
    lambda_opaque: Any = 0.5


def masked_lstsq_depth_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                            mask: jnp.ndarray) -> jnp.ndarray:
    """Least-squares-align gt depth to pred inside the mask, then MSE
    (zero123.py:104-113) — static-shape weighted normal equations instead of
    boolean indexing + torch.linalg.lstsq."""
    m = mask.reshape(-1)
    p = pred.reshape(-1)
    g = gt.reshape(-1)
    n = jnp.maximum(m.sum(), 1.0)
    # solve min ||m ⊙ ([g, 1] X − p)||²: 2x2 normal equations
    sgg = (m * g * g).sum()
    sg = (m * g).sum()
    sgp = (m * g * p).sum()
    sp = (m * p).sum()
    det = sgg * n - sg * sg
    det = jnp.where(jnp.abs(det) < 1e-8, 1.0, det)
    a = (sgp * n - sg * sp) / det
    b = (sgg * sp - sg * sgp) / det
    aligned = jax.lax.stop_gradient(a) * g + jax.lax.stop_gradient(b)
    return (m * (aligned - p) ** 2).sum() / n


def masked_pearson(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Pearson correlation over the masked pixels (torchmetrics parity)."""
    m = mask.reshape(-1)
    p = pred.reshape(-1)
    g = gt.reshape(-1)
    n = jnp.maximum(m.sum(), 1.0)
    mp = (m * p).sum() / n
    mg = (m * g).sum() / n
    cov = (m * (p - mp) * (g - mg)).sum()
    vp = (m * (p - mp) ** 2).sum()
    vg = (m * (g - mg) ** 2).sum()
    return cov / jnp.sqrt(jnp.maximum(vp * vg, 1e-8))


class NeRFTrainState(NamedTuple):
    geo_params: Any
    opt_state: Any
    step: jnp.ndarray


def init_nerf_state(geo_params, optimizer) -> NeRFTrainState:
    return NeRFTrainState(geo_params, optimizer.init(geo_params), jnp.zeros((), jnp.int32))


def make_zero123_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    losses: Zero123Losses,
    material=None,
    guidance_fn: Optional[Callable] = None,
    bg_color=(1.0, 1.0, 1.0),
    rand_hw: int = 64,
):
    """batch layout:
    - ``ref_rays_o/ref_rays_d`` (R, 3) flat ref-view rays, ``ref_rgb`` (R,3),
      ``ref_mask`` (R,1), ``ref_light`` (3,)
    - ``rand_rays_o/rand_rays_d`` (B, H, W, 3), ``light_positions`` (B,3)
      + guidance keys (elevation/azimuth/camera_distances)
    """
    bg = jnp.asarray(bg_color, jnp.float32)
    from ..utils.schedule import C_max

    need_depth = C_max(losses.lambda_depth) > 0
    need_depth_rel = C_max(losses.lambda_depth_rel) > 0
    need_normal = C_max(losses.lambda_normal) > 0
    need_3d_smooth = C_max(losses.lambda_3d_normal_smooth) > 0

    def loss_fn(geo_params, batch, rng, step, level_mask, ambient_ratio, gstate,
                occ_state=None):
        terms: Dict[str, jnp.ndarray] = {}
        k_ref, k_rand, k_guid = jax.random.split(rng, 3)

        # --- ref substep ---------------------------------------------------
        ref_out = render_rays(
            geo_params, geo_cfg, rcfg, batch["ref_rays_o"], batch["ref_rays_d"],
            jnp.broadcast_to(batch["ref_light"], batch["ref_rays_o"].shape),
            bg, k_ref, ambient_ratio=ambient_ratio, level_mask=level_mask,
            material=material, occ_state=occ_state,
        )
        gt_mask = batch["ref_mask"]
        gt_rgb = batch["ref_rgb"] * gt_mask
        terms["rgb"] = ((gt_rgb - ref_out["comp_rgb"] * gt_mask) ** 2).mean()
        terms["mask"] = ((gt_mask - ref_out["opacity"]) ** 2).mean()

        # ref depth / normal supervision (zero123.py:103-133), masked
        # static-shape formulations (no boolean indexing under jit)
        if need_depth:
            terms["depth"] = masked_lstsq_depth_loss(
                ref_out["depth"], batch["ref_depth"], gt_mask)
        if need_depth_rel:
            terms["depth_rel"] = 1.0 - masked_pearson(
                ref_out["depth"], batch["ref_depth"], gt_mask)
        if need_normal:
            gt_n = 1.0 - 2.0 * batch["ref_normal"].reshape(-1, 3)
            pred_n = 2.0 * ref_out["comp_normal"].reshape(-1, 3) - 1.0
            cos = (gt_n * pred_n).sum(-1) / (
                jnp.linalg.norm(gt_n, axis=-1) * jnp.linalg.norm(pred_n, axis=-1)
                + 1e-8)
            m = gt_mask.reshape(-1)
            terms["normal"] = 1.0 - (m * cos).sum() / jnp.maximum(m.sum(), 1.0)

        # --- rand substep --------------------------------------------------
        B, H, W = batch["rand_rays_o"].shape[:3]
        ro = batch["rand_rays_o"].reshape(-1, 3)
        rd = batch["rand_rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], H * W, axis=0)
        rand_out = render_rays(
            geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k_rand,
            ambient_ratio=ambient_ratio, level_mask=level_mask, material=material,
            return_normal_perturb=need_3d_smooth, occ_state=occ_state,
        )
        rgb_img = rand_out["comp_rgb"].reshape(B, H, W, 3)
        if guidance_fn is not None:
            terms["sds"] = guidance_fn(gstate, k_guid, rgb_img,
                                       {**batch, "step": step})

        normal_img = rand_out["comp_normal"].reshape(B, H, W, 3)
        terms["normal_smooth"] = (
            (normal_img[:, 1:] - normal_img[:, :-1]) ** 2
        ).mean() + ((normal_img[:, :, 1:] - normal_img[:, :, :-1]) ** 2).mean()
        if need_3d_smooth:
            terms["3d_normal_smooth"] = jnp.abs(
                rand_out["normal"] - rand_out["normal_perturb"]).mean()

        w_det = jax.lax.stop_gradient(rand_out["weights"])
        ndotd = (rand_out["normal"] * rand_out["t_dirs"]).sum(-1)
        n_opaque = jnp.maximum((rand_out["opacity"] > 0).sum(), 1)
        terms["orient"] = (w_det * jnp.clip(ndotd, 0.0) ** 2).sum() / n_opaque
        terms["sparsity"] = jnp.sqrt(rand_out["opacity"] ** 2 + 0.01).mean()
        oc = jnp.clip(rand_out["opacity"], 1e-3, 1 - 1e-3)
        terms["opaque"] = binary_cross_entropy(oc, oc)

        weights_map = {
            "sds": losses.lambda_sds, "rgb": losses.lambda_rgb,
            "mask": losses.lambda_mask, "normal_smooth": losses.lambda_normal_smooth,
            "depth": losses.lambda_depth, "depth_rel": losses.lambda_depth_rel,
            "normal": losses.lambda_normal,
            "3d_normal_smooth": losses.lambda_3d_normal_smooth,
            "orient": losses.lambda_orient, "sparsity": losses.lambda_sparsity,
            "opaque": losses.lambda_opaque,
        }
        total = jnp.zeros((), jnp.float32)
        for name, value in terms.items():
            total = total + C_jax(weights_map[name], step) * value
        metrics = {f"loss_{k}": v for k, v in terms.items()}
        metrics["loss_total"] = total
        metrics["psnr"] = -10.0 * jnp.log10(terms["rgb"] + 1e-8)
        return total, metrics

    from ..ops.hashgrid_pallas import tpu_jit

    @tpu_jit
    def train_step(state: NeRFTrainState, batch, rng, level_mask, ambient_ratio,
                   guidance_state=None, occ_state=None):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step, level_mask, ambient_ratio,
            guidance_state, occ_state
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        geo_params = optax.apply_updates(state.geo_params, updates)
        return NeRFTrainState(geo_params, opt_state, state.step + 1), metrics

    return train_step

