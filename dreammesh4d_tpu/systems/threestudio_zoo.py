"""threestudio systems zoo: dreamfusion / prolificdreamer / magic123.

Functional redesigns of the reference Lightning systems (each a train-step
factory, same pattern as zero123_system.py):

- ``dreamfusion-system`` (threestudio/systems/dreamfusion.py:15-180):
  text-to-3D — random-camera renders driven by SD SDS plus the
  orient/sparsity/opaque regularizer family.
- ``prolificdreamer-system`` (threestudio/systems/prolificdreamer.py):
  VSD guidance with TWO optimizers stepped inside ONE jitted step — the
  scene from loss_vsd, the LoRA phi-model from loss_lora (the reference
  alternates two torch optimizers; here both gradients come from one
  backward of the shared computation graph).
- ``magic123-system`` (threestudio/systems/magic123.py:16-210):
  image-to-3D — reference-view RGB+mask losses plus BOTH 2D (SD) and 3D
  (zero123) SDS with independent weights.

Each factory takes guidance CLOSURES (rng, rgb_image, batch) -> scalar (or a
dict for VSD) so systems stay decoupled from guidance internals and the whole
step jits as one XLA program.
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


def _regularizers(out, terms: Dict[str, jnp.ndarray]) -> None:
    """Shared orient/sparsity/opaque family (dreamfusion.py:120-150)."""
    w_det = jax.lax.stop_gradient(out["weights"])
    ndotd = (out["normal"] * out["t_dirs"]).sum(-1)
    n_opaque = jnp.maximum((out["opacity"] > 0).sum(), 1)
    terms["orient"] = (w_det * jnp.clip(ndotd, 0.0) ** 2).sum() / n_opaque
    terms["sparsity"] = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
    oc = jnp.clip(out["opacity"], 1e-3, 1 - 1e-3)
    terms["opaque"] = binary_cross_entropy(oc, oc)


def _total(terms, weights_map, step):
    total = jnp.zeros((), jnp.float32)
    for name, value in terms.items():
        total = total + C_jax(weights_map[name], step) * value
    metrics = {f"loss_{k}": v for k, v in terms.items()}
    metrics["loss_total"] = total
    return total, metrics


# ---------------------------------------------------------------------------
# dreamfusion-system
# ---------------------------------------------------------------------------


@dataclass
class DreamFusionLosses:
    lambda_sds: Any = 1.0
    lambda_orient: Any = field(default_factory=lambda: [0, 10.0, 1000.0, 5000])
    lambda_sparsity: Any = 1.0
    lambda_opaque: Any = 0.0
    # HiFA z-variance hook (eff_dreamfusion.py:96-99); 0 disables
    lambda_z_variance: Any = 0.0


class SceneTrainState(NamedTuple):
    geo_params: Any
    opt_state: Any
    step: jnp.ndarray


def init_scene_state(geo_params, optimizer) -> SceneTrainState:
    return SceneTrainState(geo_params, optimizer.init(geo_params), jnp.zeros((), jnp.int32))


def make_dreamfusion_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    losses: DreamFusionLosses,
    guidance_fn: Callable,
    material=None,
    bg_color=(1.0, 1.0, 1.0),
):
    """batch: ``rays_o/rays_d`` (B,H,W,3), ``light_positions`` (B,3) +
    guidance keys (elevation/azimuth/camera_distances)."""
    bg = jnp.asarray(bg_color, jnp.float32)

    def loss_fn(geo_params, batch, rng, step):
        k_r, k_g = jax.random.split(rng)
        B, H, W = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], H * W, axis=0)
        out = render_rays(geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k_r,
                          material=material)
        rgb = out["comp_rgb"].reshape(B, H, W, 3)
        terms: Dict[str, jnp.ndarray] = {"sds": guidance_fn(k_g, rgb, batch)}
        _regularizers(out, terms)
        return _total(terms, {
            "sds": losses.lambda_sds, "orient": losses.lambda_orient,
            "sparsity": losses.lambda_sparsity, "opaque": losses.lambda_opaque,
        }, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("dreamfusion-system")
class DreamFusionSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# prolificdreamer-system (VSD, two optimizers in one step)
# ---------------------------------------------------------------------------


@dataclass
class ProlificDreamerLosses(DreamFusionLosses):
    lambda_vsd: Any = 1.0
    lambda_lora: Any = 1.0


class VSDTrainState(NamedTuple):
    geo_params: Any
    lora_params: Any
    opt_state: Any
    lora_opt_state: Any
    step: jnp.ndarray


def init_vsd_state(geo_params, lora_params, optimizer, lora_optimizer) -> VSDTrainState:
    return VSDTrainState(geo_params, lora_params, optimizer.init(geo_params),
                         lora_optimizer.init(lora_params), jnp.zeros((), jnp.int32))


def make_prolificdreamer_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    lora_optimizer: optax.GradientTransformation,
    losses: ProlificDreamerLosses,
    vsd_fn: Callable,
    material=None,
    bg_color=(1.0, 1.0, 1.0),
):
    """``vsd_fn(lora_params, rng, rgb_image, batch) -> {"loss_vsd",
    "loss_lora", ...}`` — e.g. a closure over VSDGuidance.vsd_loss."""
    bg = jnp.asarray(bg_color, jnp.float32)

    def render(geo_params, batch, k):
        B, H, W = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], H * W, axis=0)
        out = render_rays(geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k,
                          material=material)
        return out, out["comp_rgb"].reshape(B, H, W, 3)

    def loss_fn(geo_params, lora_params, batch, rng, step):
        k_r, k_g = jax.random.split(rng)
        out, rgb = render(geo_params, batch, k_r)
        g = vsd_fn(lora_params, k_g, rgb, batch)
        terms: Dict[str, jnp.ndarray] = {"vsd": g["loss_vsd"], "lora": g["loss_lora"]}
        _regularizers(out, terms)
        return _total(terms, {
            "vsd": losses.lambda_vsd, "lora": losses.lambda_lora,
            "orient": losses.lambda_orient, "sparsity": losses.lambda_sparsity,
            "opaque": losses.lambda_opaque,
        }, step)

    @jax.jit
    def train_step(state: VSDTrainState, batch, rng):
        (loss, metrics), (g_geo, g_lora) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.geo_params, state.lora_params, batch, rng, state.step)
        up_g, opt_g = optimizer.update(g_geo, state.opt_state, state.geo_params)
        up_l, opt_l = lora_optimizer.update(g_lora, state.lora_opt_state, state.lora_params)
        return (VSDTrainState(
            optax.apply_updates(state.geo_params, up_g),
            optax.apply_updates(state.lora_params, up_l),
            opt_g, opt_l, state.step + 1), metrics)

    return train_step


@ds.register("prolificdreamer-system")
class ProlificDreamerSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# magic123-system (image-to-3D, joint 2D + 3D SDS)
# ---------------------------------------------------------------------------


@dataclass
class Magic123Losses:
    lambda_sds_2d: Any = 0.025
    lambda_sds_3d: Any = 1.0
    lambda_rgb: Any = 1000.0
    lambda_mask: Any = 100.0
    lambda_normal_smooth: Any = 4.0
    lambda_orient: Any = 1.0
    lambda_sparsity: Any = 0.5
    lambda_opaque: Any = 0.5


def make_magic123_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    losses: Magic123Losses,
    guidance_2d_fn: Optional[Callable] = None,
    guidance_3d_fn: Optional[Callable] = None,
    material=None,
    bg_color=(1.0, 1.0, 1.0),
):
    """batch: ref keys (``ref_rays_o/d`` (R,3), ``ref_rgb`` (R,3),
    ``ref_mask`` (R,1), ``ref_light`` (3,)) + rand keys as in dreamfusion."""
    bg = jnp.asarray(bg_color, jnp.float32)

    def loss_fn(geo_params, batch, rng, step):
        terms: Dict[str, jnp.ndarray] = {}
        k_ref, k_r, k_g2, k_g3 = jax.random.split(rng, 4)

        ref_out = render_rays(
            geo_params, geo_cfg, rcfg, batch["ref_rays_o"], batch["ref_rays_d"],
            jnp.broadcast_to(batch["ref_light"], batch["ref_rays_o"].shape),
            bg, k_ref, material=material)
        gt_mask = batch["ref_mask"]
        gt_rgb = batch["ref_rgb"] * gt_mask
        terms["rgb"] = ((gt_rgb - ref_out["comp_rgb"] * gt_mask) ** 2).mean()
        terms["mask"] = ((gt_mask - ref_out["opacity"]) ** 2).mean()

        B, H, W = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], H * W, axis=0)
        out = render_rays(geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k_r,
                          material=material)
        rgb = out["comp_rgb"].reshape(B, H, W, 3)
        if guidance_2d_fn is not None:
            terms["sds_2d"] = guidance_2d_fn(k_g2, rgb, batch)
        if guidance_3d_fn is not None:
            terms["sds_3d"] = guidance_3d_fn(k_g3, rgb, batch)

        normal_img = out["comp_normal"].reshape(B, H, W, 3)
        terms["normal_smooth"] = ((normal_img[:, 1:] - normal_img[:, :-1]) ** 2).mean() \
            + ((normal_img[:, :, 1:] - normal_img[:, :, :-1]) ** 2).mean()
        _regularizers(out, terms)
        return _total(terms, {
            "sds_2d": losses.lambda_sds_2d, "sds_3d": losses.lambda_sds_3d,
            "rgb": losses.lambda_rgb, "mask": losses.lambda_mask,
            "normal_smooth": losses.lambda_normal_smooth,
            "orient": losses.lambda_orient, "sparsity": losses.lambda_sparsity,
            "opaque": losses.lambda_opaque,
        }, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("magic123-system")
class Magic123System:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# efficient-dreamfusion-system (subsampled-ray SDS)
# ---------------------------------------------------------------------------


def make_eff_dreamfusion_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    losses: DreamFusionLosses,
    guidance_fn: Callable,
    full_hw: int,
    material=None,
    bg_color=(1.0, 1.0, 1.0),
):
    """Efficiency variant (threestudio/systems/eff_dreamfusion.py:16-104):
    only a strided subgrid of rays is rendered (the ``uncond_eff`` sampler,
    data/uncond.py sample_efficient) and the low-res render is bilinearly
    upsampled back to ``full_hw`` before SDS — the reference's ``unmask``
    grid_sample with a regular stride mask reduces to exactly this resize.
    Regularizers act on the rendered (subsampled) rays; an optional
    z-variance term (HiFA) matches the reference's extra loss hook."""
    bg = jnp.asarray(bg_color, jnp.float32)

    def loss_fn(geo_params, batch, rng, step):
        k_r, k_g = jax.random.split(rng)
        B, sH, sW = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], sH * sW, axis=0)
        out = render_rays(geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k_r,
                          material=material)
        low = out["comp_rgb"].reshape(B, sH, sW, 3)
        rgb = jax.image.resize(low, (B, full_hw, full_hw, 3), "bilinear")
        terms: Dict[str, jnp.ndarray] = {"sds": guidance_fn(k_g, rgb, batch)}
        _regularizers(out, terms)
        weights = {
            "sds": losses.lambda_sds, "orient": losses.lambda_orient,
            "sparsity": losses.lambda_sparsity, "opaque": losses.lambda_opaque,
        }
        if "z_variance" in out and getattr(losses, "lambda_z_variance", 0.0):
            zmask = (out["opacity"].reshape(-1) > 0.5).astype(jnp.float32)
            terms["z_variance"] = (out["z_variance"].reshape(-1) * zmask).sum() / \
                jnp.maximum(zmask.sum(), 1.0)
            weights["z_variance"] = losses.lambda_z_variance
        return _total(terms, weights, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("efficient-dreamfusion-system")
class EfficientDreamFusionSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# image-condition-dreamfusion-system (single ref image + text SDS)
# ---------------------------------------------------------------------------


@ds.register("image-condition-dreamfusion-system")
class ImageConditionDreamFusionSystem:
    """Reference-image supervision (rgb/mask on the ref camera, the zero123
    ref-loss family) + a single text-conditioned SDS on random cameras
    (threestudio/systems/imagedreamfusion.py:16-290).  The train step is the
    magic123 factory with the 3D guidance slot unused — the loss surface is
    identical with ``lambda_sds_3d = 0``."""

    def __init__(self, cfg):
        self.cfg = cfg

    @staticmethod
    def make_train_step(geo_cfg, rcfg, optimizer, losses: "Magic123Losses",
                        guidance_fn: Callable, material=None,
                        bg_color=(1.0, 1.0, 1.0)):
        return make_magic123_train_step(
            geo_cfg, rcfg, optimizer, losses,
            guidance_2d_fn=guidance_fn, guidance_3d_fn=None,
            material=material, bg_color=bg_color)
