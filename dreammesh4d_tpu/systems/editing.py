"""Editing systems: instructnerf2nerf + control4d.

- ``instructnerf2nerf-system`` (threestudio/systems/instructnerf2nerf.py):
  iterative-dataset-update editing — a NeRF is photometrically fitted to a
  view dataset whose images are PERIODICALLY REPLACED by InstructPix2Pix
  edits of the current renders (L1 + perceptual losses against the edited
  set).  ``ip2p_edit_images`` runs the partial-noising DDIM edit with the
  three-way CFG; ``make_in2n_train_step`` is the photometric step.
- ``control4d-system`` (threestudio/systems/control4d.py): GAN-driven
  editing — the gan-volume-renderer's super-resolved output trains against
  edited images with L1 + perceptual + hinge-GAN losses; generator and
  discriminator update from ONE jitted step (two optimizers, argnums grads,
  same pattern as the VSD system).

Dataset editing runs on-device but OUTSIDE the train jit (it happens every
``per_editing_step``s on one view, exactly like the reference)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

import dreammesh4d_tpu as ds

from ..models.guidance.instructpix2pix import InstructPix2PixGuidance
from ..models.guidance.zero123.scheduler import add_noise, ddim_step
from ..utils.gan import discriminator_loss, generator_loss
from ..utils.schedule import C_jax
from .threestudio_zoo import _total


# ---------------------------------------------------------------------------
# InstructPix2Pix DDIM image editing (in2n dataset update)
# ---------------------------------------------------------------------------


def ip2p_edit_images(
    guidance: InstructPix2PixGuidance,
    params,
    prompts,
    rng: jax.Array,
    rgb: jnp.ndarray,
    cond_rgb: jnp.ndarray,
    elevation: jnp.ndarray,
    azimuth: jnp.ndarray,
    diffusion_steps: int = 20,
    edit_t: float = 0.7,
) -> jnp.ndarray:
    """Edit ``rgb`` toward the instruction: partially noise the latents to
    ``edit_t`` of the schedule, then DDIM-denoise with the ip2p three-way
    CFG (instructnerf2nerf's edit_image; in2n paper Sec. 3.2)."""
    cfg = guidance.cfg
    sched = guidance.schedule
    B = rgb.shape[0]
    latents = guidance.encode_images(params, rgb)
    cond_latents = guidance.encode_images(params, cond_rgb) / 0.18215
    cond, uncond = prompts.get(elevation, azimuth)
    ctx = jnp.concatenate([cond, uncond, uncond], 0)

    t_start = int(edit_t * (sched.num_train_timesteps - 1))
    ts = jnp.linspace(t_start, 1, diffusion_steps).astype(jnp.int32)
    k_n, _ = jax.random.split(rng)
    noise = jax.random.normal(k_n, latents.shape)
    x = add_noise(sched, latents, noise, jnp.full((B,), t_start, jnp.int32))

    zeros_img = jnp.zeros_like(cond_latents)

    def body(i, x):
        t = jnp.full((B,), ts[i], jnp.int32)
        x_in = jnp.concatenate([
            jnp.concatenate([x, cond_latents], -1),
            jnp.concatenate([x, cond_latents], -1),
            jnp.concatenate([x, zeros_img], -1),
        ], 0)
        eps = guidance.unet.apply({"params": params["unet"]}, x_in,
                                  jnp.concatenate([t] * 3, 0), ctx)
        e_full, e_img, e_un = jnp.split(eps, 3, 0)
        eps_hat = (e_un + cfg.guidance_scale * (e_full - e_img)
                   + cfg.condition_scale * (e_img - e_un))
        t_prev = jnp.where(i + 1 < diffusion_steps,
                           ts[jnp.minimum(i + 1, diffusion_steps - 1)], 0)
        return ddim_step(sched, x, eps_hat, t, jnp.full((B,), t_prev, jnp.int32))

    x = jax.lax.fori_loop(0, diffusion_steps, body, x)
    from ..models.guidance.zero123.vae import AutoencoderKL

    img = guidance.vae.apply({"params": params["vae"]}, x / 0.18215,
                             method=AutoencoderKL.decode)
    return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)


@dataclass
class In2NLosses:
    lambda_l1: Any = 10.0
    lambda_p: Any = 10.0  # perceptual


class In2NState(NamedTuple):
    geo_params: Any
    opt_state: Any
    step: jnp.ndarray


def make_in2n_train_step(
    render_fn: Callable,
    optimizer: optax.GradientTransformation,
    losses: In2NLosses,
    perceptual_fn: Optional[Callable] = None,
):
    """``render_fn(geo_params, batch, rng) -> (B, H, W, 3)``;
    ``batch["edited_rgb"]`` is the current edited dataset view(s).  The
    caller swaps edited images between steps (iterative dataset update)."""

    def loss_fn(geo_params, batch, rng, step):
        rgb = render_fn(geo_params, batch, rng)
        gt = batch["edited_rgb"]
        terms: Dict[str, jnp.ndarray] = {"l1": jnp.abs(rgb - gt).mean()}
        weights = {"l1": losses.lambda_l1}
        if perceptual_fn is not None:
            terms["p"] = perceptual_fn(rgb, gt).mean()
            weights["p"] = losses.lambda_p
        return _total(terms, weights, step)

    @jax.jit
    def train_step(state: In2NState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (In2NState(optax.apply_updates(state.geo_params, updates),
                          opt_state, state.step + 1), metrics)

    return train_step


@ds.register("instructnerf2nerf-system")
class InstructNeRF2NeRFSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# control4d-system
# ---------------------------------------------------------------------------


@dataclass
class Control4DLosses:
    lambda_l1: Any = 10.0
    lambda_p: Any = 10.0
    lambda_G: Any = 1.0  # generator hinge
    lambda_D: Any = 1.0  # discriminator hinge


class Control4DState(NamedTuple):
    scene_params: Any   # geometry + generator/encoders
    disc_params: Any
    opt_state: Any
    disc_opt_state: Any
    step: jnp.ndarray


def init_control4d_state(scene_params, disc_params, optimizer, disc_optimizer):
    return Control4DState(scene_params, disc_params, optimizer.init(scene_params),
                          disc_optimizer.init(disc_params), jnp.zeros((), jnp.int32))


def make_control4d_train_step(
    render_fn: Callable,
    optimizer: optax.GradientTransformation,
    disc_optimizer: optax.GradientTransformation,
    losses: Control4DLosses,
    perceptual_fn: Optional[Callable] = None,
):
    """``render_fn(scene_params, batch, rng) -> {"comp_gan_rgb", ...}`` (the
    gan-volume-renderer closure).  batch["edited_rgb"] = edited targets.
    One jitted step updates the scene/generator AND the discriminator
    (control4d.py alternates optimizers inside one lightning step)."""

    def loss_fn(scene_params, disc_params, batch, rng, step):
        out = render_fn(scene_params, batch, rng)
        fake = out["comp_gan_rgb"]
        gt = batch["edited_rgb"]
        terms: Dict[str, jnp.ndarray] = {"l1": jnp.abs(fake - gt).mean()}
        weights = {"l1": losses.lambda_l1}
        if perceptual_fn is not None:
            terms["p"] = perceptual_fn(fake, gt).mean()
            weights["p"] = losses.lambda_p
        # generator sees a frozen discriminator
        terms["G"] = generator_loss(
            jax.tree_util.tree_map(jax.lax.stop_gradient, disc_params), fake)
        weights["G"] = losses.lambda_G
        # discriminator hinge on detached images
        terms["D"] = discriminator_loss(disc_params, gt, fake)
        weights["D"] = losses.lambda_D
        return _total(terms, weights, step)

    @jax.jit
    def train_step(state: Control4DState, batch, rng):
        (loss, metrics), (g_scene, g_disc) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
            state.scene_params, state.disc_params, batch, rng, state.step)
        up_s, opt_s = optimizer.update(g_scene, state.opt_state, state.scene_params)
        up_d, opt_d = disc_optimizer.update(g_disc, state.disc_opt_state, state.disc_params)
        return (Control4DState(
            optax.apply_updates(state.scene_params, up_s),
            optax.apply_updates(state.disc_params, up_d),
            opt_s, opt_d, state.step + 1), metrics)

    return train_step


@ds.register("control4d-multiview-system")  # reference name (control4d_multiview.py:21)
@ds.register("control4d-system")
class Control4DSystem:
    def __init__(self, cfg):
        self.cfg = cfg
