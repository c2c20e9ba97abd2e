"""InstructPix2Pix guidance (image-editing SDS), functional JAX.

Parity with threestudio/models/guidance/instructpix2pix_guidance.py (~350
lines): the UNet takes 8 latent channels (4 noisy + 4 conditioning image
latents) and the score uses THREE-way classifier-free guidance —

    ε = ε(∅,∅) + s_text·(ε(c_img,c_txt) − ε(c_img,∅)) + s_img·(ε(c_img,∅) − ε(∅,∅))

Used by editing systems (instructnerf2nerf style); part of the guidance zoo
surface, not the DreamMesh4D path.  All three branches batch through ONE
UNet call (3B batch) so the MXU sees a single large matmul stream."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds

from ...utils.schedule import C_jax
from .stable_diffusion import LATENT_SCALE, PromptEmbeddings, StableDiffusionConfig, StableDiffusionGuidance
from .zero123.scheduler import add_noise
from .zero123.unet import UNetModel
from .zero123.vae import AutoencoderKL


@dataclass
class InstructPix2PixConfig(StableDiffusionConfig):
    guidance_scale: float = 7.5        # text scale
    condition_scale: float = 1.5       # image scale
    fixed_size: int = -1


@ds.register("stable-diffusion-instructpix2pix-guidance")
class InstructPix2PixGuidance(StableDiffusionGuidance):
    def __init__(self, cfg: InstructPix2PixConfig | dict | None = None):
        if isinstance(cfg, dict):
            import dataclasses

            names = {f.name for f in dataclasses.fields(InstructPix2PixConfig)}
            cfg = InstructPix2PixConfig(**{k: v for k, v in cfg.items() if k in names})
        cfg = cfg or InstructPix2PixConfig()
        super().__init__(cfg)
        # 8-channel input UNet (latents + image-conditioning latents)
        self.unet = UNetModel(
            in_channels=8, out_channels=4, model_channels=cfg.model_channels,
            channel_mult=cfg.channel_mult, num_res_blocks=cfg.num_res_blocks,
            num_heads=cfg.num_heads, dtype=cfg.dtype,
        )

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        c = self.cfg
        k1, k2 = jax.random.split(rng)
        L, S = c.latent_size, c.image_size
        return {
            "unet": self.unet.init(
                k1, jnp.zeros((1, L, L, 8)), jnp.zeros((1,)),
                jnp.zeros((1, 77, c.context_dim)),
            )["params"],
            "vae": self.vae.init(k2, jnp.zeros((1, S, S, 3)))["params"],
        }

    def edit_loss(
        self,
        params: Dict[str, Any],
        prompts: PromptEmbeddings,
        rng: jax.Array,
        rgb: jnp.ndarray,
        cond_rgb: jnp.ndarray,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        step: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """SDS-style editing loss: pull renders ``rgb`` toward the edit of
        the (stop-gradient) condition images ``cond_rgb`` described by the
        instruction prompt (instructpix2pix_guidance.py compute_grad_sds)."""
        cfg: InstructPix2PixConfig = self.cfg
        sched = self.schedule
        B = rgb.shape[0]
        latents = self.encode_images(params, rgb)
        # image conditioning uses the VAE mode WITHOUT the latent scale
        # (diffusers prepare_image_latents convention)
        cond_latents = self.encode_images(params, jax.lax.stop_gradient(cond_rgb)) / LATENT_SCALE

        cond, uncond = prompts.get(elevation, azimuth)

        min_p = C_jax(cfg.min_step_percent, step)
        max_p = C_jax(cfg.max_step_percent, step)
        k_t, k_n = jax.random.split(rng)
        u = jax.random.uniform(k_t, (B,))
        t = (min_p * sched.num_train_timesteps
             + u * (max_p - min_p) * sched.num_train_timesteps).astype(jnp.int32)
        t = jnp.clip(t, 1, sched.num_train_timesteps - 1)

        noise = jax.random.normal(k_n, latents.shape)
        latents_noisy = add_noise(sched, jax.lax.stop_gradient(latents), noise, t)

        # three CFG branches in one batch:
        #   [full (img+txt) | img-only | unconditional]
        zeros_img = jnp.zeros_like(cond_latents)
        x_in = jnp.concatenate([
            jnp.concatenate([latents_noisy, cond_latents], -1),
            jnp.concatenate([latents_noisy, cond_latents], -1),
            jnp.concatenate([latents_noisy, zeros_img], -1),
        ], 0)
        t_in = jnp.concatenate([t] * 3, 0)
        ctx = jnp.concatenate([cond, uncond, uncond], 0)
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        e_full, e_img, e_un = jnp.split(eps, 3, 0)
        eps_hat = (e_un
                   + cfg.guidance_scale * (e_full - e_img)
                   + cfg.condition_scale * (e_img - e_un))

        grad = self._weight(t) * (eps_hat - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss = 0.5 * ((latents - target) ** 2).sum() / B
        return {"loss_sds": loss, "grad_norm": jnp.linalg.norm(grad)}
