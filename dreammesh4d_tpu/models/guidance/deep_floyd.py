"""DeepFloyd-IF guidance (pixel-space SDS), functional JAX.

Parity with threestudio/models/guidance/deep_floyd_guidance.py (~320 lines):
IF-stage-I is a PIXEL-space diffusion model — no VAE; the render is resized
to 64x64, noised directly, and the UNet predicts 6 channels (ε and per-pixel
variance, of which only ε drives SDS).  Text conditioning uses T5-XXL in the
reference; here the prompt-processor abstraction supplies embeddings (hash
fallback or cached), with context_dim 4096 by default.

TPU notes: pixel-space 64² batches are tiny — the whole CFG pair runs as one
2B batch; bf16-safe since no VAE roundtrip."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds

from ...utils.schedule import C_jax
from .stable_diffusion import PromptEmbeddings, StableDiffusionConfig, StableDiffusionGuidance
from .zero123.scheduler import add_noise
from .zero123.unet import UNetModel


@dataclass
class DeepFloydConfig(StableDiffusionConfig):
    guidance_scale: float = 20.0
    context_dim: int = 4096  # T5-XXL hidden size
    image_size: int = 64     # IF stage I resolution
    latent_size: int = 64


@ds.register("deep-floyd-guidance")
class DeepFloydGuidance(StableDiffusionGuidance):
    def __init__(self, cfg: DeepFloydConfig | dict | None = None):
        if isinstance(cfg, dict):
            import dataclasses

            names = {f.name for f in dataclasses.fields(DeepFloydConfig)}
            cfg = DeepFloydConfig(**{k: v for k, v in cfg.items() if k in names})
        cfg = cfg or DeepFloydConfig()
        super().__init__(cfg)
        # pixel-space UNet: 3 -> 6 channels (eps + learned variance)
        self.unet = UNetModel(
            in_channels=3, out_channels=6, model_channels=cfg.model_channels,
            channel_mult=cfg.channel_mult, num_res_blocks=cfg.num_res_blocks,
            num_heads=cfg.num_heads, dtype=cfg.dtype,
        )
        self.vae = None  # pixel space — no VAE

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        c = self.cfg
        return {
            "unet": self.unet.init(
                rng, jnp.zeros((1, c.image_size, c.image_size, 3)), jnp.zeros((1,)),
                jnp.zeros((1, 77, c.context_dim)),
            )["params"],
        }

    def sds_loss(
        self,
        params: Dict[str, Any],
        prompts: PromptEmbeddings,
        rng: jax.Array,
        rgb: jnp.ndarray,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_distances: jnp.ndarray,
        step: jnp.ndarray,
        rgb_as_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg: DeepFloydConfig = self.cfg
        sched = self.schedule
        B = rgb.shape[0]
        S = cfg.image_size
        # pixel-space "latents": resized render in [-1, 1]
        latents = jax.image.resize(rgb, (B, S, S, 3), "bilinear") * 2.0 - 1.0

        cond, uncond = prompts.get(elevation, azimuth)
        context = jnp.concatenate([uncond, cond], 0)

        min_p = C_jax(cfg.min_step_percent, step)
        max_p = C_jax(cfg.max_step_percent, step)
        k_t, k_n = jax.random.split(rng)
        u = jax.random.uniform(k_t, (B,))
        t = (min_p * sched.num_train_timesteps
             + u * (max_p - min_p) * sched.num_train_timesteps).astype(jnp.int32)
        t = jnp.clip(t, 1, sched.num_train_timesteps - 1)

        noise = jax.random.normal(k_n, latents.shape)
        latents_noisy = add_noise(sched, jax.lax.stop_gradient(latents), noise, t)
        x_in = jnp.concatenate([latents_noisy] * 2, 0)
        t_in = jnp.concatenate([t] * 2, 0)
        out = self.unet.apply({"params": params["unet"]}, x_in, t_in, context)
        eps_all = out[..., :3]  # drop the learned-variance channels
        eps_u, eps_c = jnp.split(eps_all, 2, 0)
        eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)

        grad = self._weight(t) * (eps - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss = 0.5 * ((latents - target) ** 2).sum() / B
        return {"loss_sds": loss, "grad_norm": jnp.linalg.norm(grad)}
