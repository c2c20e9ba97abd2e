"""Variational Score Distillation guidance (ProlificDreamer VSD).

Parity with threestudio/models/guidance/stable_diffusion_vsd_guidance.py
(~550 lines): a frozen pretrained SD UNet provides the score of the target
distribution; a LoRA-adapted copy (the "phi" model) is trained online on the
current renders to model the score of the render distribution; the scene
gradient is w(t) · (ε_pretrained_cfg − ε_phi).

TPU-first design notes:
- The phi model is NOT a second network: LoRA deltas (A·B, B zero-init) are
  merged functionally into the frozen param tree right before ``apply`` —
  one fused tree-map of small matmuls, no module surgery, fully jittable,
  and both UNet calls batch through the same compiled kernel.
- Camera conditioning of phi (the reference flattens the c2w into the LoRA
  UNet's class embedding, vsd_guidance.py ``camera_condition``) is a learned
  projection of the flattened extrinsics APPENDED AS AN EXTRA CONTEXT TOKEN
  — same information path, no architecture fork of the UNet.
- Both the VSD loss (scene update) and the LoRA diffusion loss (phi update)
  are returned from one call so a single jitted train step can drive the
  two optimizers (the reference alternates optimizers inside one step too).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds

from ...utils.schedule import C_jax
from .stable_diffusion import (
    LATENT_SCALE,
    PromptEmbeddings,
    StableDiffusionConfig,
    StableDiffusionGuidance,
)
from .zero123.scheduler import add_noise

# kernels that receive LoRA adapters: the attention projections, matching
# the diffusers LoRAAttnProcessor set the reference trains (vsd_guidance.py)
_LORA_LEAVES = ("to_q", "to_k", "to_v", "to_out")


def _iter_lora_paths(params: Dict[str, Any], prefix=()):
    for k, v in params.items():
        if isinstance(v, dict):
            if k in _LORA_LEAVES and "kernel" in v:
                yield prefix + (k,), v["kernel"].shape
            else:
                yield from _iter_lora_paths(v, prefix + (k,))


@dataclass
class VSDConfig(StableDiffusionConfig):
    guidance_scale: float = 7.5
    guidance_scale_lora: float = 1.0
    lora_rank: int = 8
    lora_alpha: float = 1.0
    camera_condition_type: str = "extrinsics"  # extrinsics | mvp_matrix | spherical
    lora_cfg_training: bool = True
    lora_uncond_prob: float = 0.1


@ds.register("stable-diffusion-vsd-guidance")
class VSDGuidance(StableDiffusionGuidance):
    """``guidance_type: "stable-diffusion-vsd-guidance"`` in threestudio."""

    def __init__(self, cfg: VSDConfig | dict | None = None):
        if isinstance(cfg, dict):
            import dataclasses

            names = {f.name for f in dataclasses.fields(VSDConfig)}
            cfg = VSDConfig(**{k: v for k, v in cfg.items() if k in names})
        super().__init__(cfg or VSDConfig())

    # -- LoRA (phi model) ---------------------------------------------------

    def init_lora_params(self, rng: jax.Array, unet_params: Dict[str, Any]) -> Dict[str, Any]:
        """A: N(0, 1/r) (in, r); B: zeros (r, out) — delta starts at 0, so
        phi == pretrained at step 0 (same property as diffusers LoRA init)."""
        cfg: VSDConfig = self.cfg
        paths = list(_iter_lora_paths(unet_params))
        keys = jax.random.split(rng, len(paths) + 1)
        lora = {}
        for k, (path, shape) in zip(keys[:-1], paths):
            d_in, d_out = shape
            lora["/".join(path)] = {
                "A": jax.random.normal(k, (d_in, cfg.lora_rank)) / jnp.sqrt(cfg.lora_rank),
                "B": jnp.zeros((cfg.lora_rank, d_out)),
            }
        # camera token: flattened 4x4 extrinsics (16) -> one context token
        lora["camera_proj"] = {
            "w": jax.random.normal(keys[-1], (16, cfg.context_dim)) * 0.02,
            "b": jnp.zeros((cfg.context_dim,)),
        }
        return lora

    def _merge_lora(self, unet_params: Dict[str, Any], lora: Dict[str, Any]) -> Dict[str, Any]:
        cfg: VSDConfig = self.cfg
        scale = cfg.lora_alpha / cfg.lora_rank

        def merge(tree, prefix=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    key = "/".join(prefix + (k,))
                    if k in _LORA_LEAVES and key in lora:
                        delta = lora[key]["A"] @ lora[key]["B"] * scale
                        out[k] = dict(v, kernel=v["kernel"] + delta)
                    else:
                        out[k] = merge(v, prefix + (k,))
                else:
                    out[k] = v
            return out

        return merge(unet_params)

    def _camera_token(self, lora, camera_condition: jnp.ndarray) -> jnp.ndarray:
        flat = camera_condition.reshape(camera_condition.shape[0], -1)
        if flat.shape[-1] < 16:
            flat = jnp.pad(flat, ((0, 0), (0, 16 - flat.shape[-1])))
        tok = flat[:, :16] @ lora["camera_proj"]["w"] + lora["camera_proj"]["b"]
        return tok[:, None, :]  # (B, 1, C)

    def _apply_phi(self, params, lora, x, t, context, camera_condition):
        merged = self._merge_lora(params["unet"], lora)
        ctx = jnp.concatenate([context, self._camera_token(lora, camera_condition)], 1)
        return self.unet.apply({"params": merged}, x, t, ctx)

    # -- losses ---------------------------------------------------------------

    def vsd_loss(
        self,
        params: Dict[str, Any],
        lora: Dict[str, Any],
        prompts: PromptEmbeddings,
        rng: jax.Array,
        rgb: jnp.ndarray,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_condition: jnp.ndarray,
        step: jnp.ndarray,
        rgb_as_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Returns ``loss_vsd`` (backprop into the scene through ``rgb``) and
        ``loss_lora`` (backprop into ``lora`` only) — the same two-term
        objective as vsd_guidance.py:train_lora + compute_grad_vsd."""
        cfg: VSDConfig = self.cfg
        sched = self.schedule
        B = rgb.shape[0]
        if rgb_as_latents:
            L = cfg.latent_size
            latents = jax.image.resize(rgb, (B, L, L, rgb.shape[-1]), "bilinear") * 2 - 1
        else:
            latents = self.encode_images(params, rgb)

        cond, uncond = prompts.get(elevation, azimuth)

        min_p = C_jax(cfg.min_step_percent, step)
        max_p = C_jax(cfg.max_step_percent, step)
        k_t, k_n, k_lt, k_ln, k_drop = jax.random.split(rng, 5)
        u = jax.random.uniform(k_t, (B,))
        t = (min_p * sched.num_train_timesteps
             + u * (max_p - min_p) * sched.num_train_timesteps).astype(jnp.int32)
        t = jnp.clip(t, 1, sched.num_train_timesteps - 1)

        noise = jax.random.normal(k_n, latents.shape)
        latents_sg = jax.lax.stop_gradient(latents)
        latents_noisy = add_noise(sched, latents_sg, noise, t)

        # -- pretrained score with CFG --
        x_in = jnp.concatenate([latents_noisy] * 2, 0)
        t_in = jnp.concatenate([t] * 2, 0)
        ctx = jnp.concatenate([uncond, cond], 0)
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        eps_u, eps_c = jnp.split(eps, 2, 0)
        eps_pretrain = eps_u + cfg.guidance_scale * (eps_c - eps_u)

        # -- phi (LoRA) score, camera-conditioned, optional small CFG --
        lora_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, lora)
        if cfg.guidance_scale_lora != 1.0:
            eps_phi2 = self._apply_phi(
                params, lora_sg, x_in, t_in,
                jnp.concatenate([uncond, cond], 0),
                jnp.concatenate([camera_condition] * 2, 0),
            )
            phi_u, phi_c = jnp.split(eps_phi2, 2, 0)
            eps_phi = phi_u + cfg.guidance_scale_lora * (phi_c - phi_u)
        else:
            eps_phi = self._apply_phi(params, lora_sg, latents_noisy, t, cond, camera_condition)

        w = self._weight(t)
        grad = w * (eps_pretrain - eps_phi)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss_vsd = 0.5 * ((latents - target) ** 2).sum() / B

        # -- LoRA diffusion loss on current renders (phi training) --
        u2 = jax.random.uniform(k_lt, (B,))
        t2 = jnp.clip((u2 * sched.num_train_timesteps).astype(jnp.int32), 1,
                      sched.num_train_timesteps - 1)
        noise2 = jax.random.normal(k_ln, latents.shape)
        noisy2 = add_noise(sched, latents_sg, noise2, t2)
        ctx_lora = cond
        if cfg.lora_cfg_training:
            # drop text condition with prob lora_uncond_prob (cfg training)
            drop = jax.random.bernoulli(k_drop, cfg.lora_uncond_prob, (B, 1, 1))
            ctx_lora = jnp.where(drop, uncond, cond)
        eps_lora = self._apply_phi(params, lora, noisy2, t2,
                                   jax.lax.stop_gradient(ctx_lora), camera_condition)
        loss_lora = ((eps_lora - noise2) ** 2).mean()

        return {
            "loss_vsd": loss_vsd,
            "loss_lora": loss_lora,
            "grad_norm": jnp.linalg.norm(grad),
        }
