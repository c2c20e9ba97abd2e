"""Stable Zero123 SDS guidance (static + temporal), fully jittable.

Re-implements the reference guidance pair
(threestudio/models/guidance/stable_zero123_guidance.py:75-362 and
custom/threestudio-dreammesh4d/guidance/temporal_stable_zero123_guidance.py:
76-387) on the flax UNet/VAE/CLIP stack:

- conditioning: CLIP image embedding ⊕ camera ΔT [Δpolar, sin Δazim, cos Δazim,
  90°−cond_elev] -> cc_projection Linear(772→768) (ddpm.py:653-656 eye-init);
  CFG via zero-cond batch concat (get_cond, temporal_*.py:248-297);
- per-frame embedding bank for the temporal variant — every video frame's
  CLIP embedding + VAE latent precomputed once, indexed by ``frame_indices``
  (temporal_*.py:197-214);
- SDS: resize render to 256², VAE-encode (×0.18215), t ~ U[min, max steps],
  add noise, UNet on the 2×B CFG batch, w(t) = 1−ᾱ_t, reparameterized MSE
  (temporal_*.py:299-374);
- min/max_step_percent are C() schedules (temporal_*.py:376-386), evaluated
  on the traced step.

The SDS computation is a pure function of (params, rgb, camera, rng, step) —
it lives inside the jitted train step; params can be device-put with any
pjit sharding (the UNet is the only >100M component worth sharding, SURVEY
§2g).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ....utils.schedule import C_jax
from .clip import CLIPImageEncoder
from .scheduler import add_noise, make_schedule
from .unet import UNetModel
from .vae import AutoencoderKL

LATENT_SCALE = 0.18215  # ddpm.py scale_factor


@dataclass
class Zero123Config:
    pretrained_model_name_or_path: str = ""
    pretrained_config: str = ""
    cond_image_path: str = ""
    cond_elevation_deg: float = 0.0
    cond_azimuth_deg: float = 0.0
    cond_camera_distance: float = 1.2
    guidance_scale: float = 3.0
    grad_clip: Optional[float] = None
    min_step_percent: Any = 0.02
    max_step_percent: Any = 0.98
    num_train_timesteps: int = 1000
    # architecture (defaults = the shipped Zero123; shrink for tests)
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    num_heads: int = 8
    context_dim: int = 768
    vae_ch: int = 128
    vae_ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    vae_num_res_blocks: int = 2
    latent_size: int = 32
    image_size: int = 256
    dtype: Any = jnp.float32
    use_clip: bool = True  # False -> tiny random projector (tests)
    # CLIP vision-tower dims (defaults = ViT-L/14, the tower
    # FrozenCLIPImageEmbedder loads — extern/ldm_zero123/modules/encoders/
    # modules.py:432); shrink for tests.  The projection is
    # clip_hidden_size -> context_dim (OpenAI CLIP ``visual.proj``).
    clip_hidden_size: int = 1024
    clip_layers: int = 24
    clip_heads: int = 16
    clip_intermediate: int = 4096
    clip_image_size: int = 224
    clip_patch_size: int = 14

    def __post_init__(self):
        # YAML surface: system.guidance.dtype "bfloat16"/"bf16"/"float32"/
        # "fp32"/"float16" (fp16 maps to bf16 — the TPU equivalent of the
        # reference's fp16-with-fp32-norms guidance,
        # temporal_stable_zero123_guidance.py:104-135; norms are f32 via
        # param_dtype in unet.py regardless of compute dtype)
        if isinstance(self.dtype, str):
            table = {"float32": jnp.float32, "fp32": jnp.float32,
                     "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
                     "float16": jnp.bfloat16, "fp16": jnp.bfloat16}
            try:
                self.dtype = table[self.dtype.lower()]
            except KeyError:
                raise ValueError(
                    f"guidance.dtype {self.dtype!r} not in {sorted(table)}")


class Zero123Modules:
    """Module bundle + param init + pure apply fns."""

    def __init__(self, cfg: Zero123Config):
        self.cfg = cfg
        self.unet = UNetModel(
            in_channels=8, out_channels=4, model_channels=cfg.model_channels,
            channel_mult=cfg.channel_mult, num_res_blocks=cfg.num_res_blocks,
            num_heads=cfg.num_heads, dtype=cfg.dtype,
        )
        self.vae = AutoencoderKL(
            embed_dim=4, ch=cfg.vae_ch, ch_mult=tuple(cfg.vae_ch_mult),
            num_res_blocks=cfg.vae_num_res_blocks, dtype=cfg.dtype,
        )
        if cfg.use_clip:
            from transformers import CLIPVisionConfig

            vis_cfg = CLIPVisionConfig(
                hidden_size=cfg.clip_hidden_size,
                intermediate_size=cfg.clip_intermediate,
                num_hidden_layers=cfg.clip_layers,
                num_attention_heads=cfg.clip_heads,
                image_size=cfg.clip_image_size,
                patch_size=cfg.clip_patch_size,
                projection_dim=cfg.context_dim,
            )
            self.clip = CLIPImageEncoder(dtype=cfg.dtype, config=vis_cfg,
                                         proj_dim=cfg.context_dim)
        else:
            self.clip = None
        self.schedule = make_schedule(cfg.num_train_timesteps)

    def init_params(self, rng) -> Dict[str, Any]:
        cfg = self.cfg
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        S, L = cfg.image_size, cfg.latent_size
        unet_params = self.unet.init(
            k1, jnp.zeros((1, L, L, 8)), jnp.zeros((1,)), jnp.zeros((1, 1, cfg.context_dim))
        )["params"]
        vae_params = self.vae.init(k2, jnp.zeros((1, S, S, 3)))["params"]
        # cc_projection Linear(772 -> 768): identity on the first 768 rows,
        # zeros for the 4 camera dims (ddpm.py:653-656)
        w = np.zeros((cfg.context_dim + 4, cfg.context_dim), np.float32)
        w[: cfg.context_dim] = np.eye(cfg.context_dim)
        cc = {"kernel": jnp.asarray(w), "bias": jnp.zeros((cfg.context_dim,))}
        params = {"unet": unet_params, "vae": vae_params, "cc_projection": cc}
        if self.clip is not None:
            params["clip"] = self.clip.init(k3)
        else:
            params["clip_proj"] = jax.random.normal(k4, (3, cfg.context_dim)) * 0.02
        return params

    # ---------------- pure apply fns ----------------
    def encode_images(self, params, rgb: jnp.ndarray) -> jnp.ndarray:
        """rgb (B,H,W,3) in [0,1] -> latents (B,L,L,4) ×0.18215
        (encode_images, temporal_*.py:227-236)."""
        S = self.cfg.image_size
        B = rgb.shape[0]
        if rgb.shape[1] != S or rgb.shape[2] != S:
            rgb = jax.image.resize(rgb, (B, S, S, 3), "bilinear")
        img = rgb * 2.0 - 1.0
        mean, logvar = self.vae.apply({"params": params["vae"]}, img,
                                      method=AutoencoderKL.encode_moments)
        return mean * LATENT_SCALE

    def encode_cond_latent(self, params, rgb: jnp.ndarray) -> jnp.ndarray:
        """c_concat: posterior MODE, un-scaled (get_img_embeds .mode())."""
        S = self.cfg.image_size
        B = rgb.shape[0]
        if rgb.shape[1] != S or rgb.shape[2] != S:
            rgb = jax.image.resize(rgb, (B, S, S, 3), "bilinear")
        img = rgb * 2.0 - 1.0
        return self.vae.apply({"params": params["vae"]}, img,
                              method=AutoencoderKL.encode_mode)

    def decode_latents(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        img = self.vae.apply({"params": params["vae"]}, latents / LATENT_SCALE,
                             method=AutoencoderKL.decode)
        return jnp.clip(img * 0.5 + 0.5, 0.0, 1.0)

    def clip_embed(self, params, rgb: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,3) in [0,1] -> (B, ctx) image embedding."""
        if self.clip is not None:
            return self.clip.embed(params["clip"], rgb)
        # test stub: mean-color projector
        pooled = rgb.mean(axis=(1, 2))  # (B, 3)
        return pooled @ params["clip_proj"]

    def apply_unet(self, params, x, t, context) -> jnp.ndarray:
        return self.unet.apply({"params": params["unet"]}, x, t, context)


def camera_delta_T(elevation, azimuth, camera_distances, cond_elevation_deg,
                   cond_azimuth_deg) -> jnp.ndarray:
    """Stable-Zero123 relative camera embedding (temporal_*.py:261-273):
    [Δpolar(rad), sin Δazim, cos Δazim, deg2rad(90 − cond_elev)]."""
    d_polar = jnp.deg2rad((90.0 - elevation) - (90.0 - cond_elevation_deg))
    d_azim = jnp.deg2rad(azimuth - cond_azimuth_deg)
    last = jnp.deg2rad(90.0 - jnp.full_like(elevation, cond_elevation_deg))
    return jnp.stack([d_polar, jnp.sin(d_azim), jnp.cos(d_azim), last], -1)


class StableZero123Guidance:
    """Static (single ref image) guidance; the temporal variant indexes
    per-frame banks.  Both share ``sds_loss``."""

    def __init__(self, cfg: Zero123Config, modules: Optional[Zero123Modules] = None):
        self.cfg = cfg
        self.modules = modules or Zero123Modules(cfg)

    def prepare_embeddings(self, params, images: jnp.ndarray,
                           chunk: int = 4):
        """images (F,H,W,3) in [0,1] (white-composited) -> bank dict with
        c_crossattn (F, ctx) and c_concat (F, L, L, 4)
        (prepare_embeddings_video, temporal_*.py:197-214).

        CHUNKED over frames: encoding all 32 flagship frames in one eager
        VAE batch spiked HBM past the worker's limit next to the resident
        UNet params (round-5 pipeline: dynamic-stage startup crashed /
        hung the tunneled worker right after weight load).  ``chunk`` caps
        the encoder batch; 4 matches the per-step SDS batch the VAE is
        compiled for anyway.  (Reference behavior unchanged — it also
        precomputes per-frame embeddings once, temporal_*.py:197-214.)"""
        import numpy as np

        F = images.shape[0]
        cc, cl = [], []
        for i in range(0, F, chunk):
            part = images[i:i + chunk]
            cc.append(np.asarray(self.modules.clip_embed(params, part)))
            cl.append(np.asarray(self.modules.encode_cond_latent(params, part)))
        return {
            "c_crossattn": jnp.asarray(np.concatenate(cc, 0)),
            "c_concat": jnp.asarray(np.concatenate(cl, 0)),
        }

    def sds_loss(
        self,
        params: Dict[str, Any],
        bank: Dict[str, jnp.ndarray],
        rng: jax.Array,
        rgb: jnp.ndarray,  # (B, H, W, 3) rendered
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_distances: jnp.ndarray,
        frame_indices: Optional[jnp.ndarray],
        step: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        mod = self.modules
        sched = mod.schedule
        B = rgb.shape[0]
        f_idx = jnp.zeros((B,), jnp.int32) if frame_indices is None else frame_indices

        latents = mod.encode_images(params, rgb)  # differentiable wrt rgb

        # conditioning (no grad)
        T_cam = camera_delta_T(elevation, azimuth, camera_distances,
                               cfg.cond_elevation_deg, cfg.cond_azimuth_deg)
        clip_emb = bank["c_crossattn"][f_idx]  # (B, ctx)
        cc_in = jnp.concatenate([clip_emb, T_cam], -1)
        cc = cc_in @ params["cc_projection"]["kernel"] + params["cc_projection"]["bias"]
        cc = cc[:, None, :]  # (B, 1, ctx)
        context = jnp.concatenate([jnp.zeros_like(cc), cc], 0)  # CFG 2B
        c_concat = bank["c_concat"][f_idx]  # (B, L, L, 4)
        c_concat_in = jnp.concatenate([jnp.zeros_like(c_concat), c_concat], 0)

        # t ~ U[min_step, max_step]
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
        x_in = jnp.concatenate([x_in, c_concat_in], -1)  # hybrid cond: 8 ch
        t_in = jnp.concatenate([t] * 2, 0)
        noise_pred = mod.apply_unet(params, x_in, t_in, context)
        eps_uncond, eps_cond = jnp.split(noise_pred, 2, 0)
        eps = eps_uncond + cfg.guidance_scale * (eps_cond - eps_uncond)

        w = (1.0 - sched.alphas_cumprod[t]).reshape(-1, 1, 1, 1)
        grad = w * (eps - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * ((latents - target) ** 2).sum() / B
        return {
            "loss_sds": loss_sds,
            "grad_norm": jnp.linalg.norm(grad),
            "min_step": min_p * sched.num_train_timesteps,
            "max_step": max_p * sched.num_train_timesteps,
        }


    def guidance_eval(
        self,
        params: Dict[str, Any],
        bank: Dict[str, jnp.ndarray],
        rng: jax.Array,
        rgb: jnp.ndarray,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_distances: jnp.ndarray,
        frame_indices: Optional[jnp.ndarray] = None,
        t_frac: float = 0.3,
        n_denoise_steps: int = 25,
    ) -> Dict[str, jnp.ndarray]:
        """Visual SDS diagnostics (reference guidance_eval,
        threestudio/systems/base.py:344-402 + zero123 guidance): returns the
        noised render, the 1-step x0 prediction, and a full DDIM denoise from
        t — decoded to images."""
        from .scheduler import ddim_step

        cfg = self.cfg
        mod = self.modules
        sched = mod.schedule
        B = rgb.shape[0]
        f_idx = jnp.zeros((B,), jnp.int32) if frame_indices is None else frame_indices

        latents = mod.encode_images(params, rgb)
        T_cam = camera_delta_T(elevation, azimuth, camera_distances,
                               cfg.cond_elevation_deg, cfg.cond_azimuth_deg)
        cc_in = jnp.concatenate([bank["c_crossattn"][f_idx], T_cam], -1)
        cc = (cc_in @ params["cc_projection"]["kernel"] + params["cc_projection"]["bias"])[:, None, :]
        context = jnp.concatenate([jnp.zeros_like(cc), cc], 0)
        c_concat = bank["c_concat"][f_idx]
        c_concat_in = jnp.concatenate([jnp.zeros_like(c_concat), c_concat], 0)

        t0 = int(t_frac * sched.num_train_timesteps)
        t = jnp.full((B,), t0, jnp.int32)
        noise = jax.random.normal(rng, latents.shape)
        x_t = add_noise(sched, latents, noise, t)

        def eps_at(x, t_arr):
            x_in = jnp.concatenate([jnp.concatenate([x] * 2, 0), c_concat_in], -1)
            t_in = jnp.concatenate([t_arr] * 2, 0)
            eps = mod.apply_unet(params, x_in, t_in, context)
            e_u, e_c = jnp.split(eps, 2, 0)
            return e_u + cfg.guidance_scale * (e_c - e_u)

        eps0 = eps_at(x_t, t)
        a_t = sched.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        x0_1step = (x_t - jnp.sqrt(1 - a_t) * eps0) / jnp.sqrt(a_t)

        # full DDIM denoise over an even timestep ladder below t0
        ts = jnp.linspace(t0, 0, n_denoise_steps + 1).astype(jnp.int32)

        def body(x, i):
            t_cur = jnp.full((B,), ts[i], jnp.int32)
            t_prev = jnp.full((B,), ts[i + 1], jnp.int32)
            eps = eps_at(x, t_cur)
            return ddim_step(sched, x, eps, t_cur,
                             jnp.where(t_prev == 0, -1, t_prev)), None

        x_final, _ = jax.lax.scan(body, x_t, jnp.arange(n_denoise_steps))
        return {
            "img_noisy": mod.decode_latents(params, x_t),
            "img_1step": mod.decode_latents(params, x0_1step),
            "img_final": mod.decode_latents(params, x_final),
        }


@ds.register("stable-zero123-guidance")
class StableZero123GuidanceComponent(StableZero123Guidance):
    pass


@ds.register("temporal-stable-zero123-guidance")
class TemporalStableZero123Guidance(StableZero123Guidance):
    """Identical math; callers pass real ``frame_indices`` into the per-frame
    bank (temporal_*.py:248-297)."""

    pass
