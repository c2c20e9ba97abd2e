"""Unified guidance: SDS/VSD dispatch + Perp-Neg, for SD and Zero123.

Parity targets:
- ``stable-diffusion-unified-guidance``
  (threestudio/models/guidance/stable_diffusion_unified_guidance.py:32-779):
  one component exposing ``guidance_type: sds | vsd`` with optional Perp-Neg
  CFG, a LoRA phi model for VSD camera-conditioned on the flattened
  extrinsics, and the same w(t) weighting family.
- ``zero123-guidance``
  (threestudio/models/guidance/zero123_guidance.py:230-300): the vanilla
  Zero123 conditioning — relative camera embedding
  [Δpolar, sin Δazim, cos Δazim, dist − cond_dist] (the stable-zero123
  variant replaces the 4th dim with deg2rad(90 − cond_elev)).
- ``zero123-unified-guidance``
  (threestudio/models/guidance/zero123_unified_guidance.py:32-716): Zero123
  SDS/VSD — the phi model is the same Zero123 UNet with LoRA deltas,
  camera-conditioned, scored with ``vsd_guidance_scale_phi`` CFG.

TPU-first notes: Perp-Neg is evaluated as ONE 4B-batch UNet call (pos,
uncond, 2 negatives) and the per-view interpolation/weights are computed
with vectorized jnp.where — no per-sample Python loop (the reference loops
over the batch on host, base.py:115-167).  The VSD phi model reuses the
functional LoRA merge from vsd.py: deltas are folded into the frozen param
tree inside the jitted step, so pretrain and phi scores share one compiled
UNet kernel.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds

from ...utils.schedule import C_jax
from .stable_diffusion import PromptEmbeddings, StableDiffusionGuidance
from .vsd import VSDConfig, VSDGuidance
from .zero123.guidance import (
    StableZero123Guidance,
    Zero123Config,
    Zero123Modules,
    camera_delta_T,
)
from .zero123.scheduler import add_noise


def shifted_expotional_decay(a: float, b: float, c: float, r: jnp.ndarray) -> jnp.ndarray:
    """a·e^(−b·r) + c (threestudio/utils/ops.py:544-545; name kept verbatim)."""
    return a * jnp.exp(-b * r) + c


def perpendicular_component(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Component of x ⟂ y per batch element (utils/ops.py:552-561)."""
    axes = tuple(range(1, x.ndim))
    num = (x * y).sum(axes, keepdims=True)
    den = jnp.maximum((y * y).sum(axes, keepdims=True), 1e-6)
    return x - (num / den) * y


# ---------------------------------------------------------------------------
# Perp-Neg view-interpolated embeddings (vectorized base.py:82-167)
# ---------------------------------------------------------------------------


@dataclass
class PerpNegCoeffs:
    # a·e^(−b·r)+c coefficient triples (PromptProcessor.Config, base.py)
    f_sb: Tuple[float, float, float] = (1.0, 0.5, -0.606)
    f_fsb: Tuple[float, float, float] = (1.0, 0.5, +0.967)
    f_fs: Tuple[float, float, float] = (4.0, 0.5, -2.426)
    f_sf: Tuple[float, float, float] = (4.0, 0.5, -2.426)


def get_perp_neg_embeddings(
    prompts: PromptEmbeddings,
    elevation: jnp.ndarray,
    azimuth: jnp.ndarray,
    coeffs: PerpNegCoeffs,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (pos (B,L,C), uncond (B,L,C), neg (B,2,L,C), neg_w (B,2)).

    Faithful vectorization of PromptProcessorOutput.get_text_embeddings_perp_neg
    (base.py:82-167): azimuth-interpolated positive embedding, two negative
    view embeddings with shifted-exponential-decay weights; overhead views
    degenerate to (overhead, no negatives).
    """
    # PromptEmbeddings rows: [base, front, side, back, overhead]
    front, side, back, overhead = (prompts.cond[1], prompts.cond[2],
                                   prompts.cond[3], prompts.cond[4])
    az = (azimuth + 180.0) % 360.0 - 180.0  # shift_azimuth_deg
    aaz = jnp.abs(az)
    is_front_side = aaz < 90.0
    is_overhead = elevation > prompts.cfg.overhead_threshold

    def lerp(r, a, b):  # r (B,) -> (B, L, C)
        r = r[:, None, None]
        return r * a[None] + (1.0 - r) * b[None]

    r_fs = 1.0 - aaz / 90.0       # 1=front, 0=side
    r_sb = 2.0 - aaz / 90.0       # 1=side, 0=back
    pos = jnp.where(is_front_side[:, None, None],
                    lerp(r_fs, front, side), lerp(r_sb, side, back))
    pos = jnp.where(is_overhead[:, None, None], overhead[None], pos)

    uncond = jnp.broadcast_to(prompts.uncond[None], pos.shape)

    # negatives: front-side -> [front, side]; side-back -> [side, front]
    neg0 = jnp.where(is_front_side[:, None, None], front[None], side[None])
    neg1 = jnp.where(is_front_side[:, None, None], side[None], front[None])
    w0 = jnp.where(is_front_side,
                   -shifted_expotional_decay(*coeffs.f_fs, r_fs),
                   -shifted_expotional_decay(*coeffs.f_sb, r_sb))
    w1 = jnp.where(is_front_side,
                   -shifted_expotional_decay(*coeffs.f_sf, 1.0 - r_fs),
                   -shifted_expotional_decay(*coeffs.f_fsb, r_sb))
    # overhead: dummy negatives with zero weight (base.py:122-129)
    neg0 = jnp.where(is_overhead[:, None, None], uncond, neg0)
    neg1 = jnp.where(is_overhead[:, None, None], uncond, neg1)
    w0 = jnp.where(is_overhead, 0.0, w0)
    w1 = jnp.where(is_overhead, 0.0, w1)

    neg = jnp.stack([neg0, neg1], 1)          # (B, 2, L, C)
    neg_w = jnp.stack([w0, w1], -1)           # (B, 2)
    return pos, uncond, neg, neg_w


# ---------------------------------------------------------------------------
# stable-diffusion-unified-guidance
# ---------------------------------------------------------------------------


@dataclass
class SDUnifiedConfig(VSDConfig):
    guidance_type: str = "sds"  # sds | vsd (unified_guidance.py:36)
    guidance_scale: float = 100.0
    use_perp_neg: bool = False
    vsd_guidance_scale_phi: float = 1.0
    perp_neg_f_sb: Tuple[float, float, float] = (1.0, 0.5, -0.606)
    perp_neg_f_fsb: Tuple[float, float, float] = (1.0, 0.5, +0.967)
    perp_neg_f_fs: Tuple[float, float, float] = (4.0, 0.5, -2.426)
    perp_neg_f_sf: Tuple[float, float, float] = (4.0, 0.5, -2.426)


@ds.register("stable-diffusion-unified-guidance")
class SDUnifiedGuidance(VSDGuidance):
    """One component covering the SDS and VSD regimes
    (stable_diffusion_unified_guidance.py) with optional Perp-Neg CFG."""

    def __init__(self, cfg: SDUnifiedConfig | dict | None = None):
        if isinstance(cfg, dict):
            names = {f.name for f in dataclasses.fields(SDUnifiedConfig)}
            cfg = SDUnifiedConfig(**{k: v for k, v in cfg.items() if k in names})
        cfg = cfg or SDUnifiedConfig()
        # bypass VSDGuidance.__init__'s own dict handling; configs are set
        StableDiffusionGuidance.__init__(self, cfg)

    @property
    def _coeffs(self) -> PerpNegCoeffs:
        c: SDUnifiedConfig = self.cfg
        return PerpNegCoeffs(c.perp_neg_f_sb, c.perp_neg_f_fsb,
                             c.perp_neg_f_fs, c.perp_neg_f_sf)

    def sds_loss_perp_neg(
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
        """SDS where the guided score adds weighted perpendicular components
        of the negative-view scores (get_eps_pretrain, unified:366-403)."""
        cfg: SDUnifiedConfig = self.cfg
        sched = self.schedule
        B = rgb.shape[0]
        if rgb_as_latents:
            L = cfg.latent_size
            latents = jax.image.resize(rgb, (B, L, L, rgb.shape[-1]), "bilinear") * 2 - 1
        else:
            latents = self.encode_images(params, rgb)

        pos, uncond, neg, neg_w = get_perp_neg_embeddings(
            prompts, elevation, azimuth, self._coeffs)

        min_p = C_jax(cfg.min_step_percent, step)
        max_p = C_jax(cfg.max_step_percent, step)
        k_t, k_n = jax.random.split(rng)
        u = jax.random.uniform(k_t, (B,))
        t = (min_p * sched.num_train_timesteps
             + u * (max_p - min_p) * sched.num_train_timesteps).astype(jnp.int32)
        t = jnp.clip(t, 1, sched.num_train_timesteps - 1)

        noise = jax.random.normal(k_n, latents.shape)
        latents_noisy = add_noise(sched, jax.lax.stop_gradient(latents), noise, t)

        # one 4B batch: [pos, uncond, neg0, neg1] (unified:374-386)
        x_in = jnp.concatenate([latents_noisy] * 4, 0)
        t_in = jnp.concatenate([t] * 4, 0)
        ctx = jnp.concatenate([pos, uncond, neg[:, 0], neg[:, 1]], 0)
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, ctx)
        e_pos, e_unc, e_n0, e_n1 = jnp.split(eps, 4, 0)

        d_pos = e_pos - e_unc
        accum = (neg_w[:, 0].reshape(-1, 1, 1, 1)
                 * perpendicular_component(e_n0 - e_unc, d_pos)
                 + neg_w[:, 1].reshape(-1, 1, 1, 1)
                 * perpendicular_component(e_n1 - e_unc, d_pos))
        eps_guided = e_unc + cfg.guidance_scale * (d_pos + accum)

        grad = self._weight(t) * (eps_guided - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss_sds = 0.5 * ((latents - target) ** 2).sum() / B
        return {"loss_sds": loss_sds, "grad_norm": jnp.linalg.norm(grad)}

    def loss(self, params, prompts, rng, rgb, elevation, azimuth,
             camera_distances, step, camera_condition=None, lora=None,
             rgb_as_latents: bool = False) -> Dict[str, jnp.ndarray]:
        """guidance_type dispatch (unified forward, :514-703)."""
        cfg: SDUnifiedConfig = self.cfg
        if cfg.guidance_type == "vsd":
            assert lora is not None and camera_condition is not None
            return self.vsd_loss(params, lora, prompts, rng, rgb, elevation,
                                 azimuth, camera_condition, step,
                                 rgb_as_latents=rgb_as_latents)
        if cfg.use_perp_neg:
            return self.sds_loss_perp_neg(params, prompts, rng, rgb, elevation,
                                          azimuth, camera_distances, step,
                                          rgb_as_latents=rgb_as_latents)
        return self.sds_loss(params, prompts, rng, rgb, elevation, azimuth,
                             camera_distances, step, rgb_as_latents=rgb_as_latents)


# ---------------------------------------------------------------------------
# zero123-guidance (vanilla conditioning)
# ---------------------------------------------------------------------------


def zero123_delta_T(elevation, azimuth, camera_distances, cond_elevation_deg,
                    cond_azimuth_deg, cond_camera_distance) -> jnp.ndarray:
    """Vanilla Zero123 relative camera embedding
    [Δpolar, sin Δazim, cos Δazim, dist − cond_dist]
    (zero123_guidance.py:236-245)."""
    d_polar = jnp.deg2rad((90.0 - elevation) - (90.0 - cond_elevation_deg))
    d_azim = jnp.deg2rad(azimuth - cond_azimuth_deg)
    d_dist = camera_distances - cond_camera_distance
    return jnp.stack([d_polar, jnp.sin(d_azim), jnp.cos(d_azim), d_dist], -1)


@ds.register("zero123-guidance")
class Zero123Guidance(StableZero123Guidance):
    """Same SDS machinery as stable-zero123; only the 4th camera-embedding
    dimension differs (distance delta instead of conditioning elevation)."""

    def camera_embedding(self, elevation, azimuth, camera_distances) -> jnp.ndarray:
        cfg = self.cfg
        return zero123_delta_T(elevation, azimuth, camera_distances,
                               cfg.cond_elevation_deg, cfg.cond_azimuth_deg,
                               cfg.cond_camera_distance)

    def sds_loss(self, params, bank, rng, rgb, elevation, azimuth,
                 camera_distances, frame_indices, step):
        """Identical to the parent but with the vanilla ΔT; implemented by
        temporarily routing through the shared body below."""
        return _zero123_sds(self, params, bank, rng, rgb, elevation, azimuth,
                            camera_distances, frame_indices, step,
                            delta_T=self.camera_embedding(elevation, azimuth,
                                                          camera_distances))


def _zero123_sds(g: StableZero123Guidance, params, bank, rng, rgb, elevation,
                 azimuth, camera_distances, frame_indices, step,
                 delta_T: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """Shared Zero123 SDS body parameterized by the camera embedding."""
    cfg = g.cfg
    mod = g.modules
    sched = mod.schedule
    B = rgb.shape[0]
    f_idx = jnp.zeros((B,), jnp.int32) if frame_indices is None else frame_indices

    latents = mod.encode_images(params, rgb)
    if delta_T is None:
        delta_T = camera_delta_T(elevation, azimuth, camera_distances,
                                 cfg.cond_elevation_deg, cfg.cond_azimuth_deg)
    clip_emb = bank["c_crossattn"][f_idx]
    cc_in = jnp.concatenate([clip_emb, delta_T], -1)
    cc = (cc_in @ params["cc_projection"]["kernel"]
          + params["cc_projection"]["bias"])[:, None, :]
    context = jnp.concatenate([jnp.zeros_like(cc), cc], 0)
    c_concat = bank["c_concat"][f_idx]
    c_concat_in = jnp.concatenate([jnp.zeros_like(c_concat), c_concat], 0)

    min_p = C_jax(cfg.min_step_percent, step)
    max_p = C_jax(cfg.max_step_percent, step)
    k_t, k_n = jax.random.split(rng)
    u = jax.random.uniform(k_t, (B,))
    t = (min_p * sched.num_train_timesteps
         + u * (max_p - min_p) * sched.num_train_timesteps).astype(jnp.int32)
    t = jnp.clip(t, 1, sched.num_train_timesteps - 1)

    noise = jax.random.normal(k_n, latents.shape)
    latents_noisy = add_noise(sched, jax.lax.stop_gradient(latents), noise, t)
    x_in = jnp.concatenate([jnp.concatenate([latents_noisy] * 2, 0), c_concat_in], -1)
    t_in = jnp.concatenate([t] * 2, 0)
    noise_pred = mod.apply_unet(params, x_in, t_in, context)
    eps_uncond, eps_cond = jnp.split(noise_pred, 2, 0)
    eps = eps_uncond + cfg.guidance_scale * (eps_cond - eps_uncond)

    w = (1.0 - sched.alphas_cumprod[t]).reshape(-1, 1, 1, 1)
    grad = jnp.nan_to_num(w * (eps - noise))
    if cfg.grad_clip is not None:
        grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
    target = jax.lax.stop_gradient(latents - grad)
    loss_sds = 0.5 * ((latents - target) ** 2).sum() / B
    return {"loss_sds": loss_sds, "grad_norm": jnp.linalg.norm(grad)}


# ---------------------------------------------------------------------------
# zero123-unified-guidance (SDS/VSD on the Zero123 stack)
# ---------------------------------------------------------------------------


@dataclass
class Zero123UnifiedConfig(Zero123Config):
    guidance_type: str = "sds"  # sds | vsd (zero123_unified_guidance.py:37)
    guidance_scale: float = 5.0
    vsd_guidance_scale_phi: float = 1.0
    vsd_lora_rank: int = 8
    vsd_lora_alpha: float = 1.0
    vsd_use_camera_condition: bool = True
    vsd_lora_cfg_training: bool = False
    vsd_lora_uncond_prob: float = 0.1


@ds.register("zero123-unified-guidance")
class Zero123UnifiedGuidance(Zero123Guidance):
    """Zero123 SDS/VSD (zero123_unified_guidance.py:32-716).  The phi model
    is the frozen Zero123 UNet + functional LoRA deltas (vsd.py machinery),
    camera-conditioned via a learned extrinsics token appended to the
    cc-projection context (same information path as the reference's class
    embedding, :144-158)."""

    def __init__(self, cfg: Zero123UnifiedConfig | dict | None = None,
                 modules: Optional[Zero123Modules] = None):
        if isinstance(cfg, dict):
            names = {f.name for f in dataclasses.fields(Zero123UnifiedConfig)}
            cfg = Zero123UnifiedConfig(**{k: v for k, v in cfg.items() if k in names})
        super().__init__(cfg or Zero123UnifiedConfig(), modules)

    # LoRA helpers shared with the SD VSD implementation
    def init_lora_params(self, rng: jax.Array, unet_params) -> Dict[str, Any]:
        from .vsd import _iter_lora_paths

        cfg: Zero123UnifiedConfig = self.cfg
        paths = list(_iter_lora_paths(unet_params))
        keys = jax.random.split(rng, len(paths) + 1)
        lora = {}
        for k, (path, shape) in zip(keys[:-1], paths):
            d_in, d_out = shape
            lora["/".join(path)] = {
                "A": jax.random.normal(k, (d_in, cfg.vsd_lora_rank))
                / jnp.sqrt(cfg.vsd_lora_rank),
                "B": jnp.zeros((cfg.vsd_lora_rank, d_out)),
            }
        lora["camera_proj"] = {
            "w": jax.random.normal(keys[-1], (16, cfg.context_dim)) * 0.02,
            "b": jnp.zeros((cfg.context_dim,)),
        }
        return lora

    def _merge_lora(self, unet_params, lora):
        cfg: Zero123UnifiedConfig = self.cfg
        scale = cfg.vsd_lora_alpha / cfg.vsd_lora_rank

        def merge(tree, prefix=()):
            out = {}
            for k, v in tree.items():
                if isinstance(v, dict):
                    key = "/".join(prefix + (k,))
                    if key in lora and "kernel" in v:
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
        return tok[:, None, :]

    def _apply_phi(self, params, lora, x, t, context, camera_condition):
        merged = self._merge_lora(params["unet"], lora)
        cfg: Zero123UnifiedConfig = self.cfg
        if cfg.vsd_use_camera_condition:
            context = jnp.concatenate(
                [context, self._camera_token(lora, camera_condition)], 1)
        return self.modules.unet.apply({"params": merged}, x, t, context)

    def vsd_loss(
        self,
        params: Dict[str, Any],
        bank: Dict[str, jnp.ndarray],
        lora: Dict[str, Any],
        rng: jax.Array,
        rgb: jnp.ndarray,
        elevation: jnp.ndarray,
        azimuth: jnp.ndarray,
        camera_distances: jnp.ndarray,
        camera_condition: jnp.ndarray,
        frame_indices: Optional[jnp.ndarray],
        step: jnp.ndarray,
    ) -> Dict[str, jnp.ndarray]:
        """loss_vsd for the scene + loss_lora for phi (zero123_unified
        get_eps_pretrain/get_eps_phi/train_phi, :357-512)."""
        cfg: Zero123UnifiedConfig = self.cfg
        mod = self.modules
        sched = mod.schedule
        B = rgb.shape[0]
        f_idx = jnp.zeros((B,), jnp.int32) if frame_indices is None else frame_indices

        latents = mod.encode_images(params, rgb)
        latents_sg = jax.lax.stop_gradient(latents)

        delta_T = self.camera_embedding(elevation, azimuth, camera_distances)
        cc_in = jnp.concatenate([bank["c_crossattn"][f_idx], delta_T], -1)
        cc = (cc_in @ params["cc_projection"]["kernel"]
              + params["cc_projection"]["bias"])[:, None, :]
        c_concat = bank["c_concat"][f_idx]

        min_p = C_jax(cfg.min_step_percent, step)
        max_p = C_jax(cfg.max_step_percent, step)
        k_t, k_n, k_lt, k_ln, k_drop = jax.random.split(rng, 5)
        u = jax.random.uniform(k_t, (B,))
        t = (min_p * sched.num_train_timesteps
             + u * (max_p - min_p) * sched.num_train_timesteps).astype(jnp.int32)
        t = jnp.clip(t, 1, sched.num_train_timesteps - 1)

        noise = jax.random.normal(k_n, latents.shape)
        latents_noisy = add_noise(sched, latents_sg, noise, t)

        # pretrained CFG score (2B: zero-cond, cond)
        x2 = jnp.concatenate([latents_noisy] * 2, 0)
        t2 = jnp.concatenate([t] * 2, 0)
        ctx2 = jnp.concatenate([jnp.zeros_like(cc), cc], 0)
        cc2 = jnp.concatenate([jnp.zeros_like(c_concat), c_concat], 0)
        eps = mod.apply_unet(params, jnp.concatenate([x2, cc2], -1), t2, ctx2)
        eps_u, eps_c = jnp.split(eps, 2, 0)
        eps_pretrain = eps_u + cfg.guidance_scale * (eps_c - eps_u)

        # phi score (camera CFG with scale_phi, get_eps_phi :409-455)
        lora_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, lora)
        x_cat = jnp.concatenate([latents_noisy, c_concat], -1)
        if cfg.vsd_guidance_scale_phi != 1.0 and cfg.vsd_use_camera_condition:
            eps_phi2 = self._apply_phi(
                params, lora_sg,
                jnp.concatenate([x_cat] * 2, 0), t2,
                jnp.concatenate([cc] * 2, 0),
                jnp.concatenate([camera_condition,
                                 jnp.zeros_like(camera_condition)], 0))
            phi_cam, phi_unc = jnp.split(eps_phi2, 2, 0)
            eps_phi = phi_unc + cfg.vsd_guidance_scale_phi * (phi_cam - phi_unc)
        else:
            eps_phi = self._apply_phi(params, lora_sg, x_cat, t, cc,
                                      camera_condition)

        w = (1.0 - sched.alphas_cumprod[t]).reshape(-1, 1, 1, 1)
        grad = jnp.nan_to_num(w * (eps_pretrain - eps_phi))
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss_vsd = 0.5 * ((latents - target) ** 2).sum() / B

        # phi diffusion loss on current renders (train_phi :457-512)
        u2 = jax.random.uniform(k_lt, (B,))
        t_l = jnp.clip((u2 * sched.num_train_timesteps).astype(jnp.int32), 1,
                       sched.num_train_timesteps - 1)
        noise_l = jax.random.normal(k_ln, latents.shape)
        noisy_l = add_noise(sched, latents_sg, noise_l, t_l)
        cam = camera_condition
        if cfg.vsd_lora_cfg_training:
            drop = jax.random.bernoulli(k_drop, cfg.vsd_lora_uncond_prob, (B, 1))
            cam = jnp.where(drop, jnp.zeros_like(cam.reshape(B, -1)),
                            cam.reshape(B, -1))
        eps_lora = self._apply_phi(
            params, lora, jnp.concatenate([noisy_l, c_concat], -1), t_l,
            jax.lax.stop_gradient(cc), cam)
        loss_lora = ((eps_lora - noise_l) ** 2).mean()

        return {"loss_vsd": loss_vsd, "loss_lora": loss_lora,
                "grad_norm": jnp.linalg.norm(grad)}

    def loss(self, params, bank, rng, rgb, elevation, azimuth,
             camera_distances, step, frame_indices=None,
             camera_condition=None, lora=None) -> Dict[str, jnp.ndarray]:
        cfg: Zero123UnifiedConfig = self.cfg
        if cfg.guidance_type == "vsd":
            assert lora is not None and camera_condition is not None
            return self.vsd_loss(params, bank, lora, rng, rgb, elevation,
                                 azimuth, camera_distances, camera_condition,
                                 frame_indices, step)
        return self.sds_loss(params, bank, rng, rgb, elevation, azimuth,
                             camera_distances, frame_indices, step)
