"""ControlNet guidance (condition-image-steered SDS), functional JAX.

Parity with threestudio/models/guidance/controlnet_guidance.py (~430 lines):
a ControlNet branch — a copy of the SD UNet's encoder + mid, fed the latents
AND an encoded hint image, emitting one zero-init residual per skip
activation — steers the frozen UNet; SDS runs on the controlled score.

The reference preprocesses hints with cv2 canny / a normal-BAE network; here
``canny_hint``/``normal_hint`` provide jit-able equivalents (Sobel-based
edges; rendered normals pass through), since opencv isn't in the image.

TPU notes: the ControlNet branch and the UNet run inside one jit; residuals
are plain adds on the skip tensors, which XLA fuses into the surrounding
convs.  Zero-init projections make the branch a no-op at init (standard
ControlNet property), preserved by the tests."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds

from ...utils.schedule import C_jax
from .stable_diffusion import PromptEmbeddings, StableDiffusionConfig, StableDiffusionGuidance
from .zero123.scheduler import add_noise
from .zero123.unet import (
    Downsample,
    GroupNorm32,
    ResBlock,
    SpatialTransformer,
    timestep_embedding,
)


class ControlNetModel(nn.Module):
    """Encoder+mid copy of UNetModel emitting zero-init residuals.

    Mirrors the layer layout of UNetModel's down path exactly so residual
    shapes line up with the skip stack."""

    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_heads: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, hint, t, context):
        """x: (B, h, w, 4) noisy latents; hint: (B, 8h, 8w, 3) control image
        in [0,1]; returns {"down": [...], "mid": r}."""
        mc = self.model_channels
        emb = timestep_embedding(t, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_embed_0")(emb.astype(self.dtype))
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        # hint encoder: strided conv stack down to latent res (8x for SD's
        # 512->64; adapts to the actual hint/latent ratio), zero-out
        n_down = 0
        s = hint.shape[1]
        while s > x.shape[1]:
            s //= 2
            n_down += 1
        widths = [16] + [min(16 * 2 ** (i + 1), 256) for i in range(n_down)] + [256]
        g = hint.astype(self.dtype)
        for i, w in enumerate(widths):
            stride = 2 if 1 <= i <= n_down else 1
            g = nn.silu(nn.Conv(w, (3, 3), strides=stride, padding=1,
                                dtype=self.dtype, name=f"hint_{i}")(g))
        g = nn.Conv(mc, (3, 3), padding=1, kernel_init=nn.initializers.zeros,
                    dtype=self.dtype, name="hint_out")(g)

        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        h = h + g

        def zero_proj(h, i):
            return nn.Conv(h.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                           dtype=self.dtype, name=f"zero_{i}")(h)

        down = [zero_proj(h, 0)]
        dsf = 1
        zi = 1
        for level, mult in enumerate(self.channel_mult):
            ch = mc * mult
            for i in range(self.num_res_blocks):
                h = ResBlock(ch, self.dtype, name=f"down_{level}_{i}_res")(h, emb)
                if dsf in self.attention_resolutions:
                    h = SpatialTransformer(self.num_heads, 1, self.dtype,
                                           name=f"down_{level}_{i}_attn")(h, context)
                down.append(zero_proj(h, zi)); zi += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype, name=f"down_{level}_ds")(h)
                down.append(zero_proj(h, zi)); zi += 1
                dsf *= 2
        ch = mc * self.channel_mult[-1]
        h = ResBlock(ch, self.dtype, name="mid_res1")(h, emb)
        h = SpatialTransformer(self.num_heads, 1, self.dtype, name="mid_attn")(h, context)
        h = ResBlock(ch, self.dtype, name="mid_res2")(h, emb)
        return {"down": down, "mid": zero_proj(h, zi)}


def canny_hint(rgb: jnp.ndarray, low: float = 0.1, high: float = 0.3) -> jnp.ndarray:
    """Sobel-magnitude edge hint in [0,1] (cv2.Canny stand-in, jit-able)."""
    gray = rgb.mean(-1, keepdims=True)
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)[..., None, None]
    ky = kx.transpose(1, 0, 2, 3)
    dn = ("NHWC", "HWIO", "NHWC")
    gx = jax.lax.conv_general_dilated(gray, kx, (1, 1), "SAME", dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(gray, ky, (1, 1), "SAME", dimension_numbers=dn)
    mag = jnp.sqrt(gx * gx + gy * gy + 1e-12)
    edge = jnp.clip((mag - low) / (high - low), 0.0, 1.0)
    return jnp.broadcast_to(edge, rgb.shape)


def normal_hint(normals: jnp.ndarray) -> jnp.ndarray:
    """Rendered world-space normals (B,H,W,3) in [-1,1] -> hint in [0,1]."""
    return normals * 0.5 + 0.5


@dataclass
class ControlNetConfig(StableDiffusionConfig):
    guidance_scale: float = 7.5
    condition_scale: float = 1.5
    control_type: str = "normal"  # normal | canny


@ds.register("stable-diffusion-controlnet-guidance")
class ControlNetGuidance(StableDiffusionGuidance):
    def __init__(self, cfg: ControlNetConfig | dict | None = None):
        if isinstance(cfg, dict):
            import dataclasses

            names = {f.name for f in dataclasses.fields(ControlNetConfig)}
            cfg = ControlNetConfig(**{k: v for k, v in cfg.items() if k in names})
        cfg = cfg or ControlNetConfig()
        super().__init__(cfg)
        self.controlnet = ControlNetModel(
            model_channels=cfg.model_channels, channel_mult=cfg.channel_mult,
            num_res_blocks=cfg.num_res_blocks, num_heads=cfg.num_heads,
            dtype=cfg.dtype,
        )

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        params = super().init_params(rng)
        c = self.cfg
        S = c.image_size
        L = S // 8  # true VAE latent resolution (the hint encoder's conv
        # stack depth depends on the hint/latent ratio, so init must match)
        params["controlnet"] = self.controlnet.init(
            jax.random.fold_in(rng, 7),
            jnp.zeros((1, L, L, 4)), jnp.zeros((1, S, S, 3)), jnp.zeros((1,)),
            jnp.zeros((1, 77, c.context_dim)),
        )["params"]
        return params

    def make_hint(self, rgb: jnp.ndarray, normals: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        if self.cfg.control_type == "normal":
            if normals is None:
                raise ValueError("control_type=normal needs rendered normals")
            return normal_hint(normals)
        return canny_hint(rgb)

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
        hint: Optional[jnp.ndarray] = None,
        rgb_as_latents: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        cfg: ControlNetConfig = self.cfg
        sched = self.schedule
        B = rgb.shape[0]
        latents = self.encode_images(params, rgb)
        if hint is None:
            hint = canny_hint(jax.lax.stop_gradient(rgb))
        S = cfg.image_size
        hint = jax.image.resize(jax.lax.stop_gradient(hint), (B, S, S, 3), "bilinear")

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
        hint_in = jnp.concatenate([hint] * 2, 0)
        control = self.controlnet.apply(
            {"params": params["controlnet"]}, x_in, hint_in, t_in, context
        )
        control = jax.tree_util.tree_map(lambda r: r * cfg.condition_scale, control)
        eps = self.unet.apply({"params": params["unet"]}, x_in, t_in, context,
                              control=control)
        eps_u, eps_c = jnp.split(eps, 2, 0)
        eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)

        grad = self._weight(t) * (eps - noise)
        grad = jnp.nan_to_num(grad)
        if cfg.grad_clip is not None:
            grad = jnp.clip(grad, -cfg.grad_clip, cfg.grad_clip)
        target = jax.lax.stop_gradient(latents - grad)
        loss = 0.5 * ((latents - target) ** 2).sum() / B
        return {"loss_sds": loss, "grad_norm": jnp.linalg.norm(grad)}
