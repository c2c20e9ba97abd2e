"""GAN volume renderer (Control4D) — low-res NeRF + GAN super-resolution.

Parity with threestudio/models/renderers/gan_volume_renderer.py:20-170 and
the supporting networks in threestudio/utils/GAN/vae.py: the base renderer
draws a LOW-RES image with 3 rgb + 4 latent channels; a VAE-style posterior
over the latent channels samples a z-map; a conditional generator upsamples
(rgb, z) to full resolution, conditioned on a global style code (and, at
guidance level 2, a local encoder of the ground-truth image).  The hinge-GAN
discriminator lives in utils/gan.py.

TPU redesign notes:
- the reference draws ``generator_level`` / pixel-interval offsets with
  python RNG inside forward; here they are ARGUMENTS (traced values drawn by
  the caller) so the whole renderer jits once,
- modules are flax linen with NHWC layouts and GroupNorm (stateless) in
  place of the reference's ActNorm/BatchNorm."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds


class _ResBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x, code=None):
        h = nn.GroupNorm(num_groups=min(8, x.shape[-1]))(x)
        if code is not None:  # FiLM conditioning (class-conditional norm)
            scale = nn.Dense(x.shape[-1], name="film_s")(code)
            shift = nn.Dense(x.shape[-1], name="film_b")(code)
            h = h * (1 + scale[:, None, None, :]) + shift[:, None, None, :]
        h = nn.Conv(self.ch, (3, 3), padding=1)(nn.silu(h))
        h = nn.Conv(self.ch, (3, 3), padding=1)(nn.silu(nn.GroupNorm(num_groups=min(8, self.ch))(h)))
        if x.shape[-1] != self.ch:
            x = nn.Conv(self.ch, (1, 1))(x)
        return x + h


class GlobalEncoder(nn.Module):
    """Low-res rgb -> global style code (GAN/vae.py GlobalEncoder)."""

    code_dim: int = 64

    @nn.compact
    def __call__(self, rgb):
        h = rgb
        for ch in (32, 64, 128):
            h = nn.silu(nn.Conv(ch, (3, 3), strides=2, padding=1)(h))
        h = h.mean((1, 2))  # GAP
        return nn.Dense(self.code_dim)(h)


class LocalEncoder(nn.Module):
    """Full-res gt rgb -> latent z-map at base resolution."""

    z_channels: int = 4
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    ch: int = 32

    @nn.compact
    def __call__(self, rgb):
        h = nn.Conv(self.ch, (3, 3), padding=1)(rgb)
        for m in self.ch_mult[1:]:
            h = _ResBlock(self.ch * m)(h)
            B, H, W, C = h.shape
            h = nn.Conv(C, (3, 3), strides=2, padding=1)(h)
        return nn.Conv(self.z_channels, (3, 3), padding=1)(h)


class Generator(nn.Module):
    """(lr rgb + z, global code) -> full-res rgb (GAN/vae.py Generator)."""

    ch: int = 64
    out_ch: int = 3
    ch_mult: Tuple[int, ...] = (1, 2, 4)

    @nn.compact
    def __call__(self, x, code):
        h = nn.Conv(self.ch * self.ch_mult[-1], (3, 3), padding=1)(x)
        for m in reversed(self.ch_mult):
            h = _ResBlock(self.ch * m)(h, code)
            if m != self.ch_mult[0]:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1)(h)
        h = nn.silu(nn.GroupNorm(num_groups=8)(h))
        return nn.sigmoid(nn.Conv(self.out_ch, (3, 3), padding=1)(h))


def posterior_sample(latent: jnp.ndarray, rng: Optional[jax.Array]) -> jnp.ndarray:
    """DiagonalGaussianDistribution over (..., 2k) moments: mode when rng is
    None, sample otherwise (GAN/distribution.py)."""
    k = latent.shape[-1] // 2
    mean, logvar = latent[..., :k], jnp.clip(latent[..., k:], -30.0, 20.0)
    if rng is None:
        return mean
    return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)


@ds.register("gan-volume-renderer")
@dataclass
class GANVolumeRenderer:
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    z_channels: int = 4

    def init_params(self, rng: jax.Array, lr_hw: int = 64) -> Dict[str, Any]:
        self.generator = Generator(ch=self.ch, ch_mult=self.ch_mult)
        self.local_encoder = LocalEncoder(z_channels=self.z_channels, ch_mult=self.ch_mult)
        self.global_encoder = GlobalEncoder()
        k1, k2, k3 = jax.random.split(rng, 3)
        scale = 2 ** (len(self.ch_mult) - 1)
        lr = lr_hw
        return {
            "generator": self.generator.init(
                k1, jnp.zeros((1, lr, lr, 3 + self.z_channels)), jnp.zeros((1, 64)))["params"],
            "local_encoder": self.local_encoder.init(
                k2, jnp.zeros((1, lr * scale, lr * scale, 3)))["params"],
            "global_encoder": self.global_encoder.init(
                k3, jnp.zeros((1, lr, lr, 3)))["params"],
        }

    def __call__(
        self,
        params: Dict[str, Any],
        base_renderer: Callable[..., Dict[str, jnp.ndarray]],
        rays_o: jnp.ndarray,
        rays_d: jnp.ndarray,
        gt_rgb: Optional[jnp.ndarray] = None,
        generator_level: int = 0,
        rng: Optional[jax.Array] = None,
        **kwargs,
    ) -> Dict[str, jnp.ndarray]:
        """The base renderer must output ``comp_rgb`` with 3 + 2*z_channels
        channels (rgb + latent moments) at the downsampled resolution."""
        B, H, W, _ = rays_o.shape
        scale = 2 ** (len(self.ch_mult) - 1)
        lo = jax.image.resize(rays_o, (B, H // scale, W // scale, 3), "bilinear")
        ld = jax.image.resize(rays_d, (B, H // scale, W // scale, 3), "bilinear")
        out = dict(base_renderer(lo, ld, **kwargs))
        comp = out["comp_rgb"]
        rgb_lr, latent = comp[..., :3], comp[..., 3:]
        out["comp_lr_rgb"] = rgb_lr

        z = posterior_sample(latent, rng if generator_level > 0 else None)
        if generator_level >= 1 and gt_rgb is not None:
            code_src = jax.image.resize(gt_rgb, (B, H // scale, W // scale, 3), "bilinear")
        else:
            code_src = rgb_lr
        g_code = self.global_encoder.apply({"params": params["global_encoder"]}, code_src)
        if generator_level == 2 and gt_rgb is not None:
            z = self.local_encoder.apply({"params": params["local_encoder"]}, gt_rgb)
        gan_rgb = self.generator.apply(
            {"params": params["generator"]},
            jnp.concatenate([rgb_lr, z], -1), g_code)
        out["comp_gan_rgb"] = gan_rgb
        return out
