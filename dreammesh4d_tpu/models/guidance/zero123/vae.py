"""AutoencoderKL (SD VAE) in flax, NHWC.

Port of the LDM first stage consumed by the reference guidance
(extern/ldm_zero123/models/autoencoder.py; config
load/zero123/sd-objaverse-finetune-c_concat-256.yaml:45-66): 256² rgb ↔ 32²
4-channel latents, ch 128, ch_mult [1,2,4,4], 2 res blocks, mid-block
single-head attention, double_z.  Latent scale factor 0.18215 applied by the
guidance (``get_first_stage_encoding``, ddpm.py).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .unet import GroupNorm32


class VAEResBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = GroupNorm32(eps=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(eps=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head full attention over spatial positions (ldm AttnBlock)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="q")(h).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="k")(h).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="v")(h).reshape(B, H * W, C)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits.astype(jnp.float32) / (C**0.5), -1).astype(v.dtype)
        out = jnp.einsum("bqk,bkc->bqc", w, v).reshape(B, H, W, C)
        out = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for level, mult in enumerate(self.ch_mult):
            for i in range(self.num_res_blocks):
                h = VAEResBlock(self.ch * mult, self.dtype, name=f"down_{level}_{i}")(h)
            if level != len(self.ch_mult) - 1:
                # ldm downsample: asymmetric pad (0,1) then stride-2 valid conv
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(h.shape[-1], (3, 3), strides=2, padding="VALID",
                            dtype=self.dtype, name=f"down_{level}_ds")(h)
        ch = self.ch * self.ch_mult[-1]
        h = VAEResBlock(ch, self.dtype, name="mid_res1")(h)
        h = VAEAttnBlock(self.dtype, name="mid_attn")(h)
        h = VAEResBlock(ch, self.dtype, name="mid_res2")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        out_ch = self.z_channels * (2 if self.double_z else 1)
        return nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z):
        ch = self.ch * self.ch_mult[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = VAEResBlock(ch, self.dtype, name="mid_res1")(h)
        h = VAEAttnBlock(self.dtype, name="mid_attn")(h)
        h = VAEResBlock(ch, self.dtype, name="mid_res2")(h)
        for level, mult in list(enumerate(self.ch_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                h = VAEResBlock(self.ch * mult, self.dtype, name=f"up_{level}_{i}")(h)
            if level != 0:
                B, H, W, C = h.shape
                h = jax.image.resize(h, (B, H * 2, W * 2, C), "nearest")
                h = nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name=f"up_{level}_us")(h)
        h = GroupNorm32(eps=1e-6, name="norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    embed_dim: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    dtype: Any = jnp.float32

    def setup(self):
        self.encoder = Encoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks, dtype=self.dtype)
        self.decoder = Decoder(ch=self.ch, ch_mult=self.ch_mult,
                               num_res_blocks=self.num_res_blocks, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.embed_dim, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype)

    def encode_moments(self, x):
        """x (B,H,W,3) in [-1,1] -> (mean, logvar) each (B,h,w,4)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, -1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mode(self, x):
        mean, _ = self.encode_moments(x)
        return mean

    def encode_sample(self, x, rng):
        mean, logvar = self.encode_moments(x)
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None):
        z = self.encode_mode(x) if rng is None else self.encode_sample(x, rng)
        return self.decode(z)
