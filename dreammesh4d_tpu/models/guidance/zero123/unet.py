"""Zero123 / Stable-Diffusion-style UNet in flax.

TPU-native port of the LDM ``UNetModel`` consumed by the reference guidance
(extern/ldm_zero123/modules/diffusionmodules/openaimodel.py, architecture
pinned by load/zero123/sd-objaverse-finetune-c_concat-256.yaml:28-43):
in 8ch (4 noisy ⊕ 4 conditioning latent), out 4ch, model_channels 320,
channel_mult [1,2,4,4], 2 res blocks/level, spatial transformer (depth 1,
context 768) at downsample factors {1,2,4}, 8 heads (dim_head = ch/8,
legacy=False).

Differences by design (TPU-first): NHWC layout throughout (XLA conv native
layout), bf16 parameter/compute dtype with fp32 GroupNorm/LayerNorm/softmax —
the principled version of the reference's fp16-with-fp32-norms patch
(guidance/temporal_stable_zero123_guidance.py:104-135); attention uses one
fused einsum per projection batch.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0) -> jnp.ndarray:
    """OpenAI sinusoidal embedding: cat([cos, sin]) (util.timestep_embedding)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1)


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in fp32 regardless of activation dtype
    (parity with extern/ldm_zero123/modules/diffusionmodules/util.py:242-244).

    ``eps``: 1e-5 for UNet res blocks (torch nn.GroupNorm default via
    openaimodel normalization()), 1e-6 for the spatial-transformer and VAE
    norms (attention.py:77-78 / model.py:39-42 Normalize)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        # largest divisor of C that is <= 32 (full-size SD channels are all
        # multiples of 32; tiny test configs may not be)
        C = x.shape[-1]
        groups = min(32, C)
        while C % groups != 0:
            groups -= 1
        x = nn.GroupNorm(num_groups=groups, epsilon=self.eps, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return x.astype(orig)


class ResBlock(nn.Module):
    out_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        h = GroupNorm32(name="norm_in")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(h)
        e = nn.Dense(self.out_ch, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + e[:, None, None, :]
        h = GroupNorm32(name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_out")(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h


def _attention(q, k, v, num_heads: int):
    """Multi-head attention with fp32 softmax.  q/k/v: (B, L, C)."""
    B, Lq, C = q.shape
    Lk = k.shape[1]
    dh = C // num_heads
    q = q.reshape(B, Lq, num_heads, dh)
    k = k.reshape(B, Lk, num_heads, dh)
    v = v.reshape(B, Lk, num_heads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits / math.sqrt(dh)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out.reshape(B, Lq, C)


class CrossAttention(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        C = x.shape[-1]
        ctx = x if context is None else context
        q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        out = _attention(q, k, v, self.num_heads)
        return nn.Dense(C, dtype=self.dtype, name="to_out")(out)


class FeedForwardGEGLU(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        h = nn.Dense(C * 8, dtype=self.dtype, name="proj_in")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        h = a * nn.gelu(gate)
        return nn.Dense(C, dtype=self.dtype, name="proj_out")(h)


class LayerNorm32(nn.Module):
    @nn.compact
    def __call__(self, x):
        orig = x.dtype
        # epsilon 1e-5 = torch nn.LayerNorm default (attention.py:222-224)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)(
            x.astype(jnp.float32)
        ).astype(orig)


class TransformerBlock(nn.Module):
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        x = x + CrossAttention(self.num_heads, self.dtype, name="attn1")(LayerNorm32(name="norm1")(x))
        x = x + CrossAttention(self.num_heads, self.dtype, name="attn2")(LayerNorm32(name="norm2")(x), context)
        x = x + FeedForwardGEGLU(self.dtype, name="ff")(LayerNorm32(name="norm3")(x))
        return x


class SpatialTransformer(nn.Module):
    num_heads: int
    depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, context):
        B, H, W, C = x.shape
        h = GroupNorm32(eps=1e-6, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(B, H * W, C)
        for i in range(self.depth):
            h = TransformerBlock(self.num_heads, self.dtype, name=f"block_{i}")(h, context)
        h = h.reshape(B, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="proj_out")(h)
        return x + h


class Downsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding=1, dtype=self.dtype, name="op")(x)


class Upsample(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), "nearest")
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class UNetModel(nn.Module):
    """NHWC UNet; call with x (B, H, W, in_ch), t (B,), context (B, L, 768)."""

    in_channels: int = 8
    out_channels: int = 4
    model_channels: int = 320
    channel_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (4, 2, 1)
    num_heads: int = 8
    transformer_depth: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t, context, control=None):
        """``control``: optional dict {"down": [residual per skip], "mid": r}
        produced by a ControlNet branch — residuals are added to the skip
        activations and the mid output (the standard ControlNet injection
        points)."""
        mc = self.model_channels
        emb = timestep_embedding(t, mc)
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_embed_0")(emb.astype(self.dtype))
        emb = nn.Dense(mc * 4, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        hs = []
        h = nn.Conv(mc, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x.astype(self.dtype))
        hs.append(h)
        ds = 1
        # down
        for level, mult in enumerate(self.channel_mult):
            ch = mc * mult
            for i in range(self.num_res_blocks):
                h = ResBlock(ch, self.dtype, name=f"down_{level}_{i}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpatialTransformer(
                        self.num_heads, self.transformer_depth, self.dtype,
                        name=f"down_{level}_{i}_attn")(h, context)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = Downsample(self.dtype, name=f"down_{level}_ds")(h)
                hs.append(h)
                ds *= 2
        # middle
        ch = mc * self.channel_mult[-1]
        h = ResBlock(ch, self.dtype, name="mid_res1")(h, emb)
        h = SpatialTransformer(self.num_heads, self.transformer_depth, self.dtype,
                               name="mid_attn")(h, context)
        h = ResBlock(ch, self.dtype, name="mid_res2")(h, emb)
        if control is not None:
            h = h + control["mid"]
            hs = [s + c for s, c in zip(hs, control["down"])]
        # up
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            ch = mc * mult
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], -1)
                h = ResBlock(ch, self.dtype, name=f"up_{level}_{i}_res")(h, emb)
                if ds in self.attention_resolutions:
                    h = SpatialTransformer(
                        self.num_heads, self.transformer_depth, self.dtype,
                        name=f"up_{level}_{i}_attn")(h, context)
            if level != 0:
                h = Upsample(self.dtype, name=f"up_{level}_us")(h)
                ds //= 2

        h = GroupNorm32(name="norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_out")(h)
        return h.astype(jnp.float32)
