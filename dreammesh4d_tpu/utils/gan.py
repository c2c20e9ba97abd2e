"""GAN utilities (PatchGAN discriminator + hinge losses), functional JAX.

Parity with threestudio/utils/GAN/{discriminator.py,loss.py} (the Control4D
adversarial stack; unused by the DreamMesh4D pipeline but part of the
framework surface): an N-layer PatchGAN discriminator and the hinge
generator/discriminator objectives.

The reference's ActNorm (data-dependent init) is replaced by GroupNorm —
stateless, jit-friendly on TPU (no "initialized" buffer mutation inside the
step), with the same normalization role."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class DiscriminatorConfig:
    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3


def init_discriminator(cfg: DiscriminatorConfig, rng: jax.Array) -> Dict[str, Any]:
    """PatchGAN: 4x4 stride-2 convs doubling channels (cap 8x), then a
    stride-1 conv and a 1-channel head (discriminator.py:NLayerDiscriminator)."""
    layers = []
    c_in = cfg.input_nc
    mults = [1] + [min(2 ** i, 8) for i in range(1, cfg.n_layers + 1)]
    k = rng
    for i, m in enumerate(mults):
        c_out = cfg.ndf * m
        k, k1 = jax.random.split(k)
        # strides/norm flags are structural (derived from position in
        # apply_discriminator) so the param tree stays all-float for grad
        layers.append({
            "w": jax.random.normal(k1, (4, 4, c_in, c_out)) * 0.02,
            "b": jnp.zeros((c_out,)),
        })
        c_in = c_out
    k, k1 = jax.random.split(k)
    head = {"w": jax.random.normal(k1, (4, 4, c_in, 1)) * 0.02, "b": jnp.zeros((1,))}
    return {"layers": layers, "head": head}


def _groupnorm(x: jnp.ndarray, groups: int = 32) -> jnp.ndarray:
    C = x.shape[-1]
    g = min(groups, C)
    while C % g != 0:
        g -= 1
    shape = x.shape[:-1] + (g, C // g)
    xg = x.reshape(shape)
    mean = xg.mean((1, 2, 4), keepdims=True)
    var = xg.var((1, 2, 4), keepdims=True)
    return ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(x.shape)


def apply_discriminator(params, x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C) -> (B, h, w, 1) patch logits."""
    h = x
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        s = 2 if i < n - 1 else 1
        h = jax.lax.conv_general_dilated(
            h, layer["w"], (s, s), [(1, 2), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + layer["b"]
        if i > 0:
            h = _groupnorm(h)
        h = jax.nn.leaky_relu(h, 0.2)
    return jax.lax.conv_general_dilated(
        h, params["head"]["w"], (1, 1), [(1, 2), (1, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["head"]["b"]


def hinge_d_loss(logits_real: jnp.ndarray, logits_fake: jnp.ndarray) -> jnp.ndarray:
    """GAN/loss.py:hinge_d_loss."""
    return 0.5 * (jax.nn.relu(1.0 - logits_real).mean() + jax.nn.relu(1.0 + logits_fake).mean())


def generator_loss(params, reconstructions: jnp.ndarray, cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GAN/loss.py:generator_loss — -mean D(fake)."""
    x = reconstructions if cond is None else jnp.concatenate([reconstructions, cond], -1)
    return -apply_discriminator(params, x).mean()


def discriminator_loss(params, inputs: jnp.ndarray, reconstructions: jnp.ndarray,
                       cond: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """GAN/loss.py:discriminator_loss — hinge on detached real/fake."""
    real = jax.lax.stop_gradient(inputs)
    fake = jax.lax.stop_gradient(reconstructions)
    if cond is not None:
        real = jnp.concatenate([real, cond], -1)
        fake = jnp.concatenate([fake, cond], -1)
    return hinge_d_loss(apply_discriminator(params, real), apply_discriminator(params, fake))
