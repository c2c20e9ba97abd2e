"""Backgrounds.

``solid-color-background`` parity with
threestudio/models/background/solid_color_background.py:13-51: fixed or
learned color, optional random-color augmentation during training.  As a
functional module: params pytree + pure apply.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds


@ds.register("neural-environment-map-background")
@ds.register("gaussian-mvdream-neural-environment-map-background")
@dataclass
class NeuralEnvironmentMapBackground:
    """Direction-conditioned MLP background (threestudio/models/background/
    neural_environment_map_background.py + the plugin variant,
    custom/.../background/gaussian_mvdream_background.py:14-72): frequency-
    encoded view directions -> tiny MLP -> rgb, optional random-color
    substitution during training."""

    n_output_dims: int = 3
    color_activation: str = "sigmoid"
    n_frequencies: int = 6
    n_neurons: int = 16
    n_hidden_layers: int = 2
    random_aug: bool = False
    random_aug_prob: float = 0.5

    def init_params(self, rng: jax.Array) -> dict:
        from ..ops.hashgrid import frequency_encode

        in_dim = 3 * 2 * self.n_frequencies
        dims = [in_dim] + [self.n_neurons] * self.n_hidden_layers + [self.n_output_dims]
        keys = jax.random.split(rng, len(dims) - 1)
        layers = []
        for k, (a, b) in zip(keys, zip(dims[:-1], dims[1:])):
            lim = (6.0 / (a + b)) ** 0.5
            layers.append({
                "w": jax.random.uniform(k, (a, b), jnp.float32, -lim, lim),
                "b": jnp.zeros((b,), jnp.float32),
            })
        return {"layers": layers}

    def __call__(self, params: dict, dirs: jnp.ndarray,
                 rng: Optional[jax.Array] = None, training: bool = False) -> jnp.ndarray:
        from ..ops.hashgrid import frequency_encode
        from ..utils.misc import get_activation

        x = frequency_encode(dirs, self.n_frequencies)
        for i, layer in enumerate(params["layers"]):
            x = x @ layer["w"] + layer["b"]
            if i < len(params["layers"]) - 1:
                x = jax.nn.relu(x)
        color = get_activation(self.color_activation)(x)
        if training and self.random_aug and rng is not None:
            k1, k2 = jax.random.split(rng)
            rand_color = jnp.broadcast_to(
                jax.random.uniform(k1, (self.n_output_dims,)), color.shape
            )
            use_rand = jax.random.uniform(k2) < self.random_aug_prob
            color = jnp.where(use_rand, rand_color, color)
        return color


@ds.register("solid-color-background")
@dataclass
class SolidColorBackground:
    n_output_dims: int = 3
    color: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    learned: bool = False
    random_aug: bool = False
    random_aug_prob: float = 0.5

    def init_params(self):
        return {"color": jnp.asarray(self.color, jnp.float32)} if self.learned else {}

    def __call__(self, params: dict, rng: Optional[jax.Array] = None, training: bool = False) -> jnp.ndarray:
        color = params.get("color", jnp.asarray(self.color, jnp.float32))
        if training and self.random_aug and rng is not None:
            k1, k2 = jax.random.split(rng)
            rand_color = jax.random.uniform(k1, (self.n_output_dims,))
            use_rand = jax.random.uniform(k2) < self.random_aug_prob
            color = jnp.where(use_rand, rand_color, color)
        return color


@ds.register("textured-background")
@dataclass
class TexturedBackground:
    """Learnable equirect texture background
    (threestudio/models/background/textured_background.py:14-55): direction →
    spherical (u, v) → bilinear sample of a (H, W, C) texture, sigmoid color.

    grid_sample(reflection padding) is replaced by explicit index math:
    wrap in azimuth, clamp at the poles — identical inside the texture."""

    n_output_dims: int = 3
    height: int = 64
    width: int = 64

    def init_params(self, rng: jax.Array) -> dict:
        return {"texture": jax.random.normal(rng, (self.height, self.width, self.n_output_dims))}

    def __call__(self, params: dict, dirs: jnp.ndarray, **kwargs) -> jnp.ndarray:
        tex = params["texture"]
        H, W, _ = tex.shape
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        xy = jnp.sqrt(x * x + y * y + 1e-12)
        u = jnp.arctan2(xy, z) / jnp.pi            # [0, 1] polar
        v = (jnp.arctan2(y, x) / (2 * jnp.pi)) % 1.0
        fi = jnp.clip(u * (H - 1), 0, H - 1)
        fj = v * W
        i0 = jnp.floor(fi).astype(jnp.int32)
        j0 = jnp.floor(fj).astype(jnp.int32) % W
        i1 = jnp.minimum(i0 + 1, H - 1)
        j1 = (j0 + 1) % W
        wi = (fi - i0)[..., None]
        wj = (fj - jnp.floor(fj))[..., None]
        c = ((1 - wi) * ((1 - wj) * tex[i0, j0] + wj * tex[i0, j1])
             + wi * ((1 - wj) * tex[i1, j0] + wj * tex[i1, j1]))
        return jax.nn.sigmoid(c)
