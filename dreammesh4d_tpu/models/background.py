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
