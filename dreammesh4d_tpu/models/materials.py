"""Materials.

``no-material`` (dummy pass-through used by SuGaR stages,
sugar_static_refine.yaml:74-76) and ``diffuse-with-point-light-material``
(lambertian + ambient shading used by the static NeRF stage,
threestudio/models/materials/diffuse_with_point_light_material.py:14-120).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import dreammesh4d_tpu as ds


@ds.register("no-material")
@dataclass
class NoMaterial:
    n_output_dims: int = 0

    def __call__(self, features: jnp.ndarray, **kwargs) -> jnp.ndarray:
        return features


@ds.register("diffuse-with-point-light-material")
@dataclass
class DiffuseWithPointLightMaterial:
    ambient_light_color: Tuple[float, float, float] = (0.1, 0.1, 0.1)
    diffuse_light_color: Tuple[float, float, float] = (0.9, 0.9, 0.9)
    ambient_only_steps: int = 1000
    diffuse_prob: float = 0.75
    textureless_prob: float = 0.5
    albedo_activation: str = "sigmoid"

    def shade(
        self,
        albedo: jnp.ndarray,
        normals: jnp.ndarray,
        positions: jnp.ndarray,
        light_positions: jnp.ndarray,
        ambient_ratio: Optional[jnp.ndarray] = None,
        shading_normal_only: bool = False,
    ) -> jnp.ndarray:
        """Lambertian: color = albedo * (diffuse·max(n·l,0) + ambient).
        ``ambient_ratio`` overrides light colors (diffuse=1-a, ambient=a),
        parity with diffuse_with_point_light_material.py:62-115."""
        l = light_positions - positions
        l = l / (jnp.linalg.norm(l, axis=-1, keepdims=True) + 1e-8)
        ndotl = jnp.maximum((normals * l).sum(-1, keepdims=True), 0.0)
        if ambient_ratio is not None:
            diffuse_c = (1.0 - ambient_ratio) * jnp.ones(3)
            ambient_c = ambient_ratio * jnp.ones(3)
        else:
            diffuse_c = jnp.asarray(self.diffuse_light_color)
            ambient_c = jnp.asarray(self.ambient_light_color)
        light = ndotl * diffuse_c + ambient_c
        if shading_normal_only:
            return jnp.clip(light, 0.0, 1.0)
        return jnp.clip(albedo * light, 0.0, 1.0)

    def __call__(self, features, positions=None, shading_normal=None,
                 light_positions=None, ambient_ratio=None, **kwargs):
        albedo = jax.nn.sigmoid(features[..., :3])
        if shading_normal is None or light_positions is None:
            return albedo
        return self.shade(albedo, shading_normal, positions, light_positions, ambient_ratio)
