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


# ---------------------------------------------------------------------------
# pbr-material (threestudio/models/materials/pbr_material.py:17-140)
# ---------------------------------------------------------------------------


@ds.register("pbr-material")
@dataclass
class PBRMaterial:
    """Split-sum PBR shading, TPU-first.

    Differences from the reference by design:
    - the ``bsdf_256_256.bin`` FG LUT (a texture fetch through nvdiffrast)
      is replaced by the Karis/Lazarov analytic environment-BRDF
      approximation — pure fused arithmetic, no gather, LUT-accurate to
      ~1e-2 over the valid (n·v, roughness) square;
    - the HDR environment (``envlight`` CUDA mip pyramid) is a learnable
      equirect latitude-gradient sky by default (``init_params``), sampled
      with roughness-dependent blur via lerped pre-blurred levels; a user
      HDR array can be passed to ``init_params(envmap=...)``.
    """

    material_activation: str = "sigmoid"
    environment_scale: float = 2.0
    min_metallic: float = 0.0
    max_metallic: float = 0.9
    min_roughness: float = 0.08
    max_roughness: float = 0.9
    use_bump: bool = True
    env_height: int = 32
    env_width: int = 64
    n_levels: int = 4
    requires_normal: bool = True

    def init_params(self, rng: jax.Array, envmap=None) -> dict:
        import numpy as np

        H, W = self.env_height, self.env_width
        if envmap is None:
            # simple sky: bright top, dim bottom (placeholder HDR)
            lat = np.linspace(1.5, 0.15, H, dtype=np.float32)[:, None, None]
            envmap = np.broadcast_to(lat, (H, W, 3)).copy()
        base = jnp.asarray(envmap, jnp.float32) * self.environment_scale
        # pre-blurred pyramid (host-free: separable box blurs in jnp)
        levels = [base]
        cur = base
        for _ in range(self.n_levels - 1):
            k = jnp.ones((5,)) / 5.0
            cur = jnp.apply_along_axis(lambda r: jnp.convolve(r, k, "same"), 0, cur)
            cur = jnp.apply_along_axis(lambda r: jnp.convolve(r, k, "same"), 1, cur)
            levels.append(cur)
        return {"env_levels": jnp.stack(levels)}  # (L, H, W, 3)

    def _sample_env(self, params, dirs: jnp.ndarray, roughness=None) -> jnp.ndarray:
        """Equirect nearest-bilinear sample with roughness-lerped blur level."""
        lv = params["env_levels"]
        L, H, W, _ = lv.shape
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        u = jnp.arccos(jnp.clip(z, -1, 1)) / jnp.pi          # [0,1] polar
        v = (jnp.arctan2(y, x) / (2 * jnp.pi)) % 1.0          # [0,1] azimuth
        fi = jnp.clip(u * (H - 1), 0, H - 1)
        fj = v * W
        i0 = jnp.floor(fi).astype(jnp.int32)
        j0 = jnp.floor(fj).astype(jnp.int32) % W
        i1 = jnp.minimum(i0 + 1, H - 1)
        j1 = (j0 + 1) % W
        wi = (fi - i0)[..., None]
        wj = (fj - jnp.floor(fj))[..., None]

        if roughness is None:
            lev = jnp.zeros(dirs.shape[:-1] + (1,))
        else:
            lev = jnp.clip(roughness, 0, 1) * (L - 1)
        l0 = jnp.clip(jnp.floor(lev[..., 0]).astype(jnp.int32), 0, L - 1)
        l1 = jnp.minimum(l0 + 1, L - 1)
        wl = (lev[..., 0] - l0)[..., None]

        def bilerp(l):
            c00 = lv[l, i0, j0]
            c01 = lv[l, i0, j1]
            c10 = lv[l, i1, j0]
            c11 = lv[l, i1, j1]
            return ((1 - wi) * ((1 - wj) * c00 + wj * c01)
                    + wi * ((1 - wj) * c10 + wj * c11))

        return (1 - wl) * bilerp(l0) + wl * bilerp(l1)

    @staticmethod
    def _env_brdf_approx(n_dot_v: jnp.ndarray, roughness: jnp.ndarray):
        """Karis mobile split-sum approximation of the FG LUT."""
        c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022])
        c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04])
        r = roughness * c0 + c1
        a004 = jnp.minimum(r[..., 0:1] * r[..., 0:1],
                           jnp.exp2(-9.28 * n_dot_v)) * r[..., 0:1] + r[..., 1:2]
        fg_a = -1.04 * a004 + r[..., 2:3]
        fg_b = 1.04 * a004 + r[..., 3:4]
        return fg_a, fg_b

    def __call__(self, features, viewdirs=None, shading_normal=None,
                 tangent=None, params=None, **kwargs):
        from ..ops.safe_math import safe_normalize

        material = jax.nn.sigmoid(features)
        albedo = material[..., :3]
        metallic = material[..., 3:4] * (self.max_metallic - self.min_metallic) + self.min_metallic
        roughness = material[..., 4:5] * (self.max_roughness - self.min_roughness) + self.min_roughness

        if viewdirs is None or shading_normal is None or params is None:
            return albedo

        if self.use_bump and tangent is not None:
            perturb = (material[..., 5:8] * 2 - 1) + jnp.asarray([0.0, 0.0, 1.0])
            perturb = safe_normalize(jnp.clip(perturb, -1, 1))
            bitangent = safe_normalize(jnp.cross(tangent, shading_normal))
            shading_normal = (tangent * perturb[..., 0:1]
                              - bitangent * perturb[..., 1:2]
                              + shading_normal * perturb[..., 2:3])
            shading_normal = safe_normalize(shading_normal)

        v = -viewdirs
        n_dot_v = (shading_normal * v).sum(-1, keepdims=True)
        reflective = n_dot_v * shading_normal * 2 - v

        diffuse_albedo = (1 - metallic) * albedo
        fg_a, fg_b = self._env_brdf_approx(jnp.clip(n_dot_v, 0, 1),
                                           jnp.clip(roughness, 0, 1))
        F0 = (1 - metallic) * 0.04 + metallic * albedo
        specular_albedo = F0 * fg_a + fg_b

        diffuse_light = self._sample_env(params, shading_normal, jnp.ones_like(roughness))
        specular_light = self._sample_env(params, reflective, roughness)
        color = diffuse_albedo * diffuse_light + specular_albedo * specular_light
        return jnp.clip(color, 0.0, 1.0)

    def export(self, features, **kwargs) -> dict:
        material = jax.nn.sigmoid(features)
        return {
            "albedo": material[..., :3],
            "metallic": material[..., 3:4] * (self.max_metallic - self.min_metallic) + self.min_metallic,
            "roughness": material[..., 4:5] * (self.max_roughness - self.min_roughness) + self.min_roughness,
        }


# ---------------------------------------------------------------------------
# neural-radiance-material (threestudio/models/materials/neural_radiance_material.py)
# ---------------------------------------------------------------------------


@ds.register("neural-radiance-material")
@dataclass
class NeuralRadianceMaterial:
    """View-dependent color head: SH-encoded viewdirs + features -> MLP -> rgb."""

    input_feature_dims: int = 8
    sh_degree: int = 3
    n_neurons: int = 16
    n_hidden_layers: int = 2

    def init_params(self, rng: jax.Array) -> dict:
        from .geometry.implicit_volume import _mlp_init

        n_sh = (self.sh_degree + 1) ** 2
        dims = ([self.input_feature_dims + n_sh]
                + [self.n_neurons] * self.n_hidden_layers + [3])
        return {"mlp": _mlp_init(rng, dims)}

    def __call__(self, features, viewdirs=None, params=None, **kwargs):
        from .geometry.implicit_volume import _mlp_apply

        if viewdirs is None or params is None:
            return jax.nn.sigmoid(features[..., :3])
        sh_basis = _sh_basis(self.sh_degree, viewdirs)
        inp = jnp.concatenate([features[..., : self.input_feature_dims], sh_basis], -1)
        return jax.nn.sigmoid(_mlp_apply(params["mlp"], inp))


def _sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Raw SH basis values (N, (deg+1)^2) — identity coefficients."""
    from ..ops.sh import eval_sh, num_sh_bases

    n = num_sh_bases(deg)
    eye = jnp.eye(n)[None]  # (1, n, n) "coefficients" picking each basis fn
    eye = jnp.broadcast_to(eye, dirs.shape[:-1] + (n, n))
    return eval_sh(deg, eye, dirs)


@ds.register("hybrid-rgb-latent-material")
@dataclass
class HybridRGBLatentMaterial:
    """Geometry features carry RGB (first 3 dims, activated) + raw latent
    channels (passed through) — the latent-NeRF hybrid decoding
    (threestudio/models/materials/hybrid_rgb_latent_material.py:15-36)."""

    n_output_dims: int = 3
    color_activation: str = "sigmoid"
    requires_normal: bool = True

    def __call__(self, features: jnp.ndarray, **kwargs) -> jnp.ndarray:
        from ..utils.misc import get_activation

        rgb = get_activation(self.color_activation)(features[..., :3])
        return jnp.concatenate([rgb, features[..., 3:]], axis=-1)


# fixed linear latent->RGB decode used for previewing SD latents
# (sd_latent_adapter_material.py:21-33); a learnable parameter there, so
# expose init_params to make it trainable here too.
_SD_LATENT_ADAPTER = (
    (0.298, 0.207, 0.208),
    (0.187, 0.286, 0.173),
    (-0.158, 0.189, 0.264),
    (-0.184, -0.271, -0.473),
)


@ds.register("sd-latent-adapter-material")
@dataclass
class SDLatentAdapterMaterial:
    """4-channel SD latent -> approximate RGB via a (trainable) 4x3 adapter
    (sd_latent_adapter_material.py:14-42)."""

    def init_params(self, rng: jax.Array | None = None) -> dict:
        return {"adapter": jnp.asarray(_SD_LATENT_ADAPTER, jnp.float32)}

    def __call__(self, features: jnp.ndarray, params: Optional[dict] = None,
                 **kwargs) -> jnp.ndarray:
        adapter = (params or self.init_params())["adapter"]
        color = features[..., :4] @ adapter
        return jnp.clip((color + 1.0) / 2.0, 0.0, 1.0)
