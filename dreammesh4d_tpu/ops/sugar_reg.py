"""SuGaR surface regularization for the vanilla-3DGS stage.

Port of the reference ``SuGaRRegularizer`` core
(custom/threestudio-dreammesh4d/utils/sugar_utils.py:183-759), the losses
applied in the ``gaussian`` stage after ``start_sugar_reg``
(system/sugar_static.py:215-240):

- sample points inside gaussians (scale factor 1.5, uniform over alive
  gaussians; sugar_utils.py:183-230);
- density field from the 16 nearest gaussians: Σ_j o_j exp(-½ dᵀΣ_j⁻¹d)
  (sugar_utils.py:278-353) with the KNN index refreshed every
  ``reset_neighbors`` steps (host-triggered);
- β = mean smallest scaling over alive gaussians ('average' beta mode,
  sugar_utils.py:400-474);
- gaussian normals = rotation column of the SMALLEST scaling axis
  (sugar_utils.py:355-398);
- density regulation |ρ(x) − exp(−sdf²/2β²)| with sdf estimated by projecting
  onto the source gaussian's normal, and the SDF-better-normal loss
  (sugar_utils.py:620-759).
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax
import jax.numpy as jnp

from .knn import knn
from .quaternion import quat_to_matrix


class SugarRegState(NamedTuple):
    knn_idx: jnp.ndarray  # (C, K) neighbor gaussian indices


def refresh_knn(xyz: jnp.ndarray, alive: jnp.ndarray, k: int = 16) -> SugarRegState:
    """KNN among alive gaussian centers (dead slots pushed to infinity)."""
    pts = jnp.where(alive[:, None], xyz, 1e6)
    _, idx = knn(pts, pts, k=k, exclude_self=False)
    return SugarRegState(idx)


def smallest_axis_normals(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Per-gaussian normal = rotation column of the min-scale axis
    (sugar_utils.py:355-398)."""
    R = quat_to_matrix(quats)  # (N, 3, 3) columns are axes
    amin = jnp.argmin(scales, axis=-1)  # (N,)
    return jnp.take_along_axis(R, amin[:, None, None].repeat(3, 1), axis=2)[..., 0]


def sample_points_in_gaussians(rng, xyz, quats, scales, alive, n_samples: int,
                               scale_factor: float = 1.5):
    """Uniform over alive gaussians; x = μ + R (s·f·n), n ~ N(0,1)
    (sugar_utils.py:183-230 with proportional_to_volume=False)."""
    k1, k2 = jax.random.split(rng)
    C = xyz.shape[0]
    probs = alive.astype(jnp.float32)
    probs = probs / probs.sum()
    src = jax.random.choice(k1, C, (n_samples,), p=probs)
    n = jax.random.normal(k2, (n_samples, 3)) * scales[src] * scale_factor
    R = quat_to_matrix(quats[src])
    offset = jnp.einsum("nij,nj->ni", R, n)
    return xyz[src] + offset, src


def gaussian_density(samples: jnp.ndarray, neighbor_idx: jnp.ndarray,
                     xyz, quats, scales, opacities) -> jnp.ndarray:
    """ρ(x) = Σ_{j∈knn} o_j exp(-½ (x-μ_j)ᵀ Σ_j⁻¹ (x-μ_j))
    (sugar_utils.py:278-353).  samples (S,3); neighbor_idx (S,K)."""
    mu = xyz[neighbor_idx]  # (S, K, 3)
    R = quat_to_matrix(quats[neighbor_idx])  # (S, K, 3, 3)
    inv_s = 1.0 / jnp.maximum(scales[neighbor_idx], 1e-8)  # (S, K, 3)
    d = samples[:, None, :] - mu  # (S, K, 3)
    local = jnp.einsum("skji,skj->ski", R, d)  # Rᵀ d
    maha2 = ((local * inv_s) ** 2).sum(-1)
    return (opacities[neighbor_idx] * jnp.exp(-0.5 * maha2)).sum(-1)


def sugar_density_regularization(
    rng: jax.Array,
    reg_state: SugarRegState,
    xyz: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    alive: jnp.ndarray,
    n_samples: int = 1000,
    use_sdf_normal_loss: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Both regulation terms (sugar_utils.py:620-759)."""
    samples, src = sample_points_in_gaussians(rng, xyz, quats, scales, alive, n_samples)
    nbr = reg_state.knn_idx[src]  # (S, K)

    density = gaussian_density(samples, nbr, xyz, quats, scales, opacities)

    normals = smallest_axis_normals(quats, scales)  # (C, 3)
    src_normals = normals[src]
    sdf_est = ((samples - xyz[src]) * src_normals).sum(-1)

    min_scale = scales.min(-1)
    beta = jnp.where(alive, min_scale, 0.0).sum() / jnp.maximum(alive.sum(), 1)
    target = jnp.exp(-0.5 * sdf_est**2 / jnp.maximum(beta, 1e-6) ** 2)
    out = {"density_regulation": jnp.abs(density - target).mean()}

    if use_sdf_normal_loss:
        nbr_normals = normals[nbr]  # (S, K, 3)
        sign = jnp.sign((nbr_normals * src_normals[:, None]).sum(-1, keepdims=True))
        sign = jax.lax.stop_gradient(jnp.where(sign == 0, 1.0, sign))
        nbr_normals = nbr_normals * sign
        nbr_opac = jax.lax.stop_gradient(
            opacities[nbr] * jnp.exp(
                -0.5 * (((samples[:, None] - xyz[nbr]) ** 2).sum(-1)
                        / jnp.maximum(scales[nbr].min(-1) ** 2, 1e-8))
            )
        )
        w = jnp.abs(((samples[:, None] - xyz[nbr]) * nbr_normals).sum(-1))
        w = jax.lax.stop_gradient(w)
        min_sc = jax.lax.stop_gradient(
            jnp.maximum(scales[nbr].min(-1), 1e-6) ** 2
        )
        w = nbr_opac * w / min_sc
        w = w / jnp.maximum(jax.lax.stop_gradient(w.sum(-1, keepdims=True)), 1e-6)
        blended = (w[..., None] * nbr_normals).sum(-2)
        out["normal_regulation"] = ((src_normals - blended) ** 2).sum(-1).mean()
    return out
