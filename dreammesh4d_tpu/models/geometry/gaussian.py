"""Vanilla 3D Gaussian splatting geometry with adaptive density control.

TPU-first redesign of the reference ``gaussian-splatting`` model
(custom/threestudio-dreammesh4d/geometry/gaussian_base.py:187-872).  XLA
needs static shapes, so the parameter store is a FIXED-CAPACITY buffer with
an ``alive`` mask; densify/clone/split/prune become masked slot rewrites
instead of tensor re-allocation + optimizer-state rebuilding
(gaussian_base.py:606-683):

- screen-space gradient statistics accumulate per step
  (add_densification_stats, :816-820);
- clone: small gaussians with grad > τ copied into dead slots (:769-798);
- split: large gaussians re-sampled from their own covariance, source
  shrunk by 1.6 in place, second sample into a dead slot (:720-767);
- prune: opacity < ε or screen/world size too big → alive=False
  (:575-579,807-814); opacity reset clamps logits (:800-806);
- Adam moment surgery = zeroing the moments of rewritten slots.

New-point count per call is capped at ``max_new`` (static) — sources are
selected by gradient-magnitude top-k, exactly the priority order the dynamic
reference achieves implicitly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.knn import dist_knn3_mean
from ...ops.quaternion import quat_apply, quat_normalize
from ...ops.sh import num_sh_bases, rgb_to_sh_dc


@dataclass(frozen=True)
class GaussianConfig:
    capacity: int = 200_000
    sh_degree: int = 3
    init_num: int = 5000
    init_radius: float = 0.5
    init_opacity: float = 0.1
    percent_dense: float = 0.01
    densify_grad_threshold: float = 0.0002
    min_opacity: float = 0.005
    max_screen_size: float = 20.0  # px; prune when exceeded (after reset warmup)
    max_world_size_ratio: float = 0.1  # × spatial extent
    spatial_extent: float = 3.8
    max_new_per_step: int = 8192


class GaussianState(NamedTuple):
    xyz: jnp.ndarray  # (C, 3)
    sh_dc: jnp.ndarray  # (C, 1, 3)
    sh_rest: jnp.ndarray  # (C, B-1, 3)
    log_scales: jnp.ndarray  # (C, 3)
    quats: jnp.ndarray  # (C, 4) wxyz
    opacity_logits: jnp.ndarray  # (C,)
    alive: jnp.ndarray  # (C,) bool


class DensifyStats(NamedTuple):
    grad_accum: jnp.ndarray  # (C,)
    denom: jnp.ndarray  # (C,)
    max_radii: jnp.ndarray  # (C,) int32


def empty_stats(capacity: int) -> DensifyStats:
    return DensifyStats(
        jnp.zeros((capacity,), jnp.float32),
        jnp.zeros((capacity,), jnp.float32),
        jnp.zeros((capacity,), jnp.int32),
    )


def _inverse_sigmoid(x: float) -> float:
    return float(np.log(x / (1 - x)))


def init_random_sphere(cfg: GaussianConfig, rng: jax.Array) -> GaussianState:
    """Random init inside a sphere (gaussian_base.py:350-370 'random' path);
    scales from 3-NN mean distances (distCUDA2 parity, :435-439)."""
    C, N = cfg.capacity, cfg.init_num
    k1, k2, k3 = jax.random.split(rng, 3)
    r = cfg.init_radius * jax.random.uniform(k1, (N, 1)) ** (1 / 3)
    d = jax.random.normal(k2, (N, 3))
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-9)
    pts = r * d
    dist2 = jnp.clip(dist_knn3_mean(pts), 1e-7, None)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, 1)
    colors = jax.random.uniform(k3, (N, 3))
    B = num_sh_bases(cfg.sh_degree)

    def pad(x, fill=0.0):
        return jnp.concatenate(
            [x, jnp.full((C - N,) + x.shape[1:], fill, x.dtype)], 0
        )

    return GaussianState(
        xyz=pad(pts),
        sh_dc=pad(rgb_to_sh_dc(colors)[:, None, :]),
        sh_rest=pad(jnp.zeros((N, B - 1, 3))),
        log_scales=pad(scales, -10.0),
        quats=pad(jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (N, 1))).at[N:, 0].set(1.0),
        opacity_logits=pad(jnp.full((N,), _inverse_sigmoid(cfg.init_opacity)), -10.0),
        alive=jnp.arange(C) < N,
    )


def from_mesh_vertices(cfg: GaussianConfig, v_pos: np.ndarray,
                       v_rgb: np.ndarray | None) -> GaussianState:
    """Init from a (vertex-colored) point set — the ``.ply``/mesh init path
    (gaussian_base.py:298-348)."""
    C = cfg.capacity
    N = min(len(v_pos), C)
    pts = jnp.asarray(v_pos[:N], jnp.float32)
    dist2 = jnp.clip(dist_knn3_mean(pts), 1e-7, None)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, 1)
    colors = jnp.asarray(v_rgb[:N]) if v_rgb is not None else jnp.full((N, 3), 0.5)
    B = num_sh_bases(cfg.sh_degree)

    def pad(x, fill=0.0):
        return jnp.concatenate([x, jnp.full((C - N,) + x.shape[1:], fill, x.dtype)], 0)

    return GaussianState(
        xyz=pad(pts),
        sh_dc=pad(rgb_to_sh_dc(colors)[:, None, :]),
        sh_rest=pad(jnp.zeros((N, B - 1, 3))),
        log_scales=pad(scales, -10.0),
        quats=pad(jnp.tile(jnp.asarray([[1.0, 0, 0, 0]]), (N, 1))).at[N:, 0].set(1.0),
        opacity_logits=pad(jnp.full((N,), _inverse_sigmoid(cfg.init_opacity)), -10.0),
        alive=jnp.arange(C) < N,
    )


def renderable(state: GaussianState):
    """(means, quats, scales, opacities, sh(N,3,B)) with dead slots carrying
    zero opacity (they never contribute)."""
    opac = jax.nn.sigmoid(state.opacity_logits) * state.alive
    sh = jnp.concatenate([state.sh_dc, state.sh_rest], 1)
    return (
        state.xyz,
        quat_normalize(state.quats),
        jnp.exp(state.log_scales),
        opac,
        jnp.swapaxes(sh, -1, -2),
    )


def update_stats(stats: DensifyStats, means2d_grad: jnp.ndarray,
                 radii: jnp.ndarray, visibility: jnp.ndarray) -> DensifyStats:
    """Accumulate ‖∂L/∂means2d‖ for visible gaussians
    (add_densification_stats, gaussian_base.py:816-820)."""
    gnorm = jnp.linalg.norm(means2d_grad, axis=-1)
    vis = visibility.astype(jnp.float32)
    return DensifyStats(
        stats.grad_accum + gnorm * vis,
        stats.denom + vis,
        jnp.maximum(stats.max_radii, radii * visibility),
    )


@partial(jax.jit, static_argnames=("cfg",))
def densify_and_prune(
    state: GaussianState,
    stats: DensifyStats,
    rng: jax.Array,
    cfg: GaussianConfig,
    adam_mu: Any = None,
    adam_nu: Any = None,
):
    """One adaptive-density-control pass.  Returns (state, stats, mu, nu,
    info) — mu/nu are the (optionally provided) Adam moment pytrees with
    rewritten slots zeroed."""
    C = cfg.capacity
    K = min(cfg.max_new_per_step, C)
    grad_avg = stats.grad_accum / jnp.maximum(stats.denom, 1.0)
    scales = jnp.exp(state.log_scales)
    max_scale = scales.max(-1)
    thresh_size = cfg.percent_dense * cfg.spatial_extent

    wants = (grad_avg >= cfg.densify_grad_threshold) & state.alive
    want_clone = wants & (max_scale <= thresh_size)
    want_split = wants & (max_scale > thresh_size)
    want_new = want_clone | want_split

    # prune: low opacity always; size pruning only when thresholds enabled
    # (the reference gates screen-size pruning on opacity-reset warmup,
    # gaussian_base.py:807-814 — callers disable via <=0)
    opac = jax.nn.sigmoid(state.opacity_logits)
    prune = opac < cfg.min_opacity
    if cfg.max_world_size_ratio > 0:
        prune = prune | (max_scale > cfg.max_world_size_ratio * cfg.spatial_extent)
    if cfg.max_screen_size > 0:
        prune = prune | (stats.max_radii > cfg.max_screen_size)
    prune = prune & ~want_split  # split sources are rewritten, not pruned
    alive = state.alive & ~prune

    # source selection: top-K by gradient priority
    priority = jnp.where(want_new & alive, grad_avg, -1.0)
    _, src = jax.lax.top_k(priority, K)
    src_valid = priority[src] > 0

    # destination selection: first K dead slots
    dead_score = jnp.where(alive, -1.0, 1.0) * (C - jnp.arange(C, dtype=jnp.float32))
    _, dst = jax.lax.top_k(dead_score, K)
    dst_valid = ~alive[dst]
    valid = src_valid & dst_valid

    is_split = want_split[src]
    # sample offsets from the source covariance (split, gaussian_base.py:720-767)
    noise = jax.random.normal(rng, (K, 3)) * scales[src]
    offset = quat_apply(quat_normalize(state.quats[src]), noise)
    split_scale = jnp.log(jnp.maximum(scales[src] / 1.6, 1e-7))

    new_xyz = jnp.where(is_split[:, None], state.xyz[src] + offset, state.xyz[src])
    new_ls = jnp.where(is_split[:, None], split_scale, state.log_scales[src])

    def scatter(arr, upd):
        return arr.at[dst].set(jnp.where(valid.reshape((-1,) + (1,) * (upd.ndim - 1)), upd, arr[dst]))

    state = state._replace(
        xyz=scatter(state.xyz, new_xyz),
        sh_dc=scatter(state.sh_dc, state.sh_dc[src]),
        sh_rest=scatter(state.sh_rest, state.sh_rest[src]),
        log_scales=scatter(state.log_scales, new_ls),
        quats=scatter(state.quats, state.quats[src]),
        opacity_logits=scatter(state.opacity_logits, state.opacity_logits[src]),
        alive=alive.at[dst].set(jnp.where(valid, True, alive[dst])),
    )
    # split also rewrites the SOURCE in place (second sample + shrunk scale)
    noise2 = -noise  # antithetic second sample
    offset2 = quat_apply(quat_normalize(state.quats[src]), noise2)
    src_upd = valid & is_split
    state = state._replace(
        xyz=state.xyz.at[src].set(
            jnp.where(src_upd[:, None], state.xyz[src] + offset2, state.xyz[src])
        ),
        log_scales=state.log_scales.at[src].set(
            jnp.where(src_upd[:, None], split_scale, state.log_scales[src])
        ),
    )

    # Adam moment surgery: zero moments at every rewritten slot
    if adam_mu is not None:
        touched = jnp.zeros((C,), bool).at[dst].set(valid).at[src].set(src_upd)

        def zero_slots(t):
            return jax.tree.map(
                lambda m: jnp.where(
                    touched.reshape((-1,) + (1,) * (m.ndim - 1)), 0.0, m
                ) if m.shape[:1] == (C,) else m,
                t,
            )

        adam_mu = zero_slots(adam_mu)
        adam_nu = zero_slots(adam_nu)

    info = {
        "n_cloned": (valid & ~is_split).sum(),
        "n_split": (valid & is_split).sum(),
        "n_pruned": prune.sum(),
        "n_alive": state.alive.sum(),
    }
    return state, empty_stats(C), adam_mu, adam_nu, info


def reset_opacity(state: GaussianState, max_opacity: float = 0.01) -> GaussianState:
    """Clamp opacities down (reset_opacity, gaussian_base.py:800-806)."""
    cap = _inverse_sigmoid(max_opacity)
    return state._replace(opacity_logits=jnp.minimum(state.opacity_logits, cap))


def prune_by_opacity(state: GaussianState, threshold: float = 0.5) -> GaussianState:
    """One-shot hard prune (sugar_prune_at semantics, gaussian_base.py:852-870)."""
    keep = jax.nn.sigmoid(state.opacity_logits) >= threshold
    return state._replace(alive=state.alive & keep)
