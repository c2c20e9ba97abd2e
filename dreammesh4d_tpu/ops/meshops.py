"""Mesh differential-geometry ops (JAX) + host-side topology builders.

Replaces the pytorch3d surface consumed by the reference:
``mesh_normal_consistency`` / ``mesh_laplacian_smoothing``
(custom/threestudio-dreammesh4d/system/sugar_4dgen.py:20,221-230), face/vertex
normals (sugar.py:577-586), and the ARAP machinery in
utils/arap_utils.py:100-224 (one-ring neighbors, Heron-formula cotangent
weights, energy with optional best-fit rotations via batched 3x3 SVD).

Topology (neighbor lists, edge adjacency) is built once on the host with
numpy into fixed-size padded arrays; the energy/loss functions are pure jnp
over those static arrays, so they live happily inside a jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Normals
# ---------------------------------------------------------------------------


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Per-face normals (F,3); counter-clockwise winding. verts may carry
    leading batch dims (..., V, 3)."""
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]
    n = jnp.cross(v1 - v0, v2 - v0)
    if normalize:
        # rsqrt(|n|^2+eps): the norm-division form has a NaN cotangent at
        # zero-area faces (degenerate masked faces in DMTet surfaces)
        n = n * jax.lax.rsqrt((n * n).sum(-1, keepdims=True) + 1e-20)
    return n


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals via scatter-add (V,3)."""
    fn = face_normals(verts, faces, normalize=False)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[..., faces[:, k], :].add(fn)
    # NaN-safe at isolated vertices (zero accumulated normal)
    return vn * jax.lax.rsqrt((vn * vn).sum(-1, keepdims=True) + 1e-20)


# ---------------------------------------------------------------------------
# Topology builders (host-side, run once)
# ---------------------------------------------------------------------------


class EdgeAdjacency(NamedTuple):
    """Pairs of faces sharing an interior edge (for normal consistency)."""

    face_pairs: np.ndarray  # (E, 2) int32


def build_edge_adjacency(faces: np.ndarray) -> EdgeAdjacency:
    edges = {}
    faces = np.asarray(faces)
    for f_idx, (a, b, c) in enumerate(faces):
        for (u, v) in ((a, b), (b, c), (c, a)):
            key = (min(u, v), max(u, v))
            edges.setdefault(key, []).append(f_idx)
    pairs = [fs[:2] for fs in edges.values() if len(fs) >= 2]
    if not pairs:
        pairs = [[0, 0]]
    return EdgeAdjacency(np.asarray(pairs, np.int32))


class OneRing(NamedTuple):
    """Fixed-capacity one-ring neighborhoods (reference arap_utils.py:100-140
    builds the same structure as python dicts; here padded arrays)."""

    neighbor_idx: np.ndarray  # (V, K) int32, padded with self-index
    neighbor_mask: np.ndarray  # (V, K) bool
    degrees: np.ndarray  # (V,) int32


def build_one_ring(faces: np.ndarray, num_verts: int, max_degree: int = 16) -> OneRing:
    nbrs = [set() for _ in range(num_verts)]
    for (a, b, c) in np.asarray(faces):
        nbrs[a].update((b, c))
        nbrs[b].update((a, c))
        nbrs[c].update((a, b))
    idx = np.zeros((num_verts, max_degree), np.int32)
    mask = np.zeros((num_verts, max_degree), bool)
    deg = np.zeros((num_verts,), np.int32)
    for v, ns in enumerate(nbrs):
        ns = sorted(ns)[:max_degree]
        deg[v] = len(ns)
        idx[v, : len(ns)] = ns
        idx[v, len(ns):] = v
        mask[v, : len(ns)] = True
    return OneRing(idx, mask, deg)


def cotangent_weights(verts: np.ndarray, faces: np.ndarray, ring: OneRing,
                      clamp_min: float = 0.0) -> np.ndarray:
    """Per-directed-edge cotangent weights in one-ring layout (V, K).

    w_ij = 0.5 * (cot α_ij + cot β_ij), computed with the Heron-area formula
    like the reference (arap_utils.py:141-175); weights are symmetrized by
    construction (both wing triangles accumulated per undirected edge) and
    clamped at ``clamp_min``."""
    verts = np.asarray(verts, np.float64)
    faces = np.asarray(faces)
    V, K = ring.neighbor_idx.shape
    w_edge: dict = {}
    for (a, b, c) in faces:
        pa, pb, pc = verts[a], verts[b], verts[c]
        # opposite angles: angle at c is opposite to edge (a,b), etc.
        for (u, v, opp) in ((a, b, c), (b, c, a), (c, a, b)):
            e1 = verts[u] - verts[opp]
            e2 = verts[v] - verts[opp]
            cross = np.linalg.norm(np.cross(e1, e2))
            cot = float(np.dot(e1, e2) / max(cross, 1e-12))
            key = (min(u, v), max(u, v))
            w_edge[key] = w_edge.get(key, 0.0) + 0.5 * cot
    W = np.zeros((V, K), np.float32)
    for v in range(V):
        for k in range(K):
            if ring.neighbor_mask[v, k]:
                key = (min(v, ring.neighbor_idx[v, k]), max(v, ring.neighbor_idx[v, k]))
                W[v, k] = max(w_edge.get(key, 0.0), clamp_min)
    return W


# ---------------------------------------------------------------------------
# Losses (device-side, differentiable)
# ---------------------------------------------------------------------------


def normal_consistency_loss(verts: jnp.ndarray, faces: jnp.ndarray,
                            face_pairs: jnp.ndarray) -> jnp.ndarray:
    """Mean (1 - cos) between normals of adjacent faces — pytorch3d
    ``mesh_normal_consistency`` equivalent (used at sugar_4dgen.py:221-230).

    Degenerate (near-zero-area) faces are EXCLUDED: their normalized normal's
    gradient is ~rsqrt(eps) ≈ 1e10, which exploded the refine stage within
    ~10 steps on a QEM-simplified real mesh (round-5 pipeline run — verts →
    inf → nan while the render stayed finite because nan gaussians cull).
    The mask is a stop-gradient indicator, so slivers contribute nothing to
    the loss OR its gradient."""
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]
    n_raw = jnp.cross(v1 - v0, v2 - v0)
    a2 = (n_raw * n_raw).sum(-1)  # (2·area)²
    scale2 = jnp.maximum(((v1 - v0) ** 2).sum(-1) * ((v2 - v0) ** 2).sum(-1),
                         1e-30)
    ok = jax.lax.stop_gradient(a2 > 1e-8 * scale2)  # relative sliver test
    n = n_raw * jax.lax.rsqrt(a2[..., None] + 1e-20)
    n0 = n[..., face_pairs[:, 0], :]
    n1 = n[..., face_pairs[:, 1], :]
    cos = (n0 * n1).sum(-1)
    w = (ok[..., face_pairs[:, 0]] & ok[..., face_pairs[:, 1]]).astype(
        verts.dtype)
    return ((1.0 - cos) * w).sum() / jnp.maximum(w.sum(), 1.0)


def laplacian_smoothing_loss(verts: jnp.ndarray, ring: Tuple[jnp.ndarray, jnp.ndarray]) -> jnp.ndarray:
    """Uniform Laplacian magnitude, pytorch3d ``mesh_laplacian_smoothing``
    (method='uniform') equivalent: mean_i || (1/deg_i) Σ_j v_j - v_i ||.
    sqrt(·+eps) instead of jnp.linalg.norm: the norm's gradient is 0/0 = nan
    at an exactly-zero Laplacian (a vertex at its ring centroid)."""
    idx, mask = ring
    nb = verts[..., idx, :]  # (..., V, K, 3)
    m = mask[..., None].astype(verts.dtype)
    deg = jnp.maximum(mask.sum(-1), 1)[..., None].astype(verts.dtype)
    lap = (nb * m).sum(-2) / deg - verts
    return jnp.sqrt((lap * lap).sum(-1) + 1e-20).mean()


def arap_energy(
    verts_ref: jnp.ndarray,
    verts_def: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    neighbor_mask: jnp.ndarray,
    weights: jnp.ndarray,
    rotations: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """As-rigid-as-possible energy Σ_i Σ_j w_ij ‖(p'_i−p'_j) − R_i(p_i−p_j)‖²
    (reference arap_utils.py:183-224).

    If ``rotations`` is None, per-vertex best-fit rotations are computed in
    closed form from the weighted covariance S_i = Σ_j w_ij e_ij e'_ijᵀ via
    batched 3x3 SVD (XLA-native; replaces torch-batch-svd) with the usual
    det-flip to stay in SO(3).  Rotations are treated as constants
    (stop-gradient), matching the local-global ARAP alternation.
    """
    m = (neighbor_mask & (neighbor_idx >= 0)).astype(verts_ref.dtype) * weights  # (V,K)
    e_ref = verts_ref[..., :, None, :] - verts_ref[..., neighbor_idx, :]  # (V,K,3)
    e_def = verts_def[..., :, None, :] - verts_def[..., neighbor_idx, :]

    if rotations is None:
        S = jnp.einsum("...vk,...vki,...vkj->...vij", m, e_ref, e_def)
        S = jax.lax.stop_gradient(S)
        U, _, Vt = jnp.linalg.svd(S)
        det = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2) @ jnp.swapaxes(U, -1, -2))
        D = jnp.concatenate(
            [jnp.ones_like(det)[..., None], jnp.ones_like(det)[..., None], det[..., None]], -1
        )
        R = jnp.swapaxes(Vt, -1, -2) @ (D[..., :, None] * jnp.swapaxes(U, -1, -2))
    else:
        R = rotations
    rot_e = jnp.einsum("...vij,...vkj->...vki", R, e_ref)
    diff = e_def - rot_e
    return (m * (diff**2).sum(-1)).sum() / jnp.maximum(m.sum(), 1.0)


def arap_energy_quat_planar(
    e_ref_p: jnp.ndarray,
    idx_t: jnp.ndarray,
    m_t: jnp.ndarray,
    verts_def: jnp.ndarray,
    rot_quats: jnp.ndarray,
) -> jnp.ndarray:
    """Component-planar ARAP with given per-vertex rotation QUATS — the
    dynamic-stage fast path (same energy as :func:`arap_energy` with
    ``rotations`` given; one energy summed over all leading batch dims,
    normalized by the weight sum per batch element).

    e_ref_p: (3, K, V) rest-pose edges, precomputed once per mesh
        (``rest.T[:, None, :] - rest.T[:, idx_t]``);
    idx_t: (K, V) transposed neighbor indices; m_t: (K, V) mask*weights;
    verts_def: (..., V, 3) deformed vertices; rot_quats: (..., V, 4) wxyz.

    Avoids the AoS (V, K, 3) einsum chain (trailing dim 3 idles 125/128 TPU
    lanes) and the quat->matrix expansion."""
    from .quaternion_planar import pl_quat_apply

    p_def = jnp.moveaxis(verts_def, -1, 0)  # (3, ..., V)
    e_def = p_def[..., None, :] - p_def[..., idx_t]  # (3, ..., K, V)
    q_p = jnp.moveaxis(rot_quats, -1, 0)[..., None, :]  # (4, ..., 1, V)
    rot_e = pl_quat_apply(q_p, e_ref_p)  # (3, ..., K, V)
    diff = e_def - rot_e
    # Σ_t [(m diff_t²).sum / max(m.sum, 1)] == total / max(m.sum, 1): the
    # per-batch normalizer is batch-independent, so one fused reduction works.
    return (m_t * (diff * diff).sum(0)).sum() / jnp.maximum(m_t.sum(), 1.0)


def tv_loss(img: jnp.ndarray) -> jnp.ndarray:
    """Total variation on (..., H, W, C) images (threestudio/utils/loss.py:8-16)."""
    dh = img[..., 1:, :, :] - img[..., :-1, :, :]
    dw = img[..., :, 1:, :] - img[..., :, :-1, :]
    return (dh**2).mean() + (dw**2).mean()
