"""Quaternion / SO(3) / dual-quaternion algebra (JAX, wxyz convention).

Pure-math replacement for the reference's pytorch3d + pypose dependency
surface: ``matrix_to_quaternion``/``quaternion_to_matrix``/``quaternion_apply``
(pytorch3d, used throughout custom/threestudio-dreammesh4d/geometry/sugar.py),
SO(3) Log/Exp rotation fusion (dynamic_sugar.py:877-889), and the batched dual
quaternion algebra in utils/dual_quaternions.py:24-269.

Convention: quaternions are (w, x, y, z) throughout this framework — the 3DGS
and pytorch3d standard.  (The reference juggles wxyz<->xyzw for pypose,
dynamic_sugar.py:669-676; we avoid that entirely.)

All functions broadcast over leading batch dims and are jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.typing import Array, Float, Int, shape_checked


@shape_checked
def quat_normalize(q: Float[Array, "*b 4"], eps: float = 1e-12) -> Float[Array, "*b 4"]:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


@shape_checked
def quat_standardize(q: Float[Array, "*b 4"]) -> Float[Array, "*b 4"]:
    """Force w >= 0 (q and -q are the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


@shape_checked
def quat_conjugate(q: Float[Array, "*b 4"]) -> Float[Array, "*b 4"]:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], q.dtype)


@shape_checked
def quat_multiply(a: Float[Array, "*b 4"], b: Float[Array, "*b 4"]) -> Float[Array, "*b 4"]:
    """Hamilton product a ⊗ b (wxyz)."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


@shape_checked
def quat_apply(q: Float[Array, "*b 4"], p: Float[Array, "*b 3"]) -> Float[Array, "*b 3"]:
    """Rotate points p (...,3) by unit quaternions q (...,4).

    Uses the expanded form p' = p + 2 w (v × p) + 2 v × (v × p) — cheaper than
    two Hamilton products."""
    w = q[..., :1]
    v = q[..., 1:]
    uv = jnp.cross(v, p)
    uuv = jnp.cross(v, uv)
    return p + 2.0 * (w * uv + uuv)


@shape_checked
def quat_to_matrix(q: Float[Array, "*b 4"]) -> Float[Array, "*b 3 3"]:
    """Unit quaternion (wxyz) -> rotation matrix (...,3,3).  Matches the 3DGS
    ``build_rotation`` (gaussian_base.py covariance path) and pytorch3d."""
    w, x, y, z = (q[..., i] for i in range(4))
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        -1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


@shape_checked
def matrix_to_quat(m: Float[Array, "*b 3 3"]) -> Float[Array, "*b 4"]:
    """Rotation matrix (...,3,3) -> unit quaternion (wxyz), branch-free.

    Uses the standard four-candidate construction (as in pytorch3d
    ``matrix_to_quaternion``) and selects the numerically best candidate, so it
    is safe under jit (no data-dependent branching)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = safe_sqrt(1.0 + tr) / 2.0
    qx = safe_sqrt(1.0 + m00 - m11 - m22) / 2.0
    qy = safe_sqrt(1.0 - m00 + m11 - m22) / 2.0
    qz = safe_sqrt(1.0 - m00 - m11 + m22) / 2.0

    # The scores satisfy qw²+qx²+qy²+qz² = 1, so the argmax candidate has
    # score >= 0.5 and denominator >= 2.  Clamping the (never-selected) small
    # denominators keeps the backward pass NaN-free: with a ~0 denominator the
    # non-selected branch would produce 0·inf = NaN cotangents under `where`/
    # gather selection.
    dw = jnp.maximum(4 * qw, 0.1)
    dx = jnp.maximum(4 * qx, 0.1)
    dy = jnp.maximum(4 * qy, 0.1)
    dz = jnp.maximum(4 * qz, 0.1)

    q0 = jnp.stack([qw, (m21 - m12) / dw, (m02 - m20) / dw, (m10 - m01) / dw], -1)
    q1 = jnp.stack([(m21 - m12) / dx, qx, (m01 + m10) / dx, (m02 + m20) / dx], -1)
    q2 = jnp.stack([(m02 - m20) / dy, (m01 + m10) / dy, qy, (m12 + m21) / dy], -1)
    q3 = jnp.stack([(m10 - m01) / dz, (m02 + m20) / dz, (m12 + m21) / dz, qz], -1)

    cand = jnp.stack([q0, q1, q2, q3], -2)  # (...,4,4)
    score = jnp.stack([qw, qx, qy, qz], -1)  # (...,4)
    idx = jnp.argmax(score, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_standardize(quat_normalize(q))


# ---------------------------------------------------------------------------
# so(3) log/exp on quaternions
# ---------------------------------------------------------------------------


@shape_checked
def quat_log(q: Float[Array, "*b 4"], eps: float = 1e-8) -> Float[Array, "*b 3"]:
    """Log map: unit quaternion -> rotation vector (...,3) = axis * angle.

    Equivalent to pypose ``SO3.Log()`` (used in fuse_rotations,
    dynamic_sugar.py:877-889).  Branch-free and NaN-free at the identity: the
    vector norm is smoothed as sqrt(‖v‖²+ε²) so that angle/vn -> 2/w as v -> 0
    with finite gradients (a plain ‖v‖ has a NaN derivative at 0, which is hit
    on every identity rotation — the zero-init deformation state)."""
    q = quat_standardize(quat_normalize(q))
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.sqrt((v * v).sum(-1, keepdims=True) + eps * eps)
    angle = 2.0 * jnp.arctan2(vn, w)
    return v * (angle / vn)


@shape_checked
def quat_exp(rotvec: Float[Array, "*b 3"], eps: float = 1e-8) -> Float[Array, "*b 4"]:
    """Exp map: rotation vector (...,3) -> unit quaternion (wxyz).
    Smoothed-norm formulation (NaN-free gradient at rotvec = 0)."""
    angle = jnp.sqrt((rotvec * rotvec).sum(-1, keepdims=True) + eps * eps)
    half = 0.5 * angle
    k = jnp.sin(half) / angle  # -> 0.5 as angle -> 0 (angle >= eps)
    w = jnp.cos(half)
    return jnp.concatenate([w, rotvec * k], -1)


def fuse_rotations(neighbor_idx: jnp.ndarray, weights: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """q'_i = Exp(Σ_j w_ij Log(q_{n(i,j)})) — weighted rotation blending in the
    Lie algebra (reference dynamic_sugar.py:877-889).

    neighbor_idx: (P, K) int; weights: (P, K); rotations: (..., N, 4) wxyz.
    Returns (..., P, 4)."""
    logs = quat_log(rotations[..., neighbor_idx, :])  # (..., P, K, 3)
    fused = (weights[..., None] * logs).sum(-2)
    return quat_exp(fused)


# ---------------------------------------------------------------------------
# Dual quaternions (for DQS skinning)
# ---------------------------------------------------------------------------


@shape_checked
def dq_from_quat_translation(q_r: Float[Array, "*b 4"], t: Float[Array, "*b 3"]) -> Float[Array, "*b 8"]:
    """σ = r + ε/2·t·r (reference dual_quaternions.py:115-131).  Returns
    (...,8) = concat(q_r wxyz, q_d wxyz)."""
    q_r = quat_normalize(q_r)
    t_quat = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], -1)
    q_d = 0.5 * quat_multiply(t_quat, q_r)
    return jnp.concatenate([q_r, q_d], -1)


@shape_checked
def dq_normalize(dq: Float[Array, "*b 8"], eps: float = 1e-12) -> Float[Array, "*b 8"]:
    """Normalize so the real part is unit and real·dual = 0."""
    q_r, q_d = dq[..., :4], dq[..., 4:]
    n = jnp.linalg.norm(q_r, axis=-1, keepdims=True) + eps
    q_r = q_r / n
    q_d = q_d / n
    # remove non-orthogonal component: q_d <- q_d - (q_r·q_d) q_r
    dot = (q_r * q_d).sum(-1, keepdims=True)
    q_d = q_d - dot * q_r
    return jnp.concatenate([q_r, q_d], -1)


@shape_checked
def dq_translation(dq: Float[Array, "*b 8"]) -> Float[Array, "*b 3"]:
    """t = 2 · q_d ⊗ conj(q_r) (vector part) — dual_quaternions.py:219-231."""
    q_r, q_d = dq[..., :4], dq[..., 4:]
    t_quat = quat_multiply(2.0 * q_d, quat_conjugate(q_r))
    return t_quat[..., 1:]


@shape_checked
def dq_apply(dq: Float[Array, "*b 8"], p: Float[Array, "*b 3"]) -> Float[Array, "*b 3"]:
    """Apply unit dual quaternion rigid transform: p' = R p + t
    (dual_quaternions.py:94-103 transform_point_simple)."""
    return quat_apply(dq[..., :4], p) + dq_translation(dq)


def dq_blend(dqs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Dual-quaternion skinning blend: weighted sum with sign-consistent reals
    (antipodality fix vs dqs[...,0,:]), then normalize.

    dqs: (..., K, 8); weights: (..., K).  Returns (..., 8)."""
    pivot = dqs[..., :1, :4]
    sign = jnp.sign((dqs[..., :4] * pivot).sum(-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    dqs = dqs * sign
    blended = (weights[..., None] * dqs).sum(-2)
    return dq_normalize(blended)
