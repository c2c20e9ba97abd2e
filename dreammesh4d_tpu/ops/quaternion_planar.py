"""Component-planar (SoA) quaternion / dual-quaternion ops for TPU.

The AoS convention (trailing component axis: ``(..., 4)`` quats, ``(..., 3)``
vectors) is hostile to the fixed (8, 128) TPU vector tiling: the component
axis lands in lanes and wastes 124/128 of every register, which made the
skinning / rotation-fusion chain of the dynamic stage (~20 ms/step at 30k
gaussians) dominate the profile.  Here components live on the LEADING axis —
``q[0], q[1], ...`` are full (..., BIG) planes whose trailing axis is the
vertex/gaussian axis, so every elementwise op runs at full lane occupancy.

Math is identical to ops/quaternion.py (wxyz order, same eps smoothing for
the NaN-free log/exp at identity); only the memory layout differs.  Convert
at chain boundaries with ``jnp.moveaxis(x, -1, 0)`` / ``(x, 0, -1)`` — one
transpose per chain instead of a 32x lane tax per op.
"""

from __future__ import annotations

import jax.numpy as jnp


def pl_norm(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Length over the leading component axis; keeps a leading 1-dim."""
    return jnp.sqrt((v * v).sum(0, keepdims=True)) + eps


def pl_quat_normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return q / pl_norm(q, eps)


def pl_quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a ⊗ b, components leading (4, ...)."""
    aw, ax, ay, az = a[0], a[1], a[2], a[3]
    bw, bx, by, bz = b[0], b[1], b[2], b[3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        0,
    )


def pl_quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([q[0], -q[1], -q[2], -q[3]], 0)


def pl_cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product, components leading (3, ...)."""
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ],
        0,
    )


def pl_quat_apply(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors p (3, ...) by unit quats q (4, ...):
    p' = p + 2 w (v × p) + 2 v × (v × p) (same as quaternion.quat_apply).

    Computed fully componentwise: stacked-array arithmetic between operands
    of different batch rank would align the LEADING component axis against a
    batch axis (numpy broadcasting is trailing-aligned), silently producing
    garbage whenever a batch dim happens to equal 3."""
    w = q[0]
    vx, vy, vz = q[1], q[2], q[3]
    px, py, pz = p[0], p[1], p[2]
    uvx = vy * pz - vz * py
    uvy = vz * px - vx * pz
    uvz = vx * py - vy * px
    uuvx = vy * uvz - vz * uvy
    uuvy = vz * uvx - vx * uvz
    uuvz = vx * uvy - vy * uvx
    return jnp.stack(
        [
            px + 2.0 * (w * uvx + uuvx),
            py + 2.0 * (w * uvy + uuvy),
            pz + 2.0 * (w * uvz + uuvz),
        ],
        0,
    )


def pl_quat_log(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """so(3) log map (4, ...) -> (3, ...); smoothed norm like quat_log."""
    q = pl_quat_normalize(q)
    # standardize w >= 0 (q and -q are the same rotation)
    q = jnp.where(q[:1] < 0, -q, q)
    w = jnp.clip(q[:1], -1.0, 1.0)
    v = q[1:]
    vn = jnp.sqrt((v * v).sum(0, keepdims=True) + eps * eps)
    angle = 2.0 * jnp.arctan2(vn, w)
    return v * (angle / vn)


def pl_quat_exp(rotvec: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Exp map (3, ...) -> unit quats (4, ...); smoothed like quat_exp."""
    angle = jnp.sqrt((rotvec * rotvec).sum(0, keepdims=True) + eps * eps)
    half = 0.5 * angle
    k = jnp.sin(half) / angle
    return jnp.concatenate([jnp.cos(half), rotvec * k], 0)


def pl_fuse_rotations(idx_t: jnp.ndarray, w_t: jnp.ndarray, rots_p: jnp.ndarray) -> jnp.ndarray:
    """q'_p = Exp(Σ_k w_kp Log(q_{n(k,p)})) — planar fuse_rotations.

    idx_t: (K, P) int neighbor indices (transposed!); w_t: (K, P) weights;
    rots_p: (4, ..., N).  Returns (4, ..., P)."""
    logs = pl_quat_log(rots_p[..., idx_t])  # (3, ..., K, P)
    fused = (w_t * logs).sum(-2)  # (3, ..., P)
    return pl_quat_exp(fused)


# --------------------------------------------------------------------------
# dual quaternions (8, ...) = [real wxyz, dual wxyz]
# --------------------------------------------------------------------------


def pl_dq_from_quat_translation(q_r: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """σ = r + ε/2·t·r; q_r (4, ...), t (3, ...) -> (8, ...)."""
    q_r = pl_quat_normalize(q_r)
    t_quat = jnp.concatenate([jnp.zeros_like(t[:1]), t], 0)
    q_d = 0.5 * pl_quat_mul(t_quat, q_r)
    return jnp.concatenate([q_r, q_d], 0)


def pl_dq_normalize(dq: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    q_r, q_d = dq[:4], dq[4:]
    n = pl_norm(q_r, eps)
    q_r = q_r / n
    q_d = q_d / n
    dot = (q_r * q_d).sum(0, keepdims=True)
    return jnp.concatenate([q_r, q_d - dot * q_r], 0)


def pl_dq_translation(dq: jnp.ndarray) -> jnp.ndarray:
    t_quat = pl_quat_mul(2.0 * dq[4:], pl_quat_conjugate(dq[:4]))
    return t_quat[1:]


def pl_dq_apply(dq: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    return pl_quat_apply(dq[:4], p) + pl_dq_translation(dq)


def pl_dq_blend(dqs: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """Sign-consistent weighted DQ blend + normalize.

    dqs: (8, ..., K, P); weights: (..., K, P) (broadcastable).  Sign pivot is
    the first neighbor (k=0), like quaternion.dq_blend.  Returns (8, ..., P).
    """
    pivot = dqs[:4, ..., :1, :]  # (4, ..., 1, P)
    sign = jnp.sign((dqs[:4] * pivot).sum(0, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    blended = (weights * (dqs * sign)).sum(-2)  # (8, ..., P)
    return pl_dq_normalize(blended)
