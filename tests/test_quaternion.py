import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.ops.quaternion import (

    dq_apply,
    dq_blend,
    dq_from_quat_translation,
    dq_normalize,
    dq_translation,
    fuse_rotations,
    matrix_to_quat,
    quat_apply,
    quat_conjugate,
    quat_exp,
    quat_log,
    quat_multiply,
    quat_normalize,
    quat_to_matrix,
)

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return quat_normalize(q)


def test_quat_matrix_roundtrip():
    q = rand_quats(jax.random.PRNGKey(0), 64)
    m = quat_to_matrix(q)
    # orthonormality
    eye = jnp.einsum("nij,nkj->nik", m, m)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (64, 3, 3)), atol=1e-5)
    q2 = matrix_to_quat(m)
    # same rotation up to sign
    dot = jnp.abs((q * q2).sum(-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


def test_quat_apply_matches_matrix():
    key = jax.random.PRNGKey(1)
    q = rand_quats(key, 32)
    p = jax.random.normal(jax.random.PRNGKey(2), (32, 3))
    out1 = quat_apply(q, p)
    out2 = jnp.einsum("nij,nj->ni", quat_to_matrix(q), p)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_quat_multiply_composition():
    a = rand_quats(jax.random.PRNGKey(3), 16)
    b = rand_quats(jax.random.PRNGKey(4), 16)
    p = jax.random.normal(jax.random.PRNGKey(5), (16, 3))
    out1 = quat_apply(quat_multiply(a, b), p)
    out2 = quat_apply(a, quat_apply(b, p))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_quat_identity_and_conjugate():
    q = rand_quats(jax.random.PRNGKey(6), 8)
    ident = quat_multiply(q, quat_conjugate(q))
    np.testing.assert_allclose(np.asarray(ident[:, 0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ident[:, 1:]), 0.0, atol=1e-5)


def test_log_exp_roundtrip():
    q = rand_quats(jax.random.PRNGKey(7), 64)
    q2 = quat_exp(quat_log(q))
    dot = jnp.abs((q * q2).sum(-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)
    # known case: 90 deg about z
    rv = jnp.asarray([[0.0, 0.0, jnp.pi / 2]])
    q90 = quat_exp(rv)
    expected = jnp.asarray([[jnp.cos(jnp.pi / 4), 0, 0, jnp.sin(jnp.pi / 4)]])
    np.testing.assert_allclose(np.asarray(q90), np.asarray(expected), atol=1e-6)
    np.testing.assert_allclose(np.asarray(quat_log(q90)), np.asarray(rv), atol=1e-6)


def test_fuse_rotations_identity_weight():
    # weight 1 on a single neighbor reproduces that neighbor's rotation
    rot = rand_quats(jax.random.PRNGKey(8), 5)
    idx = jnp.asarray([[2, 3], [0, 1], [4, 0], [1, 2], [3, 4]])
    w = jnp.asarray([[1.0, 0.0]] * 5)
    fused = fuse_rotations(idx, w, rot)
    dot = jnp.abs((fused * rot[idx[:, 0]]).sum(-1))
    np.testing.assert_allclose(np.asarray(dot), 1.0, atol=1e-5)


def test_fuse_rotations_midpoint():
    # blending identity with 90deg-z at 0.5 gives 45deg-z
    qi = jnp.asarray([[1.0, 0, 0, 0]])
    qz = quat_exp(jnp.asarray([[0.0, 0, jnp.pi / 2]]))
    rots = jnp.concatenate([qi, qz], 0)
    fused = fuse_rotations(jnp.asarray([[0, 1]]), jnp.asarray([[0.5, 0.5]]), rots)
    expected = quat_exp(jnp.asarray([[0.0, 0, jnp.pi / 4]]))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(expected), atol=1e-6)


def test_dq_transform_matches_rt():
    key = jax.random.PRNGKey(9)
    q = rand_quats(key, 16)
    t = jax.random.normal(jax.random.PRNGKey(10), (16, 3))
    p = jax.random.normal(jax.random.PRNGKey(11), (16, 3))
    dq = dq_from_quat_translation(q, t)
    np.testing.assert_allclose(np.asarray(dq_translation(dq)), np.asarray(t), atol=1e-5)
    out = dq_apply(dq, p)
    expected = quat_apply(q, p) + t
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_dq_blend_rigid():
    # blending K copies of the same transform returns that transform
    q = rand_quats(jax.random.PRNGKey(12), 1)
    t = jnp.asarray([[0.3, -0.2, 0.5]])
    dq = dq_from_quat_translation(q, t)
    dqs = jnp.tile(dq[:, None, :], (1, 4, 1))
    # antipodal copies must not break the blend
    dqs = dqs.at[:, 1].multiply(-1.0)
    w = jnp.full((1, 4), 0.25)
    blended = dq_blend(dqs, w)
    p = jnp.asarray([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(np.asarray(dq_apply(blended, p)), np.asarray(dq_apply(dq, p)), atol=1e-5)


def test_dq_normalize_unit():
    dq = dq_from_quat_translation(rand_quats(jax.random.PRNGKey(13), 8) * 2.3,
                                  jax.random.normal(jax.random.PRNGKey(14), (8, 3)))
    n = dq_normalize(dq)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(n[:, :4], axis=-1)), 1.0, atol=1e-5)
    ortho = (n[:, :4] * n[:, 4:]).sum(-1)
    np.testing.assert_allclose(np.asarray(ortho), 0.0, atol=1e-5)
