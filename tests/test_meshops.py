import pytest
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.ops.meshops import (
    arap_energy,
    build_edge_adjacency,
    build_one_ring,
    cotangent_weights,
    face_normals,
    laplacian_smoothing_loss,
    normal_consistency_loss,
    tv_loss,
    vertex_normals,
)
from dreammesh4d_tpu.ops.quaternion import quat_exp, quat_to_matrix
from dreammesh4d_tpu.utils.procedural import make_icosphere

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_face_normals_outward_on_sphere():
    m = make_icosphere(2)
    n = face_normals(jnp.asarray(m.v_pos), jnp.asarray(m.t_pos_idx))
    centers = np.asarray(m.v_pos)[m.t_pos_idx].mean(1)
    dots = (np.asarray(n) * centers / np.linalg.norm(centers, axis=-1, keepdims=True)).sum(-1)
    assert (dots > 0.9).all()  # outward


def test_vertex_normals_sphere():
    m = make_icosphere(2)
    vn = vertex_normals(jnp.asarray(m.v_pos), jnp.asarray(m.t_pos_idx))
    dots = (np.asarray(vn) * m.v_pos).sum(-1)  # radius 1: normal == position
    assert (dots > 0.99).all()


def test_normal_consistency_sphere_smooth():
    m = make_icosphere(2)
    pairs = build_edge_adjacency(m.t_pos_idx).face_pairs
    loss = normal_consistency_loss(jnp.asarray(m.v_pos), jnp.asarray(m.t_pos_idx), jnp.asarray(pairs))
    assert float(loss) < 0.02  # smooth sphere
    # crumple the mesh -> loss increases
    rng = np.random.RandomState(0)
    crumpled = m.v_pos + 0.2 * rng.randn(*m.v_pos.shape).astype(np.float32)
    loss2 = normal_consistency_loss(jnp.asarray(crumpled), jnp.asarray(m.t_pos_idx), jnp.asarray(pairs))
    assert float(loss2) > 5 * float(loss)


def test_laplacian_zero_on_flat_grid():
    # regular planar grid: interior laplacian ~ 0
    n = 5
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32), np.arange(n, dtype=np.float32))
    verts = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = i * n + j, i * n + j + 1, (i + 1) * n + j, (i + 1) * n + j + 1
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, np.int32)
    ring = build_one_ring(faces, len(verts))
    loss = laplacian_smoothing_loss(jnp.asarray(verts), (jnp.asarray(ring.neighbor_idx), jnp.asarray(ring.neighbor_mask)))
    # boundary contributes a bit; interior is 0
    assert float(loss) < 0.7
    bumped = verts.copy()
    bumped[12, 2] = 3.0  # poke center vertex
    loss2 = laplacian_smoothing_loss(jnp.asarray(bumped), (jnp.asarray(ring.neighbor_idx), jnp.asarray(ring.neighbor_mask)))
    assert float(loss2) > float(loss) + 0.1


def test_arap_zero_for_rigid_motion():
    m = make_icosphere(1)
    ring = build_one_ring(m.t_pos_idx, len(m.v_pos))
    w = cotangent_weights(m.v_pos, m.t_pos_idx, ring)
    verts = jnp.asarray(m.v_pos)
    R = quat_to_matrix(quat_exp(jnp.asarray([0.3, -0.2, 0.5])))
    moved = verts @ R.T + jnp.asarray([1.0, 2.0, 3.0])
    e = arap_energy(verts, moved, jnp.asarray(ring.neighbor_idx), jnp.asarray(ring.neighbor_mask), jnp.asarray(w))
    assert float(e) < 1e-8
    # non-rigid stretch has positive energy
    stretched = verts * jnp.asarray([2.0, 1.0, 1.0])
    e2 = arap_energy(verts, stretched, jnp.asarray(ring.neighbor_idx), jnp.asarray(ring.neighbor_mask), jnp.asarray(w))
    assert float(e2) > 1e-3


def test_arap_with_given_identity_rotations():
    m = make_icosphere(1)
    ring = build_one_ring(m.t_pos_idx, len(m.v_pos))
    w = np.ones_like(ring.neighbor_idx, np.float32)
    verts = jnp.asarray(m.v_pos)
    ident = jnp.broadcast_to(jnp.eye(3), (len(m.v_pos), 3, 3))
    e = arap_energy(verts, verts + 5.0, jnp.asarray(ring.neighbor_idx), jnp.asarray(ring.neighbor_mask), jnp.asarray(w), rotations=ident)
    assert float(e) < 1e-8  # pure translation, identity rotations


def test_cot_weights_symmetric_positive_on_sphere():
    m = make_icosphere(1)
    ring = build_one_ring(m.t_pos_idx, len(m.v_pos))
    w = cotangent_weights(m.v_pos, m.t_pos_idx, ring)
    assert (w[ring.neighbor_mask] > 0).all()
    # symmetry: w[i, j] == w[j, i]
    for i in range(0, len(m.v_pos), 7):
        for k in range(ring.degrees[i]):
            j = ring.neighbor_idx[i, k]
            back = list(ring.neighbor_idx[j, : ring.degrees[j]]).index(i)
            np.testing.assert_allclose(w[i, k], w[j, back], rtol=1e-5)


def test_tv_loss():
    flat = jnp.ones((8, 8, 3))
    assert float(tv_loss(flat)) == 0.0
    noisy = jnp.asarray(np.random.RandomState(0).rand(8, 8, 3).astype(np.float32))
    assert float(tv_loss(noisy)) > 0.05


def test_arap_energy_quat_planar_matches_aos():
    import jax.numpy as jnp
    import numpy as np
    from dreammesh4d_tpu.ops.meshops import arap_energy, arap_energy_quat_planar
    from dreammesh4d_tpu.ops.quaternion import quat_normalize, quat_to_matrix

    rng = np.random.RandomState(0)
    V, K, T = 40, 5, 3
    rest = jnp.asarray(rng.randn(V, 3), jnp.float32)
    verts = jnp.asarray(rest[None] + 0.1 * rng.randn(T, V, 3), jnp.float32)
    idx = jnp.asarray(rng.randint(0, V, (V, K)), jnp.int32)
    mask = jnp.asarray(rng.rand(V, K) > 0.2)
    w = jnp.asarray(rng.rand(V, K), jnp.float32)
    quats = quat_normalize(jnp.asarray(rng.randn(T, V, 4), jnp.float32))

    ref = sum(
        arap_energy(rest, verts[t], idx, mask, w,
                    rotations=quat_to_matrix(quats[t]))
        for t in range(T)
    )
    m_t = ((mask & (idx >= 0)).astype(jnp.float32) * w).T
    rest_p = rest.T
    e_ref_p = rest_p[:, None, :] - rest_p[:, idx.T]
    got = arap_energy_quat_planar(e_ref_p, idx.T, m_t, verts, quats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5)
