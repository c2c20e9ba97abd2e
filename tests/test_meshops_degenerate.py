"""Degenerate-mesh robustness (round-5 pipeline nan root cause): sliver
faces from QEM simplification must not nan/explode the mesh regularizers or
the SuGaR binding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick


def _mesh_with_sliver():
    # a valid triangle + a (nearly) zero-area sliver sharing an edge
    v = np.asarray([
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
        [0.5, 1e-12, 0.0],  # collinear with edge 0-1 -> sliver face
    ], np.float32)
    f = np.asarray([[0, 1, 2], [0, 1, 3]], np.int64)
    return v, f


def test_normal_consistency_finite_on_sliver():
    from dreammesh4d_tpu.ops.meshops import normal_consistency_loss

    v, f = _mesh_with_sliver()
    pairs = np.asarray([[0, 1]], np.int64)

    def loss(verts):
        return normal_consistency_loss(verts, jnp.asarray(f), jnp.asarray(pairs))

    val, g = jax.value_and_grad(loss)(jnp.asarray(v))
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(g)).all()
    # the sliver pair is masked out -> zero loss AND bounded gradient
    assert float(val) == 0.0
    assert float(jnp.abs(g).max()) < 1e3


def test_laplacian_grad_finite_at_zero_lap():
    from dreammesh4d_tpu.ops.meshops import laplacian_smoothing_loss

    # vertex 0 exactly at its ring centroid -> lap == 0 (the norm-gradient
    # 0/0 case)
    verts = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [-1.0, 0.0, 0.0]])
    idx = jnp.asarray([[1, 2], [0, 0], [0, 0]])
    mask = jnp.asarray([[True, True], [True, False], [True, False]])

    g = jax.grad(lambda vtx: laplacian_smoothing_loss(vtx, (idx, mask)))(verts)
    assert np.isfinite(np.asarray(g)).all()


def test_create_sugar_prunes_slivers():
    from dreammesh4d_tpu.export.mesh_io import MeshData
    from dreammesh4d_tpu.models.geometry.sugar import SuGaRConfig, create_sugar

    v, f = _mesh_with_sliver()
    params, static = create_sugar(
        SuGaRConfig(n_gaussians_per_surface_triangle=1,
                    mesh_component_min_ratio=0.0),
        MeshData(v_pos=v, t_pos_idx=f))
    assert static.faces.shape[0] == 1  # sliver dropped
    for leaf in jax.tree.leaves(params):
        assert np.isfinite(np.asarray(leaf)).all()
