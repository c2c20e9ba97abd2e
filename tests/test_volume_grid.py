"""volume-grid and custom-mesh geometries."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.geometry.custom_mesh import (
    CustomMeshConfig,
    forward_features as mesh_features,
    init_custom_mesh,
    load_and_normalize,
)
from dreammesh4d_tpu.models.geometry.volume_grid import (
    VolumeGridConfig,
    export_density_grid,
    forward_field,
    forward_normal,
    init_volume_grid,
)


def test_volume_grid_field_shapes_and_blob():
    cfg = VolumeGridConfig(grid_size=(32, 32, 32), radius=1.0, density_blob_std=0.5)
    params = init_volume_grid(cfg, jax.random.PRNGKey(0))
    pts = jnp.asarray([[0.0, 0.0, 0.0], [0.9, 0.9, 0.9]])
    density, feats = jax.jit(lambda p, x: forward_field(p, cfg, x))(params, pts)
    assert density.shape == (2, 1) and feats.shape == (2, 3)
    # blob bias: center much denser than corner at init
    assert float(density[0, 0]) > float(density[1, 0])
    assert np.isfinite(np.asarray(density)).all()


def test_volume_grid_trilinear_is_exact_on_linear_field():
    cfg = VolumeGridConfig(grid_size=(9, 9, 9), radius=1.0, density_bias=0.0,
                           density_activation="none" if False else "softplus")
    params = init_volume_grid(cfg, jax.random.PRNGKey(0))
    # overwrite feature channel 0 with a linear ramp in x
    gx = jnp.linspace(0, 1, 9)
    ramp = jnp.broadcast_to(gx[:, None, None], (9, 9, 9))
    grid = params["grid"].at[1].set(jnp.log(ramp / (1 - ramp + 1e-9) + 1e-9))  # pre-sigmoid
    params = {"grid": grid}
    pts = jnp.asarray([[-0.5, 0.0, 0.0], [0.25, 0.3, -0.7]])
    _, feats = forward_field(params, cfg, pts)
    expect = (pts[:, 0] / cfg.radius + 1) / 2
    assert np.allclose(np.asarray(feats[:, 0]), np.asarray(expect), atol=1e-3)


def test_volume_grid_normals_point_down_density_gradient():
    cfg = VolumeGridConfig(grid_size=(24, 24, 24), radius=1.0,
                           density_bias="blob_magic3d", density_blob_std=0.5)
    params = init_volume_grid(cfg, jax.random.PRNGKey(1))
    pts = jnp.asarray([[0.4, 0.0, 0.0], [0.0, -0.4, 0.0]])
    n = forward_normal(params, cfg, pts)
    assert n.shape == (2, 3)
    # blob density falls with radius -> normal (\-grad density) points outward
    d = np.einsum("ij,ij->i", np.asarray(n), np.asarray(pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)))
    assert (d > 0.9).all()
    # and the export grid is finite at full res
    g = export_density_grid(params, cfg, 16)
    assert g.shape == (16, 16, 16) and np.isfinite(np.asarray(g)).all()


def test_custom_mesh_normalization_and_features(tmp_path):
    from dreammesh4d_tpu.export.mesh_io import MeshData, save_obj
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    m0 = make_icosphere(1, radius=3.0)
    m = MeshData(v_pos=m0.v_pos + np.asarray([5.0, 0.0, 0.0], np.float32),
                 t_pos_idx=m0.t_pos_idx)
    p = os.path.join(tmp_path, "m.obj")
    save_obj(p, m)
    cfg = CustomMeshConfig(shape_init=f"mesh:{p}", shape_init_params=0.8)
    mesh = load_and_normalize(cfg)
    assert abs(np.abs(mesh.v_pos).max() - 0.8) < 1e-5
    assert np.abs(mesh.v_pos.mean(0)).max() < 0.1  # recentered
    params = init_custom_mesh(cfg, jax.random.PRNGKey(0))
    feats = mesh_features(params, cfg, jnp.asarray(mesh.v_pos[:10]))
    assert feats.shape == (10, 3)
    assert float(feats.min()) >= 0 and float(feats.max()) <= 1
