import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.geometry.implicit_sdf import (
    ImplicitSDFConfig,
    export_sdf_grid,
    forward_sdf,
    init_implicit_sdf,
    sdf_gradient,
    sdf_normal,
)
from dreammesh4d_tpu.models.renderers.neus_volume_renderer import (
    NeuSRendererConfig,
    init_neus_variance,
    neus_alphas,
    render_rays_neus,
)
from dreammesh4d_tpu.ops.hashgrid import HashGridConfig

HG = HashGridConfig(n_levels=4, log2_hashmap_size=12, base_resolution=4, per_level_scale=2.0)
CFG = ImplicitSDFConfig(radius=1.0, hashgrid=HG, n_neurons=32, n_hidden_layers=1,
                        shape_init_params=0.5)


def test_sphere_init_zero_level_set():
    params = init_implicit_sdf(CFG, jax.random.PRNGKey(0))
    # on the init sphere surface the SDF is near zero; center is negative
    surf = jnp.asarray([[0.5, 0.0, 0.0], [0.0, 0.5, 0.0]])
    center = jnp.zeros((1, 3))
    far = jnp.asarray([[0.9, 0.9, 0.9]])
    s_surf = np.asarray(forward_sdf(params, CFG, surf))
    assert np.abs(s_surf).max() < 0.1
    assert float(forward_sdf(params, CFG, center)[0, 0]) < -0.3
    assert float(forward_sdf(params, CFG, far)[0, 0]) > 0.3


def test_sdf_normals_outward():
    params = init_implicit_sdf(CFG, jax.random.PRNGKey(0))
    pts = jax.random.normal(jax.random.PRNGKey(1), (32, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True) * 0.5
    n = np.asarray(sdf_normal(params, CFG, pts))
    dirs = np.asarray(pts) / 0.5
    assert ((n * dirs).sum(-1) > 0.7).mean() > 0.9
    # gradient magnitude ~ 1 near surface (sphere bias dominates at init)
    g = np.asarray(sdf_gradient(params, CFG, pts))
    assert np.abs(np.linalg.norm(g, axis=-1) - 1.0).mean() < 0.3


def test_neus_alphas_monotone_crossing():
    # sdf crossing from + to - along the ray gives high alpha at crossing
    sdf = jnp.asarray([[0.5, 0.3, 0.1, -0.1, -0.3, -0.5]])
    alpha = np.asarray(neus_alphas(sdf, jnp.asarray(20.0)))
    # rises sharply at the zero crossing (interval 2) and saturates inside
    assert alpha[0, 0] < 0.05
    assert alpha[0, 2] > 0.5
    assert alpha[0, 3] > 0.5
    # receding sdf -> zero alpha
    sdf2 = jnp.asarray([[0.1, 0.2, 0.3, 0.4, 0.5, 0.6]])
    assert np.asarray(neus_alphas(sdf2, jnp.asarray(20.0))).max() < 1e-6


def test_render_rays_neus_sphere():
    params = init_implicit_sdf(CFG, jax.random.PRNGKey(0))
    rcfg = NeuSRendererConfig(num_samples_coarse=32, num_samples_fine=32, radius=1.0,
                              learned_variance_init=0.05)
    var = init_neus_variance(rcfg)
    o = jnp.asarray([[0.0, -2.0, 0.0], [0.0, -2.0, 0.9]])
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    out = render_rays_neus(params, var, CFG, rcfg, o, d, jnp.ones(3),
                           rng=jax.random.PRNGKey(0))
    assert float(out["opacity"][0, 0]) > 0.8  # center ray hits the init sphere
    assert float(out["opacity"][1, 0]) < 0.3  # grazing ray mostly misses
    assert np.isfinite(np.asarray(out["comp_rgb"])).all()
    assert np.isfinite(float(out["eikonal"]))
    # depth of the hit ~ 2 - 0.5
    assert 1.2 < float(out["depth"][0, 0]) < 1.8

    # gradients flow to geometry and the variance scalar
    def loss(p, v):
        o2 = render_rays_neus(p, v, CFG, rcfg, o, d, jnp.ones(3))
        return o2["comp_rgb"].mean() + o2["eikonal"]

    gp, gv = jax.grad(loss, argnums=(0, 1))(params, var)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(gp))
    assert np.isfinite(float(gv["log_s"]))


def test_export_sdf_grid_to_mesh():
    from dreammesh4d_tpu.export.isosurface import extract_isosurface

    params = init_implicit_sdf(CFG, jax.random.PRNGKey(0))
    grid = export_sdf_grid(params, CFG, 32)
    mesh = extract_isosurface(grid, 0.0, (-1,) * 3, (1,) * 3)
    r = np.linalg.norm(mesh.v_pos, axis=-1)
    np.testing.assert_allclose(r.mean(), 0.5, atol=0.1)
