"""PBR + neural-radiance materials and textured background."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.background import TexturedBackground
from dreammesh4d_tpu.models.materials import NeuralRadianceMaterial, PBRMaterial

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def _dirs(n, key=0):
    d = jax.random.normal(jax.random.PRNGKey(key), (n, 3))
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def test_pbr_shading_properties():
    mat = PBRMaterial(use_bump=True)
    params = mat.init_params(jax.random.PRNGKey(0))
    assert params["env_levels"].shape == (4, 32, 64, 3)
    N = 64
    feats = jax.random.normal(jax.random.PRNGKey(1), (N, 8))
    normal = _dirs(N, 2)
    view = _dirs(N, 3)
    tangent = _dirs(N, 4)
    rgb = mat(feats, viewdirs=view, shading_normal=normal, tangent=tangent, params=params)
    assert rgb.shape == (N, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
    # fully metallic, zero-albedo features -> diffuse term vanishes;
    # metallic=sigmoid(+inf)=1 via large feature, albedo sigmoid(-20)~0
    f2 = jnp.concatenate([jnp.full((N, 3), -20.0), jnp.full((N, 1), 20.0),
                          jnp.zeros((N, 4))], -1)
    rgb2 = mat(f2, viewdirs=view, shading_normal=normal, tangent=None, params=params)
    # diffuse_albedo = 0 and F0 = albedo ~ 0 -> only fg_b bias remains (small)
    assert float(rgb2.mean()) < 0.25
    # gradient flows into the env map (it's learnable)
    g = jax.grad(lambda p: mat(feats, viewdirs=view, shading_normal=normal,
                               tangent=tangent, params=p).sum())(params)
    assert float(jnp.abs(g["env_levels"]).sum()) > 0


def test_pbr_env_brdf_approx_ranges():
    nv = jnp.linspace(0, 1, 16)[:, None]
    rr = jnp.linspace(0, 1, 16)[:, None]
    fa, fb = PBRMaterial._env_brdf_approx(nv, rr)
    assert np.isfinite(np.asarray(fa)).all() and np.isfinite(np.asarray(fb)).all()
    assert float(fa.min()) > -0.1 and float(fa.max()) < 1.1
    assert float(fb.min()) > -0.1 and float(fb.max()) < 1.1
    # known point of the Karis approximation: smooth surface, head-on view
    a, b = PBRMaterial._env_brdf_approx(jnp.asarray([[1.0]]), jnp.asarray([[0.0]]))
    assert abs(float(a[0, 0]) - 0.995) < 0.02   # scale ~ 1
    assert abs(float(b[0, 0])) < 0.02           # bias ~ 0
    # grazing + smooth: Fresnel-like saturation (bias -> ~1)
    a2, b2 = PBRMaterial._env_brdf_approx(jnp.asarray([[0.0]]), jnp.asarray([[0.0]]))
    assert float(b2[0, 0]) > 0.9


def test_neural_radiance_material_view_dependence():
    mat = NeuralRadianceMaterial(input_feature_dims=8, sh_degree=3)
    params = mat.init_params(jax.random.PRNGKey(0))
    feats = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
    d1, d2 = _dirs(32, 2), _dirs(32, 3)
    c1 = mat(feats, viewdirs=d1, params=params)
    c2 = mat(feats, viewdirs=d2, params=params)
    assert c1.shape == (32, 3)
    assert not np.allclose(np.asarray(c1), np.asarray(c2))  # view-dependent
    assert float(c1.min()) >= 0 and float(c1.max()) <= 1


def test_textured_background_sampling():
    bg = TexturedBackground(height=16, width=32)
    params = bg.init_params(jax.random.PRNGKey(0))
    dirs = _dirs(100, 1)
    c = bg(params, dirs)
    assert c.shape == (100, 3)
    assert float(c.min()) >= 0 and float(c.max()) <= 1
    # continuity across the azimuth wrap: dirs just left/right of +x axis
    eps = 1e-3
    d_l = jnp.asarray([[1.0, -eps, 0.0]])
    d_r = jnp.asarray([[1.0, eps, 0.0]])
    cl = bg(params, d_l / jnp.linalg.norm(d_l))
    cr = bg(params, d_r / jnp.linalg.norm(d_r))
    assert float(jnp.abs(cl - cr).max()) < 0.05
    # gradient flows into the texture
    g = jax.grad(lambda p: bg(p, dirs).sum())(params)
    assert float(jnp.abs(g["texture"]).sum()) > 0
