"""ShapeLoss (latent-NeRF sketch-shape guidance): winding numbers + CE."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.ops.shape_loss import ShapeLoss, _ce_pq, winding_number
from dreammesh4d_tpu.utils.procedural import make_icosphere

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_winding_number_inside_outside():
    mesh = make_icosphere(2, radius=0.5)
    v = jnp.asarray(mesh.v_pos)
    f = jnp.asarray(mesh.t_pos_idx)
    pts = jnp.asarray([
        [0.0, 0.0, 0.0],    # center: inside
        [0.2, 0.1, -0.1],   # inside
        [0.9, 0.0, 0.0],    # outside
        [0.0, 0.8, 0.8],    # outside
    ])
    w = np.asarray(winding_number(pts, v, f, chunk=4))
    np.testing.assert_allclose(w[:2], 1.0, atol=1e-3)
    np.testing.assert_allclose(w[2:], 0.0, atol=1e-3)


def test_ce_pq_matches_manual():
    p = jnp.asarray([0.2, 0.9])
    q = jnp.asarray([0.5, 0.5])
    expect = -(0.2 * np.log(0.5) + 0.8 * np.log(0.5)) \
             - (0.9 * np.log(0.5) + 0.1 * np.log(0.5))
    np.testing.assert_allclose(float(_ce_pq(p, q)), expect, rtol=1e-6)
    # weighting scales per-element
    w = jnp.asarray([0.0, 1.0])
    np.testing.assert_allclose(float(_ce_pq(p, q, w)), -np.log(0.5), rtol=1e-6)


def _write_sphere_obj(tmp_path):
    mesh = make_icosphere(2, radius=1.0)
    path = os.path.join(tmp_path, "guide.obj")
    with open(path, "w") as fh:
        for v in np.asarray(mesh.v_pos):
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in np.asarray(mesh.t_pos_idx) + 1:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")
    return path


def test_shape_loss_prefers_matching_occupancy(tmp_path):
    guide = _write_sphere_obj(str(tmp_path))
    sl = ShapeLoss(guide, mesh_scale=0.6, grid_res=24)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    xyz = jax.random.uniform(k1, (512, 3), minval=-1.0, maxval=1.0)
    inside = jnp.linalg.norm(xyz, axis=-1) < 0.55  # slightly conservative
    # matching field: high density inside the guide, ~zero outside
    sig_match = jnp.where(inside, 50.0, 0.0)
    # inverted field
    sig_inv = jnp.where(inside, 0.0, 50.0)
    l_match = float(sl(xyz, sig_match))
    l_inv = float(sl(xyz, sig_inv))
    assert np.isfinite(l_match) and np.isfinite(l_inv)
    assert l_match < 0.3 * l_inv, (l_match, l_inv)


def test_shape_loss_jits_and_grads(tmp_path):
    guide = _write_sphere_obj(str(tmp_path))
    sl = ShapeLoss(guide, mesh_scale=0.6, grid_res=16)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-1, maxval=1)

    @jax.jit
    def f(s):
        return sl(xyz, s)

    sig = jnp.full((64,), 5.0)
    g = jax.grad(f)(sig)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0


def test_latentnerf_with_shape_guide(tmp_path):
    """ShapeLoss wired into the latentnerf train step produces finite grads."""
    import optax

    from dreammesh4d_tpu.models.geometry.implicit_volume import (
        ImplicitVolumeConfig,
        init_implicit_volume,
    )
    from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import NeRFRendererConfig
    from dreammesh4d_tpu.ops.hashgrid import HashGridConfig
    from dreammesh4d_tpu.systems.threestudio_zoo import SceneTrainState, init_scene_state
    from dreammesh4d_tpu.systems.threestudio_zoo2 import (
        LatentNeRFLosses,
        make_latentnerf_train_step,
    )
    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical,
        get_ray_directions,
        get_rays,
        look_at_c2w,
    )

    guide = _write_sphere_obj(str(tmp_path))
    sl = ShapeLoss(guide, mesh_scale=0.6, grid_res=16)
    geo_cfg = ImplicitVolumeConfig(
        radius=1.0, n_feature_dims=4,
        hashgrid=HashGridConfig(n_levels=4, log2_hashmap_size=8),
        n_neurons=16, n_hidden_layers=1)
    params = init_implicit_volume(geo_cfg, jax.random.PRNGKey(0))
    rcfg = NeRFRendererConfig(num_samples_coarse=16, num_samples_fine=0, radius=1.0)
    opt = optax.adam(1e-2)
    step = make_latentnerf_train_step(
        geo_cfg, rcfg, opt, LatentNeRFLosses(),
        guidance_fn=lambda k, img, batch, ral: (img ** 2).mean(),
        shape_loss=sl, shape_loss_samples=256)
    HW = 8
    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(30.0), jnp.asarray(2.0))
    dirs = get_ray_directions(HW, HW, 20.0)
    ro, rd = get_rays(dirs, look_at_c2w(pos))
    batch = {
        "rays_o": jnp.broadcast_to(ro.reshape(HW, HW, 3), (1, HW, HW, 3)),
        "rays_d": jnp.broadcast_to(rd.reshape(HW, HW, 3), (1, HW, HW, 3)),
        "light_positions": pos[None],
    }
    state = init_scene_state(params, opt)
    s1, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss_total"]))
    assert "loss_shape" in m and np.isfinite(float(m["loss_shape"]))
