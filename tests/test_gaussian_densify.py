import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.geometry.gaussian import (

    DensifyStats,
    GaussianConfig,
    GaussianState,
    densify_and_prune,
    empty_stats,
    from_mesh_vertices,
    init_random_sphere,
    prune_by_opacity,
    renderable,
    reset_opacity,
    update_stats,
)

pytestmark = pytest.mark.quick  # core <5-min CPU tier

CFG = GaussianConfig(capacity=256, init_num=64, max_new_per_step=32,
                     spatial_extent=1.0, percent_dense=0.1)


def test_init_shapes_and_alive():
    st = init_random_sphere(CFG, jax.random.PRNGKey(0))
    assert st.xyz.shape == (256, 3)
    assert int(st.alive.sum()) == 64
    means, quats, scales, opac, sh = renderable(st)
    assert sh.shape == (256, 3, 16)
    # dead slots render with zero opacity
    assert float(opac[64:].max()) == 0.0
    assert float(opac[:64].min()) > 0.05


def test_update_stats_accumulates():
    stats = empty_stats(256)
    g = jnp.zeros((256, 2)).at[3].set(jnp.asarray([3.0, 4.0]))
    radii = jnp.zeros((256,), jnp.int32).at[3].set(7)
    vis = jnp.zeros((256,), bool).at[3].set(True)
    stats = update_stats(stats, g, radii, vis)
    assert float(stats.grad_accum[3]) == 5.0
    assert float(stats.denom[3]) == 1.0
    assert int(stats.max_radii[3]) == 7
    assert float(stats.grad_accum[0]) == 0.0


def test_clone_small_high_grad():
    st = init_random_sphere(CFG, jax.random.PRNGKey(0))
    st = st._replace(log_scales=jnp.full_like(st.log_scales, np.log(0.01)))  # small
    stats = empty_stats(256)
    stats = stats._replace(
        grad_accum=jnp.zeros(256).at[:8].set(1.0),
        denom=jnp.ones(256),
    )
    n0 = int(st.alive.sum())
    st2, stats2, _, _, info = densify_and_prune(st, stats, jax.random.PRNGKey(1), CFG)
    assert int(info["n_cloned"]) == 8
    assert int(info["n_split"]) == 0
    assert int(st2.alive.sum()) == n0 + 8
    # stats reset
    assert float(stats2.grad_accum.sum()) == 0.0


def test_split_large_high_grad():
    cfg = GaussianConfig(capacity=256, init_num=64, max_new_per_step=32,
                         spatial_extent=1.0, percent_dense=0.1,
                         max_world_size_ratio=0.0, max_screen_size=0.0)
    st = init_random_sphere(cfg, jax.random.PRNGKey(0))
    big = jnp.log(0.5)  # > percent_dense * extent = 0.1
    st = st._replace(log_scales=jnp.full_like(st.log_scales, big))
    stats = empty_stats(256)._replace(
        grad_accum=jnp.zeros(256).at[:4].set(1.0), denom=jnp.ones(256))
    st2, _, _, _, info = densify_and_prune(st, stats, jax.random.PRNGKey(1), cfg)
    assert int(info["n_split"]) == 4
    # both halves shrunk by 1.6
    np.testing.assert_allclose(
        np.exp(np.asarray(st2.log_scales[:4])), 0.5 / 1.6, rtol=1e-5
    )


def test_prune_low_opacity():
    st = init_random_sphere(CFG, jax.random.PRNGKey(0))
    st = st._replace(opacity_logits=st.opacity_logits.at[:10].set(-12.0))
    st2, _, _, _, info = densify_and_prune(st, empty_stats(256), jax.random.PRNGKey(1), CFG)
    assert int(info["n_pruned"]) >= 10
    assert not bool(st2.alive[0])


def test_adam_moment_surgery():
    st = init_random_sphere(CFG, jax.random.PRNGKey(0))
    st = st._replace(log_scales=jnp.full_like(st.log_scales, np.log(0.01)))
    stats = empty_stats(256)._replace(
        grad_accum=jnp.zeros(256).at[:2].set(1.0), denom=jnp.ones(256))
    mu = st._replace()  # same pytree structure filled with ones
    mu = jax.tree.map(lambda x: jnp.ones_like(x, jnp.float32) if x.dtype != bool else x, st)
    nu = jax.tree.map(lambda x: jnp.ones_like(x, jnp.float32) if x.dtype != bool else x, st)
    st2, _, mu2, nu2, info = densify_and_prune(st, stats, jax.random.PRNGKey(1), CFG, mu, nu)
    # destination slots (first dead = 64, 65) zeroed in moments
    assert float(mu2.xyz[64].sum()) == 0.0
    assert float(nu2.xyz[65].sum()) == 0.0
    # untouched alive slot moments intact
    assert float(mu2.xyz[10].sum()) == 3.0


def test_reset_and_hard_prune():
    st = init_random_sphere(CFG, jax.random.PRNGKey(0))
    st = reset_opacity(st, 0.01)
    opac = jax.nn.sigmoid(st.opacity_logits[st.alive])
    assert float(opac.max()) <= 0.0101
    st = st._replace(opacity_logits=st.opacity_logits.at[:32].set(5.0))
    st2 = prune_by_opacity(st, 0.5)
    assert int(st2.alive.sum()) == 32


def test_render_through_rasterizer():
    from dreammesh4d_tpu.ops.cameras import (
        camera_position_from_spherical,
        get_cam_info_gaussian,
        look_at_c2w,
    )
    from dreammesh4d_tpu.ops.gs import RasterizerConfig, rasterize

    st = init_random_sphere(CFG, jax.random.PRNGKey(0))
    means, quats, scales, opac, sh = renderable(st)
    pos = camera_position_from_spherical(jnp.asarray(10.0), jnp.asarray(0.0), jnp.asarray(2.0))
    cam = get_cam_info_gaussian(look_at_c2w(pos), 0.8, 0.8, 0.01, 100.0)
    t = float(np.tan(0.4))
    cfg = RasterizerConfig(32, 32, t, t, tile_capacity=256)
    out = rasterize(means, opac, cam, cfg, jnp.zeros(3), sh=sh, sh_degree=3,
                    scales=scales, quats=quats)
    assert np.isfinite(np.asarray(out.rgb)).all()
    assert float(out.alpha.max()) > 0.01
