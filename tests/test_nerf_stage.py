import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dreammesh4d_tpu.models.geometry.implicit_volume import (
    ImplicitVolumeConfig,
    density_bias,
    forward_density,
    forward_field,
    forward_with_normal,
    init_implicit_volume,
)
from dreammesh4d_tpu.models.renderers.nerf_volume_renderer import (
    NeRFRendererConfig,
    ray_bbox_intersect,
    render_rays,
    sample_pdf,
)
from dreammesh4d_tpu.ops.hashgrid import (
    HashGridConfig,
    frequency_encode,
    hashgrid_encode,
    init_hashgrid,
    progressive_level_mask,
)

SMALL_HG = HashGridConfig(n_levels=4, n_features_per_level=2, log2_hashmap_size=12,
                          base_resolution=4, per_level_scale=2.0)
SMALL_GEO = ImplicitVolumeConfig(radius=1.0, hashgrid=SMALL_HG, n_neurons=32, n_hidden_layers=1)


def test_hashgrid_shapes_and_determinism():
    params = init_hashgrid(SMALL_HG, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (10, 3))
    f1 = hashgrid_encode(params, SMALL_HG, x)
    f2 = hashgrid_encode(params, SMALL_HG, x)
    assert f1.shape == (10, 8)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_hashgrid_continuity():
    """Trilinear interp: tiny input perturbations produce tiny output changes."""
    params = init_hashgrid(SMALL_HG, jax.random.PRNGKey(0))
    x = jnp.asarray([[0.5, 0.5, 0.5]])
    f0 = hashgrid_encode(params, SMALL_HG, x)
    f1 = hashgrid_encode(params, SMALL_HG, x + 1e-4)
    assert float(jnp.abs(f1 - f0).max()) < 1e-2


def test_hashgrid_gradient():
    params = init_hashgrid(SMALL_HG, jax.random.PRNGKey(0))
    g = jax.grad(lambda p: hashgrid_encode(p, SMALL_HG, jnp.asarray([[0.3, 0.6, 0.2]])).sum())(params)
    assert float(jnp.abs(g["tables"]).max()) > 0


def test_progressive_mask():
    cfg = HashGridConfig(n_levels=8, progressive=True, start_level=2, start_step=0, update_steps=100)
    np.testing.assert_array_equal(progressive_level_mask(cfg, 0)[:3], [1, 1, 0])
    assert progressive_level_mask(cfg, 250).sum() == 4
    assert progressive_level_mask(cfg, 10000).sum() == 8


def test_frequency_encode():
    x = jnp.asarray([[0.5, 0.25, 0.0]])
    enc = frequency_encode(x, 4)
    assert enc.shape == (1, 24)


def test_density_blob_bias():
    cfg = SMALL_GEO
    b0 = density_bias(cfg, jnp.zeros((1, 3)))
    b_far = density_bias(cfg, jnp.asarray([[1.0, 1.0, 1.0]]))
    assert float(b0[0, 0]) > 0  # positive at center
    assert float(b_far[0, 0]) < 0  # negative outside blob


def test_implicit_volume_forward():
    params = init_implicit_volume(SMALL_GEO, jax.random.PRNGKey(0))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    d, f, n = forward_with_normal(params, SMALL_GEO, pts)
    assert d.shape == (32, 1) and f.shape == (32, 3) and n.shape == (32, 3)
    assert (np.asarray(d) >= 0).all()  # softplus
    # normals are unit wherever the field gradient is non-tiny; the NaN-safe
    # normalize shrinks near-zero-gradient vectors instead of exploding them
    norms = np.linalg.norm(np.asarray(n), axis=-1)
    assert norms.max() <= 1.0 + 1e-4
    strong = norms > 0.99  # points with non-tiny field gradient
    assert strong.mean() > 0.3
    # at init the blob dominates: density decreases with radius, so
    # -grad(density) points outward from the origin
    dirs = np.asarray(pts) / np.linalg.norm(np.asarray(pts), axis=-1, keepdims=True)
    assert ((np.asarray(n) * dirs).sum(-1)[strong] > 0.5).mean() > 0.9


def test_ray_bbox():
    o = jnp.asarray([[0.0, 0.0, -3.0], [5.0, 5.0, 5.0]])
    d = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tn, tf = ray_bbox_intersect(o, d, 1.0, 0.05)
    np.testing.assert_allclose(float(tn[0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(tf[0]), 4.0, atol=1e-5)
    assert float(tf[1]) <= float(tn[1]) + 1e-3  # miss -> degenerate interval


def test_sample_pdf_concentrates():
    bins = jnp.linspace(0, 1, 9)[None].repeat(2, 0)
    w = jnp.zeros((2, 8)).at[:, 4].set(1.0)  # all mass in bin 4: [0.5, 0.625]
    s = sample_pdf(bins, w, 16, None)
    s = np.asarray(s)
    assert ((s > 0.45) & (s < 0.68)).mean() > 0.9


def test_render_rays_sphere_like():
    """At init (magic3d blob), rays through the center hit density; rays far
    outside produce background."""
    params = init_implicit_volume(SMALL_GEO, jax.random.PRNGKey(0))
    rcfg = NeRFRendererConfig(num_samples_coarse=32, num_samples_fine=32, radius=1.0)
    o = jnp.asarray([[0.0, -2.0, 0.0], [0.0, -2.0, 0.95]])
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]])
    lp = jnp.asarray([[0.0, -3.0, 0.0]] * 2)
    out = render_rays(params, SMALL_GEO, rcfg, o, d, lp, jnp.ones(3),
                      rng=jax.random.PRNGKey(0))
    assert float(out["opacity"][0, 0]) > 0.9  # center ray: opaque blob
    assert np.isfinite(np.asarray(out["comp_rgb"])).all()
    # depth of the center ray ~ distance to blob surface (< 2.0 = center dist)
    assert 0.5 < float(out["depth"][0, 0]) < 2.1


def test_zero123_train_step_fits_silhouette():
    """The NeRF stage train step carves density to match a circular mask."""
    from dreammesh4d_tpu.systems.zero123_system import (
        Zero123Losses,
        init_nerf_state,
        make_zero123_train_step,
    )

    geo = ImplicitVolumeConfig(radius=1.0, hashgrid=SMALL_HG, n_neurons=32,
                               n_hidden_layers=1, density_blob_std=0.7)
    params = init_implicit_volume(geo, jax.random.PRNGKey(0))
    rcfg = NeRFRendererConfig(num_samples_coarse=24, num_samples_fine=24, radius=1.0)
    H = W = 24

    # ref view: camera at -y looking +y; gt = white circle mask (radius 0.4)
    from dreammesh4d_tpu.ops.cameras import get_ray_directions, get_rays, look_at_c2w

    c2w = look_at_c2w(jnp.asarray([0.0, -2.5, 0.0]))
    dirs = get_ray_directions(H, W, 0.5 * H / np.tan(0.35))
    ro, rd = get_rays(dirs, c2w)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    mask = (((xs - W / 2 + 0.5) ** 2 + (ys - H / 2 + 0.5) ** 2) < (0.3 * W) ** 2)
    gt_mask = jnp.asarray(mask.reshape(-1, 1).astype(np.float32))
    gt_rgb = jnp.ones((H * W, 3)) * gt_mask + (1 - gt_mask)

    optimizer = optax.adam(5e-3)
    losses = Zero123Losses(lambda_sds=0.0, lambda_rgb=500.0, lambda_mask=50.0,
                           lambda_normal_smooth=0.0, lambda_orient=0.1,
                           lambda_sparsity=0.1, lambda_opaque=0.1)
    train_step = make_zero123_train_step(geo, rcfg, optimizer, losses)
    state = init_nerf_state(params, optimizer)
    batch = {
        "ref_rays_o": ro, "ref_rays_d": rd, "ref_rgb": gt_rgb, "ref_mask": gt_mask,
        "ref_light": jnp.asarray([0.0, -3.0, 0.0]),
        "rand_rays_o": ro.reshape(1, H, W, 3), "rand_rays_d": rd.reshape(1, H, W, 3),
        "light_positions": jnp.asarray([[0.0, -3.0, 0.0]]),
    }
    lm = jnp.ones(SMALL_HG.n_levels)
    rng = jax.random.PRNGKey(0)
    state, m0 = train_step(state, batch, rng, lm, 1.0)
    first = float(m0["loss_mask"])
    for i in range(40):
        rng, k = jax.random.split(rng)
        state, m = train_step(state, batch, k, lm, 1.0)
    final = float(m["loss_mask"])
    assert np.isfinite(final)
    assert final < 0.5 * first, (first, final)
