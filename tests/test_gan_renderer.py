"""GAN volume renderer (Control4D super-resolution path)."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.models.renderers.gan_volume_renderer import (
    GANVolumeRenderer,
    posterior_sample,
)


def _base(lo, ld):
    # fake low-res base renderer: rgb from ray dir + zero latent moments
    B, h, w, _ = lo.shape
    rgb = ld * 0.5 + 0.5
    latent = jnp.concatenate([jnp.zeros((B, h, w, 4)), jnp.full((B, h, w, 4), -5.0)], -1)
    return {"comp_rgb": jnp.concatenate([rgb, latent], -1),
            "opacity": jnp.ones((B, h, w, 1))}


def test_posterior_mode_and_sample():
    lat = jnp.concatenate([jnp.full((2, 4, 4, 4), 1.5), jnp.full((2, 4, 4, 4), -30.0)], -1)
    mode = posterior_sample(lat, None)
    assert np.allclose(np.asarray(mode), 1.5)
    samp = posterior_sample(lat, jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(samp), 1.5, atol=1e-4)  # tiny variance


def test_gan_renderer_levels():
    r = GANVolumeRenderer()
    params = r.init_params(jax.random.PRNGKey(0), lr_hw=16)
    H = 16 * 4  # scale 2^(3-1)=4
    o = jnp.zeros((1, H, H, 3))
    d = jnp.linspace(-1, 1, H * H * 3).reshape(1, H, H, 3)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (1, H, H, 3))

    out0 = r(params, _base, o, d, generator_level=0)
    assert out0["comp_gan_rgb"].shape == (1, H, H, 3)
    assert out0["comp_lr_rgb"].shape == (1, 16, 16, 3)
    assert float(out0["comp_gan_rgb"].min()) >= 0 and float(out0["comp_gan_rgb"].max()) <= 1

    out1 = r(params, _base, o, d, gt_rgb=gt, generator_level=1,
             rng=jax.random.PRNGKey(2))
    out2 = r(params, _base, o, d, gt_rgb=gt, generator_level=2,
             rng=jax.random.PRNGKey(2))
    # level 2 swaps in the local-encoder z: output differs from level 1
    assert not np.allclose(np.asarray(out1["comp_gan_rgb"]),
                           np.asarray(out2["comp_gan_rgb"]))

    # generator is trainable end-to-end
    def loss(p):
        return (r(p, _base, o, d, generator_level=0)["comp_gan_rgb"] ** 2).mean()

    g = jax.grad(loss)(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g["generator"]))
    assert np.isfinite(total) and total > 0
