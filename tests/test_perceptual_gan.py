"""Perceptual (LPIPS-style) loss and GAN utils."""

import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.utils.gan import (
    DiscriminatorConfig,
    apply_discriminator,
    discriminator_loss,
    generator_loss,
    hinge_d_loss,
    init_discriminator,
)
from dreammesh4d_tpu.utils.perceptual import (
    init_perceptual,
    load_torch_weights,
    perceptual_loss,
)


def test_perceptual_zero_for_identical_and_orders_distortions():
    params = init_perceptual(jax.random.PRNGKey(0))
    k = jax.random.PRNGKey(1)
    x = jax.random.uniform(k, (2, 64, 64, 3))
    d0 = perceptual_loss(params, x, x)
    assert d0.shape == (2,)
    assert float(jnp.abs(d0).max()) < 1e-6
    # small noise < big noise
    n = jax.random.normal(jax.random.PRNGKey(2), x.shape)
    d_small = perceptual_loss(params, x, jnp.clip(x + 0.02 * n, 0, 1))
    d_big = perceptual_loss(params, x, jnp.clip(x + 0.3 * n, 0, 1))
    assert (np.asarray(d_small) < np.asarray(d_big)).all()
    # differentiable w.r.t. the prediction
    g = jax.grad(lambda y: perceptual_loss(params, x, y).sum())(x + 0.05)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0


def test_perceptual_torch_weight_conversion():
    # build a fake torchvision-layout state dict and check shapes round-trip
    conv_ids = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    state = {}
    flat = [i for ids in conv_ids for i in ids]
    for i, (cin, cout) in zip(flat, chans):
        state[f"{i}.weight"] = np.zeros((cout, cin, 3, 3), np.float32)
        state[f"{i}.bias"] = np.zeros((cout,), np.float32)
    params = load_torch_weights(state)
    assert len(params["stages"]) == 5
    assert params["stages"][0][0]["w"].shape == (3, 3, 3, 64)
    assert params["stages"][4][-1]["w"].shape == (3, 3, 512, 512)
    assert [int(l.shape[0]) for l in params["lins"]] == [64, 128, 256, 512, 512]


def test_discriminator_patch_output_and_losses():
    cfg = DiscriminatorConfig(input_nc=3, ndf=16, n_layers=3)
    params = init_discriminator(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    logits = apply_discriminator(params, x)
    assert logits.ndim == 4 and logits.shape[0] == 2 and logits.shape[-1] == 1
    assert logits.shape[1] < 64  # patch logits, downsampled

    y = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    dl = discriminator_loss(params, x, y)
    gl = generator_loss(params, y)
    assert np.isfinite(float(dl)) and np.isfinite(float(gl))
    # hinge: perfect separation -> loss 0; swapped -> positive
    assert float(hinge_d_loss(jnp.full((4,), 2.0), jnp.full((4,), -2.0))) == 0.0
    assert float(hinge_d_loss(jnp.full((4,), -2.0), jnp.full((4,), 2.0))) == 3.0

    # generator gradient flows into the fake image, none into discriminator
    # through discriminator_loss's stop_gradients on images
    gg = jax.grad(lambda y: generator_loss(params, y))(y)
    assert float(jnp.abs(gg).sum()) > 0
    gd = jax.grad(lambda y: discriminator_loss(params, x, y))(y)
    assert float(jnp.abs(gd).sum()) == 0.0
