"""PSNR/SSIM evaluators."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.utils.metrics import psnr, ssim

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_psnr_known_values():
    x = jnp.zeros((8, 8, 3))
    assert float(psnr(x, x)) > 100  # identical -> capped by eps
    y = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(psnr(x, y)), 20.0, atol=1e-4)  # mse=0.01


def test_ssim_identity_and_ordering():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    s_same = float(ssim(img, img)[0])
    assert abs(s_same - 1.0) < 1e-5
    noisy_small = jnp.clip(img + 0.05 * jax.random.normal(jax.random.PRNGKey(1), img.shape), 0, 1)
    noisy_big = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape), 0, 1)
    s1, s2 = float(ssim(img, noisy_small)[0]), float(ssim(img, noisy_big)[0])
    assert s_same > s1 > s2
    # constant shift barely hurts SSIM but kills PSNR (structure vs fidelity)
    shifted = jnp.clip(img * 0.9 + 0.05, 0, 1)
    assert float(ssim(img, shifted)[0]) > 0.9
