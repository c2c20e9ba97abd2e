import pytest
import jax
import jax.numpy as jnp
import numpy as np

from dreammesh4d_tpu.ops.sh import C0, eval_sh, num_sh_bases, rgb_to_sh_dc, sh_dc_to_rgb, sh_to_rgb

pytestmark = pytest.mark.quick  # core <5-min CPU tier


def test_dc_only():
    sh = jnp.zeros((5, 3, 16)).at[..., 0].set(1.0)
    dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(3, sh, dirs)
    np.testing.assert_allclose(np.asarray(out), C0, atol=1e-6)


def test_rgb_roundtrip():
    rgb = jnp.asarray([[0.2, 0.5, 0.9]])
    dc = rgb_to_sh_dc(rgb)
    np.testing.assert_allclose(np.asarray(sh_dc_to_rgb(dc)), np.asarray(rgb), atol=1e-6)
    # via eval_sh with zero higher bands
    sh = jnp.zeros((1, 3, 16)).at[..., 0].set(dc)
    out = sh_to_rgb(3, sh, jnp.asarray([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(out), np.asarray(rgb), atol=1e-6)


def test_band1_antisymmetry():
    # band-1 terms flip sign when direction flips
    sh = jnp.zeros((1, 1, 4)).at[..., 1:].set(jnp.asarray([0.3, -0.2, 0.5]))
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    v1 = eval_sh(1, sh, d)
    v2 = eval_sh(1, sh, -d)
    np.testing.assert_allclose(np.asarray(v1), -np.asarray(v2), atol=1e-6)


def test_num_bases():
    assert [num_sh_bases(d) for d in range(4)] == [1, 4, 9, 16]
