"""Unified guidance: Perp-Neg math, SDS/VSD dispatch, zero123 variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.models.guidance.stable_diffusion import (
    PromptProcessorConfig,
    StableDiffusionPromptProcessor,
)
from dreammesh4d_tpu.models.guidance.unified import (
    PerpNegCoeffs,
    SDUnifiedConfig,
    SDUnifiedGuidance,
    Zero123UnifiedConfig,
    Zero123UnifiedGuidance,
    Zero123Guidance,
    get_perp_neg_embeddings,
    perpendicular_component,
    shifted_expotional_decay,
    zero123_delta_T,
)
from dreammesh4d_tpu.models.guidance.zero123.guidance import (
    Zero123Config,
    camera_delta_T,
)

TINY = dict(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
            num_heads=2, context_dim=32, latent_size=16, image_size=64,
            min_step_percent=0.2, max_step_percent=0.6)
TINY123 = dict(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
               num_heads=2, context_dim=32, latent_size=8, image_size=32,
               vae_ch=16, use_clip=False, min_step_percent=0.2,
               max_step_percent=0.6)


def _prompts():
    return StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="a test", context_dim=32))()


# ---------------------------------------------------------------------------
# math units
# ---------------------------------------------------------------------------


def test_perpendicular_component_is_orthogonal():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (3, 4, 5, 2))
    y = jax.random.normal(k2, (3, 4, 5, 2))
    p = perpendicular_component(x, y)
    dots = (p * y).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(np.asarray(dots), 0.0, atol=1e-3)


def test_perp_neg_embeddings_front_view():
    prompts = _prompts()
    # pure front view (az=0): pos == front embedding, r_inter = 1
    pos, uncond, neg, w = get_perp_neg_embeddings(
        prompts, jnp.zeros((1,)), jnp.zeros((1,)), PerpNegCoeffs())
    np.testing.assert_allclose(np.asarray(pos[0]), np.asarray(prompts.cond[1]),
                               atol=1e-6)
    # negatives are [front, side] with weights -f_fs(1), -f_sf(0)
    c = PerpNegCoeffs()
    np.testing.assert_allclose(
        float(w[0, 0]), -float(shifted_expotional_decay(*c.f_fs, jnp.asarray(1.0))),
        rtol=1e-6)
    np.testing.assert_allclose(
        float(w[0, 1]), -float(shifted_expotional_decay(*c.f_sf, jnp.asarray(0.0))),
        rtol=1e-6)


def test_perp_neg_embeddings_interpolation_and_overhead():
    prompts = _prompts()
    # az=45 -> r=0.5 blend of front and side
    pos, _, _, _ = get_perp_neg_embeddings(
        prompts, jnp.zeros((1,)), jnp.full((1,), 45.0), PerpNegCoeffs())
    expect = 0.5 * prompts.cond[1] + 0.5 * prompts.cond[2]
    np.testing.assert_allclose(np.asarray(pos[0]), np.asarray(expect), atol=1e-6)
    # az=135 -> side-back branch, r = 2 - 1.5 = 0.5
    pos2, _, _, _ = get_perp_neg_embeddings(
        prompts, jnp.zeros((1,)), jnp.full((1,), 135.0), PerpNegCoeffs())
    expect2 = 0.5 * prompts.cond[2] + 0.5 * prompts.cond[3]
    np.testing.assert_allclose(np.asarray(pos2[0]), np.asarray(expect2), atol=1e-6)
    # overhead: pos = overhead embedding, zero neg weights
    pos3, _, _, w3 = get_perp_neg_embeddings(
        prompts, jnp.full((1,), 80.0), jnp.zeros((1,)), PerpNegCoeffs())
    np.testing.assert_allclose(np.asarray(pos3[0]), np.asarray(prompts.cond[4]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(w3), 0.0, atol=1e-9)


def test_zero123_delta_T_vs_stable():
    elev = jnp.asarray([30.0])
    azim = jnp.asarray([45.0])
    dist = jnp.asarray([1.8])
    vanilla = zero123_delta_T(elev, azim, dist, 10.0, 0.0, 1.2)
    stable = camera_delta_T(elev, azim, dist, 10.0, 0.0)
    # first three dims identical
    np.testing.assert_allclose(np.asarray(vanilla[0, :3]),
                               np.asarray(stable[0, :3]), rtol=1e-6)
    # 4th: distance delta vs deg2rad(90 - cond_elev)
    np.testing.assert_allclose(float(vanilla[0, 3]), 1.8 - 1.2, rtol=1e-6)
    np.testing.assert_allclose(float(stable[0, 3]), np.deg2rad(80.0), rtol=1e-6)


# ---------------------------------------------------------------------------
# stable-diffusion-unified
# ---------------------------------------------------------------------------


def test_sd_unified_sds_and_perp_neg_gradients():
    g = SDUnifiedGuidance(SDUnifiedConfig(**TINY, use_perp_neg=True))
    params = g.init_params(jax.random.PRNGKey(0))
    prompts = _prompts()
    B = 2
    elev = jnp.zeros((B,))
    azim = jnp.asarray([20.0, 120.0])
    dist = jnp.full((B,), 3.8)
    step = jnp.asarray(100, jnp.int32)

    def f(rgb):
        out = g.loss(params, prompts, jax.random.PRNGKey(1), rgb, elev, azim,
                     dist, step)
        return out["loss_sds"]

    rgb = jax.random.uniform(jax.random.PRNGKey(2), (B, 24, 24, 3))
    val, grad = jax.value_and_grad(f)(rgb)
    assert np.isfinite(float(val))
    assert float(jnp.abs(grad).max()) > 0.0


def _kick_off_init(params, key=9):
    """The UNet's conv_out / proj_out are zero-initialized (SD zero-module
    convention), making a fresh UNet output exactly 0 with zero grads —
    randomize all weights so gradient-flow assertions are meaningful."""
    flat, tree = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(key), len(flat))
    flat = [x + 0.02 * jax.random.normal(k, x.shape, x.dtype)
            for x, k in zip(flat, keys)]
    return jax.tree_util.tree_unflatten(tree, flat)


def test_sd_unified_vsd_dispatch():
    cfg = SDUnifiedConfig(**TINY, guidance_type="vsd")
    g = SDUnifiedGuidance(cfg)
    params = g.init_params(jax.random.PRNGKey(0))
    params = dict(params, unet=_kick_off_init(params["unet"]))
    lora = g.init_lora_params(jax.random.PRNGKey(1), params["unet"])
    prompts = _prompts()
    B = 2
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (B, 24, 24, 3))
    cam = jnp.broadcast_to(jnp.eye(4).reshape(1, 16), (B, 16))
    out = g.loss(params, prompts, jax.random.PRNGKey(3), rgb, jnp.zeros((B,)),
                 jnp.zeros((B,)), jnp.full((B,), 3.8), jnp.asarray(0),
                 camera_condition=cam, lora=lora)
    assert "loss_vsd" in out and "loss_lora" in out
    assert np.isfinite(float(out["loss_vsd"]))
    # B zero-init => phi == pretrained at init => eps_pretrain - eps_phi is
    # purely the CFG delta; loss must still be finite and lora grads flow
    g_lora = jax.grad(lambda l: g.loss(
        params, prompts, jax.random.PRNGKey(3), rgb, jnp.zeros((B,)),
        jnp.zeros((B,)), jnp.full((B,), 3.8), jnp.asarray(0),
        camera_condition=cam, lora=l)["loss_lora"])(lora)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g_lora))
    assert total > 0.0


# ---------------------------------------------------------------------------
# zero123 variants
# ---------------------------------------------------------------------------


def _bank(g, params, F=3):
    imgs = jax.random.uniform(jax.random.PRNGKey(7), (F, 32, 32, 3))
    return g.prepare_embeddings(params, imgs)


def test_zero123_guidance_sds():
    g = Zero123Guidance(Zero123Config(**TINY123))
    params = g.modules.init_params(jax.random.PRNGKey(0))
    bank = _bank(g, params)
    B = 2
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (B, 24, 24, 3))
    out = g.sds_loss(params, bank, jax.random.PRNGKey(2), rgb,
                     jnp.zeros((B,)), jnp.asarray([30.0, -60.0]),
                     jnp.full((B,), 1.8), None, jnp.asarray(50))
    assert np.isfinite(float(out["loss_sds"]))
    # differentiable wrt the render
    grad = jax.grad(lambda r: g.sds_loss(
        params, bank, jax.random.PRNGKey(2), r, jnp.zeros((B,)),
        jnp.asarray([30.0, -60.0]), jnp.full((B,), 1.8), None,
        jnp.asarray(50))["loss_sds"])(rgb)
    assert float(jnp.abs(grad).max()) > 0.0


def test_zero123_unified_vsd():
    cfg = Zero123UnifiedConfig(**TINY123, guidance_type="vsd",
                               vsd_guidance_scale_phi=1.5)
    g = Zero123UnifiedGuidance(cfg)
    params = g.modules.init_params(jax.random.PRNGKey(0))
    lora = g.init_lora_params(jax.random.PRNGKey(1), params["unet"])
    bank = _bank(g, params)
    B = 2
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (B, 24, 24, 3))
    cam = jnp.broadcast_to(jnp.eye(4).reshape(1, 16), (B, 16))
    out = g.loss(params, bank, jax.random.PRNGKey(3), rgb, jnp.zeros((B,)),
                 jnp.zeros((B,)), jnp.full((B,), 1.8), jnp.asarray(0),
                 camera_condition=cam, lora=lora)
    assert "loss_vsd" in out and "loss_lora" in out
    assert np.isfinite(float(out["loss_vsd"])) and np.isfinite(float(out["loss_lora"]))


def test_zero123_unified_sds_matches_zero123():
    """guidance_type=sds must reduce to the vanilla zero123 SDS exactly."""
    cfg_u = Zero123UnifiedConfig(**TINY123)
    g_u = Zero123UnifiedGuidance(cfg_u)
    params = g_u.modules.init_params(jax.random.PRNGKey(0))
    g_v = Zero123Guidance(Zero123Config(**TINY123), g_u.modules)
    bank = _bank(g_u, params)
    B = 2
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (B, 24, 24, 3))
    args = (jnp.zeros((B,)), jnp.asarray([30.0, -60.0]), jnp.full((B,), 1.8))
    a = g_u.loss(params, bank, jax.random.PRNGKey(3), rgb, *args, jnp.asarray(5))
    b = g_v.sds_loss(params, bank, jax.random.PRNGKey(3), rgb, *args, None,
                     jnp.asarray(5))
    np.testing.assert_allclose(float(a["loss_sds"]), float(b["loss_sds"]), rtol=1e-6)
