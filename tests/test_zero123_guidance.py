import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.models.guidance.zero123 import (
    StableZero123Guidance,
    Zero123Config,
    Zero123Modules,
    add_noise,
    camera_delta_T,
    ddim_step,
    make_schedule,
)

TINY = Zero123Config(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
    context_dim=768, vae_ch=32, latent_size=8, image_size=32, use_clip=False,
    guidance_scale=3.0, min_step_percent=0.02, max_step_percent=0.98,
)


@pytest.fixture(scope="module")
def tiny_guidance():
    g = StableZero123Guidance(TINY)
    params = g.modules.init_params(jax.random.PRNGKey(0))
    return g, params


def test_schedule_golden():
    s = make_schedule(1000, 0.00085, 0.012)
    # golden values of the scaled-linear schedule (matches diffusers/ldm)
    assert abs(float(s.betas[0]) - 0.00085) < 1e-8
    assert abs(float(s.betas[-1]) - 0.012) < 1e-8
    assert 0.0 < float(s.alphas_cumprod[-1]) < 0.05
    np.testing.assert_allclose(float(s.alphas_cumprod[0]), 1 - 0.00085, rtol=1e-6)
    # monotone decreasing
    acp = np.asarray(s.alphas_cumprod)
    assert (np.diff(acp) < 0).all()


def test_add_noise_limits():
    s = make_schedule(1000)
    x0 = jnp.ones((2, 4, 4, 4))
    noise = jnp.zeros_like(x0)
    # t=0: almost no noise
    out = add_noise(s, x0, noise, jnp.asarray([0, 0]))
    np.testing.assert_allclose(np.asarray(out), np.sqrt(1 - 0.00085), rtol=1e-5)


def test_ddim_step_recovers_x0():
    s = make_schedule(1000)
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    t = jnp.asarray([500])
    x_t = add_noise(s, x0, eps, t)
    # stepping to t_prev=-1 (alpha_prev=1) with the true eps returns x0
    x_prev = ddim_step(s, x_t, eps, t, jnp.asarray([-1]))
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(x0), atol=1e-4)


def test_camera_delta_T():
    T = camera_delta_T(
        jnp.asarray([30.0]), jnp.asarray([45.0]), jnp.asarray([1.2]),
        cond_elevation_deg=10.0, cond_azimuth_deg=0.0,
    )
    expected = [np.deg2rad(-20.0), np.sin(np.deg2rad(45)), np.cos(np.deg2rad(45)),
                np.deg2rad(80.0)]
    np.testing.assert_allclose(np.asarray(T)[0], expected, atol=1e-6)


def test_vae_roundtrip_shapes(tiny_guidance):
    g, params = tiny_guidance
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    lat = g.modules.encode_images(params, rgb)
    assert lat.shape == (2, 4, 4, 4)  # 32 / 2^3 levels
    img = g.modules.decode_latents(params, lat)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_unet_shapes(tiny_guidance):
    g, params = tiny_guidance
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 8))
    t = jnp.asarray([10.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(4), (2, 1, 768))
    out = g.modules.apply_unet(params, x, t, ctx)
    assert out.shape == (2, 4, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init output conv -> near-zero output at init
    assert float(jnp.abs(out).max()) < 1e-5


def test_sds_loss_gradient_flows(tiny_guidance):
    g, params = tiny_guidance
    ref = jax.random.uniform(jax.random.PRNGKey(5), (1, 32, 32, 3))
    bank = g.prepare_embeddings(params, ref)
    assert bank["c_crossattn"].shape == (1, 768)
    assert bank["c_concat"].shape == (1, 4, 4, 4)

    def loss_fn(rgb):
        out = g.sds_loss(
            params, bank, jax.random.PRNGKey(6), rgb,
            jnp.asarray([20.0]), jnp.asarray([90.0]), jnp.asarray([1.2]),
            None, jnp.asarray(100),
        )
        return out["loss_sds"]

    rgb = jax.random.uniform(jax.random.PRNGKey(7), (1, 48, 48, 3))
    val, grad = jax.value_and_grad(loss_fn)(rgb)
    assert np.isfinite(float(val))
    gnp = np.asarray(grad)
    assert np.isfinite(gnp).all()
    assert np.abs(gnp).max() > 0  # gradients reach the rendered image


def test_sds_jits_inside_train_step(tiny_guidance):
    g, params = tiny_guidance
    ref = jax.random.uniform(jax.random.PRNGKey(8), (4, 32, 32, 3))
    bank = g.prepare_embeddings(params, ref)

    @jax.jit
    def step(rng, rgb, f_idx, s):
        return g.sds_loss(
            params, bank, rng, rgb, jnp.asarray([10.0, 20.0]),
            jnp.asarray([0.0, 180.0]), jnp.asarray([1.2, 1.2]), f_idx, s
        )["loss_sds"]

    out = step(jax.random.PRNGKey(9), jax.random.uniform(jax.random.PRNGKey(10), (2, 40, 40, 3)),
               jnp.asarray([0, 3]), jnp.asarray(50))
    assert np.isfinite(float(out))


def test_min_max_step_schedule(tiny_guidance):
    g, params = tiny_guidance
    cfg_sched = Zero123Config(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
        latent_size=8, image_size=32, use_clip=False,
        min_step_percent=[0, 0.7, 0.02, 200], max_step_percent=[0, 0.98, 0.5, 200],
    )
    g2 = StableZero123Guidance(cfg_sched, g.modules.__class__(cfg_sched))
    # reuse params of same architecture
    p2 = g2.modules.init_params(jax.random.PRNGKey(0))
    ref = jax.random.uniform(jax.random.PRNGKey(11), (1, 32, 32, 3))
    bank = g2.prepare_embeddings(p2, ref)
    out0 = g2.sds_loss(p2, bank, jax.random.PRNGKey(1), ref, jnp.asarray([0.0]),
                       jnp.asarray([0.0]), jnp.asarray([1.2]), None, jnp.asarray(0))
    out1 = g2.sds_loss(p2, bank, jax.random.PRNGKey(1), ref, jnp.asarray([0.0]),
                       jnp.asarray([0.0]), jnp.asarray([1.2]), None, jnp.asarray(500))
    assert float(out0["max_step"]) == pytest.approx(980.0, abs=0.1)
    assert float(out1["max_step"]) == pytest.approx(500.0, abs=0.1)
    assert float(out1["min_step"]) == pytest.approx(20.0, abs=0.1)


def test_guidance_eval_outputs(tiny_guidance):
    g, params = tiny_guidance
    ref = jax.random.uniform(jax.random.PRNGKey(20), (1, 32, 32, 3))
    bank = g.prepare_embeddings(params, ref)
    out = g.guidance_eval(
        params, bank, jax.random.PRNGKey(21), ref,
        jnp.asarray([10.0]), jnp.asarray([0.0]), jnp.asarray([1.2]),
        n_denoise_steps=4,
    )
    for k in ("img_noisy", "img_1step", "img_final"):
        assert out[k].shape == (1, 32, 32, 3)
        arr = np.asarray(out[k])
        assert np.isfinite(arr).all()
        assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_stable_diffusion_guidance_tiny():
    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        PromptProcessorConfig,
        StableDiffusionConfig,
        StableDiffusionGuidance,
        StableDiffusionPromptProcessor,
    )

    cfg = StableDiffusionConfig(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
        context_dim=64, latent_size=8, image_size=32, guidance_scale=7.5,
    )
    g = StableDiffusionGuidance(cfg)
    params = g.init_params(jax.random.PRNGKey(0))
    pp = StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="a chair", context_dim=64, seq_len=16)
    )
    prompts = pp()
    assert prompts.cond.shape == (5, 16, 64)
    # view-dependent selection
    cond, uncond = prompts.get(jnp.asarray([0.0, 0.0, 70.0]),
                               jnp.asarray([0.0, 180.0, 0.0]))
    assert cond.shape == (3, 16, 64)
    # front/back/overhead rows differ
    assert float(jnp.abs(cond[0] - cond[1]).max()) > 0
    assert float(jnp.abs(cond[0] - cond[2]).max()) > 0

    def loss(rgb):
        return g.sds_loss(params, prompts, jax.random.PRNGKey(1), rgb,
                          jnp.asarray([10.0]), jnp.asarray([30.0]),
                          jnp.asarray([1.5]), jnp.asarray(100))["loss_sds"]

    rgb = jax.random.uniform(jax.random.PRNGKey(2), (1, 40, 40, 3))
    val, grad = jax.value_and_grad(loss)(rgb)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert float(jnp.abs(grad).max()) > 0


def test_neural_env_background():
    from dreammesh4d_tpu.models.background import NeuralEnvironmentMapBackground

    bg = NeuralEnvironmentMapBackground(n_neurons=8, n_hidden_layers=1)
    params = bg.init_params(jax.random.PRNGKey(0))
    dirs = jax.random.normal(jax.random.PRNGKey(1), (10, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    out = bg(params, dirs)
    assert out.shape == (10, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1
    # direction-dependent
    assert float(jnp.abs(out[0] - out[5]).max()) > 1e-5


def test_misc_utils():
    from dreammesh4d_tpu.utils.misc import chunk_batch, get_activation, get_rank

    assert get_rank() >= 0
    f = get_activation("scale_-11.0")
    np.testing.assert_allclose(float(f(jnp.asarray(2.0))), -22.0)
    np.testing.assert_allclose(float(get_activation("trunc_exp")(jnp.asarray(100.0))), np.exp(15.0), rtol=1e-6)

    def fn(x):
        return {"y": x * 2}

    out = chunk_batch(fn, 3, jnp.arange(10.0))
    np.testing.assert_allclose(np.asarray(out["y"]), np.arange(10.0) * 2)
