"""Guidance zoo: ControlNet, InstructPix2Pix, DeepFloyd (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.models.guidance.controlnet import (
    ControlNetConfig,
    ControlNetGuidance,
    canny_hint,
)
from dreammesh4d_tpu.models.guidance.deep_floyd import DeepFloydConfig, DeepFloydGuidance
from dreammesh4d_tpu.models.guidance.instructpix2pix import (
    InstructPix2PixConfig,
    InstructPix2PixGuidance,
)
from dreammesh4d_tpu.models.guidance.stable_diffusion import (
    PromptProcessorConfig,
    StableDiffusionPromptProcessor,
)

TINY = dict(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
            num_heads=2, context_dim=32, latent_size=16, image_size=64,
            min_step_percent=0.2, max_step_percent=0.6)


def _prompts():
    return StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="a test", context_dim=32))()


def _views(B=2):
    return jnp.zeros((B,)), jnp.asarray([10.0, 120.0]), jnp.full((B,), 3.8)


def test_canny_hint_detects_edges():
    img = jnp.zeros((1, 32, 32, 3)).at[:, :, 16:, :].set(1.0)
    hint = canny_hint(img)
    assert hint.shape == img.shape
    # strong response at the vertical edge, none in flat regions
    assert float(hint[0, 16, 15:17, 0].max()) == 1.0
    assert float(hint[0, 16, 5, 0]) == 0.0


def test_controlnet_zero_init_and_steering():
    g = ControlNetGuidance(ControlNetConfig(**TINY, control_type="canny"))
    params = g.init_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))  # VAE is 8x
    hint = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    t = jnp.asarray([100, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 32)) * 0.02
    control = g.controlnet.apply({"params": params["controlnet"]}, x, hint, t, ctx)
    # zero-init: every residual is exactly zero at init
    assert all(float(jnp.abs(r).max()) == 0.0 for r in control["down"])
    assert float(jnp.abs(control["mid"]).max()) == 0.0
    # injection is shape-compatible with the UNet; at zero-init the UNet's
    # conv_out makes everything 0, so kick the weights off init first
    flat, tree = jax.tree_util.tree_flatten(params["unet"])
    keys = jax.random.split(jax.random.PRNGKey(9), len(flat))
    up = jax.tree_util.tree_unflatten(
        tree, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
               for p, k in zip(flat, keys)])
    out = g.unet.apply({"params": up}, x, t, ctx, control=control)
    base = g.unet.apply({"params": up}, x, t, ctx)
    assert np.allclose(np.asarray(out), np.asarray(base))  # zero residuals = no-op
    # non-zero residuals change the output
    control2 = jax.tree_util.tree_map(lambda r: r + 0.5, control)
    out2 = g.unet.apply({"params": up}, x, t, ctx, control=control2)
    assert not np.allclose(np.asarray(out2), np.asarray(base))


def test_controlnet_sds_loss_grads(tiny_rgb=None):
    g = ControlNetGuidance(ControlNetConfig(**TINY, control_type="canny"))
    params = g.init_params(jax.random.PRNGKey(0))
    prompts = _prompts()
    rgb = jax.random.uniform(jax.random.PRNGKey(42), (2, 64, 64, 3))
    # (constant images make every GroupNorm variance 0 -> rsqrt(eps)^depth
    # overflows the backward pass; real renders are never constant)
    elev, azim, dist = _views()

    def loss(rgb):
        return g.sds_loss(params, prompts, jax.random.PRNGKey(0), rgb,
                          elev, azim, dist, jnp.asarray(10))["loss_sds"]

    gv = jax.grad(loss)(rgb)
    assert np.isfinite(np.asarray(gv)).all()


def test_instructpix2pix_three_way_cfg():
    g = InstructPix2PixGuidance(InstructPix2PixConfig(**TINY))
    params = g.init_params(jax.random.PRNGKey(0))
    prompts = _prompts()
    rgb = jax.random.uniform(jax.random.PRNGKey(42), (2, 64, 64, 3))
    # (constant images make every GroupNorm variance 0 -> rsqrt(eps)^depth
    # overflows the backward pass; real renders are never constant)
    cond_rgb = jax.random.uniform(jax.random.PRNGKey(43), (2, 64, 64, 3))
    elev, azim, _ = _views()
    out = g.edit_loss(params, prompts, jax.random.PRNGKey(0), rgb, cond_rgb,
                      elev, azim, jnp.asarray(0))
    assert np.isfinite(float(out["loss_sds"]))
    gv = jax.grad(lambda r: g.edit_loss(params, prompts, jax.random.PRNGKey(0),
                                        r, cond_rgb, elev, azim, jnp.asarray(0))["loss_sds"])(rgb)
    assert np.isfinite(np.asarray(gv)).all()
    # the conditioning image is stop-gradient
    gc = jax.grad(lambda c: g.edit_loss(params, prompts, jax.random.PRNGKey(0),
                                        rgb, c, elev, azim, jnp.asarray(0))["loss_sds"])(cond_rgb)
    assert float(jnp.abs(gc).sum()) == 0.0


def test_deep_floyd_pixel_space():
    g = DeepFloydGuidance(DeepFloydConfig(**dict(TINY, context_dim=64, image_size=32, latent_size=32)))
    params = g.init_params(jax.random.PRNGKey(0))
    assert "vae" not in params  # pixel space, no VAE
    prompts = StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="a test", context_dim=64))()
    rgb = jax.random.uniform(jax.random.PRNGKey(42), (2, 64, 64, 3))
    # (constant images make every GroupNorm variance 0 -> rsqrt(eps)^depth
    # overflows the backward pass; real renders are never constant)
    elev, azim, dist = _views()
    out = g.sds_loss(params, prompts, jax.random.PRNGKey(0), rgb, elev, azim,
                     dist, jnp.asarray(0))
    assert np.isfinite(float(out["loss_sds"]))
    gv = jax.grad(lambda r: g.sds_loss(params, prompts, jax.random.PRNGKey(1),
                                       r, elev, azim, dist, jnp.asarray(0))["loss_sds"])(rgb)
    assert np.isfinite(np.asarray(gv)).all() and float(jnp.abs(gv).sum()) > 0


def test_guidance_dtype_yaml_strings():
    """YAML surface: system.guidance.dtype accepts dtype strings; fp16 maps
    to bf16 (the TPU equivalent of the reference's fp16-with-fp32-norms
    guidance, temporal_stable_zero123_guidance.py:104-135), and the flagship
    stage configs run the guidance in bf16 like the reference runs fp16."""
    import os

    import jax.numpy as jnp

    from dreammesh4d_tpu.config import load_config
    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        StableDiffusionConfig,
    )
    from dreammesh4d_tpu.models.guidance.zero123 import Zero123Config

    assert Zero123Config(dtype="bfloat16").dtype == jnp.bfloat16
    assert Zero123Config(dtype="fp16").dtype == jnp.bfloat16
    assert Zero123Config(dtype="float32").dtype == jnp.float32
    assert StableDiffusionConfig(dtype="bf16").dtype == jnp.bfloat16
    with pytest.raises(ValueError):
        Zero123Config(dtype="int8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for y in ("stable-zero123.yaml", "sugar_static_refine.yaml",
              "sugar_dynamic_dg.yaml"):
        cfg = load_config(
            os.path.join(repo, "configs", y),
            cli_args=["data.image_path=/tmp/x.png", "tag=t",
                      "use_timestamp=false", "exp_root_dir=/tmp/cfgtest"])
        assert cfg.system["guidance"]["dtype"] == "bfloat16", y
