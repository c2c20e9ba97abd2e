"""instructnerf2nerf + control4d systems (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dreammesh4d_tpu.models.guidance.instructpix2pix import (
    InstructPix2PixConfig,
    InstructPix2PixGuidance,
)
from dreammesh4d_tpu.models.guidance.stable_diffusion import (
    PromptProcessorConfig,
    StableDiffusionPromptProcessor,
)
from dreammesh4d_tpu.systems.editing import (
    Control4DLosses,
    In2NLosses,
    In2NState,
    init_control4d_state,
    ip2p_edit_images,
    make_control4d_train_step,
    make_in2n_train_step,
)
from dreammesh4d_tpu.utils.gan import DiscriminatorConfig, init_discriminator

TINY = dict(model_channels=16, channel_mult=(1, 2), num_res_blocks=1,
            num_heads=2, context_dim=32, latent_size=16, image_size=64,
            min_step_percent=0.2, max_step_percent=0.6)


def test_ip2p_edit_images_shape_and_range():
    g = InstructPix2PixGuidance(InstructPix2PixConfig(**TINY))
    params = g.init_params(jax.random.PRNGKey(0))
    prompts = StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="make it gold", context_dim=32))()
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out = ip2p_edit_images(g, params, prompts, jax.random.PRNGKey(2), rgb, rgb,
                           jnp.zeros((1,)), jnp.zeros((1,)), diffusion_steps=4)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_in2n_train_step_fits_edited_images():
    def render_fn(p, batch, rng):
        return jnp.broadcast_to(jax.nn.sigmoid(p["c"]), (1, 8, 8, 3))

    opt = optax.adam(0.1)
    params = {"c": jnp.zeros((3,))}
    step = make_in2n_train_step(render_fn, opt, In2NLosses())
    state = In2NState(params, opt.init(params), jnp.zeros((), jnp.int32))
    batch = {"edited_rgb": jnp.full((1, 8, 8, 3), 0.9)}
    for i in range(30):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    assert float(m["loss_l1"]) < 0.2  # converges toward the edited target


def test_control4d_two_optimizer_step():
    disc = init_discriminator(DiscriminatorConfig(ndf=8, n_layers=2), jax.random.PRNGKey(0))
    scene = {"img": jnp.zeros((1, 32, 32, 3))}

    def render_fn(p, batch, rng):
        return {"comp_gan_rgb": jax.nn.sigmoid(p["img"])}

    opt, dopt = optax.adam(1e-2), optax.adam(1e-3)
    step = make_control4d_train_step(render_fn, opt, dopt, Control4DLosses())
    state = init_control4d_state(scene, disc, opt, dopt)
    batch = {"edited_rgb": jnp.full((1, 32, 32, 3), 0.7)}
    s1, m = step(state, batch, jax.random.PRNGKey(0))
    for k in ("loss_l1", "loss_G", "loss_D", "loss_total"):
        assert np.isfinite(float(m[k])), k
    # both sides moved
    assert float(jnp.abs(s1.scene_params["img"] - scene["img"]).sum()) > 0
    moved = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).sum()),
                                   state.disc_params, s1.disc_params)
    assert sum(jax.tree_util.tree_leaves(moved)) > 0
