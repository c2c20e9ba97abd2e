"""VSD guidance (models/guidance/vsd.py) on a tiny UNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dreammesh4d_tpu.models.guidance.stable_diffusion import (
    PromptProcessorConfig,
    StableDiffusionPromptProcessor,
)
from dreammesh4d_tpu.models.guidance.vsd import VSDConfig, VSDGuidance, _iter_lora_paths


@pytest.fixture(scope="module")
def tiny():
    cfg = VSDConfig(
        model_channels=16, channel_mult=(1, 2), num_res_blocks=1, num_heads=2,
        context_dim=32, latent_size=16, image_size=64, lora_rank=4,
        guidance_scale=7.5, min_step_percent=0.2, max_step_percent=0.6,
    )
    g = VSDGuidance(cfg)
    params = g.init_params(jax.random.PRNGKey(0))
    lora = g.init_lora_params(jax.random.PRNGKey(1), params["unet"])
    prompts = StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="a test", context_dim=32)
    )()
    return g, params, lora, prompts


def _batch(B=2):
    rgb = jnp.full((B, 64, 64, 3), 0.5)
    elev = jnp.zeros((B,))
    azim = jnp.asarray([10.0, 120.0])
    cam = jnp.broadcast_to(jnp.eye(4), (B, 4, 4))
    return rgb, elev, azim, cam


def test_lora_paths_cover_all_attention_projections(tiny):
    g, params, lora, _ = tiny
    paths = list(_iter_lora_paths(params["unet"]))
    assert len(paths) > 0
    names = {p[-1] for p, _ in paths}
    assert names == {"to_q", "to_k", "to_v", "to_out"}
    # lora has an adapter per path + the camera projector
    assert len(lora) == len(paths) + 1
    for key, entry in lora.items():
        if key == "camera_proj":
            continue
        assert entry["A"].shape[1] == 4 and entry["B"].shape[0] == 4
        assert float(jnp.abs(entry["B"]).max()) == 0.0  # zero init


def test_phi_equals_pretrained_at_init(tiny):
    g, params, lora, _ = tiny
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 4))
    t = jnp.asarray([100, 500])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (2, 77, 32)) * 0.02
    cam = jnp.broadcast_to(jnp.eye(4), (2, 4, 4))
    base = g.unet.apply({"params": params["unet"]}, x, t, ctx)
    phi = g._apply_phi(params, lora, x, t, ctx, cam)
    # B=0 merge means identical weights; the extra camera token perturbs
    # attention only through attn2 (cross) — outputs stay close at init
    assert np.allclose(np.asarray(base), np.asarray(phi), atol=5e-2)


def test_vsd_losses_finite_and_grads_flow(tiny):
    g, params0, lora, prompts = tiny
    rgb, elev, azim, cam = _batch()
    # at exact init the UNet's zero-init proj_out makes context (and thus
    # CFG and the phi difference) a no-op -> VSD grad is exactly zero; kick
    # the weights off the init point as training immediately would
    flat, tree = jax.tree_util.tree_flatten(params0)
    keys = jax.random.split(jax.random.PRNGKey(9), len(flat))
    params = jax.tree_util.tree_unflatten(
        tree, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
               for p, k in zip(flat, keys)])

    def scene_loss(rgb):
        out = g.vsd_loss(params, lora, prompts, jax.random.PRNGKey(0), rgb,
                         elev, azim, cam, jnp.asarray(100))
        return out["loss_vsd"]

    def lora_loss(lora):
        out = g.vsd_loss(params, lora, prompts, jax.random.PRNGKey(0), rgb,
                         elev, azim, cam, jnp.asarray(100))
        return out["loss_lora"]

    gv = jax.jit(jax.grad(scene_loss))(rgb)
    gl = jax.jit(jax.grad(lora_loss))(lora)
    assert np.isfinite(np.asarray(gv)).all() and float(jnp.abs(gv).sum()) > 0
    leaves = jax.tree_util.tree_leaves(gl)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # the A matrices receive gradient (B is zero so dL/dA = 0 at exact init
    # ONLY through the merge path; the camera projector must get signal)
    assert float(jnp.abs(gl["camera_proj"]["w"]).sum()) > 0
    # B matrices get gradient through A != 0
    b_norms = [float(jnp.abs(v["B"]).sum()) for k, v in gl.items() if k != "camera_proj"]
    assert sum(b_norms) > 0


def test_scene_grad_does_not_touch_lora_and_vice_versa(tiny):
    g, params, lora, prompts = tiny
    rgb, elev, azim, cam = _batch()

    out = g.vsd_loss(params, lora, prompts, jax.random.PRNGKey(0), rgb,
                     elev, azim, cam, jnp.asarray(0))
    # loss_vsd is independent of lora gradient-wise (stop_gradient inside)
    def vsd_wrt_lora(lora):
        return g.vsd_loss(params, lora, prompts, jax.random.PRNGKey(0), rgb,
                          elev, azim, cam, jnp.asarray(0))["loss_vsd"]

    gl = jax.grad(vsd_wrt_lora)(lora)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(gl))
    assert total == 0.0
    assert np.isfinite(float(out["loss_vsd"])) and np.isfinite(float(out["loss_lora"]))
