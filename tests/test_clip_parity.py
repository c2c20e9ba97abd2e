"""Numeric parity of convert_clip_vision against a torch OpenAI-CLIP-layout
visual tower, and the guidance running end-to-end with use_clip=True.

Closes VERDICT round-2 item 2: the CLIP image-encoder conversion
(models/guidance/zero123/convert.py:convert_clip_vision) was the only
unproven link of the flagship Zero123 guidance — every prior test ran
use_clip=False.  Reference semantics: FrozenCLIPImageEmbedder
(/root/reference/extern/ldm_zero123/modules/encoders/modules.py:432-475)
= clip.load("ViT-L/14").encode_image on CLIP-normalized 224² input.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

torch = pytest.importorskip("torch")

from ldm_ref import make_tiny_clip_visual  # noqa: E402

TINY = dict(width=32, layers=2, heads=4, image_size=16, patch_size=8,
            intermediate=64, proj_dim=16)


def _tiny_vision_config():
    from transformers import CLIPVisionConfig

    return CLIPVisionConfig(
        hidden_size=TINY["width"], intermediate_size=TINY["intermediate"],
        num_hidden_layers=TINY["layers"], num_attention_heads=TINY["heads"],
        image_size=TINY["image_size"], patch_size=TINY["patch_size"],
        projection_dim=TINY["proj_dim"],
    )


def test_convert_clip_vision_parity():
    """visual.* state dict (fused in_proj qkv, c_fc/c_proj MLP, ln_post+proj)
    -> FlaxCLIPVisionModel params: projected embedding must match the torch
    forward to float32 tolerance."""
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.guidance.zero123.clip import CLIPImageEncoder
    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_clip_vision

    visual = make_tiny_clip_visual(**TINY, seed=3)
    sd = {f"visual.{k}": v.numpy() for k, v in visual.state_dict().items()}

    params = convert_clip_vision(sd, None)
    enc = CLIPImageEncoder(config=_tiny_vision_config(), proj_dim=TINY["proj_dim"])

    rng = np.random.default_rng(0)
    s = TINY["image_size"]
    pixel = rng.normal(0, 1, (2, 3, s, s)).astype(np.float32)

    with torch.no_grad():
        ref = visual(torch.from_numpy(pixel)).numpy()

    got = np.asarray(enc.embed_pixel_values(params, jnp.asarray(pixel)))
    assert got.shape == ref.shape == (2, TINY["proj_dim"])
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_convert_clip_vision_rejects_empty():
    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_clip_vision

    with pytest.raises(KeyError):
        convert_clip_vision({"not_visual.x": np.zeros(1)}, None)


def test_guidance_use_clip_end_to_end(tmp_path):
    """Tiny LDM-layout checkpoint WITH a CLIP tower -> load_zero123_checkpoint
    with use_clip=True -> prepare_embeddings conditions on real image
    features (parity vs the torch tower) and sds_loss is finite+nonzero."""
    import jax
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.guidance.zero123 import (
        StableZero123Guidance,
        Zero123Config,
    )
    from dreammesh4d_tpu.models.guidance.zero123.convert import (
        load_zero123_checkpoint,
    )
    from ldm_ref import import_ldm, make_tiny_ldm_checkpoint

    ldm = import_ldm()
    if ldm is None:
        pytest.skip("reference tree unavailable")

    visual = make_tiny_clip_visual(**TINY, seed=3)
    ckpt = str(tmp_path / "tiny_clip_zero123.ckpt")
    make_tiny_ldm_checkpoint(ckpt, ldm, clip_visual=visual)

    cfg = Zero123Config(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
        context_dim=16, vae_ch=32, vae_ch_mult=(1, 2), vae_num_res_blocks=1,
        image_size=32, latent_size=16, use_clip=True,
        clip_hidden_size=TINY["width"], clip_layers=TINY["layers"],
        clip_heads=TINY["heads"], clip_intermediate=TINY["intermediate"],
        clip_image_size=TINY["image_size"], clip_patch_size=TINY["patch_size"],
    )
    guidance = StableZero123Guidance(cfg)
    params = load_zero123_checkpoint(ckpt, guidance.modules)
    assert "clip" in params, sorted(params)
    params = jax.tree.map(jnp.asarray, params)

    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    bank = guidance.prepare_embeddings(params, images)
    assert bank["c_crossattn"].shape == (2, 16)
    assert bank["c_concat"].shape == (2, 16, 16, 4)

    # the embedding must BE the torch tower's output on the same preprocess
    pixel = guidance.modules.clip.preprocess(images)
    with torch.no_grad():
        ref = visual(torch.from_numpy(np.asarray(pixel))).numpy()
    np.testing.assert_allclose(np.asarray(bank["c_crossattn"]), ref,
                               atol=1e-4, rtol=1e-4)

    out = guidance.sds_loss(
        params, bank, jax.random.PRNGKey(0),
        images, jnp.asarray([10.0, 20.0]), jnp.asarray([0.0, 90.0]),
        jnp.asarray([1.2, 1.2]), jnp.asarray([0, 1]), jnp.asarray(0),
    )
    assert np.isfinite(float(out["loss_sds"]))
    assert float(out["loss_sds"]) != 0.0
