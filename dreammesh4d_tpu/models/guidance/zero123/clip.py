"""CLIP image conditioning (FrozenCLIPImageEmbedder equivalent).

The reference conditions Zero123 on the projected CLIP ViT-L/14 image
embedding (extern/ldm_zero123/modules/encoders/modules.py
FrozenCLIPImageEmbedder): resize to 224², CLIP-normalize, vision transformer,
pooled output through the visual projection -> (B, 768).

Here: ``transformers`` FlaxCLIPVisionModel (offline, from config; weights come
from the checkpoint converter) + an explicit visual-projection matrix.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = np.asarray([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.asarray([0.26862954, 0.26130258, 0.27577711], np.float32)


def clip_vit_l14_config():
    from transformers import CLIPVisionConfig

    # hidden_act defaults to quick_gelu — matching OpenAI CLIP's QuickGELU
    # (extern/ldm_zero123 loads the `clip` package's ViT-L/14)
    return CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14, projection_dim=768,
    )


class CLIPImageEncoder:
    """Stateless wrapper: init() -> params; embed(params, images) -> (B, proj).

    images: (B, H, W, 3) in [0, 1].  ``config`` defaults to ViT-L/14 (the
    tower FrozenCLIPImageEmbedder loads); tests pass a tiny CLIPVisionConfig
    — the converter and forward are dimension-agnostic."""

    def __init__(self, dtype=jnp.float32, config=None, proj_dim: int = 768):
        from transformers import FlaxCLIPVisionModel

        self.config = config if config is not None else clip_vit_l14_config()
        self.model = FlaxCLIPVisionModel(self.config, _do_init=False, dtype=dtype)
        self.dtype = dtype
        self.proj_dim = proj_dim

    def init(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        s = self.config.image_size
        vision = self.model.init_weights(k1, (1, s, s, 3))
        proj = jax.random.normal(
            k2, (self.config.hidden_size, self.proj_dim), jnp.float32) * 0.02
        return {"vision": vision, "projection": proj}

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """[0,1] NHWC -> CLIP-normalized NCHW at the tower's input size."""
        B = images.shape[0]
        s = self.config.image_size
        # reference preprocess resizes bicubic (FrozenCLIPImageEmbedder,
        # extern/ldm_zero123/modules/encoders/modules.py:457-464; kornia
        # align_corners=True vs jax's half-pixel convention — sub-pixel only)
        img = jax.image.resize(images, (B, s, s, 3), "bicubic")
        img = (img - CLIP_MEAN[None, None, None]) / CLIP_STD[None, None, None]
        return img.transpose(0, 3, 1, 2)

    def embed_pixel_values(self, params: dict, pixel: jnp.ndarray) -> jnp.ndarray:
        """CLIP-normalized NCHW (the torch/open-CLIP convention) -> projected
        pooled embedding (B, proj_dim) (= OpenAI CLIP ``encode_image``:
        ln_post(x[:, 0]) @ proj).  FlaxCLIPVisionModel convolves channels-last,
        so transpose here."""
        out = self.model.module.apply({"params": params["vision"]["params"]
                                       if "params" in params["vision"] else params["vision"]},
                                      pixel.transpose(0, 2, 3, 1))
        pooled = out.pooler_output  # (B, width)
        return pooled @ params["projection"]  # (B, proj_dim)

    def embed(self, params: dict, images: jnp.ndarray) -> jnp.ndarray:
        return self.embed_pixel_values(params, self.preprocess(images))
