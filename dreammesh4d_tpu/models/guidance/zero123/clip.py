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

    return CLIPVisionConfig(
        hidden_size=1024, intermediate_size=4096, num_hidden_layers=24,
        num_attention_heads=16, image_size=224, patch_size=14, projection_dim=768,
    )


class CLIPImageEncoder:
    """Stateless wrapper: init() -> params; embed(params, images) -> (B, 768).

    images: (B, H, W, 3) in [0, 1]."""

    def __init__(self, dtype=jnp.float32):
        from transformers import FlaxCLIPVisionModel

        self.config = clip_vit_l14_config()
        self.model = FlaxCLIPVisionModel(self.config, _do_init=False, dtype=dtype)
        self.dtype = dtype

    def init(self, rng) -> dict:
        k1, k2 = jax.random.split(rng)
        vision = self.model.init_weights(k1, (1, 224, 224, 3))
        proj = jax.random.normal(k2, (1024, 768), jnp.float32) * 0.02
        return {"vision": vision, "projection": proj}

    def preprocess(self, images: jnp.ndarray) -> jnp.ndarray:
        """[0,1] NHWC -> CLIP-normalized NCHW 224²."""
        B = images.shape[0]
        img = jax.image.resize(images, (B, 224, 224, 3), "bilinear")
        img = (img - CLIP_MEAN[None, None, None]) / CLIP_STD[None, None, None]
        return img.transpose(0, 3, 1, 2)

    def embed(self, params: dict, images: jnp.ndarray) -> jnp.ndarray:
        pixel = self.preprocess(images)
        out = self.model.module.apply({"params": params["vision"]["params"]
                                       if "params" in params["vision"] else params["vision"]},
                                      pixel)
        pooled = out.pooler_output  # (B, 1024)
        return pooled @ params["projection"]  # (B, 768)
