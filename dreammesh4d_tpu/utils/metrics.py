"""Evaluation metrics: PSNR + SSIM + LPIPS + CLIP similarity.

Parity with the reference evaluator stack
(extern/ldm_zero123/modules/evaluate + torchmetrics use in threestudio
validation) and the paper protocol (arXiv 2410.06756 reports LPIPS and CLIP
similarity — the BASELINE.json north-star currency): plain-jnp
implementations, jit/vmap-friendly, NHWC in [0, 1].

LPIPS rides utils/perceptual (converted torchvision VGG16 + LPIPS lins via
scripts/convert_perceptual_ckpt.py; deterministic random features as the
zero-egress fallback — valid for RELATIVE comparisons only).  CLIP
similarity rides the proven CLIP vision tower conversion
(models/guidance/zero123/convert.convert_clip_vision)."""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """(..., H, W, C) -> scalar (or batched over leading dims via mean on
    the image axes)."""
    mse = ((pred - target) ** 2).mean((-3, -2, -1))
    return 10.0 * jnp.log10(max_val * max_val / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x * x) / (2 * sigma * sigma))
    return g / g.sum()


def _blur(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian blur, NHWC, VALID padding."""
    C = x.shape[-1]
    kh = jnp.tile(k[:, None, None, None], (1, 1, 1, C))  # (K,1,1,C) depthwise
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn, feature_group_count=C)
    kw = jnp.tile(k[None, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                        dimension_numbers=dn, feature_group_count=C)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Standard single-scale SSIM with an 11x1.5 gaussian window
    (torchmetrics StructuralSimilarityIndexMeasure defaults). (B,H,W,C)
    -> (B,)."""
    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    k = _gaussian_kernel(kernel_size, sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_x = _blur(pred, k)
    mu_y = _blur(target, k)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = _blur(pred * pred, k) - mu_x2
    sig_y = _blur(target * target, k) - mu_y2
    sig_xy = _blur(pred * target, k) - mu_xy
    num = (2 * mu_xy + c1) * (2 * sig_xy + c2)
    den = (mu_x2 + mu_y2 + c1) * (sig_x + sig_y + c2)
    return (num / den).mean((1, 2, 3))


class LPIPSMetric:
    """LPIPS distance with explicit weight provenance.

    ``weights_path``: an orbax cache written by
    scripts/convert_perceptual_ckpt.py (real torchvision VGG16 + LPIPS lin
    heads).  Without one, deterministic random VGG features are used and
    ``self.converted`` is False — callers should label such numbers
    "relative" (they rank renders consistently but are not comparable to
    published LPIPS)."""

    def __init__(self, weights_path: str | None = None, seed: int = 0):
        from .perceptual import init_perceptual, load_perceptual, perceptual_loss

        if weights_path:
            self.params = load_perceptual(weights_path)
            self.converted = True
        else:
            self.params = init_perceptual(jax.random.PRNGKey(seed))
            self.converted = False
        self._fn = jax.jit(perceptual_loss)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,3) or (H,W,3) in [0,1] -> (B,) LPIPS distances."""
        if pred.ndim == 3:
            pred, target = pred[None], target[None]
        return self._fn(self.params, pred, target)


class CLIPSimilarityMetric:
    """Cosine similarity of CLIP image embeddings (the paper's CLIP metric).

    ``params``: {"vision": ..., "projection": ...} — the ``clip`` subtree of
    a converted Zero123 cache (scripts/convert_zero123_ckpt.py; conversion
    proven by tests/test_clip_parity.py) or any convert_clip_vision output.
    ``zero123_cache_path`` restores that subtree directly.  Without either,
    random ViT weights are used (``self.converted`` False — relative only)."""

    def __init__(self, params: Dict[str, Any] | None = None,
                 zero123_cache_path: str | None = None,
                 config=None, seed: int = 0):
        from ..models.guidance.zero123.clip import CLIPImageEncoder

        self.encoder = CLIPImageEncoder(config=config)
        self.converted = params is not None or zero123_cache_path is not None
        if params is None and zero123_cache_path is not None:
            import os

            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            restored = ckptr.restore(os.path.abspath(
                os.path.join(zero123_cache_path, "params")))
            if "clip" not in restored:
                raise KeyError(
                    f"{zero123_cache_path!r} carries no converted CLIP tower "
                    "(cache written with use_clip=false?)")
            params = restored["clip"]
        self.params = params if params is not None else self.encoder.init(
            jax.random.PRNGKey(seed))
        self._embed = jax.jit(self.encoder.embed)

    def __call__(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """(B,H,W,3) or (H,W,3) in [0,1] -> (B,) cosine similarities."""
        if pred.ndim == 3:
            pred, target = pred[None], target[None]
        a = self._embed(self.params, pred)
        b = self._embed(self.params, target)
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        return (a * b).sum(-1)
