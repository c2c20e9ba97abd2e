"""Evaluation metrics: PSNR + SSIM (+ LPIPS via utils/perceptual).

Parity with the reference evaluator stack
(extern/ldm_zero123/modules/evaluate + torchmetrics use in threestudio
validation): plain-jnp implementations, jit/vmap-friendly, NHWC in [0, 1]."""

from __future__ import annotations

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
