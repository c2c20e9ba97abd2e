"""LPIPS-style perceptual loss (VGG16 feature pyramid), functional JAX.

Parity with threestudio/utils/perceptual/perceptual.py:16-170 (the stripped
richzhang PerceptualSimilarity metric used by Control4D and the evaluators):
input scaling layer (the LPIPS shift/scale constants), VGG16 conv features at
[relu1_2, relu2_2, relu3_3, relu4_3, relu5_3] with channel widths
[64, 128, 256, 512, 512], unit-normalized per-channel features, learned 1x1
linear heads, spatial mean, summed over levels.

Weights: the reference downloads ``vgg_lpips`` + torchvision VGG16; this
image has zero egress, so ``init_perceptual`` uses a deterministic random
init by default (random VGG features are a serviceable perceptual distance
for RELATIVE comparisons) and ``load_torch_weights`` converts a
user-provided torchvision/LPIPS checkpoint when available.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# (out_channels, n_convs) per VGG16 stage; features tapped after each stage
_VGG_STAGES: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_perceptual(rng: jax.Array) -> Dict[str, Any]:
    params: Dict[str, Any] = {"stages": [], "lins": []}
    c_in = 3
    k = rng
    for c_out, n_convs in _VGG_STAGES:
        convs = []
        for _ in range(n_convs):
            k, k1 = jax.random.split(k)
            lim = float(np.sqrt(2.0 / (9 * c_in)))
            convs.append({
                "w": jax.random.normal(k1, (3, 3, c_in, c_out)) * lim,
                "b": jnp.zeros((c_out,)),
            })
            c_in = c_out
        params["stages"].append(convs)
        k, k1 = jax.random.split(k)
        # LPIPS lin heads are nonnegative 1x1 convs; uniform init
        params["lins"].append(jnp.abs(jax.random.normal(k1, (c_out,))) / c_out)
    return params


def _vgg_features(params, x: jnp.ndarray) -> List[jnp.ndarray]:
    """x: (B, H, W, 3) in [-1, 1] (after scaling layer). Returns 5 maps."""
    feats = []
    h = x
    for si, convs in enumerate(params["stages"]):
        for conv in convs:
            h = jax.lax.conv_general_dilated(
                h, conv["w"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + conv["b"]
            h = jax.nn.relu(h)
        feats.append(h)
        if si < len(params["stages"]) - 1:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
    return feats


def _unit_normalize(f: jnp.ndarray) -> jnp.ndarray:
    return f * jax.lax.rsqrt((f * f).sum(-1, keepdims=True) + 1e-10)


def perceptual_loss(params, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """x, y: (B, H, W, 3) in [0, 1]. Returns (B,) LPIPS distances."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    xs = ((x * 2 - 1) - shift) / scale
    ys = ((y * 2 - 1) - shift) / scale
    fx = _vgg_features(params, xs)
    fy = _vgg_features(params, ys)
    total = 0.0
    for lin, a, b in zip(params["lins"], fx, fy):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        total = total + (d * jax.nn.relu(lin)).sum(-1).mean((1, 2))
    return total


def load_torch_weights(vgg_state: Dict[str, Any], lpips_state: Dict[str, Any] | None = None) -> Dict[str, Any]:
    """Convert torchvision ``vgg16().features.state_dict()`` (+ optional
    LPIPS ``lin{k}.model.1.weight``) into the param pytree above.

    Accepts either bare feature-layer keys (``0.weight``) or the full-model
    prefix (``features.0.weight`` — what ``vgg16().state_dict()`` carries)."""
    if any(k.startswith("features.") for k in vgg_state):
        vgg_state = {k[len("features."):]: v for k, v in vgg_state.items()
                     if k.startswith("features.")}
    params: Dict[str, Any] = {"stages": [], "lins": []}
    # torchvision features indices of convs per stage
    conv_ids = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]
    for si, ids in enumerate(conv_ids):
        convs = []
        for i in ids:
            w = np.asarray(vgg_state[f"{i}.weight"])  # (out, in, 3, 3)
            b = np.asarray(vgg_state[f"{i}.bias"])
            convs.append({"w": jnp.asarray(w.transpose(2, 3, 1, 0)), "b": jnp.asarray(b)})
        params["stages"].append(convs)
        c_out = convs[-1]["b"].shape[0]
        if lpips_state is not None and f"lin{si}.model.1.weight" in lpips_state:
            lw = np.asarray(lpips_state[f"lin{si}.model.1.weight"]).reshape(-1)
        else:
            lw = np.full((c_out,), 1.0 / c_out, np.float32)
        params["lins"].append(jnp.asarray(lw))
    return params


def save_perceptual(path: str, params: Dict[str, Any]) -> None:
    """Persist converted LPIPS params as an orbax cache directory
    (scripts/convert_perceptual_ckpt.py writes these; ``load_perceptual``
    restores them with zero torch imports)."""
    import os

    import orbax.checkpoint as ocp

    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(os.path.join(path, "params")), params, force=True)
    ckptr.wait_until_finished()


def load_perceptual(path: str) -> Dict[str, Any]:
    """Restore a converted LPIPS cache directory (torch-free)."""
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(os.path.join(path, "params")))
