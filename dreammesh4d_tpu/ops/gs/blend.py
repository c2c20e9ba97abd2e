"""Per-tile front-to-back alpha compositing, pure XLA (differentiable).

The compositing half of the Gaussian rasterizer: given the per-tile
depth-ordered index table from :mod:`binning`, evaluates every Gaussian at
each pixel of its tile and alpha-blends front-to-back:

    C(p) = Σ_i c_i α_i(p) Π_{j<i} (1 - α_j(p)),
    α_i(p) = min(0.99, o_i · exp(-½ dᵀ Σ⁻¹ d)),  d = μ_i - p

matching the CUDA forward (contributions with α < 1/255 are skipped; the
background is composited with the final transmittance).  Depth is blended the
same way (ashawkey-fork convention: accumulated expected depth).

The K (capacity) axis is processed in chunks via ``lax.scan``: within a chunk
compositing is a vectorized exclusive cumprod, across chunks the running
transmittance is the scan carry.  Each chunk is wrapped in ``jax.checkpoint``
so the backward pass recomputes chunk activations instead of storing the
(T, chunk, pixels) alpha tensor for the whole capacity — the standard
FLOPs-for-HBM trade on TPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TILE, num_tiles


class BlendOutput(NamedTuple):
    rgb: jnp.ndarray  # (H, W, C)
    alpha: jnp.ndarray  # (H, W, 1)
    depth: jnp.ndarray  # (H, W, 1)


def blend_tiles(
    tile_gauss: jnp.ndarray,
    tile_valid: jnp.ndarray,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    W: int,
    H: int,
    background: jnp.ndarray,
    chunk: int = 32,
) -> BlendOutput:
    T, K = tile_gauss.shape
    tiles_x, tiles_y = num_tiles(W, H)
    C = colors.shape[-1]
    P = TILE * TILE

    # pad a zero sentinel row at index N so masked gathers are cheap
    z = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:], a.dtype)], 0)
    means2d_p, conics_p, colors_p = z(means2d), z(conics), z(colors)
    opac_p, depth_p = z(opacities[:, None])[:, 0], z(depths[:, None])[:, 0]

    # per-tile pixel centers (CUDA convention: integer pixel coords)
    t_idx = jnp.arange(T, dtype=jnp.int32)
    tx, ty = t_idx % tiles_x, t_idx // tiles_x
    px = tx[:, None] * TILE + jnp.arange(TILE, dtype=jnp.int32)[None, :]  # (T,16)
    py = ty[:, None] * TILE + jnp.arange(TILE, dtype=jnp.int32)[None, :]
    pix_x = jnp.broadcast_to(px[:, None, :], (T, TILE, TILE)).reshape(T, P).astype(jnp.float32)
    pix_y = jnp.broadcast_to(py[:, :, None], (T, TILE, TILE)).reshape(T, P).astype(jnp.float32)

    n_chunks = K // chunk
    assert n_chunks * chunk == K, "tile_capacity must be divisible by chunk"
    gauss_c = tile_gauss.reshape(T, n_chunks, chunk).transpose(1, 0, 2)  # (nc,T,ch)
    valid_c = tile_valid.reshape(T, n_chunks, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def chunk_step(carry, inp):
        trans, rgb_acc, dep_acc = carry  # (T,P), (T,P,C), (T,P)
        g_idx, g_val = inp  # (T,ch)
        mu = means2d_p[g_idx]  # (T,ch,2)
        con = conics_p[g_idx]  # (T,ch,3)
        col = colors_p[g_idx]  # (T,ch,C)
        op = opac_p[g_idx]  # (T,ch)
        dep = depth_p[g_idx]  # (T,ch)

        dx = mu[:, :, 0:1] - pix_x[:, None, :]  # (T,ch,P)
        dy = mu[:, :, 1:2] - pix_y[:, None, :]
        power = (
            -0.5 * (con[:, :, 0:1] * dx * dx + con[:, :, 2:3] * dy * dy)
            - con[:, :, 1:2] * dx * dy
        )
        alpha = jnp.minimum(0.99, op[:, :, None] * jnp.exp(power))
        # power >= -4.5 = the 3σ Mahalanobis cutoff that defines the binning
        # radius (projection.py:116).  Applying it per-pixel makes the render
        # independent of tile granularity: any pixel outside a gaussian's
        # tile AABB is beyond 3σ (|d| > r >= 3√λ1 ⇒ dᵀΣ⁻¹d > 9), so pairs
        # the binning missed would have been masked here anyway.
        alpha = jnp.where(
            g_val[:, :, None] & (power <= 0.0) & (power >= -4.5)
            & (alpha >= 1.0 / 255.0), alpha, 0.0
        )

        one_minus = 1.0 - alpha
        # exclusive cumprod along the chunk axis
        incl = jnp.cumprod(one_minus, axis=1)
        excl = jnp.concatenate([jnp.ones_like(incl[:, :1]), incl[:, :-1]], axis=1)
        w = alpha * excl * trans[:, None, :]  # (T,ch,P)

        rgb_acc = rgb_acc + jnp.einsum("tcp,tck->tpk", w, col)
        dep_acc = dep_acc + (w * dep[:, :, None]).sum(1)
        trans = trans * incl[:, -1, :]
        return (trans, rgb_acc, dep_acc), None

    trans0 = jnp.ones((T, P), jnp.float32)
    rgb0 = jnp.zeros((T, P, C), jnp.float32)
    dep0 = jnp.zeros((T, P), jnp.float32)
    (trans, rgb, dep), _ = jax.lax.scan(chunk_step, (trans0, rgb0, dep0), (gauss_c, valid_c))

    rgb = rgb + trans[:, :, None] * background[None, None, :]
    alpha = 1.0 - trans

    def untile(img_flat, ch):
        img = img_flat.reshape(tiles_y, tiles_x, TILE, TILE, ch)
        img = img.transpose(0, 2, 1, 3, 4).reshape(tiles_y * TILE, tiles_x * TILE, ch)
        return img[:H, :W]

    return BlendOutput(untile(rgb, C), untile(alpha[..., None], 1), untile(dep[..., None], 1))
