"""Tile binning for the Gaussian rasterizer, pure XLA with static shapes.

Replaces the dynamic duplicate-keys + radix-sort stage of the CUDA rasterizer
with a TPU-friendly fixed-capacity formulation:

- every Gaussian emits up to ``max_tiles_per_gaussian`` (tile, depth, id)
  tuples (its tile-AABB enumerated row-major; overflowing tiles of enormous
  Gaussians are truncated),
- one lexicographic ``jax.lax.sort`` over (tile_id, depth) orders all tuples
  by tile then front-to-back depth,
- per-tile segments are located with ``searchsorted`` and gathered into a
  dense (num_tiles, capacity) index table with a validity mask.

All shapes are static; overflow beyond ``tile_capacity`` is dropped (the
returned ``tile_counts`` lets callers detect saturation).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

TILE = 16  # pixels per tile side (matches the CUDA rasterizer's BLOCK_X/Y)


class TileAssignment(NamedTuple):
    tile_gauss: jnp.ndarray  # (T, K) int32 gaussian indices, front-to-back
    tile_valid: jnp.ndarray  # (T, K) bool
    tile_counts: jnp.ndarray  # (T,) int32 true per-tile counts (pre-truncation)


class PairAssignment(NamedTuple):
    """Segment layout without the (T, K) table: the sorted pair array itself.
    Produced by :func:`bin_gaussians_pairs` for the VMEM-resident kernel —
    avoids the scalar int32 gathers that dominate the XLA binning profile.

    ``sorted_tile``/``sorted_origpos`` feed the backward's scatter-free
    gradient reduction (TPU scatter-adds measured 67 ms here vs ~8 ms for the
    sort+row-gather formulation): original flat pair ids ride the sort so the
    inverse permutation is recovered with another payload sort instead of a
    scatter."""

    sorted_gauss: jnp.ndarray  # (N*M,) int32, grouped by tile, front-to-back
    starts: jnp.ndarray  # (T,) int32 segment starts
    counts: jnp.ndarray  # (T,) int32 segment lengths
    sorted_tile: jnp.ndarray  # (N*M,) int32 tile id per sorted pair (T = invalid)
    sorted_origpos: jnp.ndarray  # (N*M,) int32 original flat pair id (n*M+m)
    # rank mode (bin_gaussians_ranks): sorted_gauss holds DEPTH RANKS into a
    # depth-ordered row table; these map rank-space rows back to gaussians
    depth_order: jnp.ndarray = None  # (N,) int32 gaussian id at each rank
    inv_rank: jnp.ndarray = None  # (N,) int32 rank of each gaussian


def num_tiles(W: int, H: int, tile: int = TILE) -> tuple[int, int]:
    return (W + tile - 1) // tile, (H + tile - 1) // tile


def _tile_cull(tile_x, tile_y, mx, my, conics, opacities, tile=TILE):
    """EXACT per-pair tile culling: True where the pair provably contributes
    alpha < 1/255 on EVERY pixel of the tile (so the blend kernel's live
    mask would zero it anyway — pruning cannot change the rendered output).

    tile_x/tile_y: integer tile coords, any broadcastable shape with mx/my
    (means per pair).  The max of alpha over the tile rect is
    op·exp(-0.5·minQ) with minQ the min of the conic quadratic over the
    rect: 0 if the mean lies inside, else the min over the four edges (each
    a 1-D quadratic with closed-form clamped argmin).  Prune iff
    minQ > 2·ln(255·op)."""
    ca = conics[:, 0][None, :]
    cb = conics[:, 1][None, :]
    cc = conics[:, 2][None, :]
    op = opacities[None, :]
    X0 = (tile_x * tile).astype(jnp.float32)
    Y0 = (tile_y * tile).astype(jnp.float32)
    dx0 = X0 - mx
    dx1 = X0 + (tile - 1) - mx
    dy0 = Y0 - my
    dy1 = Y0 + (tile - 1) - my
    inside = (dx0 <= 0) & (dx1 >= 0) & (dy0 <= 0) & (dy1 >= 0)

    sa = jnp.maximum(ca, 1e-12)
    sc = jnp.maximum(cc, 1e-12)

    def q_edge_x(d):  # fixed dx = d, dy free in [dy0, dy1]
        t = jnp.clip(-cb * d / sc, dy0, dy1)
        return ca * d * d + 2.0 * cb * d * t + cc * t * t

    def q_edge_y(e):  # fixed dy = e, dx free in [dx0, dx1]
        t = jnp.clip(-cb * e / sa, dx0, dx1)
        return ca * t * t + 2.0 * cb * t * e + cc * e * e

    min_q = jnp.minimum(
        jnp.minimum(q_edge_x(dx0), q_edge_x(dx1)),
        jnp.minimum(q_edge_y(dy0), q_edge_y(dy1)),
    )
    min_q = jnp.where(inside, 0.0, min_q)
    # alpha_max = op·exp(-minQ/2) < 1/255  ⟺  minQ > 2·ln(255·op); the blend
    # live mask ALSO zeroes power < -4.5 (the 3σ cutoff, pallas_blend.py
    # _group_geometry), so minQ > 9 is equally provably-invisible — the min
    # of the two bounds is the tighter exact cull (bites when op > e^4.5/255
    # ≈ 0.353, e.g. the dense-scene regime)
    return min_q > jnp.minimum(
        2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0), 9.0)



def _expand_pairs_mn(means2d, radii, mask, tiles_x, tiles_y, M,
                     conics=None, opacities=None, tile=TILE):
    """Shared (M, N)-layout pair expansion for the pair/rank binning paths:
    AABB tile clip, span/validity, exact per-tile culling, sentinel tile T.
    The (M, N) layout keeps N on the TPU lane axis (full vector width).
    Returns (tile_ids (M,N) int32 with T for invalid, pair_valid (M,N))."""
    T = tiles_x * tiles_y
    r = radii.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / tile), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / tile), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r) / tile) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r) / tile) + 1, 0, tiles_y).astype(jnp.int32)
    span_w = jnp.maximum(x1 - x0, 0)
    span_h = jnp.maximum(y1 - y0, 0)
    n_span = span_w * span_h
    alive = mask & (radii > 0) & (n_span > 0)

    m = jnp.arange(M, dtype=jnp.int32)[:, None]  # (M, 1)
    sw = jnp.maximum(span_w, 1)[None, :]  # (1, N)
    dx = m % sw
    dy = m // sw
    pair_valid = alive[None, :] & (m < n_span[None, :])
    if conics is not None and opacities is not None:
        culled = _tile_cull(x0[None, :] + dx, y0[None, :] + dy,
                            means2d[:, 0][None, :], means2d[:, 1][None, :],
                            conics, opacities, tile=tile)
        pair_valid = pair_valid & ~culled
    tile_ids = jnp.where(pair_valid, (y0[None, :] + dy) * tiles_x + (x0[None, :] + dx), T)
    return tile_ids, pair_valid


def bin_gaussians(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    mask: jnp.ndarray,
    W: int,
    H: int,
    tile_capacity: int = 512,
    max_tiles_per_gaussian: int = 16,
    conics=None,
    opacities=None,
) -> TileAssignment:
    N = means2d.shape[0]
    tiles_x, tiles_y = num_tiles(W, H)
    T = tiles_x * tiles_y
    M = max_tiles_per_gaussian

    r = radii.astype(jnp.float32)
    # getRect semantics: min inclusive, max exclusive, clamped to the grid
    x0 = jnp.clip(jnp.floor((means2d[:, 0] - r) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((means2d[:, 1] - r) / TILE), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((means2d[:, 0] + r) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((means2d[:, 1] + r) / TILE) + 1, 0, tiles_y).astype(jnp.int32)

    span_w = jnp.maximum(x1 - x0, 0)
    span_h = jnp.maximum(y1 - y0, 0)
    n_span = span_w * span_h
    alive = mask & (radii > 0) & (n_span > 0)

    m = jnp.arange(M, dtype=jnp.int32)[None, :]  # (1, M)
    sw = jnp.maximum(span_w, 1)[:, None]
    dx = m % sw
    dy = m // sw
    pair_valid = alive[:, None] & (m < n_span[:, None])
    if conics is not None and opacities is not None:
        # (N, M) layout: transpose the cull's (pair, gaussian) axes
        culled = _tile_cull((x0[:, None] + dx).T, (y0[:, None] + dy).T,
                            means2d[:, 0][None, :], means2d[:, 1][None, :],
                            conics, opacities).T
        pair_valid = pair_valid & ~culled
    tile_ids = jnp.where(pair_valid, (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx), T)

    # Single-operand packed sort: gaussians are pre-ordered by depth once
    # (N-element argsort), so the depth RANK doubles as the within-tile
    # ordering key.  Pack key = tile_id << rank_bits | rank into ONE int32 and
    # sort a single array — much cheaper on TPU than multi-operand
    # lexicographic sorts; unpacking recovers both grouping and front-to-back
    # order.
    rank_bits = N.bit_length()  # rank < N
    tile_bits = (T + 1).bit_length()
    if rank_bits + tile_bits > 31:
        raise ValueError(
            f"Packed binning key overflow: {N} gaussians x {T} tiles needs "
            f"{rank_bits}+{tile_bits} bits; reduce image size or gaussian count"
        )
    depth_order = jnp.argsort(depths).astype(jnp.int32)  # (N,) front-to-back
    tile_ids_sorted = tile_ids[depth_order]  # (N, M) rows in depth order
    rank = jax.lax.broadcasted_iota(jnp.int32, (N, M), 0)
    keys = ((tile_ids_sorted << rank_bits) | rank).reshape(-1)

    sorted_keys = jax.lax.sort(keys)
    sorted_gauss = depth_order[sorted_keys & ((1 << rank_bits) - 1)]

    # per-tile segment bounds via binary search on the PACKED keys directly
    # (tile boundaries are the keys (t << rank_bits)); a histogram
    # scatter-add is slower here — 900 average collisions per bin.
    tile_bounds = (jnp.arange(T + 1, dtype=jnp.int32) << rank_bits)
    bounds = jnp.searchsorted(sorted_keys, tile_bounds, side="left")
    starts = bounds[:T]
    counts = (bounds[1:] - bounds[:-1]).astype(jnp.int32)

    k = jnp.arange(tile_capacity, dtype=jnp.int32)[None, :]  # (1, K)
    idx = starts[:, None] + k  # (T, K)
    valid = k < counts[:, None]
    idx = jnp.clip(idx, 0, N * M - 1)
    tile_gauss = jnp.where(valid, sorted_gauss[idx], N)

    return TileAssignment(tile_gauss, valid, counts)


def bin_gaussians_pairs(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    mask: jnp.ndarray,
    W: int,
    H: int,
    max_tiles_per_gaussian: int = 16,
    depth_bits: int = 20,
    need_origpos: bool = True,
    conics=None,
    opacities=None,
    tile: int = TILE,
) -> PairAssignment:
    """Pair-array binning with QUANTIZED-depth packed keys.

    The rank-based path needs a depth argsort plus three scalar-int32 gathers
    (reordering tile ids, looking up (T,K) slots) that dominate the profile on
    TPU.  Here the key is ``tile_id << depth_bits | quantize(depth)`` and the
    gaussian id rides as a second sort operand — no argsort, no reorders, no
    (T,K) table.  Depth quantization to ``depth_bits`` (default 2^20 levels
    over the visible range) only affects the within-tile ORDER; ties are
    resolved arbitrarily, indistinguishable at float precision."""
    N = means2d.shape[0]
    tiles_x, tiles_y = num_tiles(W, H, tile)
    T = tiles_x * tiles_y
    M = max_tiles_per_gaussian
    tile_bits = (T + 1).bit_length()
    if tile_bits + depth_bits > 31:
        raise ValueError(f"{T} tiles x {depth_bits} depth bits overflow int32")

    alive = mask & (radii > 0)
    d_lo = jnp.min(jnp.where(alive, depths, jnp.inf))
    d_hi = jnp.max(jnp.where(alive, depths, -jnp.inf))
    scale = ((1 << depth_bits) - 1) / jnp.maximum(d_hi - d_lo, 1e-6)
    qdepth = jnp.clip(((depths - d_lo) * scale), 0, (1 << depth_bits) - 1).astype(jnp.int32)

    tile_ids, pair_valid = _expand_pairs_mn(
        means2d, radii, mask, tiles_x, tiles_y, M, conics, opacities, tile=tile
    )
    keys = ((tile_ids << depth_bits) | qdepth[None, :]).reshape(-1)
    gauss = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None, :], (M, N)).reshape(-1)
    if need_origpos:
        # third operand rides the sort so the backward's sort+gather
        # reduction can invert the binning permutation; origpos must be the
        # ORIGINAL flat pair id n*M + m (the reduction reshapes to (N, M))
        origpos = (
            jax.lax.broadcasted_iota(jnp.int32, (M, N), 1) * M
            + jax.lax.broadcasted_iota(jnp.int32, (M, N), 0)
        ).reshape(-1)
        sorted_keys, sorted_gauss, sorted_origpos = jax.lax.sort(
            (keys, gauss, origpos), num_keys=1, is_stable=False
        )
        sorted_tile = sorted_keys >> depth_bits
    else:
        # in-kernel-accumulator backward: permutation inverse never needed
        # unstable: ties (same tile + quantized depth) already resolve
        # arbitrarily by contract; stability costs sort passes
        sorted_keys, sorted_gauss = jax.lax.sort((keys, gauss), num_keys=1,
                                                 is_stable=False)
        sorted_origpos = sorted_tile = None
    # sentinel pairs (tile T) carry gauss id N for padded reads
    sorted_gauss = jnp.where(sorted_keys >= (T << depth_bits), N, sorted_gauss)

    bounds = jnp.searchsorted(
        sorted_keys, (jnp.arange(T + 1, dtype=jnp.int32) << depth_bits), side="left"
    )
    return PairAssignment(
        sorted_gauss, bounds[:T], (bounds[1:] - bounds[:-1]).astype(jnp.int32),
        sorted_tile, sorted_origpos,
    )


def bin_gaussians_ranks(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    mask: jnp.ndarray,
    W: int,
    H: int,
    max_tiles_per_gaussian: int = 16,
    conics=None,
    opacities=None,
    tile: int = TILE,
) -> PairAssignment:
    """SINGLE-operand pair sort: the within-tile ordering key is the
    gaussian's DEPTH RANK, which doubles as its row index in a depth-ordered
    parameter table — so the rank needs no second sort operand and no
    unpacking gather.  Costs one N-argsort + one N-sort (inverse permutation)
    + two (N, c) row gathers outside the big sort; the N·M sort itself moves
    half the payload of the 2-operand quantized-depth variant.

    Returns ranks in ``sorted_gauss``; callers MUST gather their row tables
    by ``depth_order`` and un-permute per-gaussian outputs by ``inv_rank``
    (pallas_resident handles both when cfg.binning == "rank")."""
    N = means2d.shape[0]
    tiles_x, tiles_y = num_tiles(W, H, tile)
    T = tiles_x * tiles_y
    M = max_tiles_per_gaussian
    rank_bits = N.bit_length()
    tile_bits = (T + 1).bit_length()
    if tile_bits + rank_bits > 31:
        raise ValueError(f"{T} tiles x {N} gaussians overflow the int32 key")

    iota_n = jnp.arange(N, dtype=jnp.int32)
    depth_order = jnp.argsort(depths).astype(jnp.int32)  # (N,) front-to-back
    # inverse permutation WITHOUT a scatter: sort (depth_order, iota)
    _, inv_rank = jax.lax.sort((depth_order, iota_n), num_keys=1)

    # per-pair tiles computed in RANK space: permute the projection outputs
    # once ((N, c) row gathers, the fast class)
    tile_ids, pair_valid = _expand_pairs_mn(
        means2d[depth_order], radii[depth_order], mask[depth_order],
        tiles_x, tiles_y, M,
        None if conics is None else conics[depth_order],
        None if opacities is None else opacities[depth_order],
        tile=tile,
    )
    rank = jnp.broadcast_to(iota_n[None, :], (M, N))
    # sentinel pairs carry rank N -> the zero row of the padded table
    rank = jnp.where(pair_valid, rank, N)
    keys = ((tile_ids << rank_bits) | rank).reshape(-1)

    sorted_keys = jax.lax.sort(keys)
    sorted_rank = sorted_keys & ((1 << rank_bits) - 1)

    bounds = jnp.searchsorted(
        sorted_keys, (jnp.arange(T + 1, dtype=jnp.int32) << rank_bits), side="left"
    )
    return PairAssignment(
        sorted_rank, bounds[:T], (bounds[1:] - bounds[:-1]).astype(jnp.int32),
        None, None, depth_order=depth_order, inv_rank=inv_rank,
    )
