"""Pallas TPU kernel for per-tile Gaussian alpha compositing (fwd + bwd).

The hot loop of the rasterizer (replacing the CUDA forward/backward of
diff-gaussian-rasterization).  Compared to the pure-XLA ``blend.py``:

- the per-tile loop is bounded by the REAL per-tile count (scalar-prefetched)
  instead of the padded capacity, and terminates early once the tile's max
  transmittance drops below 1e-4 — on typical scenes that removes the large
  majority of the padded work;
- gaussians are processed in groups of 8: alpha for (8, 256) gaussian×pixel
  pairs is evaluated vectorized on the VPU; the only sequential piece is the
  8-step exclusive-transmittance product; per-group color accumulation is an
  (C,8)x(8,256) matmul;
- the backward pass is a single front-to-back REPLAY using the forward's
  per-pixel totals (suffix trick): for gaussian i,
      dL/dα_i = T_i·(g·c_i) − (g·S_{>i})/(1−α_i) − g_T·T_N/(1−α_i),
  with S_{>i} = C_total − C_{≤i} — no per-gaussian state is stored: the same
  memory-free structure as the CUDA backward but without a second
  back-to-front walk.

Layouts (VMEM-friendly): per-tile gaussian data is pre-gathered by XLA into
``(T, K, 16)`` float32 rows [mx, my, ca, cb, cc, c_0..c_{C-1}, ..., opac, 0];
per-tile outputs/cotangents are ``(T, C+1, 256)`` channel-major so the pixel
axis fills two 128-lane registers.  Per-tile gaussian gradients come back as
``(T, K, 16)`` and are scatter-added into per-gaussian buffers by XLA
(segment-sum instead of CUDA atomics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE

GROUP = 32  # default group size; kernels take `group` explicitly
ROW = 16  # packed row width (params + colors), padded for alignment
OP_COL = 14  # opacity column in the packed row
P = TILE * TILE  # 256 pixels per tile
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
T_EPS = 1e-4


def _pixel_grid(tiles_x_ref, tile: int = TILE):
    """(1, tile²) pixel x / y coordinates for the current tile."""
    t = pl.program_id(0)
    tiles_x = tiles_x_ref[0]
    tx = (t % tiles_x).astype(jnp.float32)
    ty = (t // tiles_x).astype(jnp.float32)
    # Build (1, P) directly: Mosaic's iota is integer-only and (16,16)->(1,256)
    # shape casts don't lower, so derive x/y from a flat pixel index.
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, tile * tile), 1)
    xs = (idx % tile).astype(jnp.float32)
    ys = (idx // tile).astype(jnp.float32)
    px = tx * tile + xs
    py = ty * tile + ys
    return px, py


def _grad_sums(d_power, dx, dy, rows):
    """Shared-product geometry + opacity gradient sums.

    The six backward reductions are pixel sums of ``d_power`` times degree-≤2
    polynomials in (dx, dy) with per-gaussian coefficients.  Sharing the
    products t1 = d_power·dx, t2 = d_power·dy and factoring the per-gaussian
    scalars OUT of the positional sums

        d_mx = −Σ d_power·(ca·dx + cb·dy) = −(ca·Σt1 + cb·Σt2)

    cuts the VPU work to 5 (G,P) multiplies + 6 reductions (from ~10
    multiplies + 5 reductions + an exp(power) recompute — the opacity grad is
    Σd_power/op since d_power = d_raw·op·exp(power) wherever nonzero).  (A
    (G,P)x(P,6) moment-matmul formulation was measured SLOWER in f32: the f32
    MXU pass with 6→128 padded output lanes costs more than these VPU chains
    — but see :func:`_grad_sums_mxu` for the bf16 SHARED-basis variant the
    mm_bf16 path uses.)
    Returns (d_mx, d_my, d_ca, d_cb, d_cc, Σd_power)."""
    t1 = d_power * dx
    t2 = d_power * dy
    s0 = jnp.sum(d_power, axis=1, keepdims=True)
    sx = jnp.sum(t1, axis=1, keepdims=True)
    sy = jnp.sum(t2, axis=1, keepdims=True)
    d_ca = -0.5 * jnp.sum(t1 * dx, axis=1, keepdims=True)
    d_cb = -jnp.sum(t1 * dy, axis=1, keepdims=True)
    d_cc = -0.5 * jnp.sum(t2 * dy, axis=1, keepdims=True)
    ca = rows[:, 2:3]; cb = rows[:, 3:4]; cc = rows[:, 4:5]
    d_mx = -(ca * sx + cb * sy)
    d_my = -(cc * sy + cb * sx)
    return d_mx, d_my, d_ca, d_cb, d_cc, s0


def _grad_sums_packed(d_power, dx, dy, rows):
    """:func:`_grad_sums` with the six (G,P)→(G,1) pixel reductions recast as
    ONE stacked (6G, P)x(P, 8) bf16 matmul against a ones column.

    The five products stay exact VPU work (same sharing as the base chain);
    only the REDUCTIONS ride the MXU — contraction on the 1024-wide pixel
    axis is the MXU-efficient direction, and bf16 rounds each summand by
    ~2⁻⁸ relative with f32 accumulation (the same noise class as the
    accepted mm_bf16 color dots; no cancellation amplification, unlike the
    tile-centered moment recombination of :func:`_grad_sums_mxu`)."""
    G = d_power.shape[0]
    t1 = d_power * dx
    t2 = d_power * dy
    stacked = jnp.concatenate([d_power, t1, t2, t1 * dx, t1 * dy, t2 * dy], 0)
    ones = jnp.ones((d_power.shape[1], 8), jnp.float32)
    S = _dot(stacked, ones, ((1,), (0,)), True)[:, 0:1]  # (6G, 1)
    s0 = S[0:G]
    sx = S[G:2 * G]
    sy = S[2 * G:3 * G]
    d_ca = -0.5 * S[3 * G:4 * G]
    d_cb = -S[4 * G:5 * G]
    d_cc = -0.5 * S[5 * G:6 * G]
    ca = rows[:, 2:3]; cb = rows[:, 3:4]; cc = rows[:, 4:5]
    d_mx = -(ca * sx + cb * sy)
    d_my = -(cc * sy + cb * sx)
    return d_mx, d_my, d_ca, d_cb, d_cc, s0


def _pixel_basis(px, py, tile: int = TILE):
    """(P, 8) TILE-CENTERED moment basis [1, u, v, u², u·v, v², 0, 0] with
    u = px − cx, v = py − cy for the current tile's center (cx, cy).

    Centering bounds every basis value by tile²/4 so the bf16 moment matmul
    (:func:`_grad_sums_mxu`) rounds relatively (half-integer u/v are exact in
    bf16 up to ±tile); an absolute-pixel basis would put 512² values through
    bf16's 8-bit mantissa.  Returns (basis (P,8), cx, cy)."""
    cx = (jnp.min(px) + jnp.max(px)) * 0.5
    cy = (jnp.min(py) + jnp.max(py)) * 0.5
    u = (px - cx).reshape(-1, 1)  # (P, 1)
    v = (py - cy).reshape(-1, 1)
    one = jnp.ones_like(u)
    zero = jnp.zeros_like(u)
    return jnp.concatenate(
        [one, u, v, u * u, u * v, v * v, zero, zero], axis=1), cx, cy


def _grad_sums_mxu(d_power, basis, cx, cy, rows):
    """MXU moment formulation of :func:`_grad_sums` for the bf16 path.

    With tile-centered pixel coords u = px−cx (shared across the group) and
    per-gaussian centered means mxc = mx−cx, every positional sum is a linear
    combination of the SHARED-basis moments S_k = Σ_p d_power·U_k
    (dx = mxc − u ⟹ Σ d_power·dx = mxc·S₀ − S_u, etc.) — so the six (G,P)
    reductions + five (G,P) products of the VPU chain collapse into ONE
    (G,P)x(P,8) bf16 matmul (contraction on the 1024-wide pixel axis — the
    MXU-efficient direction; the 6→128 padded OUTPUT lanes that sank the f32
    variant cost a single pass here) plus (G,1) recombination.  bf16 rounds
    d_power by ~2⁻⁸ relative — the same class of gradient noise as the
    mm_bf16 color dots; the f32 test path keeps the exact VPU chain."""
    S = _dot(d_power, basis, ((1,), (0,)), True)  # (G, 8) f32-accumulated
    s0 = S[:, 0:1]
    su = S[:, 1:2]
    sv = S[:, 2:3]
    suu = S[:, 3:4]
    suv = S[:, 4:5]
    svv = S[:, 5:6]
    mxc = rows[:, 0:1] - cx
    myc = rows[:, 1:2] - cy
    sx = mxc * s0 - su  # Σ d_power·dx
    sy = myc * s0 - sv
    sxx = mxc * mxc * s0 - 2.0 * mxc * su + suu  # Σ d_power·dx²
    sxy = mxc * myc * s0 - mxc * sv - myc * su + suv
    syy = myc * myc * s0 - 2.0 * myc * sv + svv
    d_ca = -0.5 * sxx
    d_cb = -sxy
    d_cc = -0.5 * syy
    ca = rows[:, 2:3]; cb = rows[:, 3:4]; cc = rows[:, 4:5]
    d_mx = -(ca * sx + cb * sy)
    d_my = -(cc * sy + cb * sx)
    return d_mx, d_my, d_ca, d_cb, d_cc, s0


def _group_geometry(rows, px, py, g0, count):
    """Shared fwd/bwd per-group math.  rows: (GROUP, ROW).
    Returns (alpha, power, dx, dy, live, clamped) each (GROUP, P)-shaped
    (live/clamped boolean).

    All f32: a bf16 exp+mask variant was tried (targeting VPU element
    throughput) and rejected — Mosaic on v5e rejects bf16 comparisons
    ("Target does not support this comparison"), and with masks kept in f32
    the remaining bf16 exp measured no fps change on bench.py (the group loop
    is bound by the csum matmuls + row reads, not the exp chain)."""
    mx = rows[:, 0:1]
    my = rows[:, 1:2]
    ca = rows[:, 2:3]
    cb = rows[:, 3:4]
    cc = rows[:, 4:5]
    op = rows[:, OP_COL:OP_COL + 1]
    dx = mx - px  # (GROUP, P)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    valid = (jax.lax.broadcasted_iota(jnp.int32, (rows.shape[0], 1), 0) + g0) < count
    raw = op * jnp.exp(power)
    clamped = raw > ALPHA_MAX
    alpha0 = jnp.minimum(ALPHA_MAX, raw)
    # power >= -4.5 = the 3σ Mahalanobis cutoff defining the binning radius
    # (projection.py:116) applied per-pixel — makes the composite independent
    # of binning tile granularity (see blend.py chunk_step).
    live = (power <= 0.0) & (power >= -4.5) & (alpha0 >= ALPHA_MIN) & valid
    alpha = jnp.where(live, alpha0, 0.0)
    return alpha, power, dx, dy, live, clamped


def _tri_strict(G):
    """Strictly-lower-triangular ones (G, G) — cumulative products/
    sums along the group axis become a single MXU matmul instead of a
    G-step unrolled scan."""
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return (c < r).astype(jnp.float32)


def _tri_incl(G):
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return (c <= r).astype(jnp.float32)


def _matmul_bf16(a, b):
    """a @ b (contracting a's dim 1 with b's dim 0) with bf16 inputs and f32
    accumulation — ONE MXU pass instead of the ~3 passes of a DEFAULT f32
    dot (profiled −0.6 ms/step on the 100k bench for the transmittance
    cumsums at GROUP=128).  ``a`` is a 0/1 mask (exact in bf16); only ``b``
    rounds (~2⁻⁸ relative).  A two-term hi+lo split recovers f32 precision
    but costs two passes — no faster than the f32 dot; measured and
    rejected."""
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _dot(a, b, dims, bf16: bool):
    """dot_general with f32 accumulation; optionally bf16 inputs (ONE MXU
    pass instead of the ~3 of an f32 dot).  Used for the color/cotangent
    matmuls where inputs are bounded ([0,1] colors/weights) or rounding is
    gradient noise (~2^-8 relative) — gated by RasterizerConfig.bf16_matmuls
    so parity tests keep exact f32."""
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _exclusive_transmittance(alpha, trans, tri=None):
    """Per-gaussian exclusive transmittance within the group.
    alpha: (GROUP, P); trans: (1, P) carry.  Returns (T_excl (GROUP,P),
    t_out (1,P)).

    Computed in log space: T_excl = trans · exp(Lstrict @ log1p(−α)) where
    Lstrict is the strictly-lower-triangular ones matrix — the sequential
    product becomes one (GROUP,GROUP)x(GROUP,P) MXU matmul.  α ≤ 0.99 keeps
    log1p well-conditioned.  ``tri`` lets callers hoist the mask out of
    the group loop.  The group-exit carry t_out MUST stay an exact-f32 sum:
    deriving it from the bf16 csum's last row compounds 2⁻⁸ rounding into
    the carry multiplicatively across groups (measured: gradient parity vs
    XLA breaks)."""
    E, tof = _transmittance_parts(alpha, tri)
    return trans * E, trans * tof


def _transmittance_parts(alpha, tri=None):
    """Trans-factored transmittance: returns (E, tof) with
    T_excl = trans·E and trans_out = trans·tof — lets the forward keep the
    (1,P) running transmittance OUT of the (G,P) work (it scales the (C,P)
    dot output instead)."""
    G = alpha.shape[0]
    l = jnp.log1p(-alpha)  # (G, P), <= 0
    csum = _matmul_bf16(tri if tri is not None else _tri_strict(G), l)
    E = jnp.exp(csum)
    # exact-f32 SUM for the group-exit carry: it compounds multiplicatively
    # across groups, so only the element values may round, never the sum
    tof = jnp.exp(jnp.sum(l, axis=0, keepdims=True, dtype=jnp.float32))
    return E, tof


def _fwd_kernel(n_channels: int, group: int, mm_bf16: bool, counts_ref, tiles_x_ref, data_ref, out_ref):
    px, py = _pixel_grid(tiles_x_ref)
    tri_s = _tri_strict(group)
    t = pl.program_id(0)
    count = counts_ref[t]
    n_groups = pl.cdiv(count, group)
    C = n_channels

    def body(carry):
        g, trans, acc = carry  # trans (1,P); acc (C, P)
        g0 = g * group
        rows = data_ref[0, pl.ds(g0, group), :]  # (group, ROW)
        alpha, _, _, _, _, _ = _group_geometry(rows, px, py, g0, count)
        t_excl, t_out = _exclusive_transmittance(alpha, trans, tri_s)
        w = alpha * t_excl  # (GROUP, P)
        cols = rows[:, 5:5 + C]  # (GROUP, C)
        acc = acc + _dot(cols, w, ((0,), (0,)), mm_bf16)  # (C, P)
        return g + 1, t_out, acc

    def cond(carry):
        g, trans, _ = carry
        return jnp.logical_and(g < n_groups, jnp.max(trans) > T_EPS)

    trans0 = jnp.ones((1, P), jnp.float32)
    acc0 = jnp.zeros((C, P), jnp.float32)
    _, trans, acc = jax.lax.while_loop(cond, body, (0, trans0, acc0))
    out_ref[0, :C, :] = acc
    out_ref[0, C, :] = trans[0]


def _bwd_kernel(n_channels: int, group: int, mm_bf16: bool, grad_reduce: str,
                counts_ref, tiles_x_ref, data_ref,
                fwd_out_ref, cot_ref, grad_ref):
    """Front-to-back replay.  cot rows: (C+1, P) = [g_colors, g_T] where g_T
    already folds the background and alpha cotangents (plain-JAX wrapper)."""
    px, py = _pixel_grid(tiles_x_ref)
    tri_s = _tri_strict(group)
    tri_i = _tri_incl(group)
    basis = cx = cy = None
    if mm_bf16 and grad_reduce == "moments":
        basis, cx, cy = _pixel_basis(px, py)
    t = pl.program_id(0)
    count = counts_ref[t]
    n_groups = pl.cdiv(count, group)
    C = n_channels

    c_total_dot_g = jnp.sum(
        fwd_out_ref[0, :C, :] * cot_ref[0, :C, :], axis=0, keepdims=True
    )  # (1,P) — g·C_total
    t_final = fwd_out_ref[0, C:C + 1, :]  # (1,P)
    g_col = cot_ref[0, :C, :]  # (C,P)
    g_T = cot_ref[0, C:C + 1, :]  # (1,P)

    grad_ref[0, :, :] = jnp.zeros_like(grad_ref[0, :, :])

    def body(carry):
        g, trans, gdot_cpre = carry  # gdot_cpre: (1,P) = g·C_{≤ processed}
        g0 = g * group
        rows = data_ref[0, pl.ds(g0, group), :]
        alpha, power, dx, dy, live, clamped = _group_geometry(rows, px, py, g0, count)
        t_excl, t_out = _exclusive_transmittance(alpha, trans, tri_s)
        w = alpha * t_excl  # (GROUP, P)
        cols = rows[:, 5:5 + C]  # (GROUP, C)

        # g·c_k per gaussian: (GROUP,C)x(C,P) -> (GROUP,P)
        gdotc = _dot(cols, g_col, ((1,), (0,)), mm_bf16)
        # inclusive prefix of g·(w_k c_k) within the group — triangular MXU
        # matmul (Mosaic has no cumsum lowering)
        contrib = gdotc * w  # (GROUP, P)
        prefix = gdot_cpre + _matmul_bf16(tri_i, contrib)
        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = (
            t_excl * gdotc
            - (c_total_dot_g - prefix) / one_m
            - g_T * t_final / one_m
        )
        d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)
        d_raw = jnp.where(clamped, 0.0, d_alpha)
        d_power = d_raw * alpha  # (GROUP,P)
        if mm_bf16 and grad_reduce == "moments":
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums_mxu(
                d_power, basis, cx, cy, rows)
        elif mm_bf16 and grad_reduce == "packed":
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums_packed(
                d_power, dx, dy, rows)
        else:
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums(d_power, dx, dy, rows)
        d_op = s0 / jnp.maximum(rows[:, OP_COL:OP_COL + 1], 1e-12)
        # d_col: (GROUP,P)x(P,C) -> (GROUP,C)
        d_col = _dot(w, g_col, ((1,), (1,)), mm_bf16)
        pad = jnp.zeros((group, OP_COL - 5 - C), jnp.float32)
        tail = jnp.zeros((group, ROW - OP_COL - 1), jnp.float32)
        grad_rows = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_col, pad, d_op, tail], axis=1
        )
        grad_ref[0, pl.ds(g0, group), :] = grad_rows
        return g + 1, t_out, prefix[group - 1:group, :]

    def cond(carry):
        g, trans, _ = carry
        return jnp.logical_and(g < n_groups, jnp.max(trans) > T_EPS)

    trans0 = jnp.ones((1, P), jnp.float32)
    gpre0 = jnp.zeros((1, P), jnp.float32)
    jax.lax.while_loop(cond, body, (0, trans0, gpre0))


def _pack_rows(means2d, conics, colors, opacities):
    """(N,2),(N,3),(N,C),(N,) -> (N+1, ROW) with a zero sentinel row.

    Assembled as a SUBLANE-axis stack of planar (N,) columns + one (ROW, N)
    -> (N, ROW) transpose: lane-axis concatenation of small-lane arrays
    lowers to strided writes (~0.6 ms/iter on the 100k bench); the planar
    stack is contiguous and the transpose is a single fast copy.  (The
    earlier .at[].set formulation cost ~1.6 ms as dynamic-update-slices.)"""
    N, C = colors.shape
    assert 5 + C <= OP_COL, "packed row supports up to 9 blended channels"
    zero = jnp.zeros((N,), jnp.float32)
    cols = [means2d[:, 0], means2d[:, 1], conics[:, 0], conics[:, 1], conics[:, 2]]
    cols += [colors[:, i] for i in range(C)]
    cols += [zero] * (OP_COL - 5 - C)
    cols += [opacities]
    cols += [zero] * (ROW - OP_COL - 1)
    rows = jnp.stack(cols, axis=0).T  # (ROW, N) -> (N, ROW)
    return jnp.concatenate([rows, jnp.zeros((1, ROW), jnp.float32)], 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def blend_tiles_pallas(
    tile_gauss, tile_counts, means2d, conics_colors, opacities,
    W: int, H: int, n_channels: int, interpret: bool, group: int = GROUP,
    mm_bf16: bool = False, grad_reduce: str = "vpu",
):
    out, _ = _blend_fwd_impl(
        tile_gauss, tile_counts, means2d, conics_colors, opacities, W, H,
        n_channels, interpret, group, mm_bf16,
    )
    return out


def _blend_fwd_impl(tile_gauss, tile_counts, means2d, conics_colors, opacities,
                    W, H, n_channels, interpret, group, mm_bf16):
    conics, colors = conics_colors
    T, K = tile_gauss.shape
    C = n_channels
    tiles_x = (W + TILE - 1) // TILE
    rows = _pack_rows(means2d, conics, colors, opacities)  # (N+1, ROW)
    tile_data = rows[tile_gauss]  # (T, K, ROW) one fused gather

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[pl.BlockSpec((1, K, ROW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C, group, mm_bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, C + 1, P), jnp.float32),
        interpret=interpret,
    )(tile_counts.astype(jnp.int32), jnp.asarray([tiles_x], jnp.int32), tile_data)
    return out, (tile_gauss, tile_counts, means2d, conics, colors, opacities, tile_data, out)


def _blend_fwd_rule(tile_gauss, tile_counts, means2d, conics_colors, opacities,
                    W, H, n_channels, interpret, group, mm_bf16, grad_reduce):
    return _blend_fwd_impl(
        tile_gauss, tile_counts, means2d, conics_colors, opacities, W, H,
        n_channels, interpret, group, mm_bf16,
    )


def _blend_bwd_rule(W, H, n_channels, interpret, group, mm_bf16, grad_reduce,
                    res, cot):
    tile_gauss, tile_counts, means2d, conics, colors, opacities, tile_data, fwd_out = res
    T, K = tile_gauss.shape
    C = n_channels
    N = means2d.shape[0]
    tiles_x = (W + TILE - 1) // TILE

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, K, ROW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, ROW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )
    tile_grads = pl.pallas_call(
        functools.partial(_bwd_kernel, C, group, mm_bf16, grad_reduce),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, K, ROW), jnp.float32),
        interpret=interpret,
    )(tile_counts.astype(jnp.int32), jnp.asarray([tiles_x], jnp.int32),
      tile_data, fwd_out, cot)

    flat_idx = tile_gauss.reshape(-1)
    flat_grads = tile_grads.reshape(-1, ROW)
    acc = jnp.zeros((N + 1, ROW), jnp.float32).at[flat_idx].add(flat_grads)[:N]
    d_means2d = acc[:, 0:2]
    d_conics = acc[:, 2:5]
    d_colors = acc[:, 5:5 + C]
    d_opac = acc[:, OP_COL]
    return None, None, d_means2d, (d_conics, d_colors), d_opac


blend_tiles_pallas.defvjp(_blend_fwd_rule, _blend_bwd_rule)


def blend_image_pallas(
    tile_gauss: jnp.ndarray,
    tile_counts: jnp.ndarray,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    W: int,
    H: int,
    background: jnp.ndarray,
    interpret: bool = False,
    group: int = GROUP,
    mm_bf16: bool = False,
    grad_reduce: str = "vpu",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-image blend through the Pallas kernel: (rgb_HWC, alpha_HW1,
    depth_HW1) with background composited — matches blend.blend_tiles.

    Depth rides as an extra blended channel.  The alpha/background cotangents
    reach the kernel through plain-JAX ops on the (T, C+1, P) block, so
    autodiff of this wrapper produces exactly the folded g_T channel the
    backward kernel expects."""
    C_user = colors.shape[-1]
    colors_aug = jnp.concatenate([colors, depths[:, None]], -1)  # (N, C+1)
    C = C_user + 1
    tiles_x = (W + TILE - 1) // TILE
    tiles_y = (H + TILE - 1) // TILE

    out = blend_tiles_pallas(
        tile_gauss, tile_counts, means2d, (conics, colors_aug), opacities,
        W, H, C, interpret, group, mm_bf16, grad_reduce,
    )  # (T, C+1, P)

    acc = out[:, :C, :]
    t_final = out[:, C, :]  # (T, P)

    def untile(flat, ch):  # (T, ch, P) -> (H, W, ch)
        img = flat.reshape(tiles_y, tiles_x, ch, TILE, TILE)
        img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * TILE, tiles_x * TILE, ch)
        return img[:H, :W]

    colors_img = untile(acc[:, :C_user, :], C_user)
    depth_img = untile(acc[:, C_user:C_user + 1, :], 1)
    trans_img = untile(t_final[:, None, :], 1)
    alpha_img = 1.0 - trans_img
    rgb = colors_img + trans_img * background[None, None, :]
    return rgb, alpha_img, depth_img
