"""VMEM-resident Pallas rasterizer path (pair segments, no (T,K) table).

The tiled kernel (pallas_blend.py) is fed by XLA gathers whose SCALAR-int32
variants dominate the profile (6-8 ms each: depth-order reorder, (T,K) slot
lookup).  This path eliminates every scalar gather:

- binning produces the sorted PAIR array directly (quantized-depth packed
  keys + 2-operand sort, ops/gs/binning.bin_gaussians_pairs);
- the whole per-gaussian parameter table (N+1, 16) sits in VMEM (6.4 MB at
  100k gaussians — gate on budget);
- each tile DMAs its contiguous index segment HBM→SMEM and reads rows from
  the VMEM table by index inside the kernel;
- the backward writes per-PAIR gradients into an aliased zero-initialized
  (NM, 16) buffer via manual VMEM→HBM DMA, and XLA scatter-adds them per
  gaussian (row scatters are the fast gather/scatter class).

Compositing math is shared with pallas_blend (groups of 32, log-space
triangular-matmul transmittance, suffix-trick backward).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TILE
from .pallas_blend import (
    ALPHA_MIN,
    GROUP,  # default group size
    OP_COL,
    P,
    ROW,
    T_EPS,
    _dot,
    _exclusive_transmittance,
    _grad_sums,
    _grad_sums_mxu,
    _group_geometry,
    _matmul_bf16,
    _pack_rows,
    _pixel_basis,
    _pixel_grid,
    _transmittance_parts,
    _tri_incl,
    _tri_strict,
)

VMEM_TABLE_BUDGET = 12 * 1024 * 1024  # bytes for the resident row table


def fits_resident(n_gaussians: int) -> bool:
    return (n_gaussians + 1) * ROW * 4 <= VMEM_TABLE_BUDGET


ALIGN = 1024  # VMEM 1-D int32 tiling: dynamic slices must be 1024-aligned


def dma_window(cap: int) -> int:
    """Size of the aligned pair-segment DMA window for a tile capacity.

    The window starts at ``start`` rounded DOWN to ALIGN and must cover
    ``cap`` entries past the unrounded start; Mosaic additionally requires
    the slice SIZE itself to be ALIGN-aligned (cap=768 lowered a 1792-sized
    slice and failed to compile), so round (cap + ALIGN) up to ALIGN."""
    return ((cap + ALIGN + ALIGN - 1) // ALIGN) * ALIGN


def _read_group_rows(table_ref, idx_smem, slot_base, g0, group):
    rows = [table_ref[idx_smem[slot_base + g0 + j], :] for j in range(group)]
    return jnp.stack(rows, 0)  # (group, ROW)


def _seg_dma(pairs_hbm, starts_ref, idx_smem, sem, cap, t):
    """Async-copy descriptor for tile ``t``'s (aligned) pair-index window into
    double-buffer slot ``t % 2``.  The TPU grid is sequential on one core, so
    a copy STARTED at grid step t-1 into the other slot is WAITED at step t —
    the 8 KB HBM→SMEM segment fetch rides under the previous tile's compute
    instead of serializing with it (start();wait() at the top of every tile
    measured as a per-tile stall).

    The double buffer is ONE flat (2·window,) SMEM array indexed at dynamic
    offset slot·window: a (2, window) scratch sliced ``.at[slot]`` stopped
    lowering when Mosaic gave SMEM int32 a (2, 128) tiling (size-1 slices
    along the tiled dim 0 are rejected); dynamic-offset 1-D windows have no
    such constraint."""
    start = starts_ref[t]
    start_al = (start // ALIGN) * ALIGN
    win = dma_window(cap)
    slot = jax.lax.rem(t, 2)
    return pltpu.make_async_copy(
        pairs_hbm.at[pl.ds(start_al, win)],
        idx_smem.at[pl.ds(slot * win, win)],
        sem.at[slot],
    )


def _seg_prefetch(pairs_hbm, starts_ref, idx_smem, sem, cap):
    """Warm-up + steady-state prefetch; returns the flat SMEM offset of this
    tile's first pair index (slot·window + in-window base)."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _warmup():
        _seg_dma(pairs_hbm, starts_ref, idx_smem, sem, cap, 0).start()

    @pl.when(t + 1 < pl.num_programs(0))
    def _ahead():
        _seg_dma(pairs_hbm, starts_ref, idx_smem, sem, cap, t + 1).start()

    _seg_dma(pairs_hbm, starts_ref, idx_smem, sem, cap, t).wait()
    start = starts_ref[t]
    slot = jax.lax.rem(t, 2)
    return slot * dma_window(cap) + start - (start // ALIGN) * ALIGN


def _fwd_kernel(n_channels: int, cap: int, group: int, mm_bf16: bool,
                stream_rows: bool, tile: int,
                counts_ref, starts_ref, tiles_x_ref,
                table_ref, pairs_hbm, out_ref, *rest):
    if stream_rows:
        rows_out_ref, idx_smem, sem = rest
    else:
        idx_smem, sem = rest
        rows_out_ref = None
    P = tile * tile
    px, py = _pixel_grid(tiles_x_ref, tile)
    tri_s = _tri_strict(group)
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], cap)
    C = n_channels

    # aligned DMA window (arbitrary starts violate the 1-D VMEM tiling),
    # double-buffered across grid steps
    slot_base = _seg_prefetch(pairs_hbm, starts_ref, idx_smem, sem, cap)

    n_groups = pl.cdiv(count, group)

    def body(carry):
        g, trans, acc = carry
        g0 = g * group
        rows = _read_group_rows(table_ref, idx_smem, slot_base, g0, group)
        if rows_out_ref is not None:
            # stream the gathered rows out contiguously: the backward replay
            # re-reads them with VECTOR loads instead of repeating ~4 per-pair
            # indexed sublane reads per gaussian (and drops its dependence on
            # the VMEM-resident table entirely)
            rows_out_ref[0, pl.ds(g0, group), :] = rows
        alpha, _, _, _, _, _ = _group_geometry(rows, px, py, g0, count)
        cols = rows[:, 5:5 + C]
        # trans-factored: the (1,P) carry scales the (C,P) dot output instead
        # of a (G,P) broadcast mul (see _transmittance_parts)
        E, tof = _transmittance_parts(alpha, tri_s)
        w = alpha * E
        acc = acc + trans * _dot(cols, w, ((0,), (0,)), mm_bf16)
        return g + 1, trans * tof, acc

    def cond(carry):
        g, trans, _ = carry
        return jnp.logical_and(g < n_groups, jnp.max(trans) > T_EPS)

    trans0 = jnp.ones((1, P), jnp.float32)
    acc0 = jnp.zeros((C, P), jnp.float32)
    _, trans, acc = jax.lax.while_loop(cond, body, (0, trans0, acc0))
    out_ref[0, :C, :] = acc
    out_ref[0, C, :] = trans[0]


def _bwd_kernel(n_channels: int, cap: int, group: int, mm_bf16: bool,
                grad_reduce: str, tile: int,
                counts_ref, starts_ref, tiles_x_ref,
                table_ref, pairs_hbm, fwd_out_ref, cot_ref,
                grads_ref, idx_smem, sem):
    P = tile * tile
    px, py = _pixel_grid(tiles_x_ref, tile)
    tri_s = _tri_strict(group)
    tri_i = _tri_incl(group)
    basis = cx = cy = None
    if mm_bf16 and grad_reduce == "moments":
        basis, cx, cy = _pixel_basis(px, py, tile)
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], cap)
    C = n_channels

    slot_base = _seg_prefetch(pairs_hbm, starts_ref, idx_smem, sem, cap)

    c_total_dot_g = jnp.sum(
        fwd_out_ref[0, :C, :] * cot_ref[0, :C, :], axis=0, keepdims=True
    )
    t_final = fwd_out_ref[0, C:C + 1, :]
    g_col = cot_ref[0, :C, :]
    g_T = cot_ref[0, C:C + 1, :]
    n_groups = pl.cdiv(count, group)

    def body(carry):
        g, trans, gdot_cpre = carry
        g0 = g * group
        rows = _read_group_rows(table_ref, idx_smem, slot_base, g0, group)
        alpha, power, dx, dy, live, clamped = _group_geometry(
            rows, px, py, g0, count)
        t_excl, t_out = _exclusive_transmittance(alpha, trans, tri_s)
        w = alpha * t_excl
        cols = rows[:, 5:5 + C]

        gdotc = _dot(cols, g_col, ((1,), (0,)), mm_bf16)
        contrib = gdotc * w
        prefix = gdot_cpre + _matmul_bf16(tri_i, contrib)
        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = (
            t_excl * gdotc - (c_total_dot_g - prefix) / one_m - g_T * t_final / one_m
        )
        d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)
        d_raw = jnp.where(clamped, 0.0, d_alpha)
        d_power = d_raw * alpha
        if mm_bf16 and grad_reduce == "moments":
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums_mxu(
                d_power, basis, cx, cy, rows)
        elif mm_bf16 and grad_reduce == "packed":
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums_packed(
                d_power, dx, dy, rows)
        else:
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums(
                d_power, dx, dy, rows)
        d_op = s0 / jnp.maximum(rows[:, OP_COL:OP_COL + 1], 1e-12)
        d_col = _dot(w, g_col, ((1,), (1,)), mm_bf16)
        pad = jnp.zeros((group, OP_COL - 5 - C), jnp.float32)
        tail = jnp.zeros((group, ROW - OP_COL - 1), jnp.float32)
        grad_rows = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_col, pad, d_op, tail], axis=1
        )
        grads_ref[0, pl.ds(g0, group), :] = grad_rows
        return g + 1, t_out, prefix[group - 1:group, :]

    def cond(carry):
        g, trans, _ = carry
        return jnp.logical_and(g < n_groups, jnp.max(trans) > T_EPS)

    grads_ref[0, :, :] = jnp.zeros((cap, ROW), jnp.float32)
    trans0 = jnp.ones((1, P), jnp.float32)
    gpre0 = jnp.zeros((1, P), jnp.float32)
    jax.lax.while_loop(cond, body, (0, trans0, gpre0))


def _bwd_kernel_accum(n_channels: int, cap: int, group: int, mm_bf16: bool,
                      grad_reduce: str, stream_rows: bool, tile: int,
                      counts_ref, starts_ref, tiles_x_ref,
                      *rest):
    """Backward replay that accumulates per-GAUSSIAN gradients directly into
    a VMEM-resident (N+1, ROW) table instead of emitting per-pair rows.

    The TPU pallas grid is sequential, and a gaussian appears at most once
    per tile, so the read-modify-write on ``grads_ref`` rows is race-free.
    This removes the whole post-kernel reduction (permutation sort + M
    row-gathers over the (T·cap, ROW) buffer — the largest block in the
    fwd+bwd profile) at the cost of ``group`` indexed row updates per group.

    With ``stream_rows`` the forward's streamed (T, cap, ROW) row dump
    replaces the VMEM-resident table: group rows arrive as ONE vector load
    per group instead of ``group`` indexed sublane reads, and the kernel no
    longer books the (N+1, ROW) table in VMEM at all (only the pair-index
    SMEM window survives, for the RMW target indices)."""
    if stream_rows:
        (pairs_hbm, pairrows_ref, fwd_out_ref, cot_ref,
         grads_ref, idx_smem, sem) = rest
        table_ref = None
    else:
        (table_ref, pairs_hbm, fwd_out_ref, cot_ref,
         grads_ref, idx_smem, sem) = rest
        pairrows_ref = None
    P = tile * tile
    px, py = _pixel_grid(tiles_x_ref, tile)
    tri_s = _tri_strict(group)
    tri_i = _tri_incl(group)
    basis = cx = cy = None
    if mm_bf16 and grad_reduce == "moments":
        basis, cx, cy = _pixel_basis(px, py, tile)
    t = pl.program_id(0)
    count = jnp.minimum(counts_ref[t], cap)
    C = n_channels

    @pl.when(t == 0)
    def _init():
        grads_ref[...] = jnp.zeros_like(grads_ref)

    slot_base = _seg_prefetch(pairs_hbm, starts_ref, idx_smem, sem, cap)

    # fold the two /(1-α) terms into one: dα = T_excl·(g·c) − (S − prefix)/(1−α)
    # with S = g·C_total + g_T·T_final hoisted per tile (saves one (G,P)
    # divide per group — divides are multi-op on the VPU)
    c_total_dot_g = jnp.sum(
        fwd_out_ref[0, :C, :] * cot_ref[0, :C, :], axis=0, keepdims=True
    )
    t_final = fwd_out_ref[0, C:C + 1, :]
    g_col = cot_ref[0, :C, :]
    g_T = cot_ref[0, C:C + 1, :]
    s_tot = c_total_dot_g + g_T * t_final
    n_groups = pl.cdiv(count, group)

    def body(carry):
        g, trans, gdot_cpre = carry
        g0 = g * group
        if pairrows_ref is not None:
            rows = pairrows_ref[0, pl.ds(g0, group), :]
        else:
            rows = _read_group_rows(table_ref, idx_smem, slot_base, g0, group)
        # RMW read phase HOISTED above the VPU-heavy geometry/gradient block:
        # the 128 indexed sublane reads are latency-bound (they occupy no
        # vector ALU — the 23% VPU-idle gap in the round-4 roofline), and
        # issuing them first lets them overlap the (G,P) compute below.
        # Safe: pair indices within a tile are DISTINCT, so no write in this
        # tile (all writes happen after) can alias a row read here.
        sent = grads_ref.shape[0] - 1
        idxs = [
            jnp.where(g0 + j < count, idx_smem[slot_base + g0 + j], sent)
            for j in range(group)
        ]
        cur = jnp.stack([grads_ref[i, :] for i in idxs], 0)
        alpha, power, dx, dy, live, clamped = _group_geometry(
            rows, px, py, g0, count)
        t_excl, t_out = _exclusive_transmittance(alpha, trans, tri_s)
        w = alpha * t_excl
        cols = rows[:, 5:5 + C]

        gdotc = _dot(cols, g_col, ((1,), (0,)), mm_bf16)
        contrib = gdotc * w
        prefix = gdot_cpre + _matmul_bf16(tri_i, contrib)
        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        d_alpha = t_excl * gdotc - (s_tot - prefix) / one_m
        d_alpha = jnp.where(alpha > 0.0, d_alpha, 0.0)
        d_raw = jnp.where(clamped, 0.0, d_alpha)
        d_power = d_raw * alpha
        if mm_bf16 and grad_reduce == "moments":
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums_mxu(
                d_power, basis, cx, cy, rows)
        elif mm_bf16 and grad_reduce == "packed":
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums_packed(
                d_power, dx, dy, rows)
        else:
            d_mx, d_my, d_ca, d_cb, d_cc, s0 = _grad_sums(
                d_power, dx, dy, rows)
        d_op = s0 / jnp.maximum(rows[:, OP_COL:OP_COL + 1], 1e-12)
        d_col = _dot(w, g_col, ((1,), (1,)), mm_bf16)
        pad = jnp.zeros((group, OP_COL - 5 - C), jnp.float32)
        tail = jnp.zeros((group, ROW - OP_COL - 1), jnp.float32)
        grad_rows = jnp.concatenate(
            [d_mx, d_my, d_ca, d_cb, d_cc, d_col, pad, d_op, tail], axis=1
        )
        # RMW write phase (reads hoisted above): batched gather -> one vector
        # add -> batched scatter — the interleaved read-add-write per row
        # chains 128 RMWs the compiler must serialize (it cannot prove
        # idx_j != idx_{j+1}); split phases let the indexed reads/writes
        # pipeline.  Out-of-count rows divert to the sentinel row: the SMEM
        # window rows past ``count`` hold the NEXT tiles' pair indices
        # (segments are contiguous), which can repeat an in-count gaussian
        # and last-write-wins its stale pre-add value; sentinel grad_rows
        # are exactly zero under the live mask, so duplicate cur+0 writes
        # are no-ops there.
        new_rows = cur + grad_rows
        for j in range(group):
            grads_ref[idxs[j], :] = new_rows[j, :]
        return g + 1, t_out, prefix[group - 1:group, :]

    def cond(carry):
        g, trans, _ = carry
        return jnp.logical_and(g < n_groups, jnp.max(trans) > T_EPS)

    trans0 = jnp.ones((1, P), jnp.float32)
    gpre0 = jnp.zeros((1, P), jnp.float32)
    jax.lax.while_loop(cond, body, (0, trans0, gpre0))


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15))
def blend_pairs_pallas(
    sorted_gauss, starts_counts, means2d, conics_colors, opacities,
    W: int, H: int, n_channels: int, cap: int, interpret: bool,
    group: int = GROUP, bwd_accum: bool = True, mm_bf16: bool = False,
    stream_rows: bool = False, tile: int = TILE, grad_reduce: str = "vpu",
):
    """starts_counts = (starts, counts, sorted_tile, sorted_origpos, perm,
    inv_rank) — the last two are the rank-mode depth permutation and its
    inverse (None in pairs mode)."""
    out, _ = _fwd_impl(sorted_gauss, starts_counts, means2d, conics_colors,
                       opacities, W, H, n_channels, cap, interpret, group,
                       mm_bf16, stream_rows, tile)
    return out


def _fwd_impl(sorted_gauss, starts_counts, means2d, conics_colors, opacities,
              W, H, n_channels, cap, interpret, group, mm_bf16,
              stream_rows=False, tile=TILE):
    conics, colors = conics_colors
    starts, counts, sorted_tile, sorted_origpos, perm, inv_rank = starts_counts
    P = tile * tile
    T = starts.shape[0]
    C = n_channels
    tiles_x = (W + tile - 1) // tile
    rows = _pack_rows(means2d, conics, colors, opacities)  # (N+1, ROW)
    N = means2d.shape[0]
    if perm is not None:
        # rank-mode binning: pair indices are DEPTH RANKS — put the table in
        # depth order (one (N, ROW) row gather; sentinel row stays last)
        rows = jnp.concatenate([rows[perm], rows[N:]], 0)
    # pad the pair array so ds(start, cap) never overruns
    pairs = jnp.concatenate([sorted_gauss, jnp.full((dma_window(cap),), N, jnp.int32)], 0)

    if stream_rows:
        out_specs = (
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap, ROW), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            jax.ShapeDtypeStruct((T, C + 1, P), jnp.float32),
            jax.ShapeDtypeStruct((T, cap, ROW), jnp.float32),
        )
    else:
        out_specs = pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((T, C + 1, P), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # row table, resident
            pl.BlockSpec(memory_space=pl.ANY),  # pair indices in HBM
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((2 * dma_window(cap),), jnp.int32), pltpu.SemaphoreType.DMA((2,))],
    )
    result = pl.pallas_call(
        functools.partial(_fwd_kernel, C, cap, group, mm_bf16, stream_rows,
                          tile),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts.astype(jnp.int32), starts.astype(jnp.int32),
      jnp.asarray([tiles_x], jnp.int32), rows, pairs)
    if stream_rows:
        out, pair_rows = result
    else:
        out, pair_rows = result, None
    res = (sorted_gauss, starts, counts, sorted_tile, sorted_origpos, means2d,
           conics, colors, opacities, rows, pairs, out, inv_rank, pair_rows)
    return out, res


def _fwd_rule(sorted_gauss, starts_counts, means2d, conics_colors, opacities,
              W, H, n_channels, cap, interpret, group, bwd_accum, mm_bf16,
              stream_rows, tile, grad_reduce):
    return _fwd_impl(sorted_gauss, starts_counts, means2d, conics_colors,
                     opacities, W, H, n_channels, cap, interpret, group,
                     mm_bf16, stream_rows, tile)


def _bwd_rule_accum(W, H, n_channels, cap, interpret, group, mm_bf16,
                    stream_rows, tile, grad_reduce, res, cot):
    """In-kernel per-gaussian accumulation: the kernel's output IS the
    (N+1, ROW) gradient table — no permutation sort, no row-gathers."""
    (sorted_gauss, starts, counts, sorted_tile, sorted_origpos, means2d,
     conics, colors, opacities, rows, pairs, fwd_out, inv_rank, pair_rows) = res
    P = tile * tile
    T = starts.shape[0]
    C = n_channels
    N = means2d.shape[0]
    tiles_x = (W + tile - 1) // tile

    if stream_rows:
        # the forward streamed each tile's gathered rows to (T, cap, ROW):
        # the replay reads them as pipelined per-tile blocks — no VMEM table
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),  # pair indices (RMW targets)
            pl.BlockSpec((1, cap, ROW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        inputs = (pairs, pair_rows, fwd_out, cot)
    else:
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # row table
            pl.BlockSpec(memory_space=pl.ANY),  # pair indices
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ]
        inputs = (rows, pairs, fwd_out, cot)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=in_specs,
        # full-size accumulator revisited by every grid step (sequential grid)
        out_specs=pl.BlockSpec((N + 1, ROW), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * dma_window(cap),), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc = pl.pallas_call(
        functools.partial(_bwd_kernel_accum, C, cap, group, mm_bf16,
                          grad_reduce, stream_rows, tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N + 1, ROW), jnp.float32),
        interpret=interpret,
    )(counts.astype(jnp.int32), starts.astype(jnp.int32),
      jnp.asarray([tiles_x], jnp.int32), *inputs)

    if inv_rank is not None:
        # rank-mode: rows of acc are in depth order; one (N, ROW) row gather
        # puts gradients back in gaussian order
        acc = acc[inv_rank]
        d_means2d = acc[:, 0:2]
        d_conics = acc[:, 2:5]
        d_colors = acc[:, 5:5 + C]
        d_opac = acc[:, OP_COL]
    else:
        # transpose the table on the MXU before slicing: extracting K
        # columns straight from the lane-padded (N+1, 16) table is a
        # ~1 elem/cycle strided kLoop fusion (871k cycles profiled =
        # ~0.5 ms/step); as a dot with a 16x16 identity the padded table
        # is read ONCE and every gradient column becomes a contiguous
        # (1, N) row slice of the dense (ROW, N+1) product.  The barrier
        # keeps the simplifier from folding dot(eye, x) back into the
        # transpose relayout this replaces (measured slower, PERF.md).
        eye = jax.lax.optimization_barrier(jnp.eye(ROW, dtype=jnp.float32))
        accT = jax.lax.dot_general(eye, acc, (((0,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        d_means2d = accT[0:2, :N].T
        d_conics = accT[2:5, :N].T
        d_colors = accT[5:5 + C, :N].T
        d_opac = accT[OP_COL, :N]
    return None, None, d_means2d, (d_conics, d_colors), d_opac


def _bwd_rule_dispatch(W, H, n_channels, cap, interpret, group, bwd_accum,
                       mm_bf16, stream_rows, tile, grad_reduce, res, cot):
    if bwd_accum:
        return _bwd_rule_accum(W, H, n_channels, cap, interpret, group,
                               mm_bf16, stream_rows, tile, grad_reduce, res,
                               cot)
    return _bwd_rule(W, H, n_channels, cap, interpret, group, mm_bf16, tile,
                     grad_reduce, res, cot)


def _bwd_rule(W, H, n_channels, cap, interpret, group, mm_bf16, tile,
              grad_reduce, res, cot):
    (sorted_gauss, starts, counts, sorted_tile, sorted_origpos, means2d,
     conics, colors, opacities, rows, pairs, fwd_out, inv_rank, pair_rows) = res
    assert inv_rank is None, "rank-mode binning requires bwd_accum=True"
    P = tile * tile
    T = starts.shape[0]
    C = n_channels
    N = means2d.shape[0]
    NM = sorted_gauss.shape[0]
    M = NM // N
    tiles_x = (W + tile - 1) // tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # row table
            pl.BlockSpec(memory_space=pl.ANY),  # pair indices
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C + 1, P), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cap, ROW), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((2 * dma_window(cap),), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    tile_grads = pl.pallas_call(
        functools.partial(_bwd_kernel, C, cap, group, mm_bf16, grad_reduce,
                          tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, cap, ROW), jnp.float32),
        interpret=interpret,
    )(counts.astype(jnp.int32), starts.astype(jnp.int32),
      jnp.asarray([tiles_x], jnp.int32), rows, pairs, fwd_out, cot)

    # SCATTER-FREE reduction (TPU scatter-adds on this shape measured 67 ms;
    # sorts + row gathers are ~8 ms):
    # 1. per sorted pair, its (tile, within-segment slot) without gathers:
    #    segment starts via a cumulative max over boundary positions;
    # 2. its row in the kernel output = tile*cap + slot (pad row if beyond
    #    cap / invalid — kernel zero-fills, pad row is zeros);
    # 3. invert the binning permutation by SORTING the original flat pair ids
    #    with the output positions as payload — no scatter;
    # 4. row-gather the (T*cap+1, ROW) kernel output at the per-original-pair
    #    positions (fast gather class) and sum the (N, M) axis.
    iota = jax.lax.broadcasted_iota(jnp.int32, (NM, 1), 0)[:, 0]
    boundary = jnp.concatenate([
        jnp.ones((1,), bool), sorted_tile[1:] != sorted_tile[:-1]
    ])
    seg_start = jax.lax.cummax(jnp.where(boundary, iota, 0))
    slot = iota - seg_start
    valid = (sorted_tile < T) & (slot < cap)
    outpos = jnp.where(valid, sorted_tile * cap + slot, T * cap)  # pad row

    _, outpos_by_orig = jax.lax.sort((sorted_origpos, outpos), num_keys=1)
    flat = jnp.concatenate(
        [tile_grads.reshape(-1, ROW), jnp.zeros((1, ROW), jnp.float32)], 0
    )
    # one (NM, ROW) gather forces XLA into a column-major layout + a 3 ms
    # transposing reshape (profiled: 5.5 ms gather + 3.2 ms reshape); M
    # separate (N, ROW) row-gathers keep the natural row layout and the adds
    # fuse into the gathers
    pos_nm = outpos_by_orig.reshape(N, M)
    acc = flat[pos_nm[:, 0]]
    for j in range(1, M):
        acc = acc + flat[pos_nm[:, j]]
    d_means2d = acc[:, 0:2]
    d_conics = acc[:, 2:5]
    d_colors = acc[:, 5:5 + C]
    d_opac = acc[:, OP_COL]
    return None, None, d_means2d, (d_conics, d_colors), d_opac


blend_pairs_pallas.defvjp(_fwd_rule, _bwd_rule_dispatch)


def blend_image_resident(
    pa,
    means2d: jnp.ndarray,
    conics: jnp.ndarray,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    depths: jnp.ndarray,
    W: int,
    H: int,
    background: jnp.ndarray,
    cap: int = 1024,
    interpret: bool = False,
    group: int = GROUP,
    bwd_accum: bool = True,
    mm_bf16: bool = False,
    stream_rows: bool = False,
    tile: int = TILE,
    grad_reduce: str = "vpu",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-image blend through the resident kernel (same outputs/contract as
    pallas_blend.blend_image_pallas)."""
    C_user = colors.shape[-1]
    colors_aug = jnp.concatenate([colors, depths[:, None]], -1)
    C = C_user + 1
    tiles_x = (W + tile - 1) // tile
    tiles_y = (H + tile - 1) // tile

    out = blend_pairs_pallas(
        pa.sorted_gauss,
        (pa.starts, pa.counts, pa.sorted_tile, pa.sorted_origpos,
         pa.depth_order, pa.inv_rank),
        means2d, (conics, colors_aug), opacities, W, H, C, cap, interpret, group,
        bwd_accum, mm_bf16, stream_rows and bwd_accum, tile, grad_reduce,
    )
    acc = out[:, :C, :]
    t_final = out[:, C, :]

    def untile(flat, ch):
        img = flat.reshape(tiles_y, tiles_x, ch, tile, tile)
        img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * tile, tiles_x * tile, ch)
        return img[:H, :W]

    colors_img = untile(acc[:, :C_user, :], C_user)
    depth_img = untile(acc[:, C_user:C_user + 1, :], 1)
    trans_img = untile(t_final[:, None, :], 1)
    alpha_img = 1.0 - trans_img
    rgb = colors_img + trans_img * background[None, None, :]
    return rgb, alpha_img, depth_img
