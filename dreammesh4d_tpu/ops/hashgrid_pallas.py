"""VMEM-resident Pallas kernel for the cell-packed hash encoding.

TPU-native replacement for the hot path of the tcnn HashGrid (reference
threestudio/models/networks.py:55-66) at stage-1 NeRF sizes.  Round-5
profiling showed XLA's TPU gather/scatter are latency-bound PER INDEX
(~4-10 ms per 524k-index op), so the corner-layout encode cost ~2 s per
524k-point fwd+bwd at stage-1 sizes.  This kernel applies the rasterizer's
proven machinery (ops/gs/pallas_resident.py): per-level tables resident in
VMEM, point-block row indices DMA'd HBM→SMEM, scalar-indexed row reads,
planar in-kernel trilerp math with an eye-matmul transpose, and a backward
that RMWs coefficient rows into a VMEM (T, 16) gradient accumulator.

Data layout notes (all dynamic indexing on LEADING dims — no dynamic lane
slices, the Mosaic-unsupported class):
- points ride as (Np/G, 3, G) blocks (G=128 lanes);
- outputs as (L, Np/G, CH, G) with CH = [f0, f1, df0/dx .. df1/dz];
- the level table block (1, T, 16) is VMEM-resident per level (the 16-lane
  rows pad to 128 in VMEM: 32 MB at T=2^16 — the layout the rasterizer's
  (N+1, 16) table proved);
- row indices are precomputed in XLA (cheap planar uint32 hashing,
  hashgrid.cell_indices) and DMA'd per block into SMEM.

The kernel returns BOTH features and their spatial gradient d feats/dx from
ONE row pass — the analytic-normal path needs no second encode.  The custom
VJP returns EXACT table gradients; the query-point cotangent ``d_x`` is
returned as zeros (documented: every in-repo consumer's query points are
data — rays — so the cotangent is discarded upstream; geometries whose
query points carry parameters must use layout="corner").

F (features/level) must be 2 (8 corners x 2 = one 16-float rasterizer-class
row).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashgrid import HashGridConfig, cell_indices

G = 128  # points per inner group (lane width)
BLOCK = 1024  # points per grid step (SMEM DMA window; 1024-aligned)
ROW = 16  # 8 corners x F=2


def _eye16():
    r = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (ROW, ROW), 1)
    return (r == c).astype(jnp.float32)


def _transpose16(a, out_first: bool):
    """MXU transposes with a 16x16 identity: out_first=True maps
    (n, 16) -> (16, n); False maps (16, n) -> (n, 16).  HIGHEST precision:
    the default TPU matmul rounds the non-identity operand to bf16 (~2^-8
    relative — measured 0.3% feature/gradient error before the pin)."""
    eye = _eye16()
    if out_first:
        return jax.lax.dot_general(eye, a, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(a, eye, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _corner_chains(u0, u1, u2):
    """u*: (1, G) fractionals -> per-corner (w, dwx, dwy, dwz) chains,
    corner order c = dx | dy<<1 | dz<<2 (cell row slot order)."""
    out = []
    for c in range(8):
        dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        fx = u0 if dx else 1.0 - u0
        fy = u1 if dy else 1.0 - u1
        fz = u2 if dz else 1.0 - u2
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        sz = 1.0 if dz else -1.0
        out.append((fx * fy * fz, sx * fy * fz, fx * sy * fz, fx * fy * sz))
    return out


def _group_fracs(pts_g, res):
    """pts_g (3, G) in [0,1] + scalar res -> (u0, u1, u2) each (1, G)."""
    resf = res.astype(jnp.float32)
    us = []
    for d in range(3):
        xs = pts_g[d:d + 1, :] * resf
        x0 = jnp.clip(jnp.floor(xs), 0.0, resf - 1.0)
        us.append(xs - x0)
    return us


def _dma_idx(idx_hbm, idx_smem, sem, l, b, nb, slot):
    """Copy descriptor for flat block index l*nb+b into double-buffer slot
    ``slot`` (the 2*BLOCK SMEM scratch is indexed at slot*BLOCK)."""
    start = (l * nb + b) * BLOCK
    return pltpu.make_async_copy(idx_hbm.at[pl.ds(start, BLOCK)],
                                 idx_smem.at[pl.ds(slot * BLOCK, BLOCK)],
                                 sem.at[slot])


def _idx_prefetch(idx_hbm, idx_smem, sem):
    """Double-buffered SMEM index windows across the (l, b) grid (the
    rasterizer's _seg_prefetch pattern): start block k+1's copy before
    waiting on block k's, so the 4 KB fetch rides under the previous
    block's compute.  Returns this block's SMEM base offset."""
    l = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(1)
    k = l * nb + b  # flat sequential block id (row-major grid)
    slot = jax.lax.rem(k, 2)

    @pl.when(k == 0)
    def _warmup():
        _dma_idx(idx_hbm, idx_smem, sem, l, b, nb, 0).start()

    nxt = k + 1
    @pl.when(nxt < pl.num_programs(0) * nb)
    def _ahead():
        _dma_idx(idx_hbm, idx_smem, sem, nxt // nb, jax.lax.rem(nxt, nb),
                 nb, jax.lax.rem(nxt, 2)).start()

    _dma_idx(idx_hbm, idx_smem, sem, l, b, nb, slot).wait()
    return slot * BLOCK


def _fwd_kernel(res_ref, pts_ref, table_ref, idx_hbm,
                out_ref, idx_smem, sem):
    l = pl.program_id(0)
    res = res_ref[l]
    base = _idx_prefetch(idx_hbm, idx_smem, sem)
    resf = res.astype(jnp.float32)

    def group(g, _):
        rows = jnp.stack(
            [table_ref[0, idx_smem[base + g * G + j], :] for j in range(G)], 0)
        rT = _transpose16(rows, True)  # (16, G) planar
        pts_g = pts_ref[g]  # (3, G)
        chains = _corner_chains(*_group_fracs(pts_g, res))
        outs = []
        for f in range(2):
            acc = jnp.zeros((1, G), jnp.float32)
            for c in range(8):
                acc = acc + chains[c][0] * rT[c * 2 + f:c * 2 + f + 1, :]
            outs.append(acc)
        for d in range(3):
            for f in range(2):
                gr = jnp.zeros((1, G), jnp.float32)
                for c in range(8):
                    gr = gr + chains[c][1 + d] * rT[c * 2 + f:c * 2 + f + 1, :]
                outs.append(gr * resf)
        out_ref[0, g, :, :] = jnp.concatenate(outs, 0)  # (8, G)
        return 0

    jax.lax.fori_loop(0, BLOCK // G, group, 0)


def _bwd_kernel(res_ref, pts_ref, gpk_ref, idx_hbm,
                acc_ref, idx_smem, sem):
    l = pl.program_id(0)
    b = pl.program_id(1)
    res = res_ref[l]  # noqa: F841 (b used by the init predicate below)

    @pl.when(b == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    base = _idx_prefetch(idx_hbm, idx_smem, sem)
    resf = res.astype(jnp.float32)

    def group(g, _):
        pts_g = pts_ref[g]
        chains = _corner_chains(*_group_fracs(pts_g, res))
        gpk = gpk_ref[0, g]  # (8, G): [gf0, gf1, gdx0, gdx1, .., gdz1]
        drows = []
        for c in range(8):
            w, dwx, dwy, dwz = chains[c]
            for f in range(2):
                coeff = (w * gpk[f:f + 1, :]
                         + resf * (dwx * gpk[2 + f:3 + f, :]
                                   + dwy * gpk[4 + f:5 + f, :]
                                   + dwz * gpk[6 + f:7 + f, :]))
                drows.append(coeff)
        D = jnp.concatenate(drows, 0)  # (16, G) planar
        D_rows = _transpose16(D, False)  # (G, 16)
        # serial RMW: duplicate indices WITHIN a group are expected
        # (consecutive ray samples share cells at coarse levels), so the
        # rasterizer's phase-split does NOT apply — read-add-write one row
        # at a time (the compiler serializes the chain; correct over fast)
        for j in range(G):
            i = idx_smem[base + g * G + j]
            acc_ref[0, i, :] = acc_ref[0, i, :] + D_rows[j, :]
        return 0

    jax.lax.fori_loop(0, BLOCK // G, group, 0)


def _fwd_call(tables, pts_b, idx, resolutions, interpret):
    L, T, _ = tables.shape
    NG = pts_b.shape[0]  # Np / G
    nb = NG * G // BLOCK
    gpb = BLOCK // G  # groups per block
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((gpb, 3, G), lambda l, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, ROW), lambda l, b, *_: (l, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # indices (L*Np,) HBM
        ],
        out_specs=pl.BlockSpec((1, gpb, 8, G), lambda l, b, *_: (l, b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((2 * BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, NG, 8, G), jnp.float32),
        interpret=interpret,
    )(resolutions, pts_b, tables, idx)


def _bwd_call(gpacked, pts_b, idx, resolutions, L, T, interpret):
    NG = pts_b.shape[0]
    nb = NG * G // BLOCK
    gpb = BLOCK // G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, nb),
        in_specs=[
            pl.BlockSpec((gpb, 3, G), lambda l, b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpb, 8, G), lambda l, b, *_: (l, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # indices
        ],
        out_specs=pl.BlockSpec((1, T, ROW), lambda l, b, *_: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((2 * BLOCK,), jnp.int32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((L, T, ROW), jnp.float32),
        interpret=interpret,
    )(resolutions, pts_b, gpacked, idx)


def _prep(cfg, x):
    """x (N, 3) -> (pts_b (Np/G, 3, G), idx (L*Np,), res (L,), N, Np)."""
    N = x.shape[0]
    pad = (-N) % BLOCK
    xp = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], 0) if pad else x
    Np = N + pad
    idx = cell_indices(cfg, xp).reshape(-1)
    res = jnp.asarray(cfg.level_resolutions(), jnp.int32)
    pts_b = xp.reshape(Np // G, G, 3).transpose(0, 2, 1)  # (Np/G, 3, G)
    return pts_b, idx, res, N, Np


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _encode_cell_pallas(tables, x, cfg: HashGridConfig, interpret: bool):
    out, _ = _encode_fwd_rule(tables, x, cfg, interpret)
    return out


def _encode_fwd_rule(tables, x, cfg, interpret):
    pts_b, idx, res, N, Np = _prep(cfg, x)
    out = _fwd_call(tables, pts_b, idx, res, interpret)  # (L, Np/G, 8, G)
    L = tables.shape[0]
    # -> (Np, L, 8): [f0, f1, dx0, dx1, dy0, dy1, dz0, dz1]
    per_pt = out.transpose(1, 3, 0, 2).reshape(Np, L, 8)
    feats = per_pt[:N, :, :2].reshape(N, L * 2)
    dfeats = per_pt[:N, :, 2:].reshape(N, L, 3, 2).transpose(0, 1, 3, 2)
    dfeats = dfeats.reshape(N, L * 2, 3)
    return (feats, dfeats), (pts_b, idx, res, N, Np)


def _encode_bwd_rule(cfg, interpret, resid, cot):
    pts_b, idx, res, N, Np = resid
    g_feats, g_dfeats = cot
    L = len(cfg.level_resolutions())
    T = 1 << cfg.log2_hashmap_size
    pad = Np - N

    gf = g_feats.reshape(N, L, 2)
    gd = g_dfeats.reshape(N, L, 2, 3).transpose(0, 1, 3, 2).reshape(N, L, 6)
    gp = jnp.concatenate([gf, gd], -1)  # (N, L, 8)
    if pad:
        gp = jnp.concatenate(
            [gp, jnp.zeros((pad, L, 8), gp.dtype)], 0)
    gpacked = gp.reshape(Np // G, G, L, 8).transpose(2, 0, 3, 1)  # (L, Np/G, 8, G)
    d_tables = _bwd_call(gpacked, pts_b, idx, res, L, T, interpret)
    # d_x: zeros by design (documented in the module docstring)
    return d_tables, jnp.zeros((N, 3), jnp.float32)


_encode_cell_pallas.defvjp(_encode_fwd_rule, _encode_bwd_rule)


def encode_cell_with_grad(params, cfg: HashGridConfig, x: jnp.ndarray,
                          level_mask=None, interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(..., 3) in [0,1] -> (feats (..., L*F), dfeats (..., L*F, 3)) through
    the Pallas kernel.  CPU callers use hashgrid.hashgrid_encode_cell."""
    assert cfg.n_features_per_level == 2, "cell layout requires F=2"
    shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    feats, dfeats = _encode_cell_pallas(params["tables"], xf, cfg, interpret)
    if level_mask is not None:
        m = jnp.repeat(level_mask, 2)  # (L*F,)
        feats = feats * m[None, :]
        dfeats = dfeats * m[None, :, None]
    return (feats.reshape(shape + (cfg.out_dim,)),
            dfeats.reshape(shape + (cfg.out_dim, 3)))


# The kernel's whole-output can be STACK-allocated in scoped VMEM by the
# compiler (the known scheduling-hostage behavior PERF.md documents for the
# rasterizer's accumulator): jits that trace this kernel must raise the
# scoped-vmem limit.  CPU backends reject TPU-specific options, so gate.
SCOPED_VMEM_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "112640"}


def tpu_jit(fn, **kw):
    """jax.jit with the raised scoped-vmem limit on TPU backends (no-op
    options on CPU).  Use for any jit whose trace may reach the cell-layout
    hashgrid kernel."""
    import jax as _jax

    if _jax.default_backend() not in ("cpu",):
        kw.setdefault("compiler_options", SCOPED_VMEM_OPTS)
    return _jax.jit(fn, **kw)
