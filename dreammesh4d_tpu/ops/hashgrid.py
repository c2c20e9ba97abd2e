"""Multi-resolution hash-grid encoding (tiny-cuda-nn HashGrid replacement).

TPU-native stand-in for the tcnn encodings consumed by the reference NeRF
geometry (threestudio/models/networks.py:55-66,194-211: HashGrid L16 F2 T2^19
base 16, per-level scale 1.447; ProgressiveBandHashGrid level masking;
composite with raw xyz).  Implementation is pure jnp: per level a feature
table (T, F) gathered at the 8 hashed corners and trilinearly interpolated —
XLA fuses the gathers + lerps; the tables live in HBM and the gathers are the
only memory traffic.

Also provides frequency (NeRF sin/cos) encoding
(threestudio/models/networks.py frequency path).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (1, 2654435761, 805459861)


@dataclass
class HashGridConfig:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.447269237440378
    # progressive band (ProgressiveBandHashGrid, networks.py:122-160)
    progressive: bool = False
    start_level: int = 4
    start_step: int = 0
    update_steps: int = 1000
    # "corner" = instant-NGP corner-shared tables (T, F) — exact reference
    # parameterization (networks.py HashGrid).  "cell" = TPU-first
    # cell-packed tables (T, 8F): one row access per (point, level) — see
    # the cell section below + ops/hashgrid_pallas.py.  With layout=cell,
    # log2_hashmap_size counts CELL rows (shipped configs use 16: 2^16·16
    # params/level == the NGP default 2^19·2).
    layout: str = "corner"

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self):
        return [
            int(np.floor(self.base_resolution * self.per_level_scale**l))
            for l in range(self.n_levels)
        ]


def init_hashgrid(cfg: HashGridConfig, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    T = 1 << cfg.log2_hashmap_size
    tables = jax.random.uniform(
        rng, (cfg.n_levels, T, cfg.n_features_per_level), jnp.float32, -1e-4, 1e-4
    )
    return {"tables": tables}


def _hash_corner(ix: jnp.ndarray, iy: jnp.ndarray, iz: jnp.ndarray, res: int,
                 table_size: int) -> jnp.ndarray:
    n_dense = (res + 1) ** 3
    if n_dense <= table_size:
        return ((ix * (res + 1) + iy) * (res + 1) + iz).astype(jnp.uint32)
    # spatial hash with uint32 wrap-around multiplies (instant-ngp primes)
    h = (
        (ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
        ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
        ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    )
    # table_size is a power of two -> mask instead of mod
    return h & jnp.uint32(table_size - 1)


def hashgrid_encode(params: Dict[str, jnp.ndarray], cfg: HashGridConfig,
                    x: jnp.ndarray, level_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """x: (..., 3) in [0, 1].  Returns (..., L*F).  ``level_mask`` (L,)
    multiplies per-level features (progressive training)."""
    tables = params["tables"]
    T = tables.shape[1]
    F = tables.shape[2]
    shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    # PLANAR feature chains: the natural formulation (row-gather (N, F=2)
    # per corner, accumulate (N, F)) makes every gather/multiply temp an
    # f32[N,2]{1,0:T(8,128)} buffer — the 2-wide minor dim pads to 128 lanes
    # (64x expansion, 256 MB at N=2^19 sample points) and the renderer's
    # remat'd march loop keeps ~20 such clones live at once: observed 5+ GB
    # of HLO temps OOMing the v5e HBM on the stage-1 NeRF step.  Keeping each
    # feature as its own (N,) chain (1-D gathers from the flattened (T*F,)
    # table, planar weight multiplies) removes ALL lane padding from the hot
    # loop; only the final (N, L*F=32) stack pads (32 -> 128 = 4x), and that
    # buffer is exactly what the MLP consumes.
    tables_flat = tables.reshape(tables.shape[0], T * F)
    cols = []  # L*F planar (N,) chains, level-major / feature-minor
    for l, res in enumerate(cfg.level_resolutions()):
        xs = xf * res  # [0, res]
        x0 = jnp.clip(jnp.floor(xs), 0, res - 1).astype(jnp.uint32)
        f = xs - x0.astype(jnp.float32)
        tbl = tables_flat[l]
        accs = [jnp.zeros((), jnp.float32)] * F
        for corner in range(8):
            dx, dy, dz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            ix = x0[:, 0] + dx
            iy = x0[:, 1] + dy
            iz = x0[:, 2] + dz
            idx = _hash_corner(ix, iy, iz, res, T)
            w = (
                (f[:, 0] if dx else 1 - f[:, 0])
                * (f[:, 1] if dy else 1 - f[:, 1])
                * (f[:, 2] if dz else 1 - f[:, 2])
            )
            base = idx.astype(jnp.int32) * F
            for j in range(F):
                accs[j] = accs[j] + tbl[base + j] * w
        if level_mask is not None:
            accs = [a * level_mask[l] for a in accs]
        cols.extend(accs)
    out = jnp.stack(cols, -1)  # (N, L*F)
    return out.reshape(shape + (cfg.out_dim,))


def progressive_level_mask(cfg: HashGridConfig, step: int) -> np.ndarray:
    """ProgressiveBandHashGrid mask (networks.py:140-160): start_level levels
    enabled, +1 every update_steps after start_step."""
    if not cfg.progressive:
        return np.ones(cfg.n_levels, np.float32)
    current = min(
        cfg.start_level + max(step - cfg.start_step, 0) // cfg.update_steps,
        cfg.n_levels,
    )
    mask = np.zeros(cfg.n_levels, np.float32)
    mask[:current] = 1.0
    return mask


def frequency_encode(x: jnp.ndarray, n_frequencies: int = 6) -> jnp.ndarray:
    """NeRF positional encoding: [sin(2^k πx), cos(2^k πx)]."""
    freqs = 2.0 ** jnp.arange(n_frequencies, dtype=jnp.float32) * jnp.pi
    ang = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
    return enc.reshape(x.shape[:-1] + (-1,))


# ---------------------------------------------------------------------------
# CELL-PACKED layout ("cell"): TPU-first redesign of the hash encoding.
#
# Round-5 profiling (PERF.md "stage-1 NeRF"): XLA's TPU gather/scatter is
# LATENCY-BOUND PER INDEX (~4-10 ms per 524k-index op regardless of width),
# and the NGP corner layout issues 8 corner gathers x L levels x fwd/bwd/
# normals ≈ 384 index ops per step — 30+ s/step at stage-1 sizes.  The cell
# layout stores ALL EIGHT corner feature vectors of a cell contiguously in
# one (8·F,)-row, so each (point, level) costs ONE row access:
#
#   tables_cell: (L, T_cells, 8*F); index = dense cell id (res^3 <= T) or
#   spatial hash of the cell coordinate; trilinear weights applied across
#   the row's 8 corner slots.
#
# Param count per level is preserved by construction (T_cells * 8F ==
# T_corner * F when log2_hashmap_size drops by 3... the shipped configs use
# log2=16 cells vs the NGP 2^19 corners: 2^16*16 == 2^19*2 == 2^20).  The
# trade: corners are NOT shared between adjacent cells, so the field is
# C0-discontinuous at cell faces at the level's resolution — the same class
# of pseudo-random seam NGP's hash collisions already introduce at hashed
# levels, and at hashed-level cell sizes (< 1/100 scene units) it is
# sub-pixel at the shipped render resolutions.  Dense (coarse) levels keep
# exact dense indexing.
#
# The fast path on TPU is ops/hashgrid_pallas.py (VMEM-resident rows, SMEM-
# indexed reads, in-kernel RMW gradient accumulation — the rasterizer's
# proven machinery); this XLA twin defines the semantics and serves CPU.
# ---------------------------------------------------------------------------


def init_hashgrid_cell(cfg: HashGridConfig, rng: jax.Array) -> Dict[str, jnp.ndarray]:
    T = 1 << cfg.log2_hashmap_size
    tables = jax.random.uniform(
        rng, (cfg.n_levels, T, 8 * cfg.n_features_per_level), jnp.float32,
        -1e-4, 1e-4)
    return {"tables": tables}


def _cell_index(x0: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """x0: (..., 3) int cell coords in [0, res-1] -> (...,) int32 index."""
    n_dense = res ** 3
    ix, iy, iz = x0[..., 0], x0[..., 1], x0[..., 2]
    if n_dense <= table_size:
        return ((ix * res + iy) * res + iz).astype(jnp.int32)
    h = (
        (ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0]))
        ^ (iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
        ^ (iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def cell_indices(cfg: HashGridConfig, x: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) in [0,1] -> (L, N) int32 row indices (precomputed host of the
    Pallas kernel's SMEM windows; cheap planar uint32 math)."""
    T = 1 << cfg.log2_hashmap_size
    xf = x.reshape(-1, 3)
    out = []
    for res in cfg.level_resolutions():
        x0 = jnp.clip(jnp.floor(xf * res), 0, res - 1).astype(jnp.int32)
        out.append(_cell_index(x0, res, T))
    return jnp.stack(out, 0)


def _corner_weights(u: jnp.ndarray):
    """u: (..., 3) fractional coords -> list of 8 (…,) trilinear weights and
    their d/du per axis, corner order c = dx | dy<<1 | dz<<2 (matching the
    row slot order)."""
    w, dw = [], []
    for c in range(8):
        dx, dy, dz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        fx = u[..., 0] if dx else 1.0 - u[..., 0]
        fy = u[..., 1] if dy else 1.0 - u[..., 1]
        fz = u[..., 2] if dz else 1.0 - u[..., 2]
        sx = 1.0 if dx else -1.0
        sy = 1.0 if dy else -1.0
        sz = 1.0 if dz else -1.0
        w.append(fx * fy * fz)
        dw.append((sx * fy * fz, fx * sy * fz, fx * fy * sz))
    return w, dw


def hashgrid_encode_cell(params, cfg: HashGridConfig, x: jnp.ndarray,
                         level_mask=None, with_grad: bool = False):
    """Cell-layout encode, XLA twin of the Pallas kernel.

    Returns feats (..., L*F), and with ``with_grad`` also dfeats
    (..., L*F, 3) = d feats / d x (x in the encode's [0,1] coords — callers
    scale by their contraction Jacobian).  Gradients w.r.t. ``x`` through
    THIS function's outputs flow normally under XLA; the Pallas kernel's
    custom VJP returns exact table gradients and first-order-exact d_x (see
    hashgrid_pallas)."""
    tables = params["tables"]
    F = cfg.n_features_per_level
    T = tables.shape[1]
    shape = x.shape[:-1]
    xf = x.reshape(-1, 3)
    N = xf.shape[0]
    feats_cols = []
    grad_cols = []
    for l, res in enumerate(cfg.level_resolutions()):
        xs = xf * res
        x0 = jnp.clip(jnp.floor(xs), 0, res - 1).astype(jnp.int32)
        u = xs - x0.astype(jnp.float32)
        rows = tables[l][_cell_index(x0, res, T)]  # (N, 8F)
        w, dw = _corner_weights(u)
        m = 1.0 if level_mask is None else level_mask[l]
        for f in range(F):
            acc = 0.0
            for c in range(8):
                acc = acc + w[c] * rows[:, c * F + f]
            feats_cols.append(acc * m)
        if with_grad:
            for f in range(F):
                for d in range(3):
                    g = 0.0
                    for c in range(8):
                        g = g + dw[c][d] * rows[:, c * F + f]
                    grad_cols.append(g * (res * 1.0) * m)
    feats = jnp.stack(feats_cols, -1).reshape(shape + (cfg.out_dim,))
    if not with_grad:
        return feats
    # grad_cols order: level-major, then f, then d -> (N, L*F, 3)
    dfeats = jnp.stack(grad_cols, -1).reshape(-1, cfg.n_levels * F, 3)
    return feats, dfeats.reshape(shape + (cfg.out_dim, 3))
