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
