"""Parameter sharding rules for the Zero123 diffusion stack (tensor parallel).

SURVEY §2g: the ~860M-param UNet is the only component worth sharding — the
per-scene splatting state replicates.  Strategy: annotate WEIGHT shardings
over a ``model`` mesh axis and let pjit/XLA insert the activation collectives
(all-gather / reduce-scatter ride ICI):

- dense kernels (in, out): shard the OUTPUT dim (column parallel — covers
  attention q/k/v projections and the GEGLU fan-out) unless the input dim is
  larger and divisible (row parallel: to_out / fc2);
- conv kernels (kh, kw, in, out): shard output channels;
- norms / biases / embeddings: replicated.

Dims that don't divide the axis stay replicated (correct, just not sharded).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# attention/FFN layer names with a FIXED parallel role (Megatron layout):
# column-parallel (shard output dim = shard attention heads / GEGLU fan-out)
# feeds row-parallel (shard input dim; XLA inserts ONE psum per attn/ff block
# instead of the all-gathers a size heuristic can produce mid-block).
_COLUMN_PARALLEL = ("to_q", "to_k", "to_v", "proj_in")  # attn heads / ff fan-out
_ROW_PARALLEL = ("to_out", "proj_out")  # contracting dim sharded -> psum


def _spec_for(path: str, x, axis_size: int) -> P:
    shape = getattr(x, "shape", ())
    parts = path.split("/")
    if len(shape) == 2:  # dense kernel (in, out)
        n_in, n_out = shape
        name = parts[-2] if len(parts) >= 2 else ""
        # head-aware fixed roles inside transformer blocks (attn*/ff scopes)
        in_block = any(p.startswith("attn") or p == "ff" for p in parts)
        if in_block and name in _COLUMN_PARALLEL and n_out % axis_size == 0:
            return P(None, "model")
        if in_block and name in _ROW_PARALLEL and n_in % axis_size == 0:
            return P("model", None)
        if n_out % axis_size == 0 and n_out >= axis_size * 64:
            return P(None, "model")
        if n_in % axis_size == 0 and n_in >= axis_size * 64:
            return P("model", None)
    if len(shape) == 4:  # conv kernel (kh, kw, in, out)
        if shape[3] % axis_size == 0 and shape[3] >= axis_size * 64:
            return P(None, None, None, "model")
    return P()


def zero123_param_shardings(params: Any, mesh: Mesh, axis: str = "model"):
    """NamedSharding pytree for a guidance params tree."""
    axis_size = mesh.shape[axis]

    def walk(path, x):
        keys = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)
        return NamedSharding(mesh, _spec_for(keys, x, axis_size))

    return jax.tree_util.tree_map_with_path(walk, params)


def shard_guidance_params(params: Any, mesh: Mesh, axis: str = "model"):
    shardings = zero123_param_shardings(params, mesh, axis)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
