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


def _spec_for(path: str, x, axis_size: int) -> P:
    shape = getattr(x, "shape", ())
    if len(shape) == 2:  # dense kernel (in, out)
        n_in, n_out = shape
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
        return NamedSharding(mesh, _spec_for("/".join(str(p) for p in path), x, axis_size))

    return jax.tree_util.tree_map_with_path(walk, params)


def shard_guidance_params(params: Any, mesh: Mesh, axis: str = "model"):
    shardings = zero123_param_shardings(params, mesh, axis)
    return jax.tree.map(lambda x, s: jax.device_put(x, s), params, shardings)
