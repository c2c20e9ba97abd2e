"""Device mesh + sharding helpers.

TPU-native replacement for the reference's only multi-device strategy
(Lightning DDP / NCCL all-reduce, launch.py:228-235): a ``jax.sharding.Mesh``
with named axes and NamedShardings.  The per-scene optimization replicates
parameters and shards the *view batch* (data axis) — gradients are combined by
XLA-inserted collectives riding ICI, not an explicit backend.  The diffusion
UNet (when sharded) adds a ``model`` axis for tensor parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = np.asarray(devices[:n])
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch/view) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array leaf of a camera/view batch with its leading dim
    sharded over ``axis`` (leading dims must divide the axis size), leaving
    scalars replicated."""
    ds = data_sharding(mesh, axis)
    rep = replicated(mesh)
    ax_size = mesh.shape[axis]

    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] % ax_size == 0:
            return jax.device_put(x, ds)
        return jax.device_put(x, rep)

    return jax.tree.map(place, batch)


def replicate_pytree(tree, mesh: Mesh):
    rep = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)
