"""Fixed-mesh geometry (``custom-mesh``) — a user mesh as scene geometry.

Parity with threestudio/models/geometry/custom_mesh.py (~180 lines): loads a
mesh, normalizes it into the scene bbox, and exposes per-point features from
a hash-encoded MLP for texture/material learning on a frozen surface.  The
mesh itself is not optimized (that is what ``sugar``/``dynamic-sugar`` are
for on the DreamMesh4D path)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ...export.mesh_io import MeshData, load_mesh
from ...ops.hashgrid import HashGridConfig, hashgrid_encode, init_hashgrid
from .implicit_volume import _mlp_apply, _mlp_init


@dataclass
class CustomMeshConfig:
    shape_init: str = ""  # mesh path ("mesh:/path/to.obj" accepted too)
    shape_init_params: float = 1.0  # target max half-extent after normalize
    radius: float = 1.0
    n_feature_dims: int = 3
    hashgrid: HashGridConfig = field(default_factory=HashGridConfig)
    n_neurons: int = 64
    n_hidden_layers: int = 1


def load_and_normalize(cfg: CustomMeshConfig) -> MeshData:
    path = cfg.shape_init
    if path.startswith("mesh:"):
        path = path[5:]
    mesh = load_mesh(path)
    v = np.asarray(mesh.v_pos, np.float32)
    center = (v.max(0) + v.min(0)) / 2
    scale = float(np.abs(v - center).max())
    v = (v - center) / max(scale, 1e-8) * cfg.shape_init_params
    return MeshData(v_pos=v, t_pos_idx=mesh.t_pos_idx, v_rgb=mesh.v_rgb)


def init_custom_mesh(cfg: CustomMeshConfig, rng: jax.Array) -> Dict[str, Any]:
    k1, k2 = jax.random.split(rng)
    dims = [cfg.hashgrid.out_dim, cfg.n_neurons]
    dims += [cfg.n_neurons] * (cfg.n_hidden_layers - 1) + [cfg.n_feature_dims]
    return {"encoding": init_hashgrid(cfg.hashgrid, k1), "feature_mlp": _mlp_init(k2, dims)}


def forward_features(params, cfg: CustomMeshConfig, points: jnp.ndarray) -> jnp.ndarray:
    x = (points / cfg.radius + 1.0) / 2.0
    feat = hashgrid_encode(params["encoding"], cfg.hashgrid, x)
    return jax.nn.sigmoid(_mlp_apply(params["feature_mlp"], feat))
