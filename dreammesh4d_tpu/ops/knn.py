"""K-nearest-neighbor queries (JAX, chunked brute force).

TPU-native replacement for the ``simple-knn`` CUDA extension (``distCUDA2``,
consumed at gaussian_base.py:25,435-439 for init scales) and pytorch3d
``knn_points`` (sugar.py:636, utils/sugar_utils.py:41,248, system/base.py:349).

Strategy: brute-force distance tiles with ``jax.lax.map`` over query chunks —
O(Q·P) FLOPs but fully MXU/VPU-friendly and static-shaped.  The point sets in
this workload are ≤ a few 100k, and the heavy call sites run once (init) or
every few steps (regularizer KNN refresh), so brute force on TPU beats
host-side KD-trees by a wide margin.  ``jax.lax.top_k`` gives the k smallest
via negated distances.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _chunk_dists(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (Qc, P) via the |q|²+|p|²-2qp expansion
    (hits the MXU for the cross term)."""
    q2 = (q * q).sum(-1, keepdims=True)
    p2 = (p * p).sum(-1)[None, :]
    cross = q @ p.T
    return jnp.maximum(q2 + p2 - 2.0 * cross, 0.0)


@partial(jax.jit, static_argnames=("k", "chunk", "exclude_self"))
def knn(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    chunk: int = 1024,
    exclude_self: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Return (sq_dists (Q,k), indices (Q,k)) of the k nearest points.

    ``exclude_self`` masks exact-same-index matches for self-queries
    (queries is points)."""
    Q = queries.shape[0]
    pad = (-Q) % chunk
    q_padded = jnp.concatenate([queries, jnp.zeros((pad, 3), queries.dtype)], 0)
    n_chunks = q_padded.shape[0] // chunk
    q_chunks = q_padded.reshape(n_chunks, chunk, 3)
    base = jnp.arange(n_chunks) * chunk

    def one_chunk(args):
        qc, offset = args
        d = _chunk_dists(qc, points)  # (chunk, P)
        if exclude_self:
            qidx = offset + jnp.arange(chunk)
            pidx = jnp.arange(points.shape[0])
            d = jnp.where(qidx[:, None] == pidx[None, :], jnp.inf, d)
        neg, idx = jax.lax.top_k(-d, k)
        return -neg, idx

    dists, idxs = jax.lax.map(one_chunk, (q_chunks, base))
    dists = dists.reshape(-1, k)[:Q]
    idxs = idxs.reshape(-1, k)[:Q]
    return dists, idxs


def dist_knn3_mean(points: jnp.ndarray, chunk: int = 1024) -> jnp.ndarray:
    """Mean squared distance to the 3 nearest neighbors — behavioural parity
    with simple-knn's ``distCUDA2`` (gaussian_base.py:435-439)."""
    d, _ = knn(points, points, k=3, chunk=chunk, exclude_self=True)
    return d.mean(-1)
