"""NaN-free numeric helpers shared across the compute paths.

The recurring trap: ``x / (‖x‖ + ε)`` is value-safe but its GRADIENT is NaN at
x = 0 (d‖x‖/dx = x/‖x‖ = 0/0), and exactly-zero vectors do occur — empty-ray
normal sums underflow, splatted background normals, zero-init deformation
rotations.  All normalizations in gradient paths must go through these.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_normalize(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """L2 normalize with finite gradients everywhere (rsqrt(‖x‖²+ε))."""
    return x * jax.lax.rsqrt((x * x).sum(-1, keepdims=True) + eps)


def safe_norm(x: jnp.ndarray, eps: float = 1e-12, axis=-1, keepdims: bool = False) -> jnp.ndarray:
    """‖x‖ with a finite gradient at 0: sqrt(‖x‖² + ε)."""
    return jnp.sqrt((x * x).sum(axis=axis, keepdims=keepdims) + eps)
