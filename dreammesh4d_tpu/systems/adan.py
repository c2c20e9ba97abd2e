"""Adan optimizer (Adaptive Nesterov Momentum) as an optax transformation.

Parity with the reference's custom optimizer (threestudio/systems/
optimizers.py, 315 LoC torch implementation; selectable through the config
``optimizer.name: Adan``).  Reference update rule (Xie et al. 2022):

    m_k = (1-β1) m_{k-1} + β1 g_k                     (EMA of grads)
    v_k = (1-β2) v_{k-1} + β2 (g_k - g_{k-1})         (EMA of grad diffs)
    n_k = (1-β3) n_{k-1} + β3 (g_k + (1-β2)(g_k - g_{k-1}))²
    θ_{k+1} = θ_k - η (m_k + (1-β2) v_k) / (√n_k + ε), then weight decay.

(The torch reference stores betas as (0.98, 0.92, 0.99) acting as 1-β here;
we follow the paper's convention with defaults matching the reference.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class AdanState(NamedTuple):
    count: jnp.ndarray
    m: optax.Updates
    v: optax.Updates
    n: optax.Updates
    prev_grad: optax.Updates


def adan(
    learning_rate: float = 1e-3,
    b1: float = 0.98,
    b2: float = 0.92,
    b3: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """b1/b2/b3 follow the reference betas (optimizers.py defaults)."""

    def init(params):
        z = jax.tree.map(jnp.zeros_like, params)
        return AdanState(jnp.zeros((), jnp.int32), z, z, z, z)

    def update(grads, state: AdanState, params=None):
        count = state.count + 1
        first = state.count == 0
        diff = jax.tree.map(
            lambda g, pg: jnp.where(first, 0.0, g - pg), grads, state.prev_grad
        )
        # reference convention (optimizers.py): ema.mul_(1-β).add_(x, alpha=β)
        m = jax.tree.map(lambda m_, g: (1 - b1) * m_ + b1 * g, state.m, grads)
        v = jax.tree.map(lambda v_, d: (1 - b2) * v_ + b2 * d, state.v, diff)
        n = jax.tree.map(
            lambda n_, g, d: (1 - b3) * n_ + b3 * (g + (1 - b2) * d) ** 2,
            state.n, grads, diff,
        )
        cf = count.astype(jnp.float32)
        c1 = 1 - (1 - b1) ** cf
        c2 = 1 - (1 - b2) ** cf
        c3 = 1 - (1 - b3) ** cf

        def upd(m_, v_, n_, p):
            step = (m_ / c1 + (1 - b2) * v_ / c2) / (jnp.sqrt(n_ / c3) + eps)
            out = -learning_rate * step
            if weight_decay > 0 and p is not None:
                out = (out - learning_rate * weight_decay * p) / (1 + learning_rate * weight_decay)
            return out

        if params is None:
            updates = jax.tree.map(lambda m_, v_, n_: upd(m_, v_, n_, None), m, v, n)
        else:
            updates = jax.tree.map(upd, m, v, n, params)
        return updates, AdanState(count, m, v, n, grads)

    return optax.GradientTransformation(init, update)
