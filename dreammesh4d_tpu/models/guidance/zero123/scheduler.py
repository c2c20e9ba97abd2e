"""Diffusion noise schedule + DDIM stepping (replaces diffusers DDIMScheduler
usage in the reference guidance, stable_zero123_guidance.py / ddpm.py).

Zero123 trains with a scaled-linear (sqrt-space) beta schedule: 1000 steps,
linear_start 0.00085, linear_end 0.012
(load/zero123/sd-objaverse-finetune-c_concat-256.yaml:5-13).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class DiffusionSchedule(NamedTuple):
    betas: jnp.ndarray  # (T,)
    alphas_cumprod: jnp.ndarray  # (T,)
    num_train_timesteps: int


def make_schedule(num_train_timesteps: int = 1000, linear_start: float = 0.00085,
                  linear_end: float = 0.012) -> DiffusionSchedule:
    betas = (
        np.linspace(linear_start**0.5, linear_end**0.5, num_train_timesteps, dtype=np.float64)
        ** 2
    )
    alphas = 1.0 - betas
    acp = np.cumprod(alphas)
    return DiffusionSchedule(
        jnp.asarray(betas, jnp.float32), jnp.asarray(acp, jnp.float32), num_train_timesteps
    )


def add_noise(sched: DiffusionSchedule, x0: jnp.ndarray, noise: jnp.ndarray,
              t: jnp.ndarray) -> jnp.ndarray:
    """q(x_t | x_0): sqrt(ᾱ_t) x0 + sqrt(1−ᾱ_t) ε  (t: (B,) int)."""
    a = sched.alphas_cumprod[t]
    shape = (-1,) + (1,) * (x0.ndim - 1)
    return jnp.sqrt(a).reshape(shape) * x0 + jnp.sqrt(1.0 - a).reshape(shape) * noise


def ddim_step(sched: DiffusionSchedule, x_t: jnp.ndarray, eps: jnp.ndarray,
              t: jnp.ndarray, t_prev: jnp.ndarray, eta: float = 0.0,
              noise: jnp.ndarray | None = None) -> jnp.ndarray:
    """Deterministic (eta=0) DDIM update x_t -> x_{t_prev}."""
    shape = (-1,) + (1,) * (x_t.ndim - 1)
    a_t = sched.alphas_cumprod[t].reshape(shape)
    a_prev = jnp.where(t_prev >= 0, sched.alphas_cumprod[jnp.maximum(t_prev, 0)], 1.0).reshape(shape)
    x0_pred = (x_t - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    sigma = eta * jnp.sqrt((1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev))
    dir_xt = jnp.sqrt(jnp.maximum(1 - a_prev - sigma**2, 0.0)) * eps
    x_prev = jnp.sqrt(a_prev) * x0_pred + dir_xt
    if eta > 0 and noise is not None:
        x_prev = x_prev + sigma * noise
    return x_prev
