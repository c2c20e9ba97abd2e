"""Optimizer construction: per-parameter-group Adam with C()-scheduled LRs.

Replaces the reference's geometry-owned ``torch.optim.Adam`` with named param
groups + manual ``update_learning_rate`` exp-interpolation
(custom/threestudio-dreammesh4d/geometry/sugar.py:329-416) by a single
``optax.multi_transform``: each SuGaRParams field gets its own Adam chain with
an optax schedule evaluating the same ``C(value, step, interpolation='exp')``
semantics.  ``merge`` composes extra transforms for system-level nets
(background, deformation net) like ``merge_optimizer`` (sugar.py:406-416).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..utils.schedule import C_jax


def c_schedule(value: Any, scale: float = 1.0, interpolation: str = "exp"):
    """optax schedule evaluating C(value, step) (exp-interp like
    update_learning_rate, sugar.py:387-404)."""

    def sched(step):
        return C_jax(value, step, interpolation=interpolation) * scale

    return sched


def adam_group(lr_value: Any, scale: float = 1.0, eps: float = 1e-15,
               b1: float = 0.9, b2: float = 0.999,
               interpolation: str = "exp") -> optax.GradientTransformation:
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_learning_rate(c_schedule(lr_value, scale, interpolation)),
    )


def sugar_optimizer(
    position_lr: Any = 0.00048,
    scaling_lr: Any = 0.005,
    feature_lr: Any = 0.001,
    opacity_lr: Any = 0.02,
    rotation_lr: Any = 0.001,
    spatial_lr_scale: float = 1.0,
    eps: float = 1e-15,
) -> optax.GradientTransformation:
    """Parity with SuGaRModel.training_setup (sugar.py:329-385): group LRs
    points/scales/quaternions/f_dc/f_rest(=feature/20)/opacities."""
    transforms = {
        "points": adam_group(position_lr, spatial_lr_scale, eps),
        "log_scales": adam_group(scaling_lr, 1.0, eps),
        "complex_rot": adam_group(rotation_lr, 1.0, eps),
        "sh_dc": adam_group(feature_lr, 1.0, eps),
        "sh_rest": adam_group(feature_lr, 1.0 / 20.0, eps),
        "density_logits": adam_group(opacity_lr, 1.0, eps),
    }

    def label_fn(params):
        return type(params)(**{f: f for f in params._fields})

    return optax.multi_transform(transforms, label_fn)


def merged_optimizer(param_labels, transforms: Dict[str, optax.GradientTransformation]):
    """Generic multi-transform for merged (geometry + system nets) training
    states; ``param_labels`` is a pytree of the same structure as params with
    string labels."""
    return optax.multi_transform(transforms, param_labels)
