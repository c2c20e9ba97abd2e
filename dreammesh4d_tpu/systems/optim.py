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


# ---------------------------------------------------------------------------
# Generic LR-scheduler parsing (parity with the reference's parse_scheduler,
# threestudio/systems/utils.py:50-104).  The reference wraps torch.optim
# lr_scheduler classes (StepLR / MultiStepLR / ExponentialLR / LinearLR /
# ConstantLR / CosineAnnealingLR) plus the SequentialLR / ChainedScheduler
# combinators.  Torch schedulers multiply the optimizer's base LR by a
# step-indexed factor; here each scheduler becomes a pure
# ``factor(step) -> float`` closure and the whole config becomes one
# ``optax.scale_by_schedule`` appended after the LR — identical semantics
# (lr_t = base_lr * factor_t) with no stateful scheduler object.
# ``interval: epoch`` is treated as ``step``: the rebuilt trainer is
# step-driven (one optimization step per batch, no epoch boundary), matching
# how every shipped threestudio config actually progresses.
# ---------------------------------------------------------------------------


def scheduler_factor_fn(config: Any):
    """Build ``factor(step)->float`` from a reference scheduler config.

    ``config`` is a dict(-like) with ``name``, optional ``args``, and for the
    combinators ``schedulers`` (list of sub-configs) and ``milestones``.
    Supported names mirror what reference configs reach through
    ``get_scheduler`` (systems/utils.py:12-16): StepLR, MultiStepLR,
    ExponentialLR, LinearLR, ConstantLR, CosineAnnealingLR, LambdaLR
    (factor given as a ``C()``-style schedule list under args.lr_lambda),
    plus SequentialLR and ChainedScheduler."""
    import math
    from bisect import bisect_right

    name = config["name"] if isinstance(config, dict) else config.name
    get = (lambda k, d=None: config.get(k, d)) if isinstance(config, dict) \
        else (lambda k, d=None: getattr(config, k, d))
    args = dict(get("args", {}) or {})

    if name in ("SequentialLR", "Sequential"):
        subs = [scheduler_factor_fn(c) for c in get("schedulers")]
        miles = [int(m) for m in get("milestones")]

        def factor(step):
            i = bisect_right(miles, step)
            # torch SequentialLR: each scheduler restarts its local counter
            # when it becomes active (milestone m_i -> local step = step-m_i)
            start = 0 if i == 0 else miles[i - 1]
            return subs[i](step - start)

        return factor

    if name == "ChainedScheduler":
        subs = [scheduler_factor_fn(c) for c in get("schedulers")]
        return lambda step: math.prod(f(step) for f in subs)

    if name == "StepLR":
        size, gamma = int(args["step_size"]), float(args.get("gamma", 0.1))
        return lambda step: gamma ** (step // size)

    if name == "MultiStepLR":
        miles = sorted(int(m) for m in args["milestones"])
        gamma = float(args.get("gamma", 0.1))
        return lambda step: gamma ** bisect_right(miles, step)

    if name == "ExponentialLR":
        gamma = float(args["gamma"])
        return lambda step: gamma ** step

    if name == "LinearLR":
        s = float(args.get("start_factor", 1.0 / 3.0))
        e = float(args.get("end_factor", 1.0))
        n = int(args.get("total_iters", 5))
        return lambda step: s + (e - s) * min(max(step, 0), n) / n

    if name == "ConstantLR":
        f = float(args.get("factor", 1.0 / 3.0))
        n = int(args.get("total_iters", 5))
        return lambda step: f if step < n else 1.0

    if name == "CosineAnnealingLR":
        t_max = int(args["T_max"])
        eta_min_f = float(args.get("eta_min_factor", args.get("eta_min", 0.0)))
        return lambda step: eta_min_f + (1.0 - eta_min_f) * 0.5 * (
            1.0 + math.cos(math.pi * min(step, t_max) / t_max))

    if name == "LambdaLR":
        sched = args["lr_lambda"]  # C()-style schedule list or scalar
        from ..utils.schedule import C
        return lambda step: float(C(sched, 0, step))

    raise NotImplementedError(f"scheduler {name!r} (reference get_scheduler "
                              "parity: torch.optim.lr_scheduler names)")


def parse_scheduler(config: Any) -> optax.GradientTransformation:
    """Reference ``parse_scheduler`` -> one optax transform to chain AFTER the
    optimizer: post-LR update scaling == torch's per-step LR factor
    (lr_t = base_lr * factor_t).  Uses the jnp-traceable factor so it works
    with a traced step count inside a jitted train step."""
    interval = (config.get("interval", "step") if isinstance(config, dict)
                else getattr(config, "interval", "step"))
    assert interval in ("epoch", "step"), interval
    return optax.scale_by_schedule(jnp_factor_fn(config))


def with_scheduler(optimizer: optax.GradientTransformation,
                   scheduler_cfg: Any) -> optax.GradientTransformation:
    """``optimizer`` then LR-factor scaling; no-op when cfg is falsy."""
    if not scheduler_cfg:
        return optimizer
    return optax.chain(optimizer, parse_scheduler(scheduler_cfg))


def jnp_factor_fn(config: Any):
    """Traceable (jnp) twin of ``scheduler_factor_fn`` — same semantics,
    expressed with jnp primitives so the returned closure works on a traced
    step inside a jitted train step."""
    name = config["name"] if isinstance(config, dict) else config.name
    get = (lambda k, d=None: config.get(k, d)) if isinstance(config, dict) \
        else (lambda k, d=None: getattr(config, k, d))
    args = dict(get("args", {}) or {})

    if name in ("SequentialLR", "Sequential"):
        subs = [jnp_factor_fn(c) for c in get("schedulers")]
        miles = [int(m) for m in get("milestones")]

        def factor(step):
            step = jnp.asarray(step)
            starts = [0] + miles
            vals = [f(step - s) for f, s in zip(subs, starts)]
            out = vals[0]
            for m, v in zip(miles, vals[1:]):
                out = jnp.where(step >= m, v, out)
            return out

        return factor

    if name == "ChainedScheduler":
        subs = [jnp_factor_fn(c) for c in get("schedulers")]

        def factor(step):
            out = jnp.asarray(1.0)
            for f in subs:
                out = out * f(step)
            return out

        return factor

    if name == "StepLR":
        size, gamma = int(args["step_size"]), float(args.get("gamma", 0.1))
        return lambda step: gamma ** jnp.floor_divide(step, size).astype(jnp.float32)

    if name == "MultiStepLR":
        miles = jnp.asarray(sorted(int(m) for m in args["milestones"]))
        gamma = float(args.get("gamma", 0.1))
        return lambda step: gamma ** jnp.sum(jnp.asarray(step) >= miles).astype(jnp.float32)

    if name == "ExponentialLR":
        gamma = float(args["gamma"])
        return lambda step: gamma ** jnp.asarray(step, jnp.float32)

    if name == "LinearLR":
        s = float(args.get("start_factor", 1.0 / 3.0))
        e = float(args.get("end_factor", 1.0))
        n = int(args.get("total_iters", 5))
        return lambda step: s + (e - s) * jnp.clip(
            jnp.asarray(step, jnp.float32), 0, n) / n

    if name == "ConstantLR":
        f = float(args.get("factor", 1.0 / 3.0))
        n = int(args.get("total_iters", 5))
        return lambda step: jnp.where(jnp.asarray(step) < n, f, 1.0)

    if name == "CosineAnnealingLR":
        t_max = int(args["T_max"])
        eta = float(args.get("eta_min_factor", args.get("eta_min", 0.0)))
        return lambda step: eta + (1.0 - eta) * 0.5 * (1.0 + jnp.cos(
            jnp.pi * jnp.clip(jnp.asarray(step, jnp.float32), 0, t_max) / t_max))

    if name == "LambdaLR":
        sched = args["lr_lambda"]
        return lambda step: C_jax(sched, step)

    raise NotImplementedError(f"scheduler {name!r}")
