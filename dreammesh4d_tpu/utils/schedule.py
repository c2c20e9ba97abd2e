"""Step-scheduled scalar hyperparameters.

``C(value, epoch, step)`` re-implements the reference schedule semantics
(threestudio/utils/misc.py:66-101): any scalar hyperparameter may instead be a
list ``[start_step, start_value, end_value, end_step]`` (3-element form gets a
leading 0; >=6-element form chains segments ``[s0, v0, v1, e1, v2, e2, ...]``)
interpolated linearly or exponentially.  An integer ``end_step`` interpolates
over global steps; a float interpolates over epochs.

These are evaluated host-side (Python) per step and fed into the jitted train
step as scalars — the jitted computation itself stays schedule-free.

Also provides jnp-traceable variants (``C_jax``) for use *inside* a jitted
step when a schedule must be a function of a traced step counter.
"""

from __future__ import annotations

import math
from typing import Any, Union

Scalar = Union[int, float]


def _normalize(value: list) -> list:
    if len(value) == 3:
        value = [0] + list(value)
    return list(value)


def C(value: Any, epoch: int = 0, global_step: int = 0, interpolation: str = "linear") -> float:
    """Evaluate a scheduled scalar at (epoch, global_step)."""
    if isinstance(value, (int, float)):
        return value
    value = _normalize(list(value))
    if len(value) >= 6:
        select_i = 3
        for i in range(3, len(value) - 2, 2):
            if global_step >= value[i]:
                select_i = i + 2
        if select_i != 3:
            start_value, start_step = value[select_i - 3], value[select_i - 2]
        else:
            start_step, start_value = value[:2]
        end_value, end_step = value[select_i - 1], value[select_i]
        value = [start_step, start_value, end_value, end_step]
    if len(value) != 4:
        raise ValueError(f"Schedule list must have 3, 4 or >=6 elements, got {value}")
    start_step, start_value, end_value, end_step = value
    current = epoch if isinstance(end_step, float) else global_step
    t = max(min(1.0, (current - start_step) / (end_step - start_step)), 0.0)
    if interpolation == "linear":
        return start_value + (end_value - start_value) * t
    if interpolation == "exp":
        return math.exp(math.log(start_value) * (1 - t) + math.log(end_value) * t)
    raise ValueError(f"Unknown interpolation {interpolation!r} (linear|exp)")


def C_max(value: Any) -> float:
    """Max value a schedule can attain (reference config.py C_max, used by
    ``cmaxgt0`` resolvers to gate data loading on loss weights)."""
    if isinstance(value, (int, float)):
        return value
    value = _normalize(list(value))
    # values sit at odd positions after normalization: [s0, v0, v1, e1, ...]
    vals = [value[1]] + [value[i] for i in range(2, len(value), 2)]
    return max(vals)


def C_jax(value: Any, global_step, interpolation: str = "linear"):
    """Traceable schedule evaluation on a jnp step counter (linear segments,
    integer steps only).  Returns a jnp scalar; usable inside jit."""
    import jax.numpy as jnp

    if isinstance(value, (int, float)):
        return jnp.asarray(value, jnp.float32)
    value = _normalize(list(value))
    segs = []
    if len(value) >= 6:
        # decompose chained form into 4-element segments
        s0, v0 = value[0], value[1]
        rest = value[2:]
        prev_s, prev_v = s0, v0
        for i in range(0, len(rest), 2):
            v1, e1 = rest[i], rest[i + 1]
            segs.append((prev_s, prev_v, v1, e1))
            prev_s, prev_v = e1, v1
    else:
        segs.append(tuple(value))
    step = jnp.asarray(global_step, jnp.float32)
    out = jnp.asarray(segs[0][1], jnp.float32)
    for (ss, sv, ev, es) in segs:
        t = jnp.clip((step - ss) / max(es - ss, 1e-8), 0.0, 1.0)
        if interpolation == "linear":
            seg_val = sv + (ev - sv) * t
        elif interpolation == "exp":
            seg_val = jnp.exp(math.log(sv) * (1 - t) + math.log(ev) * t)
        else:
            raise ValueError(interpolation)
        out = jnp.where(step >= ss, seg_val, out)
    return out
