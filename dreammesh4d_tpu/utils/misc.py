"""Misc utilities (reference threestudio/utils/misc.py parity).

Rank/device helpers map to JAX process/device concepts; ``cleanup`` maps to
JAX's buffer donation + live-array deletion (no CUDA cache to empty);
``chunk_batch`` and ``get_activation`` match the reference ops surface
(threestudio/utils/ops.py:78-177).
"""

from __future__ import annotations

import gc
import os
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def get_rank() -> int:
    """Process index (reference reads RANK/LOCAL_RANK/SLURM env,
    misc.py:18-26)."""
    for v in ("RANK", "LOCAL_RANK", "SLURM_PROCID", "JAX_PROCESS_INDEX"):
        if v in os.environ:
            return int(os.environ[v])
    try:
        return jax.process_index()
    except Exception:  # noqa: BLE001
        return 0


def get_device():
    return jax.devices()[0]


def barrier() -> None:
    """Cross-process barrier (reference torch.distributed.barrier)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("barrier")


def broadcast(x, root: int = 0):
    """Host-0 broadcast (reference misc.py:119-135)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.broadcast_one_to_all(x)
    return x


def cleanup() -> None:
    """gc + drop donated/live buffers (reference: empty_cache + tcnn free)."""
    gc.collect()
    try:
        jax.clear_caches()
    except Exception:  # noqa: BLE001
        pass


def get_activation(name: Optional[str]) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation lookup (reference ops.py:78-110): supports scale-style
    names like 'scale_-11.0' and 'shifted_softplus', 'trunc_exp' etc."""
    if name is None or name == "none":
        return lambda x: x
    name_l = str(name).lower()
    if name_l.startswith("scale_"):
        scale = float(name_l.replace("scale_", ""))
        return lambda x: x * scale
    if name_l.startswith("clamp_"):
        lo, hi = (float(v) for v in name_l.replace("clamp_", "").split("_"))
        return lambda x: jnp.clip(x, lo, hi)
    table = {
        "lin2srgb": lambda x: jnp.where(
            x > 0.0031308, jnp.power(jnp.clip(x, 0.0031308, None), 1 / 2.4) * 1.055 - 0.055,
            12.92 * x,
        ),
        "exp": jnp.exp,
        "trunc_exp": lambda x: jnp.exp(jnp.clip(x, -15.0, 15.0)),
        "shifted_trunc_exp": lambda x: jnp.exp(jnp.clip(x - 1.0, -15.0, 15.0)),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "softplus": jax.nn.softplus,
        "shifted_softplus": lambda x: jax.nn.softplus(x - 1.0),
        "relu": jax.nn.relu,
        "silu": jax.nn.silu,
    }
    if name_l in table:
        return table[name_l]
    raise ValueError(f"Unknown activation {name!r}")


def chunk_batch(fn: Callable, chunk_size: int, *args: Any, **kwargs: Any):
    """Apply ``fn`` over leading-dim chunks of array args and concatenate
    outputs (reference ops.py:113-177) — eval-time memory control for
    non-jitted paths (inside jit use lax.map instead)."""
    if chunk_size <= 0:
        return fn(*args, **kwargs)
    arr_args = [a for a in args if hasattr(a, "shape") and getattr(a, "ndim", 0) > 0]
    if not arr_args:
        return fn(*args, **kwargs)
    B = arr_args[0].shape[0]
    outs = []
    for i in range(0, B, chunk_size):
        chunk_args = [
            a[i: i + chunk_size] if hasattr(a, "shape") and getattr(a, "ndim", 0) > 0 and a.shape[0] == B else a
            for a in args
        ]
        outs.append(fn(*chunk_args, **kwargs))
    first = outs[0]
    if first is None:
        return None
    if isinstance(first, dict):
        return {k: jnp.concatenate([o[k] for o in outs], 0) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(jnp.concatenate([o[j] for o in outs], 0) for j in range(len(first)))
    return jnp.concatenate(outs, 0)


def find_last_path(path: str) -> str:
    from .checkpoint import find_last_path as _flp

    return _flp(path)
