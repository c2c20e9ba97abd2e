"""Typed-array aliases + opt-in runtime shape checking.

Parity with the reference typing layer (threestudio/utils/typing.py: jaxtyping
aliases enforced by typeguard when launched with ``--typecheck``,
launch.py:130-133).  Here the aliases are jaxtyping over jax.Array, and
checking is enabled at CALL time (``enable_typecheck()`` — wired to the same
``--typecheck`` CLI flag) so the toggle works regardless of import order,
unlike an import hook.

Usage::

    from dreammesh4d_tpu.utils.typing import Float, shape_checked

    @shape_checked
    def quat_mul(a: Float[Array, "* 4"], b: Float[Array, "* 4"]) -> Float[Array, "* 4"]:
        ...

``shape_checked`` is a no-op passthrough unless typechecking is enabled, so
the annotations cost nothing in production (and nothing under jit tracing
beyond the first call).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Dict, List, Optional, Tuple, Union  # noqa: F401 (re-export)

import jax
from jaxtyping import (  # noqa: F401 (re-export, same names as the reference)
    Bool,
    Float,
    Int,
    Num,
    Shaped,
)

Array = jax.Array

_ENABLED = bool(int(os.environ.get("DREAMMESH4D_TYPECHECK", "0")))


def enable_typecheck(on: bool = True) -> None:
    """Turn runtime shape checking on/off (the ``--typecheck`` flag)."""
    global _ENABLED
    _ENABLED = on


def typecheck_enabled() -> bool:
    return _ENABLED


def shape_checked(fn: Callable) -> Callable:
    """Enforce the function's jaxtyping annotations when checking is enabled.

    The jaxtyped wrapper is built lazily on first checked call so importing
    this module never forces typeguard's machinery into the import path."""
    checked_holder: list = []

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not _ENABLED:
            return fn(*args, **kwargs)
        if not checked_holder:
            import typeguard
            from jaxtyping import jaxtyped

            checked_holder.append(jaxtyped(typechecker=typeguard.typechecked)(fn))
        return checked_holder[0](*args, **kwargs)

    wrapper.__wrapped_unchecked__ = fn
    return wrapper
