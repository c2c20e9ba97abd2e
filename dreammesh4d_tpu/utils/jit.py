"""jit wrapper with TPU-specific compiler options.

The VMEM-resident rasterizer's (N+1, 16) row table/accumulator pads its 16
columns to 128 lanes under the fixed (8, 128) f32 tiling, so XLA's scoped-vmem
accounting books 8x the actual bytes whenever the buffer lands on the kernel
stack — and WHICH buffers land on the stack flips unpredictably with unrelated
graph changes (the memory-space-assignment pass vs stack placement; see
PERF.md "Tried and rejected").  Raising ``xla_tpu_scoped_vmem_limit_kib`` so a
stack placement always fits makes every training-step compile robust to that
flip (physical VMEM usage is identical either way) and unblocks compiling a
second rasterizer variant next to the UNet (``guidance_render_size: 256``).

Use :func:`tpu_jit` instead of ``jax.jit`` for step functions that contain
the Pallas rasterizer.  On non-TPU backends (CPU tests) the option is not a
valid compile option and is omitted.
"""

from __future__ import annotations

import functools

import jax

SCOPED_VMEM_LIMIT_KIB = "112640"  # 110 MiB of the 128 MiB physical VMEM


def _is_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # noqa: BLE001 — backend probing must never break import
        return False


def tpu_jit(fun=None, **jit_kwargs):
    """``jax.jit`` with the raised scoped-vmem limit on TPU backends."""
    if fun is None:
        return functools.partial(tpu_jit, **jit_kwargs)
    if _is_tpu():
        jit_kwargs.setdefault(
            "compiler_options",
            {"xla_tpu_scoped_vmem_limit_kib": SCOPED_VMEM_LIMIT_KIB},
        )
    return jax.jit(fun, **jit_kwargs)
