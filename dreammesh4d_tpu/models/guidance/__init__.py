"""Diffusion guidance (Zero123 SDS)."""

from . import zero123  # noqa: F401
