"""Diffusion guidance (Zero123 SDS, Stable Diffusion SDS)."""

from . import stable_diffusion, zero123  # noqa: F401
