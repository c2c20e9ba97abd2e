"""Diffusion guidance (Zero123 SDS/VSD, Stable Diffusion SDS/VSD, editing)."""

from . import (  # noqa: F401
    controlnet,
    deep_floyd,
    instructpix2pix,
    stable_diffusion,
    unified,
    vsd,
    zero123,
)
