"""TPU-native differentiable 3D Gaussian splatting."""

from .binning import TILE, TileAssignment, bin_gaussians, num_tiles
from .blend import BlendOutput, blend_tiles
from .projection import ProjectedGaussians, compute_cov3d, project_gaussians
from .rasterize import (
    RasterizeOutput,
    RasterizerConfig,
    rasterize,
    render_with_screen_grads,
)

__all__ = [
    "TILE",
    "TileAssignment",
    "bin_gaussians",
    "num_tiles",
    "BlendOutput",
    "blend_tiles",
    "ProjectedGaussians",
    "compute_cov3d",
    "project_gaussians",
    "RasterizeOutput",
    "RasterizerConfig",
    "rasterize",
    "render_with_screen_grads",
]
