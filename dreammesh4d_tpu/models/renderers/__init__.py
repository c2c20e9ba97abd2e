from . import (  # noqa: F401
    gan_volume_renderer,
    mesh_rasterizer,
    nerf_volume_renderer,
    neus_volume_renderer,
    sugar_rasterizer,
)
