from . import sugar_rasterizer  # noqa: F401
