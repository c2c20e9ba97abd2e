from . import co3d, image, multiview, temporal_image, uncond  # noqa: F401
