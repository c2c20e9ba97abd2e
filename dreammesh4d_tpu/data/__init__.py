from . import image, multiview, temporal_image, uncond  # noqa: F401
