"""Single-image dataset: one reference RGBA image + fixed camera.

Parity with threestudio/data/image.py:32-352 (``single-image-datamodule``):
loads ``<name>_rgba.png`` (optionally ``_depth.png`` / ``_normal.png``),
white-composites, fixed camera from default elevation/azimuth/distance/fovy,
and pairs every train batch with a nested random-camera batch.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..ops import cameras as cam_ops
from .uncond import RandomCameraConfig, RandomCameraSampler, camera_batch_from_c2w


@dataclass
class SingleImageConfig:
    image_path: str = ""
    height: int = 512
    width: int = 512
    default_elevation_deg: float = 5.0
    default_azimuth_deg: float = 0.0
    default_camera_distance: float = 3.8
    default_fovy_deg: float = 20.0
    requires_depth: bool = False
    requires_normal: bool = False
    use_random_camera: bool = True
    random_camera: RandomCameraConfig = field(default_factory=RandomCameraConfig)
    znear: float = 0.01
    zfar: float = 100.0


def load_rgba(path: str, height: int, width: int) -> Tuple[np.ndarray, np.ndarray]:
    """Load an RGBA image -> (rgb white-composited [H,W,3], mask [H,W,1]),
    both float32 in [0,1] (parity with image.py:176-206)."""
    import cv2

    img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_UNCHANGED), cv2.COLOR_BGRA2RGBA)
    img = cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA).astype(np.float32) / 255.0
    mask = img[..., 3:4]
    rgb = img[..., :3] * mask + (1.0 - mask)
    return rgb, (mask > 0.5).astype(np.float32)


@ds.register("single-image-datamodule")
class SingleImageDataModule:
    def __init__(self, cfg: SingleImageConfig, seed: int = 0):
        self.cfg = cfg
        self.random_sampler = (
            RandomCameraSampler(cfg.random_camera, seed) if cfg.use_random_camera else None
        )
        self._ref_batch = None

    def ref_camera_c2w(self) -> np.ndarray:
        cfg = self.cfg
        return cam_ops.make_c2w_numpy(
            cfg.default_elevation_deg, cfg.default_azimuth_deg, cfg.default_camera_distance
        )

    def ref_batch(self) -> dict:
        """The fixed reference-view batch (loaded once)."""
        if self._ref_batch is not None:
            return self._ref_batch
        cfg = self.cfg
        rgb, mask = load_rgba(cfg.image_path, cfg.height, cfg.width)
        fovy = math.radians(cfg.default_fovy_deg)
        c2w = self.ref_camera_c2w()[None]
        cam = camera_batch_from_c2w(c2w, np.asarray([fovy]), np.asarray([fovy]),
                                    cfg.znear, cfg.zfar)
        directions = cam_ops.get_ray_directions(
            cfg.height, cfg.width, 0.5 * cfg.height / math.tan(0.5 * fovy)
        )
        rays_o, rays_d = cam_ops.get_rays(directions, jnp.asarray(c2w[0]), keepdim=True)
        self._ref_batch = {
            "ref_cameras": cam,
            "ref_rgb": jnp.asarray(rgb)[None],
            "ref_mask": jnp.asarray(mask)[None],
            "ref_rays_o": rays_o[None],
            "ref_rays_d": rays_d[None],
            "ref_elevation": jnp.asarray([cfg.default_elevation_deg], jnp.float32),
            "ref_azimuth": jnp.asarray([cfg.default_azimuth_deg], jnp.float32),
            "ref_distance": jnp.asarray([cfg.default_camera_distance], jnp.float32),
        }
        return self._ref_batch

    def train_batch(self, step: int = 0) -> dict:
        batch = dict(self.ref_batch())
        if self.random_sampler is not None:
            self.random_sampler.update(step)
            batch.update(self.random_sampler.sample())
        return batch
