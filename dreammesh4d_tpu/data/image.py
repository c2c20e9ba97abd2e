"""Single-image dataset: one reference RGBA image + fixed camera.

Parity with threestudio/data/image.py:32-352 (``single-image-datamodule``):
loads ``<name>_rgba.png`` (optionally ``_depth.png`` / ``_normal.png``,
image.py:191-225), white-composites, fixed camera from default
elevation/azimuth/distance/fovy, pairs every train batch with a nested
random-camera batch, and switches the reference-view resolution at
``resolution_milestones`` (image.py:117-126,232).
"""

from __future__ import annotations

import bisect
import math
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..ops import cameras as cam_ops
from .uncond import RandomCameraConfig, RandomCameraSampler, camera_batch_from_c2w


@dataclass
class SingleImageConfig:
    image_path: str = ""
    # int or list (paired with resolution_milestones; reference trains the
    # ref view 128->256->512, configs/stable-zero123.yaml:9-12)
    height: Any = 512
    width: Any = 512
    resolution_milestones: Tuple[int, ...] = ()
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


def _load_gray(path: str, height: int, width: int) -> np.ndarray:
    """(H, W, 1) float in [0,1] (ref depth map, image.py:191-206)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    img = cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)
    if img.ndim == 3:
        img = img[..., 0]
    return (img.astype(np.float32) / 255.0)[..., None]


def _load_rgb(path: str, height: int, width: int) -> np.ndarray:
    """(H, W, 3) float in [0,1] (ref normal map, image.py:210-225)."""
    import cv2

    img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_UNCHANGED)[..., :3], cv2.COLOR_BGR2RGB)
    img = cv2.resize(img, (width, height), interpolation=cv2.INTER_AREA)
    return img.astype(np.float32) / 255.0


@ds.register("single-image-datamodule")
class SingleImageDataModule:
    def __init__(self, cfg: SingleImageConfig, seed: int = 0):
        self.cfg = cfg
        self.random_sampler = (
            RandomCameraSampler(cfg.random_camera, seed) if cfg.use_random_camera else None
        )
        self.heights = cfg.height if isinstance(cfg.height, (list, tuple)) else [cfg.height]
        self.widths = cfg.width if isinstance(cfg.width, (list, tuple)) else [cfg.width]
        self.milestones = [-1] + list(cfg.resolution_milestones)[: len(self.heights) - 1]
        self.height = int(self.heights[0])
        self.width = int(self.widths[0])
        self._ref_cache = {}

    def ref_camera_c2w(self) -> np.ndarray:
        cfg = self.cfg
        return cam_ops.make_c2w_numpy(
            cfg.default_elevation_deg, cfg.default_azimuth_deg, cfg.default_camera_distance
        )

    def update(self, step: int) -> None:
        i = bisect.bisect_right(self.milestones, step) - 1
        self.height = int(self.heights[i])
        self.width = int(self.widths[min(i, len(self.widths) - 1)])

    def ref_batch(self) -> dict:
        """The fixed reference-view batch at the CURRENT milestone resolution
        (cached per resolution)."""
        key = (self.height, self.width)
        if key in self._ref_cache:
            return self._ref_cache[key]
        cfg = self.cfg
        H, W = self.height, self.width
        rgb, mask = load_rgba(cfg.image_path, H, W)
        fovy = math.radians(cfg.default_fovy_deg)
        c2w = self.ref_camera_c2w()[None]
        cam = camera_batch_from_c2w(c2w, np.asarray([fovy]), np.asarray([fovy]),
                                    cfg.znear, cfg.zfar)
        directions = cam_ops.get_ray_directions(
            H, W, 0.5 * H / math.tan(0.5 * fovy)
        )
        rays_o, rays_d = cam_ops.get_rays(directions, jnp.asarray(c2w[0]), keepdim=True)
        batch = {
            "ref_cameras": cam,
            "ref_rgb": jnp.asarray(rgb)[None],
            "ref_mask": jnp.asarray(mask)[None],
            "ref_rays_o": rays_o[None],
            "ref_rays_d": rays_d[None],
            "ref_elevation": jnp.asarray([cfg.default_elevation_deg], jnp.float32),
            "ref_azimuth": jnp.asarray([cfg.default_azimuth_deg], jnp.float32),
            "ref_distance": jnp.asarray([cfg.default_camera_distance], jnp.float32),
        }
        if cfg.requires_depth:
            depth_path = cfg.image_path.replace("_rgba.png", "_depth.png")
            if not os.path.exists(depth_path):
                raise FileNotFoundError(
                    f"requires_depth set but {depth_path} is missing")
            batch["ref_depth"] = jnp.asarray(_load_gray(depth_path, H, W))[None]
        if cfg.requires_normal:
            normal_path = cfg.image_path.replace("_rgba.png", "_normal.png")
            if not os.path.exists(normal_path):
                raise FileNotFoundError(
                    f"requires_normal set but {normal_path} is missing")
            batch["ref_normal"] = jnp.asarray(_load_rgb(normal_path, H, W))[None]
        self._ref_cache[key] = batch
        return batch

    def train_batch(self, step: int = 0) -> dict:
        self.update(step)
        batch = dict(self.ref_batch())
        if self.random_sampler is not None:
            self.random_sampler.update(step)
            batch.update(self.random_sampler.sample())
        return batch
