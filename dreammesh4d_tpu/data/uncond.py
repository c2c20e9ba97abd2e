"""Random-camera sampling (host-side numpy) + GS camera batch assembly.

Behavioural parity with threestudio/data/uncond.py:27-518 (the
``random-camera-datamodule``): spherical cameras with

- elevation: 50/50 mix of uniform-in-angle and uniform-on-sphere sampling
  (uncond.py:147-172),
- azimuth: optionally batch-stratified (uncond.py:176-191),
- distance/fovy uniform in range; optional camera/center/up perturbations;
- light positions via the ``dreamfusion`` strategy (uncond.py:251-296);
- progressive view widening (uncond.py:122-141) via ``update(step)``;
- deterministic n-view orbits for val/test (uncond.py:347-467).

Sampling runs on host numpy (it is control flow, not compute) and feeds the
jitted step with stacked camera transforms (CameraBatch) + ray bundles.
"""

from __future__ import annotations

import bisect
import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..models.renderers.sugar_rasterizer import CameraBatch
from ..ops import cameras as cam_ops
from ..utils.schedule import C


@dataclass
class RandomCameraConfig:
    # height/width/batch_size may be lists paired with resolution_milestones
    # (reference trains the static stage 64²→128²→256² with batch 8/4/2,
    # configs/stable-zero123.yaml:19-22 + uncond.py:116-141)
    height: Any = 512
    width: Any = 512
    batch_size: Any = 4
    resolution_milestones: Tuple[int, ...] = ()
    eval_height: int = 512
    eval_width: int = 512
    eval_batch_size: int = 1
    elevation_range: Tuple[float, float] = (-10.0, 80.0)
    azimuth_range: Tuple[float, float] = (-180.0, 180.0)
    camera_distance_range: Tuple[float, float] = (3.8, 3.8)
    fovy_range: Tuple[float, float] = (20.0, 20.0)
    camera_perturb: float = 0.0
    center_perturb: float = 0.0
    up_perturb: float = 0.0
    light_position_perturb: float = 1.0
    light_distance_range: Tuple[float, float] = (7.5, 10.0)
    light_sample_strategy: str = "dreamfusion"
    batch_uniform_azimuth: bool = False
    progressive_until: int = 0
    eval_elevation_deg: float = 5.0
    eval_camera_distance: float = 3.8
    eval_fovy_deg: float = 20.0
    n_val_views: int = 30
    n_test_views: int = 120
    rays_d_normalize: bool = False
    znear: float = 0.01
    zfar: float = 100.0


def camera_batch_from_c2w(c2w: np.ndarray, fovx: np.ndarray, fovy: np.ndarray,
                          znear: float = 0.01, zfar: float = 100.0) -> CameraBatch:
    """Stack GS camera transforms for a batch of OpenGL c2w matrices."""
    wv, fp, cc = [], [], []
    for i in range(len(c2w)):
        info = cam_ops.get_cam_info_gaussian(jnp.asarray(c2w[i]), float(fovx[i]), float(fovy[i]), znear, zfar)
        wv.append(info.world_view_transform)
        fp.append(info.full_proj_transform)
        cc.append(info.camera_center)
    return CameraBatch(jnp.stack(wv), jnp.stack(fp), jnp.stack(cc))




@partial(jax.jit, static_argnames=("H", "W", "znear", "zfar", "normalize"))
def assemble_camera_batch(positions, center, up, fovy,
                          H: int, W: int, znear: float, zfar: float,
                          normalize: bool):
    """ONE jitted program building everything device-side from the sampled
    camera scalars: GS camera transforms (vmapped get_cam_info_gaussian),
    per-view pixel-center ray directions from the per-view focal, and world
    rays.  The per-camera Python loops this replaces issued ~10 tiny device
    dispatches per view — under a tunneled TPU each dispatch is a network
    roundtrip, making host batch assembly slower than the train step."""
    c2w = cam_ops.look_at_c2w(positions, center, up)  # (B,4,4)
    info = jax.vmap(
        lambda m, f: cam_ops.get_cam_info_gaussian(m, f, f, znear, zfar)
    )(c2w, fovy)
    cam_batch = CameraBatch(info.world_view_transform, info.full_proj_transform,
                            info.camera_center)
    focal = 0.5 * H / jnp.tan(0.5 * fovy)  # (B,)
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + 0.5,
        jnp.arange(H, dtype=jnp.float32) + 0.5,
        indexing="xy",
    )
    f = focal[:, None, None]
    dirs = jnp.stack(
        [
            jnp.broadcast_to(i[None], (fovy.shape[0], H, W)) / f - (W / 2.0) / f,
            -(jnp.broadcast_to(j[None], (fovy.shape[0], H, W)) / f - (H / 2.0) / f),
            -jnp.ones((fovy.shape[0], H, W), jnp.float32),
        ],
        -1,
    )  # (B,H,W,3) == get_ray_directions(H, W, focal_b) per view
    rays_o, rays_d = cam_ops.get_rays(dirs, c2w, keepdim=True, normalize=normalize)
    return cam_batch, c2w, rays_o, rays_d


@ds.register("random-camera-datamodule")
class RandomCameraSampler:
    def __init__(self, cfg: RandomCameraConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.elevation_range = list(cfg.elevation_range)
        self.azimuth_range = list(cfg.azimuth_range)
        # resolution milestone schedule (uncond.py:116-141): list-valued
        # height/width/batch_size switch at the milestone steps
        self.heights = cfg.height if isinstance(cfg.height, (list, tuple)) else [cfg.height]
        self.widths = cfg.width if isinstance(cfg.width, (list, tuple)) else [cfg.width]
        self.batch_sizes = (cfg.batch_size if isinstance(cfg.batch_size, (list, tuple))
                            else [cfg.batch_size])
        n = max(len(self.heights), len(self.batch_sizes))
        self.heights = list(self.heights) + [self.heights[-1]] * (n - len(self.heights))
        self.widths = list(self.widths) + [self.widths[-1]] * (n - len(self.widths))
        self.batch_sizes = list(self.batch_sizes) + [self.batch_sizes[-1]] * (
            n - len(self.batch_sizes))
        self.milestones = [-1] + list(cfg.resolution_milestones)[: n - 1]
        self.height = int(self.heights[0])
        self.width = int(self.widths[0])
        self.batch_size = int(self.batch_sizes[0])

    def update(self, step: int):
        """Progressive view widening (uncond.py:122-141) + resolution
        milestones (uncond.py:116-141)."""
        cfg = self.cfg
        i = bisect.bisect_right(self.milestones, step) - 1
        self.height = int(self.heights[i])
        self.width = int(self.widths[i])
        self.batch_size = int(self.batch_sizes[i])
        if cfg.progressive_until > 0:
            r = min(1.0, step / cfg.progressive_until)
            self.elevation_range = [
                (1 - r) * cfg.eval_elevation_deg + r * cfg.elevation_range[0],
                (1 - r) * cfg.eval_elevation_deg + r * cfg.elevation_range[1],
            ]
            self.azimuth_range = [
                (1 - r) * 0.0 + r * cfg.azimuth_range[0],
                (1 - r) * 0.0 + r * cfg.azimuth_range[1],
            ]

    def sample(self, batch_size: Optional[int] = None) -> dict:
        cfg = self.cfg
        B = batch_size or self.batch_size
        rng = self.rng

        # elevation: 50/50 uniform-angle / uniform-on-sphere (uncond.py:147-172)
        if rng.rand() < 0.5:
            elevation_deg = (
                rng.rand(B) * (self.elevation_range[1] - self.elevation_range[0])
                + self.elevation_range[0]
            )
        else:
            elo = math.sin(math.radians(self.elevation_range[0]))
            ehi = math.sin(math.radians(self.elevation_range[1]))
            elevation_deg = np.degrees(np.arcsin(rng.rand(B) * (ehi - elo) + elo))

        # azimuth: stratified option (uncond.py:176-191)
        if cfg.batch_uniform_azimuth:
            span = (self.azimuth_range[1] - self.azimuth_range[0]) / B
            azimuth_deg = self.azimuth_range[0] + (np.arange(B) + rng.rand(B)) * span
        else:
            azimuth_deg = (
                rng.rand(B) * (self.azimuth_range[1] - self.azimuth_range[0])
                + self.azimuth_range[0]
            )

        distances = (
            rng.rand(B) * (cfg.camera_distance_range[1] - cfg.camera_distance_range[0])
            + cfg.camera_distance_range[0]
        )
        fovy_deg = rng.rand(B) * (cfg.fovy_range[1] - cfg.fovy_range[0]) + cfg.fovy_range[0]
        fovy = np.radians(fovy_deg)

        positions = np.stack(
            [
                distances * np.cos(np.radians(elevation_deg)) * np.cos(np.radians(azimuth_deg)),
                distances * np.cos(np.radians(elevation_deg)) * np.sin(np.radians(azimuth_deg)),
                distances * np.sin(np.radians(elevation_deg)),
            ],
            -1,
        ).astype(np.float32)

        center = np.zeros_like(positions) + rng.randn(B, 3).astype(np.float32) * cfg.center_perturb
        up = np.asarray([[0, 0, 1.0]], np.float32).repeat(B, 0) + rng.randn(B, 3).astype(np.float32) * cfg.up_perturb
        positions = positions + (rng.rand(B, 3).astype(np.float32) * 2 - 1) * cfg.camera_perturb

        # light sampling, dreamfusion strategy (uncond.py:251-296)
        light_distances = (
            rng.rand(B) * (cfg.light_distance_range[1] - cfg.light_distance_range[0])
            + cfg.light_distance_range[0]
        )
        local_z = positions / np.linalg.norm(positions, axis=-1, keepdims=True)
        light_direction = local_z + rng.randn(B, 3) * cfg.light_position_perturb
        light_direction = light_direction / np.linalg.norm(light_direction, axis=-1, keepdims=True)
        light_positions = (light_direction * light_distances[:, None]).astype(np.float32)

        cam_batch, c2w, rays_o, rays_d = assemble_camera_batch(
            jnp.asarray(positions), jnp.asarray(center), jnp.asarray(up),
            jnp.asarray(fovy, jnp.float32), self.height, self.width,
            cfg.znear, cfg.zfar, cfg.rays_d_normalize,
        )

        return {
            "rand_cameras": cam_batch,
            "c2w": c2w,
            "rays_o": rays_o,
            "rays_d": rays_d,
            "elevation": jnp.asarray(elevation_deg, jnp.float32),
            "azimuth": jnp.asarray(azimuth_deg, jnp.float32),
            "camera_distances": jnp.asarray(distances, jnp.float32),
            "light_positions": jnp.asarray(light_positions),
            "fovy": jnp.asarray(fovy, jnp.float32),
            "height": self.height,
            "width": self.width,
        }

    def mask_ray_directions(self, H: int, W: int, s_H: int, s_W: int) -> np.ndarray:
        """Flat pixel indices of an (s_H, s_W) stride grid with a random
        offset over the (H, W) image — the ``uncond_eff`` efficiency mask
        (threestudio/utils/ops.py:220-246): train at high resolution while
        marching only s_H*s_W rays, denser toward the inner 3/4 crop."""
        rng = self.rng
        xs = np.linspace(0, 0.75 * W, s_W).astype(np.int64)
        ys = np.linspace(0, 0.75 * H, s_H).astype(np.int64)
        off_x = rng.randint(0, W // 8 + 1)
        off_y = rng.randint(0, H // 8 + 1)
        gx, gy = np.meshgrid(xs + off_x, ys + off_y, indexing="xy")
        return (gy * W + gx).reshape(-1)

    def sample_efficient(self, sample_height: int, sample_width: int,
                         batch_size: Optional[int] = None) -> dict:
        """``uncond_eff``-style batch (threestudio/data/uncond_eff.py:66-180):
        cameras at full (height, width) resolution, but rays subsampled to a
        (sample_height, sample_width) offset grid — `ray_indices` maps them
        back into the full image for supervision crops."""
        batch = self.sample(batch_size)
        H, W = self.height, self.width
        idx = self.mask_ray_directions(H, W, sample_height, sample_width)
        B = batch["rays_o"].shape[0]
        ro = batch["rays_o"].reshape(B, H * W, 3)[:, idx].reshape(
            B, sample_height, sample_width, 3)
        rd = batch["rays_d"].reshape(B, H * W, 3)[:, idx].reshape(
            B, sample_height, sample_width, 3)
        batch.update({
            "rays_o": ro, "rays_d": rd,
            "ray_indices": jnp.asarray(idx, jnp.int32),
            "sample_height": sample_height, "sample_width": sample_width,
        })
        return batch

    def orbit(self, n_views: Optional[int] = None, height: Optional[int] = None,
              width: Optional[int] = None) -> dict:
        """Deterministic evaluation orbit (uncond.py:347-467)."""
        cfg = self.cfg
        n = n_views or cfg.n_val_views
        H = height or cfg.eval_height
        W = width or cfg.eval_width
        azimuth_deg = np.linspace(0, 360.0, n + 1)[:n]
        elevation_deg = np.full(n, cfg.eval_elevation_deg)
        distances = np.full(n, cfg.eval_camera_distance)
        fovy = np.radians(np.full(n, cfg.eval_fovy_deg))
        positions = np.stack(
            [
                distances * np.cos(np.radians(elevation_deg)) * np.cos(np.radians(azimuth_deg)),
                distances * np.cos(np.radians(elevation_deg)) * np.sin(np.radians(azimuth_deg)),
                distances * np.sin(np.radians(elevation_deg)),
            ],
            -1,
        ).astype(np.float32)
        c2w = np.asarray(cam_ops.look_at_c2w(jnp.asarray(positions)))
        cam_batch = camera_batch_from_c2w(c2w, fovy, fovy, cfg.znear, cfg.zfar)
        return {
            "rand_cameras": cam_batch,
            "c2w": jnp.asarray(c2w),
            "elevation": jnp.asarray(elevation_deg, jnp.float32),
            "azimuth": jnp.asarray(azimuth_deg, jnp.float32),
            "camera_distances": jnp.asarray(distances, jnp.float32),
            "fovy": jnp.asarray(fovy, jnp.float32),
            "height": H,
            "width": W,
        }
