"""Temporal (video) dataset for the dynamic stage.

Parity with custom/threestudio-dreammesh4d/data/temporal_image.py:40-546
(``temporal-image-datamodule``):

- loads Consistent4D-format frame sequences: ``{i:03d}_rgba.png`` or
  ``{i}.png`` under ``video_frames_dir`` (temporal_image.py:256-286),
  white-composited RGBA with masks;
- fixed reference camera from default elevation/azimuth/distance/fovy;
- train batches sample ``num_frames`` random frame indices with timestamps
  ``linspace(0, 1, L+2)[1:-1]`` (temporal_image.py:291-323), paired with a
  frame-aligned random-camera batch;
- val/test: 5 fixed azimuths [0, −75, 15, 105, 195] × all timestamps
  (temporal_image.py:345-479); predict: ``n_predict_views`` arbitrary views at
  high res (RandomCameraArbiraryDataset, temporal_image.py:502-522).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..ops import cameras as cam_ops
from .image import load_rgba
from .uncond import RandomCameraConfig, RandomCameraSampler, camera_batch_from_c2w

EVAL_AZIMUTHS = [0.0, -75.0, 15.0, 105.0, 195.0]  # temporal_image.py:367-370


@dataclass
class TemporalImageConfig:
    video_frames_dir: str = ""
    num_frames: int = 4  # frames sampled per train batch
    video_length: int = 32
    # int or list (paired with resolution_milestones); with a scalar height the
    # milestones are warned about and ignored, exactly like the reference
    # (temporal_image.py:128-137 inherits image.py milestone semantics)
    height: object = 512
    width: object = 512
    resolution_milestones: Tuple[int, ...] = ()
    # declared in the reference config surface (temporal_image.py:45) but never
    # consumed by any reference code path — accepted here for config parity;
    # timestamps are always the normalized linspace(0,1,L+2)[1:-1]
    norm_timestamp: bool = False
    # per-frame {i:03d}_depth.png / {i:03d}_normal.png supervision
    # (reference load_single_frame, temporal_image.py:215-250)
    requires_depth: bool = False
    requires_normal: bool = False
    default_elevation_deg: float = 5.0
    default_azimuth_deg: float = 0.0
    default_camera_distance: float = 3.8
    default_fovy_deg: float = 20.0
    use_random_camera: bool = True
    random_camera: RandomCameraConfig = field(default_factory=RandomCameraConfig)
    znear: float = 0.01
    zfar: float = 100.0
    n_predict_views: int = 120
    predict_height: int = 1024
    predict_width: int = 1024


def frame_timestamps(video_length: int) -> np.ndarray:
    """linspace(0,1,L+2)[1:-1] (temporal_image.py:291-297)."""
    return np.linspace(0.0, 1.0, video_length + 2)[1:-1].astype(np.float32)


def find_frame_paths(frames_dir: str, length: Optional[int] = None) -> List[str]:
    paths = []
    i = 0
    while True:
        cands = [
            os.path.join(frames_dir, f"{i:03d}_rgba.png"),
            os.path.join(frames_dir, f"{i}.png"),
            os.path.join(frames_dir, f"{i:03d}.png"),
        ]
        hit = next((c for c in cands if os.path.exists(c)), None)
        if hit is None:
            break
        paths.append(hit)
        i += 1
        if length is not None and i >= length:
            break
    return paths


@ds.register("temporal-image-datamodule")
class TemporalImageDataModule:
    def __init__(self, cfg: TemporalImageConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self.random_sampler = (
            RandomCameraSampler(cfg.random_camera, seed) if cfg.use_random_camera else None
        )
        # milestone machinery (reference temporal_image.py:120-137 via image.py)
        self.heights = list(cfg.height) if isinstance(cfg.height, (list, tuple)) else [cfg.height]
        self.widths = list(cfg.width) if isinstance(cfg.width, (list, tuple)) else [cfg.width]
        if len(self.heights) == 1 and cfg.resolution_milestones:
            ds.warn("Ignoring resolution_milestones since height and width are not changing")
            self.milestones = [-1]
        else:
            self.milestones = [-1] + list(cfg.resolution_milestones)[: len(self.heights) - 1]
        self.height = int(self.heights[0])
        self.width = int(self.widths[0])
        self._pinned = False
        self._frames_cache: dict = {}
        self._ref_cam = None

    def update(self, step: int) -> None:
        """Milestone resolution switch (reference update_step,
        temporal_image.py:326-339): frames reload at the new size lazily via
        the per-resolution cache."""
        import bisect

        if self._pinned:
            return
        i = bisect.bisect_right(self.milestones, step) - 1
        self.height = int(self.heights[i])
        self.width = int(self.widths[min(i, len(self.widths) - 1)])

    def set_final_resolution(self) -> None:
        """Pin the datamodule to the last milestone resolution.  The GS-stage
        experiments bake video frames + raster shapes into ONE jitted step
        (assembly.py), so they render at the final size for the whole run —
        the same documented deviation as build_raster_config's list handling."""
        self.height = int(self.heights[-1])
        self.width = int(self.widths[-1])
        self._pinned = True

    # ---------------- loading ----------------
    def load_frames(self):
        return self.frames_at(self.height, self.width)

    def frames_at(self, height: int, width: int):
        """Frame bank at an EXPLICIT resolution (cached) — per-milestone
        compiled steps each close over their own size's bank."""
        key = (height, width)
        if key in self._frames_cache:
            return self._frames_cache[key]
        cfg = self.cfg
        paths = find_frame_paths(cfg.video_frames_dir, cfg.video_length)
        if not paths:
            raise FileNotFoundError(f"No frames found under {cfg.video_frames_dir}")
        rgbs, masks = [], []
        for p in paths:
            rgb, mask = load_rgba(p, height, width)
            rgbs.append(rgb)
            masks.append(mask)
        self._frames_cache[key] = (np.stack(rgbs), np.stack(masks))
        return self._frames_cache[key]

    def _load_sidecar(self, suffix: str, loader, height: int, width: int):
        """Per-frame sidecar maps ({i:03d}_depth.png / _normal.png), hard
        error when missing (reference asserts, temporal_image.py:218,239)."""
        paths = find_frame_paths(self.cfg.video_frames_dir, self.cfg.video_length)
        out = []
        for p in paths:
            sp = p.replace("_rgba.png", f"_{suffix}.png")
            if sp == p:  # {i}.png naming: append the suffix before .png
                sp = p[:-4] + f"_{suffix}.png"
            if not os.path.exists(sp):
                raise FileNotFoundError(f"requires_{suffix} set but {sp} is missing")
            out.append(loader(sp, height, width))
        return np.stack(out)

    def load_depths(self, height=None, width=None):
        from .image import _load_gray

        h = int(height if height is not None else self.height)
        w = int(width if width is not None else self.width)
        key = ("depth", h, w)
        if key not in self._frames_cache:
            self._frames_cache[key] = self._load_sidecar("depth", _load_gray, h, w)
        return self._frames_cache[key]

    def load_normals(self, height=None, width=None):
        from .image import _load_rgb

        h = int(height if height is not None else self.height)
        w = int(width if width is not None else self.width)
        key = ("normal", h, w)
        if key not in self._frames_cache:
            self._frames_cache[key] = self._load_sidecar("normal", _load_rgb, h, w)
        return self._frames_cache[key]

    @property
    def video_length(self) -> int:
        return len(self.load_frames()[0])

    def _ref_camera(self, n: int, height=None, width=None):
        # the reference camera is FIXED — cache per view count (the per-view
        # transform build costs n device dispatches, paid per step otherwise)
        key = (n, height, width)
        cached = getattr(self, "_ref_camera_cache", {})
        if key in cached:
            return cached[key]
        cfg = self.cfg
        fovy = math.radians(cfg.default_fovy_deg)
        c2w = cam_ops.make_c2w_numpy(
            cfg.default_elevation_deg, cfg.default_azimuth_deg, cfg.default_camera_distance
        )[None].repeat(n, 0)
        cam = camera_batch_from_c2w(
            c2w, np.full(n, fovy), np.full(n, fovy), cfg.znear, cfg.zfar
        )
        cached[key] = cam
        self._ref_camera_cache = cached
        return cam

    # ---------------- batches ----------------
    def train_batch(self, step: int = 0) -> dict:
        cfg = self.cfg
        self.update(step)  # applies resolution milestones
        rgbs, masks = self.load_frames()
        L = len(rgbs)
        ts_all = frame_timestamps(L)
        idx = np.sort(self.rng.choice(L, size=min(cfg.num_frames, L), replace=False))
        T = len(idx)

        batch = {
            "frame_indices": jnp.asarray(idx, jnp.int32),
            "timestamps": jnp.asarray(ts_all[idx]),
            "ref_cameras": self._ref_camera(T),
            # numpy (lazy): consumers that keep the whole video device-resident
            # (sugar_4dgen video_frames) never pay this host->device transfer
            "ref_rgb": rgbs[idx],
            "ref_mask": masks[idx],
            "ref_elevation": jnp.full((T,), cfg.default_elevation_deg, jnp.float32),
            "ref_azimuth": jnp.full((T,), cfg.default_azimuth_deg, jnp.float32),
            "ref_distance": jnp.full((T,), cfg.default_camera_distance, jnp.float32),
        }
        if cfg.requires_depth:
            batch["ref_depth"] = self.load_depths()[idx]
        if cfg.requires_normal:
            batch["ref_normal"] = self.load_normals()[idx]
        if self.random_sampler is not None:
            self.random_sampler.update(step)
            rand = self.random_sampler.sample(batch_size=T)
            batch.update(rand)
        return batch

    def inter_frame_timestamps(self, num_inter: int, length_inter: float) -> jnp.ndarray:
        """Densely sampled window (sugar_4dgen.py:338-349)."""
        start = self.rng.rand() * (1.0 - length_inter)
        return jnp.asarray(
            np.linspace(start, start + length_inter, num_inter).astype(np.float32)
        )

    def eval_batches(self, height=None, width=None):
        """5 fixed azimuths × all timestamps (one batch per azimuth)."""
        cfg = self.cfg
        H = height or self.height
        W = width or self.width
        L = self.video_length
        ts_all = frame_timestamps(L)
        fovy = math.radians(cfg.default_fovy_deg)
        for az in EVAL_AZIMUTHS:
            c2w = cam_ops.make_c2w_numpy(
                cfg.default_elevation_deg, az, cfg.default_camera_distance
            )[None].repeat(L, 0)
            cams = camera_batch_from_c2w(
                c2w, np.full(L, fovy), np.full(L, fovy), cfg.znear, cfg.zfar
            )
            yield {
                "azimuth": az,
                "cameras": cams,
                "timestamps": jnp.asarray(ts_all),
                "frame_indices": jnp.arange(L, dtype=jnp.int32),
                "height": H,
                "width": W,
            }

    def predict_batch(self):
        """n_predict_views arbitrary orbit views for texture baking."""
        cfg = self.cfg
        n = cfg.n_predict_views
        azimuth = np.linspace(-180, 180, n, endpoint=False)
        elevation = np.full(n, cfg.default_elevation_deg)
        dist = np.full(n, cfg.default_camera_distance)
        fovy = np.full(n, math.radians(cfg.default_fovy_deg))
        pos = np.stack(
            [
                dist * np.cos(np.radians(elevation)) * np.cos(np.radians(azimuth)),
                dist * np.cos(np.radians(elevation)) * np.sin(np.radians(azimuth)),
                dist * np.sin(np.radians(elevation)),
            ],
            -1,
        ).astype(np.float32)
        c2w = np.asarray(cam_ops.look_at_c2w(jnp.asarray(pos)))
        cams = camera_batch_from_c2w(c2w, fovy, fovy, cfg.znear, cfg.zfar)
        return {
            "cameras": cams,
            "c2w": jnp.asarray(c2w),
            "height": cfg.predict_height,
            "width": cfg.predict_width,
            "elevation": jnp.asarray(elevation, jnp.float32),
            "azimuth": jnp.asarray(azimuth, jnp.float32),
        }
