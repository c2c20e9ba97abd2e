"""Multiview posed-image dataset (threestudio/data/multiview.py surface).

Loads a NeRF-synthetic-style ``transforms.json`` (frames with file_path +
transform_matrix, camera_angle_x) — the interchange format the reference's
multiview module consumes — and yields camera/image batches for
reconstruction-style training and evaluation orbits.
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..ops import cameras as cam_ops
from .image import load_rgba
from .uncond import camera_batch_from_c2w


@dataclass
class MultiviewConfig:
    dataroot: str = ""
    height: int = 256
    width: int = 256
    batch_size: int = 4
    train_split: str = "train"
    eval_split: str = "val"
    znear: float = 0.01
    zfar: float = 100.0


@ds.register("multiview-camera-datamodule")
class MultiviewDataModule:
    def __init__(self, cfg: MultiviewConfig, seed: int = 0):
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        self._splits = {}

    def _load_split(self, split: str):
        if split in self._splits:
            return self._splits[split]
        cfg = self.cfg
        path = os.path.join(cfg.dataroot, f"transforms_{split}.json")
        if not os.path.exists(path):
            path = os.path.join(cfg.dataroot, "transforms.json")
        with open(path) as f:
            meta = json.load(f)
        fovx = float(meta["camera_angle_x"])
        c2ws, rgbs, masks = [], [], []
        for frame in meta["frames"]:
            fp = frame["file_path"]
            img_path = os.path.join(cfg.dataroot, fp)
            if not os.path.splitext(img_path)[1]:
                img_path += ".png"
            rgb, mask = load_rgba(img_path, cfg.height, cfg.width)
            rgbs.append(rgb)
            masks.append(mask)
            c2ws.append(np.asarray(frame["transform_matrix"], np.float32))
        focal = 0.5 * cfg.width / math.tan(0.5 * fovx)
        fovy = 2 * math.atan(0.5 * cfg.height / focal)
        data = {
            "c2w": np.stack(c2ws),
            "rgb": np.stack(rgbs),
            "mask": np.stack(masks),
            "fovy": fovy,
            "focal": focal,
        }
        self._splits[split] = data
        return data

    def train_batch(self, step: int = 0) -> dict:
        cfg = self.cfg
        data = self._load_split(cfg.train_split)
        n = len(data["c2w"])
        idx = self.rng.choice(n, size=min(cfg.batch_size, n), replace=False)
        c2w = data["c2w"][idx]
        B = len(idx)
        cams = camera_batch_from_c2w(
            c2w, np.full(B, data["fovy"]), np.full(B, data["fovy"]), cfg.znear, cfg.zfar
        )
        dirs = cam_ops.get_ray_directions(cfg.height, cfg.width, data["focal"])
        rays_o, rays_d = cam_ops.get_rays(jnp.asarray(np.stack([np.asarray(dirs)] * B)),
                                          jnp.asarray(c2w), keepdim=True)
        return {
            "index": jnp.asarray(idx, jnp.int32),
            "cameras": cams,
            "c2w": jnp.asarray(c2w),
            "rgb": jnp.asarray(data["rgb"][idx]),
            "mask": jnp.asarray(data["mask"][idx]),
            "rays_o": rays_o,
            "rays_d": rays_d,
            "height": cfg.height,
            "width": cfg.width,
        }

    def eval_batches(self):
        cfg = self.cfg
        data = self._load_split(cfg.eval_split)
        for i in range(len(data["c2w"])):
            c2w = data["c2w"][i: i + 1]
            cams = camera_batch_from_c2w(
                c2w, np.asarray([data["fovy"]]), np.asarray([data["fovy"]]),
                cfg.znear, cfg.zfar,
            )
            yield {
                "cameras": cams,
                "c2w": jnp.asarray(c2w),
                "rgb": jnp.asarray(data["rgb"][i: i + 1]),
                "mask": jnp.asarray(data["mask"][i: i + 1]),
            }
