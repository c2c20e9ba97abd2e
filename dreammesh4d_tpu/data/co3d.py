"""CO3D dataset module (real multi-view captures with masks + depth).

Behavioral port of threestudio/data/co3d.py:192-713 without cv2/PIL/torch:
- parses ``frame_annotations.jgz`` (per-sequence viewpoint R/T, focal,
  principal point, image/mask/depth paths),
- PyTorch3D -> OpenCV camera conversion, v2-mode intrinsic rescaling
  (co3d.py:279-290),
- similarity normalization of the scene from camera poses
  (``similarity_from_cameras``, co3d.py:132-190): align the up axis, center
  on the median nearest point of the center rays, rescale to ``scale_radius``,
- mask-threshold bounding-box crop with context (co3d.py:60-106),
- per-split ray/image/mask batches + the shared random-camera sampler.

TPU notes: everything here is HOST-side numpy preprocessing — images land in
one (N, H, W, C) array, uploaded once and index-gathered in-jit by the
training step (the same device-resident pattern as the temporal module).
Images load via imageio when available, else a minimal PNG reader."""

from __future__ import annotations

import gzip
import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np

import dreammesh4d_tpu as ds

from .uncond import RandomCameraConfig, RandomCameraSampler


@dataclass
class Co3dDataModuleConfig:
    root_dir: str = ""
    batch_size: int = 1
    height: int = 256
    width: int = 256
    cam_scale_factor: float = 0.95
    max_num_frames: int = 300
    v2_mode: bool = True
    use_mask: bool = True
    box_crop: bool = True
    box_crop_mask_thr: float = 0.4
    box_crop_context: float = 0.3
    train_split: str = "train"
    val_split: str = "val"
    test_split: str = "test"
    scale_radius: float = 1.0
    use_random_camera: bool = True
    random_camera: dict = field(default_factory=dict)
    render_path: str = "circle"


def similarity_from_cameras(c2w: np.ndarray, fix_rot: bool = False, radius: float = 1.0):
    """Normalizing similarity from OpenCV c2w poses (co3d.py:132-190)."""
    t = c2w[:, :3, 3]
    R = c2w[:, :3, :3]
    ups = np.sum(R * np.array([0, -1.0, 0]), axis=-1)
    world_up = np.mean(ups, axis=0)
    nrm = np.linalg.norm(world_up)
    if nrm < 1e-8:  # degenerate rig (up axes cancel): keep world frame
        world_up = np.array([0.0, 0.0, 1.0])
        nrm = 1.0
    world_up = world_up / nrm
    up_camspace = np.array([0.0, 0.0, 1.0])
    c = (up_camspace * world_up).sum()
    cross = np.cross(world_up, up_camspace)
    skew = np.array([
        [0.0, -cross[2], cross[1]],
        [cross[2], 0.0, -cross[0]],
        [-cross[1], cross[0], 0.0],
    ])
    if c > -1:
        R_align = np.eye(3) + skew + (skew @ skew) / (1 + c)
    else:
        R_align = np.array([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    if fix_rot:
        R_align = np.eye(3)
        R = np.eye(3)
    else:
        R = R_align @ R
    fwds = np.sum(R * np.array([0, 0.0, 1.0]), axis=-1)
    t = (R_align @ t[..., None])[..., 0]
    nearest = t + (fwds * -t).sum(-1)[:, None] * fwds
    translate = -np.median(nearest, axis=0)
    transform = np.eye(4)
    transform[:3, 3] = translate
    transform[:3, :3] = R_align
    scale = radius / np.median(np.linalg.norm(t + translate, axis=-1))
    return transform, scale


def get_bbox_from_mask(mask: np.ndarray, thr: float, decrease_quant: float = 0.05):
    """Tightest (x0, x1, y0, y1) covering mask>thr; lowers thr if empty
    (co3d.py:55-73)."""
    while thr > 0:
        hit = mask > thr
        if hit.any():
            ys = np.where(hit.any(1))[0]
            xs = np.where(hit.any(0))[0]
            return int(xs[0]), int(xs[-1]) + 1, int(ys[0]), int(ys[-1]) + 1
        thr -= decrease_quant
    return 0, mask.shape[1], 0, mask.shape[0]


def get_clamp_bbox(bbox, H: int, W: int, box_crop_context: float = 0.0):
    """Expand by context and clamp to the image (co3d.py:75-99)."""
    x0, x1, y0, y1 = bbox
    w, h = x1 - x0, y1 - y0
    if box_crop_context > 0:
        x0 -= w * box_crop_context / 2
        x1 += w * box_crop_context / 2
        y0 -= h * box_crop_context / 2
        y1 += h * box_crop_context / 2
    return (max(0, int(np.floor(x0))), min(W, int(np.ceil(x1))),
            max(0, int(np.floor(y0))), min(H, int(np.ceil(y1))))


def _resize(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Bilinear resize via jax.image (host numpy in / numpy out)."""
    import jax

    shape = (height, width) + img.shape[2:]
    return np.asarray(jax.image.resize(np.asarray(img, np.float32), shape, "bilinear"))


def _load_image(path: str) -> np.ndarray:
    import imageio.v3 as iio

    img = np.asarray(iio.imread(path), np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    return img


@ds.register("co3d-datamodule")
class Co3dDataModule:
    """Loads one CO3D sequence and serves per-split batches.

    Directory layout (CO3D v2): ``root_dir = <category>/<sequence>`` with
    ``<category>/frame_annotations.jgz`` one level up."""

    def __init__(self, cfg: Co3dDataModuleConfig | dict | None = None):
        if isinstance(cfg, dict):
            import dataclasses

            names = {f.name for f in dataclasses.fields(Co3dDataModuleConfig)}
            cfg = Co3dDataModuleConfig(**{k: v for k, v in cfg.items() if k in names})
        self.cfg = cfg or Co3dDataModuleConfig()
        self._loaded = False
        if self.cfg.use_random_camera:
            rc = dict(self.cfg.random_camera or {})
            import dataclasses

            names = {f.name for f in dataclasses.fields(RandomCameraConfig)}
            self.random_sampler = RandomCameraSampler(
                RandomCameraConfig(**{k: v for k, v in rc.items() if k in names}), 0)

    def setup(self) -> None:
        cfg = self.cfg
        seq = os.path.basename(os.path.normpath(cfg.root_dir))
        json_path = os.path.join(cfg.root_dir, "..", "frame_annotations.jgz")
        with gzip.open(json_path, "rt") as fp:
            all_frames = json.load(fp)
        frames = [f for f in all_frames if f["sequence_name"] == seq]
        frames = frames[: cfg.max_num_frames]
        if not frames:
            raise ValueError(f"no frames for sequence {seq!r} in {json_path}")

        cam_trans = np.diag(np.array([-1, -1, 1, 1], np.float32))
        images, masks, poses, focals, prps = [], [], [], [], []
        data_root = os.path.join(cfg.root_dir, "..", "..")
        for fr in frames:
            img = _load_image(os.path.join(data_root, fr["image"]["path"]))[..., :3]
            H, W = fr["image"]["size"]
            fxy = np.asarray(fr["viewpoint"]["focal_length"], np.float32)
            cxy = np.asarray(fr["viewpoint"]["principal_point"], np.float32)
            R = np.asarray(fr["viewpoint"]["R"], np.float32)
            T = np.asarray(fr["viewpoint"]["T"], np.float32)
            if cfg.v2_mode:  # co3d.py:279-290 (NDC-isotropic -> screen)
                min_hw = min(W, H)
                half = np.array([W * 0.5, H * 0.5], np.float32)
                scale_arr = np.array([min_hw * 0.5, min_hw * 0.5], np.float32)
                fxy_x = fxy * scale_arr
                prp_x = half - cxy * scale_arr
                cxy = (half - prp_x) / half
                fxy = fxy_x / half
            scale_arr = np.array([W * 0.5, H * 0.5], np.float32)
            focal = fxy * scale_arr
            prp = -1.0 * (cxy - 1.0) * scale_arr
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = R
            pose[:3, 3:] = -R @ T[..., None]
            pose = pose @ cam_trans  # PyTorch3D -> OpenCV

            if cfg.use_mask and fr.get("mask"):
                mask = _load_image(os.path.join(data_root, fr["mask"]["path"]))
                if mask.ndim == 3:
                    mask = mask[..., 0]
            else:
                mask = np.ones(img.shape[:2], np.float32)

            if cfg.box_crop:
                bbox = get_clamp_bbox(
                    get_bbox_from_mask(mask, cfg.box_crop_mask_thr),
                    mask.shape[0], mask.shape[1], cfg.box_crop_context)
                x0, x1, y0, y1 = bbox
                img = img[y0:y1, x0:x1]
                mask = mask[y0:y1, x0:x1]
                prp = prp - np.array([x0, y0], np.float32)
            sy = cfg.height / img.shape[0]
            sx = cfg.width / img.shape[1]
            focal = focal * np.array([sx, sy], np.float32)
            prp = prp * np.array([sx, sy], np.float32)
            images.append(_resize(img, cfg.height, cfg.width))
            masks.append(_resize(mask[..., None], cfg.height, cfg.width)[..., 0])
            poses.append(pose)
            focals.append(focal)
            prps.append(prp)

        poses = np.stack(poses)
        transform, scale = similarity_from_cameras(poses, radius=cfg.scale_radius)
        poses = transform[None] @ poses
        poses[:, :3, 3] *= scale * cfg.cam_scale_factor

        self.images = np.stack(images).astype(np.float32)
        self.masks = np.stack(masks).astype(np.float32)
        self.poses = poses.astype(np.float32)
        self.focals = np.stack(focals).astype(np.float32)
        self.prps = np.stack(prps).astype(np.float32)
        n = len(frames)
        idx = np.arange(n)
        self.splits = {
            cfg.train_split: idx[idx % 8 != 0],
            cfg.val_split: idx[idx % 8 == 0][:2],
            cfg.test_split: idx[idx % 8 == 0],
        }
        self._loaded = True

    def rays_for(self, i: int):
        """OpenCV-convention rays for frame i (H, W, 3) o/d in world."""
        from ..ops.cameras import get_ray_directions

        import jax.numpy as jnp

        dirs = get_ray_directions(
            self.cfg.height, self.cfg.width,
            (float(self.focals[i][0]), float(self.focals[i][1])),
            (float(self.prps[i][0]), float(self.prps[i][1])),
        )
        # get_ray_directions is OpenGL (-z forward, y up); CO3D poses are
        # OpenCV (+z forward, y down) — flip y and z
        dirs = dirs * jnp.asarray([1.0, -1.0, -1.0])
        c2w = jnp.asarray(self.poses[i])
        rays_d = dirs @ c2w[:3, :3].T
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
        return rays_o, rays_d

    def batch(self, split: str, rng: np.random.RandomState) -> Dict[str, Any]:
        ids = self.splits[split]
        pick = rng.choice(ids, size=min(self.cfg.batch_size, len(ids)), replace=False)
        out = {
            "index": pick,
            "rgb": self.images[pick],
            "mask": self.masks[pick],
            "c2w": self.poses[pick],
        }
        if self.cfg.use_random_camera and split == self.cfg.train_split:
            out["random_camera"] = self.random_sampler.sample()
        return out
