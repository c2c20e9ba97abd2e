"""CO3D data module on a synthetic mini-sequence."""

import gzip
import json
import os

import numpy as np
import pytest

from dreammesh4d_tpu.data.co3d import (
    Co3dDataModule,
    Co3dDataModuleConfig,
    get_bbox_from_mask,
    get_clamp_bbox,
    similarity_from_cameras,
)


def _write_fake_co3d(root, n_frames=10, H=48, W=64):
    """category/sequence layout with frame_annotations.jgz one level up."""
    import imageio.v3 as iio

    cat = os.path.join(root, "teddybear")
    seq_dir = os.path.join(cat, "seq001")
    os.makedirs(os.path.join(seq_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(seq_dir, "masks"), exist_ok=True)
    frames = []
    rng = np.random.RandomState(0)
    for i in range(n_frames):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        mask = np.zeros((H, W), np.uint8)
        mask[H // 4: 3 * H // 4, W // 4: 3 * W // 4] = 255
        ip = f"teddybear/seq001/images/frame{i:03d}.png"
        mp = f"teddybear/seq001/masks/frame{i:03d}.png"
        iio.imwrite(os.path.join(root, ip), img)
        iio.imwrite(os.path.join(root, mp), mask)
        # cameras on a circle looking inward (PyTorch3D convention fields)
        a = 2 * np.pi * i / n_frames
        Rz = np.array([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        frames.append({
            "sequence_name": "seq001",
            "image": {"path": ip, "size": [H, W]},
            "mask": {"path": mp},
            "viewpoint": {
                "R": Rz.tolist(),
                "T": [0.0, 0.0, 3.0],
                "focal_length": [2.0, 2.0],
                "principal_point": [0.0, 0.0],
            },
        })
    with gzip.open(os.path.join(cat, "frame_annotations.jgz"), "wt") as f:
        json.dump(frames, f)
    return seq_dir


def test_similarity_normalizes_scale():
    # cameras on a circle of radius 3 around origin, OpenCV convention
    n = 12
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([3 * np.cos(a), 3 * np.sin(a), 0.3])
        fwd = -pos / np.linalg.norm(pos)
        up = np.array([0, 0, -1.0])
        right = np.cross(up, fwd); right /= np.linalg.norm(right)
        up2 = np.cross(fwd, right)
        p = np.eye(4)
        p[:3, 0], p[:3, 1], p[:3, 2], p[:3, 3] = right, up2, fwd, pos
        poses.append(p)
    poses = np.stack(poses)
    T, s = similarity_from_cameras(poses, radius=1.0)
    out = (T[None] @ poses)
    out[:, :3, 3] *= s
    r = np.linalg.norm(out[:, :3, 3], axis=-1)
    assert abs(np.median(r) - 1.0) < 1e-5  # rescaled to radius 1


def test_bbox_helpers():
    mask = np.zeros((40, 60), np.float32)
    mask[10:20, 30:50] = 1.0
    x0, x1, y0, y1 = get_bbox_from_mask(mask, 0.4)
    assert (x0, x1, y0, y1) == (30, 50, 10, 20)
    cx0, cx1, cy0, cy1 = get_clamp_bbox((x0, x1, y0, y1), 40, 60, 0.5)
    assert cx0 < 30 and cx1 > 50 and cy0 < 10 and cy1 > 20
    assert cx0 >= 0 and cy0 >= 0 and cx1 <= 60 and cy1 <= 40
    # empty mask: threshold walks down, eventually whole image
    x = get_bbox_from_mask(np.zeros((8, 8), np.float32), 0.4)
    assert x == (0, 8, 0, 8)


def test_co3d_module_end_to_end(tmp_path):
    seq = _write_fake_co3d(str(tmp_path))
    cfg = Co3dDataModuleConfig(root_dir=seq, height=32, width=32,
                               use_random_camera=False)
    dm = Co3dDataModule(cfg)
    dm.setup()
    assert dm.images.shape == (10, 32, 32, 3)
    assert dm.masks.shape == (10, 32, 32)
    # camera radius normalized to ~scale_radius * cam_scale_factor
    r = np.linalg.norm(dm.poses[:, :3, 3], axis=-1)
    assert abs(np.median(r) - cfg.scale_radius * cfg.cam_scale_factor) < 0.05
    batch = dm.batch("train", np.random.RandomState(0))
    assert batch["rgb"].shape[0] == 1 and batch["rgb"].shape[1:] == (32, 32, 3)
    ro, rd = dm.rays_for(0)
    assert ro.shape == (32, 32, 3) and rd.shape == (32, 32, 3)
    assert np.allclose(np.linalg.norm(np.asarray(rd), axis=-1), 1.0, atol=1e-5)
    # central ray looks roughly toward the scene center (origin)
    c = np.asarray(rd)[16, 16]
    to_origin = -np.asarray(ro)[16, 16]
    to_origin /= np.linalg.norm(to_origin)
    assert float(c @ to_origin) > 0.8
