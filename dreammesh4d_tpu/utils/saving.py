"""Artifact saving (SaverMixin equivalent).

Parity with threestudio/utils/saving.py:22-652: image grids from typed
layers (rgb/grayscale with colormaps), image-sequence -> mp4/gif, json/npz
dumps — all rooted at a trial save dir.  imageio/cv2 based, host-side.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


class Saver:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    def path(self, name: str) -> str:
        p = os.path.join(self.save_dir, name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        return p

    # ---------------- images ----------------
    @staticmethod
    def _to_u8(img: np.ndarray) -> np.ndarray:
        img = np.asarray(img)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
        return img

    @staticmethod
    def _colorize(gray: np.ndarray, cmap: Optional[str], data_range=None) -> np.ndarray:
        import cv2

        g = np.asarray(gray, np.float32)
        if data_range is None:
            lo, hi = float(g.min()), float(g.max())
        else:
            lo, hi = data_range
        g = (g - lo) / max(hi - lo, 1e-8)
        g8 = (np.clip(g, 0, 1) * 255).astype(np.uint8)
        if cmap is None:
            return np.stack([g8] * 3, -1)
        code = {"jet": cv2.COLORMAP_JET, "magma": cv2.COLORMAP_MAGMA,
                "viridis": cv2.COLORMAP_VIRIDIS}[cmap]
        return cv2.cvtColor(cv2.applyColorMap(g8, code), cv2.COLOR_BGR2RGB)

    def save_image_grid(self, name: str, layers: List[dict], align: str = "h") -> str:
        """layers: [{"type": "rgb"|"grayscale", "img": HW3/HW1 array,
        "kwargs": {...}}] — same layer spec shape as the reference
        ``save_image_grid`` (saving.py:132-243)."""
        imgs = []
        for layer in layers:
            img = np.asarray(layer["img"])
            kwargs = layer.get("kwargs", {})
            if layer["type"] == "rgb":
                imgs.append(self._to_u8(img))
            else:
                if img.ndim == 3:
                    img = img[..., 0]
                imgs.append(self._colorize(img, kwargs.get("cmap"),
                                           kwargs.get("data_range")))
        grid = np.concatenate(imgs, axis=1 if align == "h" else 0)
        import imageio.v2 as imageio

        out = self.path(name)
        imageio.imwrite(out, grid)
        return out

    def save_rgb(self, name: str, img: np.ndarray) -> str:
        import imageio.v2 as imageio

        out = self.path(name)
        imageio.imwrite(out, self._to_u8(img))
        return out

    def save_img_sequence(self, name: str, frames: List[np.ndarray], fps: int = 10) -> str:
        """frames -> mp4 (or gif by extension), parity with save_img_sequence
        (saving.py:316-360)."""
        import imageio.v2 as imageio

        out = self.path(name)
        frames_u8 = [self._to_u8(f) for f in frames]
        if out.endswith(".gif"):
            imageio.mimwrite(out, frames_u8, duration=1.0 / fps, loop=0)
        else:
            if not out.endswith(".mp4"):
                out = out + ".mp4"
            try:
                imageio.mimwrite(out, frames_u8, fps=fps, codec="libx264", quality=8)
            except Exception:
                out = out.replace(".mp4", ".gif")
                imageio.mimwrite(out, frames_u8, duration=1.0 / fps, loop=0)
        return out

    # ---------------- data ----------------
    def save_json(self, name: str, data) -> str:
        out = self.path(name)
        with open(out, "w") as f:
            json.dump(data, f, indent=2, default=float)
        return out

    def save_npz(self, name: str, **arrays) -> str:
        out = self.path(name)
        np.savez(out, **{k: np.asarray(v) for k, v in arrays.items()})
        return out
