"""Gaussian PLY IO in the standard 3DGS attribute layout.

Parity with the reference GaussianIO (custom/threestudio-dreammesh4d/geometry/
gaussian_io.py:50-172): x/y/z, nx/ny/nz, f_dc_0..2, f_rest_0..44, opacity,
scale_0..2, rot_0..3 — files interoperate with 3DGS viewers and the
reference loader.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .mesh_io import load_ply


def save_gaussians_ply(
    path: str,
    xyz: np.ndarray,  # (N, 3)
    sh: np.ndarray,  # (N, B, 3) with DC first (band-major)
    opacity_logits: np.ndarray,  # (N,) or (N, 1)
    log_scales: np.ndarray,  # (N, 3)
    quats: np.ndarray,  # (N, 4) wxyz
) -> None:
    N = len(xyz)
    sh = np.asarray(sh, np.float32)
    B = sh.shape[1]
    f_dc = sh[:, 0, :]  # (N, 3)
    f_rest = sh[:, 1:, :].transpose(0, 2, 1).reshape(N, -1)  # channel-major like 3DGS
    opacity = np.asarray(opacity_logits, np.float32).reshape(N, 1)

    names = (
        ["x", "y", "z", "nx", "ny", "nz"]
        + [f"f_dc_{i}" for i in range(3)]
        + [f"f_rest_{i}" for i in range(f_rest.shape[1])]
        + ["opacity"]
        + [f"scale_{i}" for i in range(3)]
        + [f"rot_{i}" for i in range(4)]
    )
    data = np.concatenate(
        [
            np.asarray(xyz, np.float32), np.zeros((N, 3), np.float32), f_dc, f_rest,
            opacity, np.asarray(log_scales, np.float32), np.asarray(quats, np.float32),
        ],
        -1,
    ).astype("<f4")

    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = ["ply", "format binary_little_endian 1.0", f"element vertex {N}"]
    header += [f"property float {n}" for n in names]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        f.write(np.ascontiguousarray(data).tobytes())


def load_gaussians_ply(path: str) -> dict:
    """-> dict(xyz, sh (N,B,3), opacity_logits, log_scales, quats wxyz)."""
    ply = load_ply(path)["vertex"]
    xyz = np.stack([ply["x"], ply["y"], ply["z"]], -1).astype(np.float32)
    N = len(xyz)
    f_dc = np.stack([ply[f"f_dc_{i}"] for i in range(3)], -1)  # (N,3)
    rest_keys = sorted(
        (k for k in ply if k.startswith("f_rest_")), key=lambda s: int(s.split("_")[-1])
    )
    if rest_keys:
        f_rest = np.stack([ply[k] for k in rest_keys], -1).reshape(N, 3, -1)
        f_rest = f_rest.transpose(0, 2, 1)  # (N, B-1, 3)
    else:
        f_rest = np.zeros((N, 0, 3), np.float32)
    sh = np.concatenate([f_dc[:, None, :], f_rest], 1).astype(np.float32)
    return {
        "xyz": xyz,
        "sh": sh,
        "opacity_logits": np.asarray(ply["opacity"], np.float32),
        "log_scales": np.stack([ply[f"scale_{i}"] for i in range(3)], -1).astype(np.float32),
        "quats": np.stack([ply[f"rot_{i}"] for i in range(4)], -1).astype(np.float32),
    }
