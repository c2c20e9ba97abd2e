"""Camera and ray math (JAX).

Behavioural parity with the reference ops library
(threestudio/utils/ops.py:180-415):

- Camera convention for NeRF rays: OpenGL-style, camera looks down -z, y up
  (``get_ray_directions``/``get_rays``).
- Gaussian-splatting cameras convert to COLMAP convention (+z forward) via a
  (y,z) flip (``convert_pose``), then build row-major world->view and
  projection transforms exactly like ``get_cam_info_gaussian``
  (ops.py:362-413).

Everything here is pure jnp and jit/vmap-friendly; matrices are computed in
float32.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np


def get_ray_directions(
    H: int,
    W: int,
    focal: Union[float, Tuple[float, float]],
    principal: Optional[Tuple[float, float]] = None,
    use_pixel_centers: bool = True,
) -> jnp.ndarray:
    """Per-pixel ray directions in camera frame (H, W, 3); -z forward.

    Parity: threestudio/utils/ops.py:180-218."""
    pixel_center = 0.5 if use_pixel_centers else 0.0
    if isinstance(focal, (int, float)):
        fx = fy = float(focal)
        cx, cy = W / 2.0, H / 2.0
    else:
        fx, fy = focal
        assert principal is not None
        cx, cy = principal
    i, j = jnp.meshgrid(
        jnp.arange(W, dtype=jnp.float32) + pixel_center,
        jnp.arange(H, dtype=jnp.float32) + pixel_center,
        indexing="xy",
    )
    return jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], -1)


def get_rays(
    directions: jnp.ndarray,
    c2w: jnp.ndarray,
    keepdim: bool = False,
    normalize: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Transform camera-frame directions into world rays.

    Handles the same rank combinations as the reference (ops.py:274-320):
    directions (N,3)/(H,W,3)/(B,H,W,3) x c2w (4,4)/(B,4,4)."""
    assert directions.shape[-1] == 3
    if directions.ndim == 2:
        if c2w.ndim == 2:
            c2w = c2w[None]
        rays_d = (directions[:, None, :] * c2w[:, :3, :3]).sum(-1)
        rays_o = jnp.broadcast_to(c2w[:, :3, 3], rays_d.shape)
    elif directions.ndim == 3:
        if c2w.ndim == 2:
            rays_d = (directions[:, :, None, :] * c2w[None, None, :3, :3]).sum(-1)
            rays_o = jnp.broadcast_to(c2w[None, None, :3, 3], rays_d.shape)
        else:
            rays_d = (directions[None, :, :, None, :] * c2w[:, None, None, :3, :3]).sum(-1)
            rays_o = jnp.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    elif directions.ndim == 4:
        assert c2w.ndim == 3
        rays_d = (directions[:, :, :, None, :] * c2w[:, None, None, :3, :3]).sum(-1)
        rays_o = jnp.broadcast_to(c2w[:, None, None, :3, 3], rays_d.shape)
    else:
        raise ValueError(f"Unsupported directions rank {directions.ndim}")
    if normalize:
        rays_d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-12)
    if not keepdim:
        rays_o, rays_d = rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
    return rays_o, rays_d


def get_projection_matrix(fovy: jnp.ndarray, aspect_wh: float, near: float, far: float) -> jnp.ndarray:
    """Batched OpenGL projection with flipped y (reference ops.py:323-336)."""
    fovy = jnp.atleast_1d(jnp.asarray(fovy, jnp.float32))
    B = fovy.shape[0]
    t = jnp.tan(fovy / 2.0)
    proj = jnp.zeros((B, 4, 4), jnp.float32)
    proj = proj.at[:, 0, 0].set(1.0 / (t * aspect_wh))
    proj = proj.at[:, 1, 1].set(-1.0 / t)
    proj = proj.at[:, 2, 2].set(-(far + near) / (far - near))
    proj = proj.at[:, 2, 3].set(-2.0 * far * near / (far - near))
    proj = proj.at[:, 3, 2].set(-1.0)
    return proj


def c2w_to_w2c(c2w: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid camera-to-world: R' = R^T, t' = -R^T t (ops.py:338-349)."""
    single = c2w.ndim == 2
    if single:
        c2w = c2w[None]
    R_t = jnp.swapaxes(c2w[:, :3, :3], -1, -2)
    t = -(R_t @ c2w[:, :3, 3:])
    w2c = jnp.zeros_like(c2w)
    w2c = w2c.at[:, :3, :3].set(R_t)
    w2c = w2c.at[:, :3, 3:].set(t)
    w2c = w2c.at[:, 3, 3].set(1.0)
    return w2c[0] if single else w2c


def get_mvp_matrix(c2w: jnp.ndarray, proj_mtx: jnp.ndarray) -> jnp.ndarray:
    """proj @ w2c (reference ops.py:338-352)."""
    return proj_mtx @ c2w_to_w2c(c2w)


# ---------------------------------------------------------------------------
# Gaussian-splatting camera path (reference ops.py:362-413)
# ---------------------------------------------------------------------------


def convert_pose(c2w: jnp.ndarray) -> jnp.ndarray:
    """OpenGL -> COLMAP pose conversion: flip y and z axes (ops.py:362-367)."""
    flip = jnp.diag(jnp.asarray([1.0, -1.0, -1.0, 1.0], jnp.float32))
    return c2w @ flip


def get_projection_matrix_gaussian(znear: float, zfar: float, fovx: float, fovy: float) -> jnp.ndarray:
    """GS-style perspective projection, +z forward (ops.py:370-390)."""
    tan_y = jnp.tan(jnp.asarray(fovy, jnp.float32) / 2.0)
    tan_x = jnp.tan(jnp.asarray(fovx, jnp.float32) / 2.0)
    top = tan_y * znear
    right = tan_x * znear
    P = jnp.zeros((4, 4), jnp.float32)
    P = P.at[0, 0].set(2.0 * znear / (2 * right))
    P = P.at[1, 1].set(2.0 * znear / (2 * top))
    P = P.at[3, 2].set(1.0)
    P = P.at[2, 2].set(zfar / (zfar - znear))
    P = P.at[2, 3].set(-(zfar * znear) / (zfar - znear))
    return P


class GSCameraInfo(NamedTuple):
    """Row-major transforms consumed by the rasterizer, matching the tuple
    returned by reference ``get_cam_info_gaussian`` (ops.py:398-413)."""

    world_view_transform: jnp.ndarray  # (4,4) row-major w2c
    full_proj_transform: jnp.ndarray  # (4,4) row-major w2c@proj
    camera_center: jnp.ndarray  # (3,)


def get_cam_info_gaussian(c2w: jnp.ndarray, fovx, fovy, znear: float, zfar: float) -> GSCameraInfo:
    c2w = convert_pose(jnp.asarray(c2w, jnp.float32))
    w2c = jnp.linalg.inv(c2w)
    world_view = w2c.T  # row-major
    proj = get_projection_matrix_gaussian(znear, zfar, fovx, fovy).T
    full_proj = world_view @ proj
    cam_center = c2w[:3, 3]
    return GSCameraInfo(world_view, full_proj, cam_center)


def camera_position_from_spherical(
    elevation_deg: jnp.ndarray, azimuth_deg: jnp.ndarray, distance: jnp.ndarray
) -> jnp.ndarray:
    """World position on sphere; matches the data pipeline convention
    (threestudio/data/uncond.py:210-216): x=d·cos(el)·cos(az), y=d·cos(el)·sin(az),
    z=d·sin(el)."""
    el = jnp.deg2rad(jnp.asarray(elevation_deg, jnp.float32))
    az = jnp.deg2rad(jnp.asarray(azimuth_deg, jnp.float32))
    d = jnp.asarray(distance, jnp.float32)
    return jnp.stack(
        [d * jnp.cos(el) * jnp.cos(az), d * jnp.cos(el) * jnp.sin(az), d * jnp.sin(el)], -1
    )


def look_at_c2w(camera_position: jnp.ndarray, center: Optional[jnp.ndarray] = None,
                up: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Build OpenGL c2w from eye/center/up (threestudio/data/uncond.py:242-252):
    lookat = normalize(center-eye), right = normalize(cross(lookat, up)),
    real up = cross(right, lookat); c2w rotation columns = [right, up, -lookat]."""
    pos = jnp.asarray(camera_position, jnp.float32)
    batched = pos.ndim == 2
    if not batched:
        pos = pos[None]
    B = pos.shape[0]
    if center is None:
        center = jnp.zeros_like(pos)
    else:
        center = jnp.broadcast_to(jnp.asarray(center, jnp.float32), pos.shape)
    if up is None:
        up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), pos.shape)
    else:
        up = jnp.broadcast_to(jnp.asarray(up, jnp.float32), pos.shape)

    def norm(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)

    lookat = norm(center - pos)
    right = norm(jnp.cross(lookat, up))
    up_real = norm(jnp.cross(right, lookat))
    rot = jnp.stack([right, up_real, -lookat], axis=-1)  # columns
    c2w = jnp.zeros((B, 4, 4), jnp.float32)
    c2w = c2w.at[:, :3, :3].set(rot)
    c2w = c2w.at[:, :3, 3].set(pos)
    c2w = c2w.at[:, 3, 3].set(1.0)
    return c2w if batched else c2w[0]


def fov2focal(fov: float, pixels: int) -> float:
    """sugar_utils.py:829-831."""
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def intrinsics_from_fov(H: int, W: int, fovy: float) -> Tuple[float, float, float]:
    """focal (px), cx, cy for a square-pixel pinhole from vertical fov."""
    focal = 0.5 * H / math.tan(0.5 * fovy)
    return focal, W / 2.0, H / 2.0


def binary_cross_entropy(inputs: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically-explicit BCE (reference ops.py:416-421)."""
    eps = 1e-6
    x = jnp.clip(inputs, eps, 1.0 - eps)
    return -(target * jnp.log(x) + (1 - target) * jnp.log(1 - x)).mean()


def make_c2w_numpy(elevation_deg: float, azimuth_deg: float, distance: float,
                   center=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Host-side convenience: OpenGL c2w as numpy for dataset construction."""
    pos = np.asarray(
        camera_position_from_spherical(
            jnp.asarray(elevation_deg), jnp.asarray(azimuth_deg), jnp.asarray(distance)
        )
    )
    return np.asarray(look_at_c2w(jnp.asarray(pos), jnp.asarray(center, jnp.float32)))
