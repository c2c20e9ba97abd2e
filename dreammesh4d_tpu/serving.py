"""Serving surface: load a trained trial and render novel (view, time) frames.

The reference has no inference API beyond re-running the Lightning loop in
``--test`` mode; a 4D viewer or render service wants the inverse shape —
load once, then a single jitted call per frame:

    viewer = Viewer4D.from_trial("outputs/sugar-dynamic/mytag")
    rgb = viewer.render(elevation_deg=15, azimuth_deg=30, distance=2.2, t=0.4)
    frames = viewer.orbit(n_views=60, t=0.0)          # orbit at a fixed time
    frames = viewer.play(azimuth_deg=30, n_frames=32) # fixed view, time sweep

Everything after ``from_trial`` is device-resident: each ``render`` is one
camera-matrix assembly (jitted) + one timed-render program.  Works for any
``sugar-4dgen-system`` trial (deformation or discrete mode, with or without
the deformation graph).
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


class Viewer4D:
    def __init__(self, sugar_params, static, deform_params, dyn_cfg, raster_cfg,
                 height: int, width: int, fovy_deg: float, num_frames: int,
                 bg_color=(1.0, 1.0, 1.0)):
        from .systems.sugar_4dgen import make_dynamic_render_eval

        self.static = static
        self.dyn_cfg = dyn_cfg
        self.deform_params = deform_params
        self.height, self.width = height, width
        self.fovy = math.radians(fovy_deg)
        self.num_frames = num_frames
        self._render = make_dynamic_render_eval(
            sugar_params, static, dyn_cfg.deformation, raster_cfg, bg_color
        )

    # ------------------------------------------------------------------
    @classmethod
    def from_trial(cls, trial_dir: str, checkpoint: str = "LAST",
                   height: Optional[int] = None, width: Optional[int] = None):
        """Load ``configs/parsed.yaml`` + the checkpoint of a dynamic-stage
        trial and build the jitted renderer.  ``height/width`` override the
        training render size (the rasterizer recompiles per size)."""
        from .config import load_config
        from .systems.assembly import build_raster_config, _filtered_dataclass
        from .models.geometry.sugar import SuGaRConfig, create_sugar
        from .models.geometry.deformation import DeformationConfig
        from .models.geometry.dynamic_sugar import (
            DynamicSuGaRConfig,
            build_dynamic_static,
        )
        from .export.mesh_io import load_mesh
        from .utils.checkpoint import latest_checkpoint, restore_checkpoint

        cfg = load_config(os.path.join(trial_dir, "configs", "parsed.yaml"))
        system = cfg.system
        geo = dict(system.get("geometry", {}))
        mesh = load_mesh(str(geo["surface_mesh_to_bind_path"]))
        sugar_cfg = _filtered_dataclass(SuGaRConfig, {
            k: v for k, v in geo.items()
            if k in ("n_gaussians_per_surface_triangle", "sh_degree",
                     "init_gs_scales_s", "color_clip", "spatial_extent")
        })
        sugar_params, sugar_static = create_sugar(sugar_cfg, mesh)
        deform_cfg = _filtered_dataclass(DeformationConfig, dict(geo.get("deformation", {})))
        dyn_cfg = DynamicSuGaRConfig(
            num_frames=int(geo.get("num_frames", 32)),
            dynamic_mode=str(geo.get("dynamic_mode", "deformation")),
            use_deform_graph=bool(geo.get("use_deform_graph", True)),
            n_dg_nodes=int(geo.get("n_dg_nodes", 1000)),
            dg_node_connectivity=int(geo.get("dg_node_connectivity", 4)),
            dist_mode=str(geo.get("dist_mode", "geodisc")),
            skinning_method=str(geo.get("skinning_method", "hybrid")),
            d_scale=bool(geo.get("d_scale", True)),
            deformation=deform_cfg,
        )
        # the static-stage refined appearance, when the trial recorded it —
        # MUST load before build_dynamic_static: the deformation graph's node
        # positions / skinning weights are built from the (refined) rest
        # points, exactly as Sugar4DGenExperiment does (assembly.py) — building
        # it from the raw bind mesh renders with mismatched skinning
        weights = system.get("weights")
        if weights and os.path.exists(str(weights)):
            prev = restore_checkpoint(str(weights), None)
            if "params" in prev:
                loaded = type(sugar_params)(**{
                    k: jnp.asarray(v) for k, v in prev["params"].items()
                })
                if loaded.points.shape == sugar_params.points.shape:
                    sugar_params = loaded

        static = build_dynamic_static(dyn_cfg, sugar_static, np.asarray(sugar_params.points))

        ckpt = checkpoint
        if ckpt == "LAST":
            ckpt = latest_checkpoint(os.path.join(trial_dir, "ckpts"))
            if ckpt is None:
                raise FileNotFoundError(f"no checkpoints under {trial_dir}/ckpts")
        state = restore_checkpoint(str(ckpt), None)
        deform_params = jax.tree.map(jnp.asarray, state["deform_params"])

        d = dict(cfg.data.get("random_camera", {}))
        H = int(height or d.get("eval_height", d.get("height", 512)))
        W = int(width or d.get("eval_width", d.get("width", 512)))
        if isinstance(d.get("height"), (list, tuple)):
            H = int(height or d["height"][-1])
            W = int(width or d["width"][-1])
        fovy_deg = float(cfg.data.get("default_fovy_deg", 40.0))
        raster_cfg = build_raster_config(H, W, fovy_deg, system)
        return cls(sugar_params, static, deform_params, dyn_cfg, raster_cfg,
                   H, W, fovy_deg, dyn_cfg.num_frames)

    # ------------------------------------------------------------------
    def _cameras(self, elevation_deg, azimuth_deg, distance):
        from .data.uncond import assemble_camera_batch

        el = jnp.atleast_1d(jnp.asarray(elevation_deg, jnp.float32))
        az = jnp.atleast_1d(jnp.asarray(azimuth_deg, jnp.float32))
        di = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(distance, jnp.float32)), el.shape)
        elr, azr = jnp.deg2rad(el), jnp.deg2rad(az)
        pos = jnp.stack([di * jnp.cos(elr) * jnp.cos(azr),
                         di * jnp.cos(elr) * jnp.sin(azr),
                         di * jnp.sin(elr)], -1)
        fovy = jnp.full(el.shape, self.fovy, jnp.float32)
        cams, _, _, _ = assemble_camera_batch(
            pos, jnp.zeros_like(pos), jnp.broadcast_to(jnp.asarray([0., 0., 1.]), pos.shape),
            fovy, self.height, self.width, 0.01, 100.0, False,
        )
        return cams

    def _frame_indices(self, ts: jnp.ndarray) -> jnp.ndarray:
        L = self.num_frames
        return jnp.clip(jnp.round(ts * (L - 1)).astype(jnp.int32), 0, L - 1)

    def render(self, elevation_deg: float = 0.0, azimuth_deg: float = 0.0,
               distance: float = 2.2, t: float = 0.0) -> np.ndarray:
        """One (H, W, 3) float frame at spherical camera + normalized time."""
        cams = self._cameras(elevation_deg, azimuth_deg, distance)
        ts = jnp.asarray([t], jnp.float32)
        out = self._render(self.deform_params, cams, ts, self._frame_indices(ts))
        return np.asarray(out["comp_rgb"][0])

    def orbit(self, n_views: int = 30, elevation_deg: float = 15.0,
              distance: float = 2.2, t: float = 0.0):
        """Frames on an azimuth orbit at a fixed time."""
        az = np.linspace(0.0, 360.0, n_views, endpoint=False)
        cams = self._cameras(np.full(n_views, elevation_deg), az,
                             np.full(n_views, distance))
        ts = jnp.full((n_views,), t, jnp.float32)
        out = self._render(self.deform_params, cams, ts, self._frame_indices(ts))
        return [np.asarray(out["comp_rgb"][i]) for i in range(n_views)]

    def play(self, elevation_deg: float = 0.0, azimuth_deg: float = 0.0,
             distance: float = 2.2, n_frames: Optional[int] = None):
        """Frames at a fixed view sweeping time over the trained video."""
        from .data.temporal_image import frame_timestamps

        n = n_frames or self.num_frames
        ts = jnp.asarray(frame_timestamps(n))
        cams = self._cameras(np.full(n, elevation_deg), np.full(n, azimuth_deg),
                             np.full(n, distance))
        fi = jnp.arange(n, dtype=jnp.int32) if n == self.num_frames else self._frame_indices(ts)
        out = self._render(self.deform_params, cams, ts, fi)
        return [np.asarray(out["comp_rgb"][i]) for i in range(n)]
