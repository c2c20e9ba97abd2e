"""Experiment assembly: config -> runnable stage experiments.

This is the layer the reference spreads across ``BaseLift3DSystem.configure``
+ Lightning wiring (threestudio/systems/base.py:249-303, launch.py:159-259):
for each ``system_type`` it instantiates the data module, geometry, optimizer,
guidance and the jitted train step, and exposes the trainer-facing callbacks
(train_step / validate / export / checkpoint state).

Guidance weights: if ``system.guidance.pretrained_model_name_or_path`` is
missing on disk the SDS term is disabled with a warning (the reference would
crash; here every stage stays runnable end-to-end for reconstruction-only
workflows and CI).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..config import ConfigDict
from ..data.image import SingleImageConfig, SingleImageDataModule
from ..data.temporal_image import TemporalImageConfig, TemporalImageDataModule
from ..data.uncond import RandomCameraConfig
from ..export.mesh_io import MeshData, load_mesh, save_obj, save_ply_mesh
from ..models.geometry.sugar import SuGaRConfig, create_sugar, gaussian_attributes
from ..ops.gs import RasterizerConfig
from ..ops.hashgrid import progressive_level_mask
from ..parallel.context import ParallelContext
from ..utils.saving import Saver
from ..utils.schedule import C


def _sub(cfg, key, default=None):
    v = cfg.get(key, default if default is not None else {})
    return v if isinstance(v, dict) else v


def _filtered_dataclass(cls, cfg: dict):
    """Build dataclass from a config dict, ignoring unknown keys (the YAML
    surface carries reference-only keys we accept for compatibility)."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    return cls(**{k: v for k, v in dict(cfg).items() if k in names})


def make_random_camera_config(cfg: dict) -> RandomCameraConfig:
    return _filtered_dataclass(RandomCameraConfig, cfg)


def make_single_image_datamodule(data_cfg: dict, seed: int) -> SingleImageDataModule:
    rc = make_random_camera_config(dict(data_cfg.get("random_camera", {})))
    c = _filtered_dataclass(SingleImageConfig, {k: v for k, v in dict(data_cfg).items()
                                                if k != "random_camera"})
    c.random_camera = rc
    return SingleImageDataModule(c, seed)


def make_temporal_datamodule(data_cfg: dict, seed: int) -> TemporalImageDataModule:
    rc = make_random_camera_config(dict(data_cfg.get("random_camera", {})))
    c = _filtered_dataclass(TemporalImageConfig, {k: v for k, v in dict(data_cfg).items()
                                                  if k != "random_camera"})
    c.random_camera = rc
    return TemporalImageDataModule(c, seed)


def build_raster_config(height, width, fovy_deg: float,
                        system_cfg: dict) -> RasterizerConfig:
    # list-valued (milestone) sizes: rasterize at the final resolution
    if isinstance(height, (list, tuple)):
        height = height[-1]
    if isinstance(width, (list, tuple)):
        width = width[-1]
    height, width = int(height), int(width)
    t = math.tan(math.radians(fovy_deg) / 2)
    r = system_cfg.get("renderer", {})
    return RasterizerConfig(
        width=width, height=height, tan_fovx=t, tan_fovy=t,
        tile_capacity=int(r.get("tile_capacity", 1024)),
        max_tiles_per_gaussian=int(r.get("max_tiles_per_gaussian", 16)),
        chunk=int(r.get("chunk", 32)),
        backend=str(r.get("backend", "pallas_resident")),
        interpret=bool(r.get("interpret", False)),
        bf16_matmuls=bool(r.get("bf16_matmuls", False)),
        binning=str(r.get("binning", "pairs")),
        stream_rows=bool(r.get("stream_rows", True)),
        tile_px=int(r.get("tile_px", 16)),
    )


def maybe_build_guidance(system_cfg: dict, num_frames: int = 1):
    """Return ``(guidance, params)`` or ``None`` when SDS guidance is off.

    ``pretrained_model_name_or_path`` semantics (reference
    threestudio/models/guidance/stable_zero123_guidance.py:41-72 loads the
    checkpoint unconditionally and crashes on a bad path — a typo must NOT
    silently degrade to reconstruction-only training):

    - ``""`` / ``none`` — guidance explicitly off, returns None.
    - ``random[:seed]`` — random weights, an SDS smoke path for
      multi-device/integration runs with no checkpoint on disk (the sharded
      step compiles and executes identically; only the scores are
      meaningless).
    - any other path — must exist on disk, else FileNotFoundError unless
      ``guidance.allow_missing: true`` opts into the reconstruction-only
      degradation."""
    gcfg_dict = dict(system_cfg.get("guidance", {}))
    path = str(gcfg_dict.get("pretrained_model_name_or_path", "") or "")
    is_random = path == "random" or path.startswith("random:")
    if not path or path.lower() == "none":
        return None
    if not is_random and not os.path.exists(path):
        if gcfg_dict.get("allow_missing", False):
            ds.warn("Zero123 checkpoint not found (%r) — SDS guidance disabled "
                    "(guidance.allow_missing=true).", path)
            return None
        raise FileNotFoundError(
            f"Zero123 guidance checkpoint not found: {path!r}. Set "
            "system.guidance.pretrained_model_name_or_path to a real "
            "checkpoint, 'random[:seed]' for an SDS smoke run, or 'none' / "
            "system.guidance.allow_missing=true to train reconstruction-only."
        )
    from ..models.guidance.zero123 import StableZero123Guidance, Zero123Config

    zcfg = _filtered_dataclass(Zero123Config, gcfg_dict)
    guidance = StableZero123Guidance(zcfg)
    if is_random:
        seed = int(path.partition(":")[2] or 0)
        params = guidance.modules.init_params(jax.random.PRNGKey(seed))
        return guidance, params
    from ..models.guidance.zero123.convert import load_zero123_checkpoint

    params = load_zero123_checkpoint(path, guidance.modules)
    return guidance, params


def _guidance_eval_snapshot(saver, guidance, gstate, rng, rgb, elevation,
                            azimuth, camera_distances, step,
                            frame_indices=None, max_views: int = 2):
    """``freq.guidance_eval`` diagnostics (reference systems/base.py:344-402:
    the loop periodically decodes what SDS "sees"): per sampled view, save
    [render | noised | 1-step x0 | full DDIM denoise] as one grid row."""
    gp, bk = gstate
    B = min(int(rgb.shape[0]), max_views)
    out = guidance.guidance_eval(
        gp, bk, rng, rgb[:B], elevation[:B], azimuth[:B], camera_distances[:B],
        None if frame_indices is None else frame_indices[:B],
    )
    layers = []
    for i in range(B):
        S = out["img_noisy"].shape[1]
        render = jax.image.resize(rgb[i], (S, S, 3), "bilinear")
        for img in (render, out["img_noisy"][i], out["img_1step"][i],
                    out["img_final"][i]):
            layers.append({"type": "rgb", "img": np.asarray(jnp.clip(img, 0, 1))})
    saver.save_image_grid(f"it{step}-guidance.png", layers)


# ---------------------------------------------------------------------------
# gaussian stage of sugar-static (vanilla 3DGS with density control)
# ---------------------------------------------------------------------------


class GaussianStageExperiment:
    """``system.stage: gaussian`` — vanilla 3DGS + adaptive density control +
    SuGaR regularization (reference sugar_static.py gaussian stage)."""

    def __init__(self, cfg):
        from ..models.geometry.gaussian import (
            GaussianConfig,
            from_mesh_vertices,
            init_random_sphere,
        )
        from ..systems.gaussian_stage import (
            GaussianStageLosses,
            gaussian_optimizer,
            init_gaussian_train_state,
            make_gaussian_train_step,
            make_reg_state,
        )

        self.cfg = cfg
        system = cfg.system
        self.saver = Saver(os.path.join(cfg.trial_dir, "save"))
        self.data = make_single_image_datamodule(cfg.data, cfg.seed)
        self.par = ParallelContext.from_trainer_cfg(dict(cfg.trainer or {}))
        if self.par.active:
            self.par.check_batch_size(self.data.cfg.random_camera.batch_size,
                                      "data.random_camera.batch_size")

        geo = dict(system.get("geometry", {}))
        self.gcfg = GaussianConfig(
            capacity=int(geo.get("max_num", 200_000)),
            init_num=int(geo.get("init_num_pts", 5000)),
            sh_degree=int(geo.get("sh_degree", 3)),
            spatial_extent=float(geo.get("spatial_extent", 3.8)),
            percent_dense=float(geo.get("percent_dense", 0.01)),
            densify_grad_threshold=float(geo.get("densify_grad_threshold", 0.0002)),
            min_opacity=float(geo.get("min_opac_prune", 0.005)),
        )
        init_path = geo.get("geometry_convert_from") or geo.get("init_from")
        if init_path and os.path.exists(str(init_path)):
            mesh = load_mesh(str(init_path))
            gaussians = from_mesh_vertices(self.gcfg, mesh.v_pos, mesh.v_rgb)
        else:
            gaussians = init_random_sphere(self.gcfg, jax.random.PRNGKey(cfg.seed))

        optimizer = gaussian_optimizer(
            position_lr=geo.get("position_lr", 0.00016),
            feature_lr=geo.get("feature_lr", 0.0025),
            opacity_lr=geo.get("opacity_lr", 0.05),
            scaling_lr=geo.get("scaling_lr", 0.005),
            rotation_lr=geo.get("rotation_lr", 0.001),
            spatial_lr_scale=float(geo.get("spatial_lr_scale", 1.0)),
        )
        loss_cfg = _filtered_dataclass(GaussianStageLosses, {
            k: v for k, v in dict(system.get("loss", {})).items()
            if k in GaussianStageLosses.__dataclass_fields__
        })
        d = self.data.cfg
        self.raster_cfg = build_raster_config(
            d.random_camera.height, d.random_camera.width, d.default_fovy_deg, system
        )
        freq = dict(system.get("freq", {}))
        self.densify_every = int(freq.get("densify", 100))
        self.densify_from = int(freq.get("densify_from", 500))
        self.densify_until = int(freq.get("densify_until", 7000))
        self.opacity_reset_every = int(freq.get("opacity_reset", 3000))
        self.reset_neighbors_every = int(freq.get("reset_neighbors", 50))

        guidance_pack = maybe_build_guidance(system)
        guidance_fn = None
        self._gstate = None
        if guidance_pack is not None:
            guidance, gparams = guidance_pack
            ref = self.data.ref_batch()
            bank = guidance.prepare_embeddings(gparams, ref["ref_rgb"])
            self._gstate = (gparams, bank)  # rides the step as an ARGUMENT

            def guidance_fn(gstate, rng, rgb, batch):  # noqa: F811
                gp, bk = gstate
                return guidance.sds_loss(
                    gp, bk, rng, rgb, batch["elevation"], batch["azimuth"],
                    batch["camera_distances"], None, batch["step"],
                )["loss_sds"]

        self._train_step, self._density_step = make_gaussian_train_step(
            self.gcfg, self.raster_cfg, optimizer, loss_cfg, guidance_fn,
            invert_bg_prob=float(system.get("renderer", {}).get("invert_bg_prob", 1.0)),
            sugar_reg_start=int(freq.get("start_sugar_reg", 3000)),
        )
        self.state = self.par.replicate(init_gaussian_train_state(gaussians, optimizer))
        self._gstate = self.par.shard_guidance(self._gstate)
        self._make_reg_state = make_reg_state
        self.reg_state = make_reg_state(self.state)
        self.rng = jax.random.PRNGKey(cfg.seed)

    def train_step(self, step: int) -> Dict[str, float]:
        batch = self.data.train_batch(step)
        keep = ("ref_cameras", "ref_rgb", "ref_mask", "rand_cameras")
        if self._gstate is not None:  # SDS conditioning needs the view poses
            keep += ("elevation", "azimuth", "camera_distances")
        b = self.par.shard_batch({k: batch[k] for k in keep})
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._train_step(self.state, b, self.reg_state, k,
                                               self._gstate)
        if (self.densify_from <= step < self.densify_until
                and step % self.densify_every == 0 and step > 0):
            self.rng, k2 = jax.random.split(self.rng)
            self.state, info = self._density_step(self.state, k2)
            metrics = dict(metrics)
            metrics["gauss_num"] = info["n_alive"]
        if step % self.reset_neighbors_every == 0:
            self.reg_state = self._make_reg_state(self.state)
        if self.opacity_reset_every > 0 and step > 0 and step % self.opacity_reset_every == 0:
            from ..models.geometry.gaussian import reset_opacity

            self.state = self.state._replace(gaussians=reset_opacity(self.state.gaussians))
        return metrics

    def validate(self, step: int, test: bool = False) -> None:
        from ..models.geometry.gaussian import renderable
        from ..models.renderers.sugar_rasterizer import CameraBatch
        from ..ops.cameras import GSCameraInfo
        from ..ops.gs import rasterize

        orbit = self.data.random_sampler.orbit(n_views=4)
        means, quats, scales, opac, sh = renderable(self.state.gaussians)
        frames = []
        for i in range(4):
            cam = GSCameraInfo(orbit["rand_cameras"].world_view[i],
                               orbit["rand_cameras"].full_proj[i],
                               orbit["rand_cameras"].camera_center[i])
            out = rasterize(means, opac, cam, self.raster_cfg, jnp.ones(3), sh=sh,
                            sh_degree=self.gcfg.sh_degree, scales=scales, quats=quats)
            frames.append(np.asarray(jnp.clip(out.rgb, 0, 1)))
        self.saver.save_image_grid(
            f"it{step}-gaussian.png", [{"type": "rgb", "img": f} for f in frames]
        )

    def export(self) -> None:
        from ..export.gaussian_io import save_gaussians_ply
        from ..models.geometry.gaussian import renderable

        g = self.state.gaussians
        alive = np.asarray(g.alive)
        sh = np.concatenate([np.asarray(g.sh_dc), np.asarray(g.sh_rest)], 1)
        save_gaussians_ply(
            self.saver.path("gaussians.ply"),
            np.asarray(g.xyz)[alive], sh[alive],
            np.asarray(g.opacity_logits)[alive],
            np.asarray(g.log_scales)[alive], np.asarray(g.quats)[alive],
        )

    def state_for_checkpoint(self):
        return self.state

    def load_state(self, state):
        self.state = state
        self.reg_state = self._make_reg_state(self.state)


# ---------------------------------------------------------------------------
# sugar-static experiment
# ---------------------------------------------------------------------------


@ds.register("sugar-static-system")
class SugarStaticExperiment:
    def __init__(self, cfg):
        from ..systems.optim import sugar_optimizer
        from ..systems.sugar_static import (
            SugarStaticLosses,
            init_state,
            make_render_eval,
            make_train_step,
        )

        self.cfg = cfg
        system = cfg.system
        self.saver = Saver(os.path.join(cfg.trial_dir, "save"))
        self.data = make_single_image_datamodule(cfg.data, cfg.seed)
        # dp×tp mesh from trainer.devices / trainer.mesh (reference: Lightning
        # DDP via devices=-1, launch.py:228-235)
        self.par = ParallelContext.from_trainer_cfg(dict(cfg.trainer or {}))
        if self.par.active:
            self.par.check_batch_size(self.data.cfg.random_camera.batch_size,
                                      "data.random_camera.batch_size")

        geo_cfg_d = dict(system.get("geometry", {}))
        mesh_path = geo_cfg_d.get("surface_mesh_to_bind_path")
        mesh = load_mesh(str(mesh_path))
        sugar_cfg = _filtered_dataclass(SuGaRConfig, {
            k: v for k, v in geo_cfg_d.items()
            if k in ("n_gaussians_per_surface_triangle", "sh_degree", "init_gs_scales_s",
                     "color_clip", "spatial_extent")
        })
        if "init_gs_opacity" in geo_cfg_d:
            sugar_cfg.init_gs_opacity = float(geo_cfg_d["init_gs_opacity"])
        params, self.static = create_sugar(sugar_cfg, mesh)

        optimizer = sugar_optimizer(
            position_lr=geo_cfg_d.get("position_lr", 0.00048),
            scaling_lr=geo_cfg_d.get("scaling_lr", 0.005),
            feature_lr=geo_cfg_d.get("feature_lr", 0.001),
            opacity_lr=geo_cfg_d.get("opacity_lr", 0.02),
            rotation_lr=geo_cfg_d.get("rotation_lr", 0.001),
            spatial_lr_scale=float(geo_cfg_d.get("spatial_lr_scale", 1.0)),
        )
        loss_cfg = _filtered_dataclass(SugarStaticLosses, {
            k: v for k, v in dict(system.get("loss", {})).items()
            if k in SugarStaticLosses.__dataclass_fields__
        })

        d = self.data.cfg
        self.raster_cfg = build_raster_config(
            d.random_camera.height, d.random_camera.width, d.default_fovy_deg, system
        )

        guidance_pack = maybe_build_guidance(system)
        guidance_fn = None
        self._gstate = None
        if guidance_pack is not None:
            guidance, gparams = guidance_pack
            ref = self.data.ref_batch()
            bank = guidance.prepare_embeddings(gparams, ref["ref_rgb"])
            self._gstate = (gparams, bank)  # rides the step as an ARGUMENT

            def guidance_fn(gstate, rng, rgb, batch):  # noqa: F811
                gp, bk = gstate
                return guidance.sds_loss(
                    gp, bk, rng, rgb, batch["elevation"], batch["azimuth"],
                    batch["camera_distances"], None, batch["step"],
                )["loss_sds"]

        invert_bg_prob = float(system.get("renderer", {}).get("invert_bg_prob", 1.0))

        # per-milestone compiled steps: list-valued heights train at EACH
        # milestone size with its own jitted step (JAX compiles per static
        # shape anyway — this is a dict of steps keyed by resolution),
        # honoring resolution_milestones exactly like the static NeRF path
        # (reference image.py:117-126,232).  Scalar configs hit one key.
        def _build_step(rc_h, rc_w, ref_h, ref_w):
            rc = build_raster_config(rc_h, rc_w, d.default_fovy_deg, system)
            rf = build_raster_config(ref_h, ref_w, d.default_fovy_deg, system)
            return make_train_step(
                self.static, rc, optimizer, loss_cfg, guidance_fn,
                invert_bg_prob=invert_bg_prob, ref_raster_cfg=rf,
            )

        self._build_step = _build_step
        self._steps: Dict[tuple, Any] = {}
        self._train_step = self._step_for_current()
        self._render_eval = make_render_eval(self.static, self.raster_cfg)
        self.state = self.par.replicate(init_state(params, optimizer))
        self._gstate = self.par.shard_guidance(self._gstate)
        self.rng = jax.random.PRNGKey(cfg.seed)

    def _step_for_current(self):
        rs = self.data.random_sampler
        rc_h = rs.height if rs is not None else self.data.height
        rc_w = rs.width if rs is not None else self.data.width
        key = (int(rc_h), int(rc_w), int(self.data.height), int(self.data.width))
        if key not in self._steps:
            self._steps[key] = self._build_step(*key)
        return self._steps[key]

    def train_step(self, step: int) -> Dict[str, float]:
        from ..utils.schedule import C_max

        batch = self.data.train_batch(step)
        # milestone boundary: train_batch applied data/sampler milestones —
        # switch to (or compile) the step for the CURRENT resolution
        self._train_step = self._step_for_current()
        keep = ("ref_cameras", "ref_rgb", "ref_mask", "rand_cameras")
        if self._gstate is not None:  # SDS conditioning needs the view poses
            keep += ("elevation", "azimuth", "camera_distances")
        # ref geometry supervision / normal-depth agreement inputs
        loss_d = dict(self.cfg.system.get("loss", {}))
        if C_max(loss_d.get("lambda_depth", 0)) > 0 or C_max(loss_d.get("lambda_depth_rel", 0)) > 0:
            keep += ("ref_depth",)
        if C_max(loss_d.get("lambda_normal", 0)) > 0:
            keep += ("ref_normal",)
        if C_max(loss_d.get("lambda_normal_depth_consistency", 0)) > 0:
            batch["rand_rays_o"] = batch["rays_o"]
            batch["rand_rays_d"] = batch["rays_d"]
            keep += ("rand_rays_o", "rand_rays_d")
        batch = self.par.shard_batch({k: batch[k] for k in keep})
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._train_step(self.state, batch, k, self._gstate)
        return metrics

    def validate(self, step: int, test: bool = False) -> None:
        n = self.data.cfg.random_camera.n_test_views if test else 8
        orbit = self.data.random_sampler.orbit(n_views=n)
        out = self._render_eval(self.state.params, orbit["rand_cameras"])
        frames = [np.asarray(out["comp_rgb"][i]) for i in range(n)]
        if test:
            self.saver.save_img_sequence(f"it{step}-test.mp4", frames, fps=10)
        else:
            for i in range(min(n, 4)):
                self.saver.save_image_grid(
                    f"it{step}-{i}.png",
                    [
                        {"type": "rgb", "img": np.asarray(out["comp_rgb"][i])},
                        {"type": "rgb", "img": np.asarray(out["comp_normal"][i])},
                        {"type": "grayscale", "img": np.asarray(out["comp_mask"][i])},
                    ],
                )

    def export(self) -> None:
        from ..ops.sh import sh_dc_to_rgb

        params = self.state.params
        attrs = gaussian_attributes(params, self.static)
        mesh = MeshData(
            v_pos=np.asarray(params.points),
            t_pos_idx=np.asarray(self.static.faces),
        )
        save_obj(self.saver.path("refined_mesh.obj"), mesh)
        from ..export.gaussian_io import save_gaussians_ply

        save_gaussians_ply(
            self.saver.path("gaussians.ply"),
            np.asarray(attrs.means3d),
            np.asarray(jnp.swapaxes(attrs.sh, -1, -2)),
            np.asarray(params.density_logits),
            np.asarray(jnp.log(attrs.scales)),
            np.asarray(attrs.quats),
        )

    # checkpoint protocol
    def state_for_checkpoint(self):
        return self.state

    def load_state(self, state):
        self.state = state


# ---------------------------------------------------------------------------
# sugar-4dgen experiment
# ---------------------------------------------------------------------------


@ds.register("sugar-4dgen-system")
class Sugar4DGenExperiment:
    def __init__(self, cfg):
        import optax

        from ..models.geometry.deformation import DeformationConfig, init_deformation
        from ..models.geometry.dynamic_sugar import DynamicSuGaRConfig, build_dynamic_static
        from ..ops.meshops import build_one_ring, cotangent_weights
        from ..systems.sugar_4dgen import (
            Sugar4DGenLosses,
            init_dyn_state,
            make_dynamic_render_eval,
            make_dynamic_train_step,
        )

        self.cfg = cfg
        system = cfg.system
        self.saver = Saver(os.path.join(cfg.trial_dir, "save"))
        self.data = make_temporal_datamodule(cfg.data, cfg.seed)
        # list-valued (milestone) sizes are honored by compiling ONE step per
        # milestone resolution (see _step_for_current below) — the video bank
        # + raster shapes are per-step closure constants, so each size gets
        # its own jitted step instead of pinning to the final resolution
        # (reference image.py:117-126,232 via temporal_image.py)
        self.par = ParallelContext.from_trainer_cfg(dict(cfg.trainer or {}))
        if self.par.active:
            self.par.check_batch_size(self.data.cfg.num_frames,
                                      "data.num_frames")

        geo_cfg_d = dict(system.get("geometry", {}))
        mesh_path = geo_cfg_d.get("surface_mesh_to_bind_path")
        mesh = load_mesh(str(mesh_path))
        sugar_cfg = _filtered_dataclass(SuGaRConfig, {
            k: v for k, v in geo_cfg_d.items()
            if k in ("n_gaussians_per_surface_triangle", "sh_degree", "init_gs_scales_s",
                     "color_clip", "spatial_extent")
        })
        sugar_params, sugar_static = create_sugar(sugar_cfg, mesh)

        # cross-stage weight transfer (system.weights=<static ckpt>).  A
        # mismatch here (e.g. wrong bind mesh) must be a HARD error — silently
        # discarding the refined appearance and training from mesh-derived
        # init would be a materially different run (reference loads via
        # load_state_dict, which raises on shape mismatch,
        # sugar_static.py:71-82).
        weights = cfg.system.get("weights")
        if weights:
            from ..utils.checkpoint import restore_checkpoint

            prev = restore_checkpoint(str(weights), None)
            if "params" not in prev:
                raise ValueError(
                    f"system.weights={weights!r} has no 'params' entry — not a "
                    "static SuGaR checkpoint")
            loaded = jax.tree.map(jnp.asarray, type(sugar_params)(**prev["params"]))
            for name in sugar_params._fields:
                want = getattr(sugar_params, name).shape
                got = getattr(loaded, name).shape
                if want != got:
                    raise ValueError(
                        f"system.weights={weights!r}: shape mismatch for "
                        f"{name!r}: checkpoint {got} vs bind mesh {want} — "
                        "was the static stage trained on a different mesh?")
            sugar_params = loaded
            ds.info("Loaded static SuGaR weights from %s", weights)

        deform_cfg = _filtered_dataclass(DeformationConfig, dict(geo_cfg_d.get("deformation", {})))
        dyn_cfg = DynamicSuGaRConfig(
            num_frames=int(geo_cfg_d.get("num_frames", 32)),
            dynamic_mode=str(geo_cfg_d.get("dynamic_mode", "deformation")),
            use_deform_graph=bool(geo_cfg_d.get("use_deform_graph", True)),
            n_dg_nodes=int(geo_cfg_d.get("n_dg_nodes", 1000)),
            dg_node_connectivity=int(geo_cfg_d.get("dg_node_connectivity", 4)),
            dist_mode=str(geo_cfg_d.get("dist_mode", "geodisc")),
            skinning_method=str(geo_cfg_d.get("skinning_method", "hybrid")),
            d_scale=bool(geo_cfg_d.get("d_scale", True)),
            deformation=deform_cfg,
        )
        self.static = build_dynamic_static(dyn_cfg, sugar_static, np.asarray(sugar_params.points))
        self.sugar_params = sugar_params
        self.dyn_cfg = dyn_cfg

        ring = build_one_ring(np.asarray(sugar_static.faces), len(sugar_params.points))
        arap_w = cotangent_weights(np.asarray(sugar_params.points),
                                   np.asarray(sugar_static.faces), ring)

        lr = float(system.get("optimizer", {}).get("args", {}).get("lr", 1.6e-3))
        optimizer = optax.adam(lr, b1=0.9, b2=0.99)
        loss_cfg = _filtered_dataclass(Sugar4DGenLosses, {
            k: v for k, v in dict(system.get("loss", {})).items()
            if k in Sugar4DGenLosses.__dataclass_fields__
        })

        d = self.data.cfg
        self.raster_cfg = build_raster_config(
            d.random_camera.height, d.random_camera.width, d.default_fovy_deg, system
        )

        guidance_fn = None
        self._gstate = None
        self._guidance = None
        guidance_pack = maybe_build_guidance(system)
        if guidance_pack is not None:
            guidance, gparams = guidance_pack
            self._guidance = guidance
            # embedding bank from the FINAL-milestone frames: the guidance
            # resizes internally (encode_cond_latent), so the bank is
            # resolution-independent — build it once from the sharpest source
            frames_rgb, _ = self.data.frames_at(
                int(self.data.heights[-1]), int(self.data.widths[-1]))
            bank = guidance.prepare_embeddings(gparams, jnp.asarray(frames_rgb))
            # params/bank ride the jitted step as an argument — closing over
            # them would bake ~3.4 GB of UNet weights into the program as
            # captured constants (unbounded lowering/compile)
            self._gstate = (gparams, bank)

            def guidance_fn(gstate, rng, rgb, batch):  # noqa: F811
                gp, bk = gstate
                return guidance.sds_loss(
                    gp, bk, rng, rgb, batch["elevation"], batch["azimuth"],
                    batch["camera_distances"], batch["frame_indices"], batch["step"],
                )["loss_sds"]

        freq = dict(system.get("freq", {}))
        self.guidance_eval_every = int(freq.get("guidance_eval", 0))
        self.inter_frame_every = int(freq.get("inter_frame_reg", 10))
        self.num_inter_frames = int(system.get("num_inter_frames", 10))
        self.length_inter_frames = float(system.get("length_inter_frames", 0.2))

        if dyn_cfg.dynamic_mode == "discrete":
            from ..models.geometry.dynamic_sugar import init_discrete_params

            deform_params = init_discrete_params(dyn_cfg, len(sugar_params.points))
        else:
            deform_params = init_deformation(deform_cfg, jax.random.PRNGKey(cfg.seed))
        from ..utils.schedule import C_max as _cmax

        loss_d = dict(system.get("loss", {}))
        need_depth = (_cmax(loss_d.get("lambda_depth", 0)) > 0
                      or _cmax(loss_d.get("lambda_depth_rel", 0)) > 0)
        need_normal = _cmax(loss_d.get("lambda_normal", 0)) > 0
        grs = int(dict(system.get("guidance", {})).get("guidance_render_size", 0) or 0)
        if guidance_fn is None:
            grs = 0  # the rand views only feed SDS; keep data-size renders
        invert_bg = float(system.get("renderer", {}).get("invert_bg_prob", 1.0))
        arap_start = int(freq.get("milestone_arap_reg", 0))

        # per-milestone compiled steps: each resolution closes over its own
        # frame bank + raster cfgs (reference image.py:117-126,232 honored for
        # list-valued heights; scalar configs compile exactly one step)
        def _build_step(rc_h, rc_w, ref_h, ref_w):
            rc = build_raster_config(rc_h, rc_w, d.default_fovy_deg, system)
            rf = build_raster_config(ref_h, ref_w, d.default_fovy_deg, system)
            frames_rgb_np, frames_mask_np = self.data.frames_at(ref_h, ref_w)
            video_frames = (jnp.asarray(frames_rgb_np), jnp.asarray(frames_mask_np))
            video_depths = (jnp.asarray(self.data.load_depths(ref_h, ref_w))
                            if need_depth else None)
            video_normals = (jnp.asarray(self.data.load_normals(ref_h, ref_w))
                             if need_normal else None)
            rand_rc = None
            if grs and grs != rc_h:
                rand_rc = build_raster_config(grs, grs, d.default_fovy_deg, system)
            return make_dynamic_train_step(
                sugar_params, self.static, deform_cfg, rc, optimizer,
                loss_cfg, jnp.asarray(arap_w), guidance_fn,
                invert_bg_prob=invert_bg, arap_start_step=arap_start,
                ref_raster_cfg=rf, video_frames=video_frames,
                rand_raster_cfg=rand_rc, video_depths=video_depths,
                video_normals=video_normals,
            )

        self._build_step = _build_step
        self._steps: Dict[tuple, Any] = {}
        self._train_step = self._step_for_current()
        self._render_eval = make_dynamic_render_eval(
            sugar_params, self.static, deform_cfg, self.raster_cfg
        )
        self.state = self.par.replicate(init_dyn_state(deform_params, optimizer))
        self._gstate = self.par.shard_guidance(self._gstate)
        self.rng = jax.random.PRNGKey(cfg.seed)

    def _step_for_current(self):
        rs = self.data.random_sampler
        rc_h = rs.height if rs is not None else self.data.height
        rc_w = rs.width if rs is not None else self.data.width
        key = (int(rc_h), int(rc_w), int(self.data.height), int(self.data.width))
        if key not in self._steps:
            self._steps[key] = self._build_step(*key)
        return self._steps[key]

    def train_step(self, step: int) -> Dict[str, float]:
        batch = self.data.train_batch(step)
        # milestone boundary: switch to (or compile) the step whose frame
        # bank + raster shapes match the CURRENT milestone resolution
        self._train_step = self._step_for_current()
        batch["inter_timestamps"] = self.data.inter_frame_timestamps(
            self.num_inter_frames, self.length_inter_frames
        )
        # frames stay device-resident (gathered by index inside the jit) —
        # only cameras/timestamps cross the host boundary per step
        keep = ("timestamps", "frame_indices", "ref_cameras",
                "rand_cameras", "inter_timestamps")
        if self._gstate is not None:  # SDS conditioning needs the view poses
            keep += ("elevation", "azimuth", "camera_distances")
        batch = self.par.shard_batch({k: batch[k] for k in keep})
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._train_step(self.state, batch, k, self._gstate)
        if (self.guidance_eval_every > 0 and self._gstate is not None
                and (step + 1) % self.guidance_eval_every == 0):
            self.rng, k_ge = jax.random.split(self.rng)
            # only render the views the snapshot consumes
            V = 2
            cams = batch["rand_cameras"]
            cams2 = type(cams)(*(x[:V] for x in cams))
            out = self._render_eval(
                self.state.deform_params, cams2, batch["timestamps"][:V],
                batch["frame_indices"][:V],
            )
            _guidance_eval_snapshot(
                self.saver, self._guidance, self._gstate, k_ge, out["comp_rgb"],
                batch["elevation"][:V], batch["azimuth"][:V],
                batch["camera_distances"][:V],
                step + 1, frame_indices=batch["frame_indices"][:V],
            )
        return metrics

    def validate(self, step: int, test: bool = False) -> None:
        for batch in self.data.eval_batches():
            out = self._render_eval(
                self.state.deform_params, batch["cameras"], batch["timestamps"],
                batch.get("frame_indices"),
            )
            frames = [np.asarray(out["comp_rgb"][i]) for i in range(len(batch["timestamps"]))]
            self.saver.save_img_sequence(
                f"it{step}-az{int(batch['azimuth'])}.mp4", frames, fps=10
            )
            if not test:
                break  # one azimuth during training validation

    def export(self) -> None:
        """Per-timestamp textured OBJ meshes sharing ONE baked texture
        (sugar_4dgen.py:594-637): bake from the predict orbit at the first
        timestamp, then save every frame's deformed mesh with the same UVs."""
        from ..data.temporal_image import frame_timestamps
        from ..export.texture_bake import bake_texture, export_textured_mesh
        from ..models.geometry.dynamic_sugar import timed_all
        from ..models.geometry.sugar import gaussian_attributes
        from ..ops.gs import rasterize

        L = self.data.video_length
        ts = jnp.asarray(frame_timestamps(L))
        deform_cfg = self.dyn_cfg.deformation
        gs, vert = timed_all(self.sugar_params, self.state.deform_params,
                             deform_cfg, self.static, ts,
                             frame_indices=jnp.arange(L, dtype=jnp.int32))
        faces = np.asarray(self.static.sugar.faces)

        # bake: render timed gaussians (t=first frame) from the predict orbit
        # at the predict resolution (reference bakes its 1024² predict renders,
        # base.py:253-292); system.exporter.bake_resolution overrides
        pred = self.data.predict_batch()
        bake_hw = (int(dict(self.cfg.system.get("exporter", {})).get("bake_resolution", 0))
                   or int(pred["height"]))
        import math as _math

        t_tan = _math.tan(_math.radians(self.data.cfg.default_fovy_deg) / 2)
        bake_cfg = self.raster_cfg._replace(width=bake_hw, height=bake_hw,
                                            tan_fovx=t_tan, tan_fovy=t_tan)
        attrs0 = gaussian_attributes(self.sugar_params, self.static.sugar)
        means0, quats0, scales0 = gs.means3d[0], gs.quats[0], gs.scales[0]

        def render_rgb(cam):
            return rasterize(
                means0, attrs0.opacities, cam, bake_cfg, jnp.ones(3),
                sh=attrs0.sh, sh_degree=self.static.sugar.sh_degree,
                scales=scales0, quats=quats0,
            ).rgb

        cams = pred["cameras"]
        exporter_cfg = self.cfg.system.get("exporter", {})
        tex_size = int(exporter_cfg.get("texture_size", 1024))
        # system.exporter.atlas: "square" (per-face, reference DreamMesh4D
        # bake, system/base.py:72-131) or "charts" (xatlas-style unwrap)
        atlas = str(exporter_cfg.get("atlas", "square"))
        texture, v_tex, t_tex = bake_texture(
            vert.xyz[0], self.static.sugar.faces, cams.world_view, cams.full_proj,
            cams.camera_center, render_rgb, bake_hw, bake_hw, tex_size=tex_size,
            atlas=atlas,
        )
        for i in range(L):
            export_textured_mesh(
                self.saver.path(f"4d_export/frame_{i:03d}.obj"),
                np.asarray(vert.xyz[i]), faces, texture, v_tex, t_tex,
                mtl_name="material0",
            )

    def state_for_checkpoint(self):
        return self.state

    def load_state(self, state):
        self.state = state


# ---------------------------------------------------------------------------
# zero123 (static NeRF) experiment
# ---------------------------------------------------------------------------


@ds.register("zero123-system")
class Zero123Experiment:
    def __init__(self, cfg):
        import optax

        from ..models.geometry.implicit_volume import (
            ImplicitVolumeConfig,
            init_implicit_volume,
        )
        from ..models.materials import DiffuseWithPointLightMaterial
        from ..models.renderers.nerf_volume_renderer import (
            NeRFRendererConfig,
            make_image_renderer,
        )
        from ..ops.hashgrid import HashGridConfig, progressive_level_mask
        from ..systems.zero123_system import (
            Zero123Losses,
            init_nerf_state,
            make_zero123_train_step,
        )

        self.cfg = cfg
        system = cfg.system
        self.saver = Saver(os.path.join(cfg.trial_dir, "save"))
        self.data = make_single_image_datamodule(cfg.data, cfg.seed)
        self.par = ParallelContext.from_trainer_cfg(dict(cfg.trainer or {}))
        if self.par.active:
            self.par.check_batch_size(self.data.cfg.random_camera.batch_size,
                                      "data.random_camera.batch_size")

        geo_d = dict(system.get("geometry", {}))
        pos_enc = dict(geo_d.get("pos_encoding_config", {}))
        hg = HashGridConfig(
            n_levels=int(pos_enc.get("n_levels", 16)),
            n_features_per_level=int(pos_enc.get("n_features_per_level", 2)),
            log2_hashmap_size=int(pos_enc.get("log2_hashmap_size", 19)),
            base_resolution=int(pos_enc.get("base_resolution", 16)),
            per_level_scale=float(pos_enc.get("per_level_scale", 1.447269237440378)),
            layout=str(pos_enc.get("layout", "corner")),
        )
        self.geo_cfg = ImplicitVolumeConfig(
            radius=float(geo_d.get("radius", 2.0)),
            density_bias=geo_d.get("density_bias", "blob_magic3d"),
            density_activation=str(geo_d.get("density_activation", "softplus")),
            density_blob_scale=float(geo_d.get("density_blob_scale", 10.0)),
            density_blob_std=float(geo_d.get("density_blob_std", 0.5)),
            normal_type=str(geo_d.get("normal_type", "analytic")),
            hashgrid=hg,
        )
        rend = dict(system.get("renderer", {}))
        self.rcfg = NeRFRendererConfig(
            radius=self.geo_cfg.radius,
            num_samples_coarse=int(rend.get("num_samples_coarse", 64)),
            num_samples_fine=int(rend.get("num_samples_fine", 64)),
            estimator=str(rend.get("estimator", "importance")),
            grid_resolution=int(rend.get("grid_resolution", 32)),
            occ_candidates=int(rend.get("occ_candidates", 192)),
            occ_samples=int(rend.get("occ_samples", 64)),
            occ_thre=float(rend.get("occ_thre", 0.01)),
            grid_update_every=int(rend.get("grid_update_every", 16)),
        )
        self.material = DiffuseWithPointLightMaterial()
        self.hg = hg

        opt_args = dict(system.get("optimizer", {}).get("args", {}))
        optimizer = optax.adam(
            float(opt_args.get("lr", 0.01)),
            b1=float(opt_args.get("betas", [0.9, 0.99])[0]),
            b2=float(opt_args.get("betas", [0.9, 0.99])[1]),
            eps=float(opt_args.get("eps", 1e-8)),
        )
        loss_cfg = _filtered_dataclass(Zero123Losses, {
            k: v for k, v in dict(system.get("loss", {})).items()
            if k in Zero123Losses.__dataclass_fields__
        })

        guidance_fn = None
        self._gstate = None
        self._guidance = None
        self.guidance_eval_every = int(dict(system.get("freq", {})).get("guidance_eval", 0))
        guidance_pack = maybe_build_guidance(system)
        if guidance_pack is not None:
            guidance, gparams = guidance_pack
            self._guidance = guidance
            ref = self.data.ref_batch()
            bank = guidance.prepare_embeddings(gparams, ref["ref_rgb"])
            self._gstate = (gparams, bank)  # rides the step as an ARGUMENT

            def guidance_fn(gstate, rng, rgb, batch):  # noqa: F811
                gp, bk = gstate
                return guidance.sds_loss(
                    gp, bk, rng, rgb, batch["elevation"], batch["azimuth"],
                    batch["camera_distances"], None, batch["step"],
                )["loss_sds"]

        self._train_step = make_zero123_train_step(
            self.geo_cfg, self.rcfg, optimizer, loss_cfg, self.material, guidance_fn
        )
        self._image_renderer = make_image_renderer(self.geo_cfg, self.rcfg, self.material)
        params = init_implicit_volume(self.geo_cfg, jax.random.PRNGKey(cfg.seed))
        self.state = self.par.replicate(init_nerf_state(params, optimizer))
        self._gstate = self.par.shard_guidance(self._gstate)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)
        self.ambient_only_steps = int(system.get("material", {}).get("ambient_only_steps", 0))

        # occupancy-grid estimator state (nerfacc update_every_n_steps parity)
        self.occ_state = None
        self._occ_update = None
        if self.rcfg.estimator == "occgrid":
            from ..models.renderers.nerf_volume_renderer import (
                init_occgrid,
                make_occgrid_update,
            )

            self.occ_state = init_occgrid(self.rcfg)
            self._occ_update = make_occgrid_update(self.geo_cfg, self.rcfg)

    def train_step(self, step: int) -> Dict[str, float]:
        batch = self.data.train_batch(step)  # applies resolution milestones
        ref = self.data.ref_batch()
        rand = batch
        b = {
            "ref_rays_o": ref["ref_rays_o"].reshape(-1, 3),
            "ref_rays_d": ref["ref_rays_d"].reshape(-1, 3),
            "ref_rgb": ref["ref_rgb"].reshape(-1, 3),
            "ref_mask": ref["ref_mask"].reshape(-1, 1),
            "ref_light": jnp.asarray([0.0, 0.0, 3.0]),
            "rand_rays_o": rand["rays_o"],
            "rand_rays_d": rand["rays_d"],
            "light_positions": rand["light_positions"],
            "elevation": rand["elevation"],
            "azimuth": rand["azimuth"],
            "camera_distances": rand["camera_distances"],
        }
        if "ref_depth" in ref:
            b["ref_depth"] = ref["ref_depth"].reshape(-1, 1)
        if "ref_normal" in ref:
            b["ref_normal"] = ref["ref_normal"].reshape(-1, 3)
        b = self.par.shard_batch(b)
        lm = jnp.asarray(progressive_level_mask(self.hg, step))
        ambient = 1.0 if step < self.ambient_only_steps else 0.1 + 0.9 * float(np.random.rand())
        if self._occ_update is not None and step % self.rcfg.grid_update_every == 0:
            self.rng, k_occ = jax.random.split(self.rng)
            self.occ_state = self._occ_update(self.occ_state, self.state.geo_params,
                                              k_occ, lm)
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._train_step(self.state, b, k, lm, ambient,
                                               self._gstate, self.occ_state)
        if (self.guidance_eval_every > 0 and self._gstate is not None
                and (step + 1) % self.guidance_eval_every == 0):
            # re-render the first random view (the in-step render lives inside
            # the jitted loss) and decode the SDS diagnostics
            self.rng, k_ge = jax.random.split(self.rng)
            out = self._image_renderer(
                self.state.geo_params, rand["rays_o"][0], rand["rays_d"][0],
                rand["light_positions"][0], jnp.ones(3), level_mask=lm,
                ambient_ratio=1.0,
            )
            _guidance_eval_snapshot(
                self.saver, self._guidance, self._gstate, k_ge,
                out["comp_rgb"][None], rand["elevation"], rand["azimuth"],
                rand["camera_distances"], step + 1,
            )
        return metrics

    def validate(self, step: int, test: bool = False) -> None:
        import math as _math

        from ..ops.cameras import get_ray_directions, get_rays

        R = min(int(self.data.cfg.random_camera.eval_height), 128)
        orbit = self.data.random_sampler.orbit(n_views=4, height=R, width=R)
        frames = []
        fovy = _math.radians(self.data.cfg.default_fovy_deg)
        dirs = get_ray_directions(R, R, 0.5 * R / _math.tan(0.5 * fovy))
        for i in range(4):
            ro, rd = get_rays(dirs, orbit["c2w"][i], keepdim=True)
            out = self._image_renderer(
                self.state.geo_params, ro, rd, jnp.asarray([0.0, 0.0, 3.0]),
                jnp.ones(3), ambient_ratio=1.0,
            )
            frames.append(np.asarray(out["comp_rgb"]))
        self.saver.save_image_grid(
            f"it{step}-nerf.png", [{"type": "rgb", "img": f} for f in frames]
        )

    def export(self) -> None:
        """mc-cpu mesh export with vertex colors (mesh-exporter fmt=obj path,
        threestudio/models/exporters/mesh_exporter.py:43-175)."""
        from ..export.isosurface import extract_isosurface
        from ..models.geometry.implicit_volume import export_density_grid, forward_field

        res = int(self.cfg.system.get("exporter", {}).get("isosurface_resolution", 128))
        grid = export_density_grid(self.state.geo_params, self.geo_cfg, res)
        r = self.geo_cfg.radius
        mesh = extract_isosurface(grid, None, (-r,) * 3, (r,) * 3)
        if mesh.n_verts:
            from ..ops.hashgrid_pallas import tpu_jit

            # tpu_jit: the cell-layout encode kernel needs the raised
            # scoped-vmem limit at vertex-count batch sizes
            geo_cfg = self.geo_cfg
            _, feats = tpu_jit(lambda p, x: forward_field(p, geo_cfg, x))(
                self.state.geo_params, jnp.asarray(mesh.v_pos))
            mesh.v_rgb = np.asarray(jax.nn.sigmoid(feats))
        save_obj(self.saver.path("model.obj"), mesh)

    def state_for_checkpoint(self):
        return self.state

    def load_state(self, state):
        self.state = state


EXPERIMENTS = {
    "sugar-static-system": SugarStaticExperiment,
    "sugar-4dgen-system": Sugar4DGenExperiment,
    "zero123-system": Zero123Experiment,
}


def build_experiment(cfg):
    if cfg.system_type not in EXPERIMENTS:
        raise KeyError(
            f"Unknown system_type {cfg.system_type!r}; known: {sorted(EXPERIMENTS)}"
        )
    cls = EXPERIMENTS[cfg.system_type]
    # sugar-static dispatches on its stage (reference sugar_static.py:309:
    # 'gaussian' runs vanilla 3DGS + density control, 'sugar' the bound refine)
    if cfg.system_type == "sugar-static-system" and str(
        cfg.system.get("stage", "sugar")
    ) == "gaussian":
        cls = GaussianStageExperiment
    return cls(cfg)
