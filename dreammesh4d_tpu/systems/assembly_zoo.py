"""Launcher assembly for the threestudio systems zoo.

Extends systems/assembly.py's experiment table beyond the DreamMesh4D
pipeline: every NeRF-based zoo system (dreamfusion, efficient-dreamfusion,
latentnerf, sjc, magic3d, prolificdreamer, magic123,
image-condition-dreamfusion) becomes runnable through
``python launch.py --config configs/<x>.yaml --train`` with the same YAML
surface as the reference configs.

Guidance weights: text systems load real SD 1.x LDM checkpoints through
``models/guidance/zero123/convert.load_sd_checkpoint`` (UNet + VAE + CLIP
text tower), with the same hard-error path semantics as the Zero123 stages —
a missing checkpoint raises; ``random[:seed]`` is the explicit smoke-run
sentinel and ``none`` / ``guidance.allow_missing=true`` the explicit opt-out
(the reference crashes on bad paths,
threestudio/models/guidance/stable_diffusion_guidance.py:59-95).
"""

from __future__ import annotations

import math as _math
import os
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

import dreammesh4d_tpu as ds

from ..data.uncond import RandomCameraSampler
from ..export.mesh_io import save_obj
from ..utils.saving import Saver
from .assembly import (
    _filtered_dataclass,
    make_random_camera_config,
    make_single_image_datamodule,
)


def _build_implicit_volume(system: dict, n_feature_dims: int = 3):
    from ..models.geometry.implicit_volume import ImplicitVolumeConfig
    from ..ops.hashgrid import HashGridConfig

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
    geo_cfg = ImplicitVolumeConfig(
        radius=float(geo_d.get("radius", 2.0)),
        density_bias=geo_d.get("density_bias", "blob_magic3d"),
        density_activation=str(geo_d.get("density_activation", "softplus")),
        density_blob_scale=float(geo_d.get("density_blob_scale", 10.0)),
        density_blob_std=float(geo_d.get("density_blob_std", 0.5)),
        normal_type=str(geo_d.get("normal_type", "analytic")),
        n_feature_dims=int(geo_d.get("n_feature_dims", n_feature_dims)),
        hashgrid=hg,
    )
    return geo_cfg, hg


def _build_optimizer(system: dict):
    import optax

    opt_args = dict(system.get("optimizer", {}).get("args", {}))
    betas = opt_args.get("betas", [0.9, 0.99])
    opt = optax.adam(float(opt_args.get("lr", 0.01)),
                     b1=float(betas[0]), b2=float(betas[1]),
                     eps=float(opt_args.get("eps", 1e-8)))
    # reference parse_scheduler parity (threestudio/systems/utils.py:50-104):
    # a system.scheduler block multiplies the LR by a per-step factor
    from .optim import with_scheduler
    return with_scheduler(opt, system.get("scheduler"))


def maybe_build_sd_guidance(system: dict, guidance_cls=None, config_cls=None):
    """(guidance, params, prompts) or None when SDS guidance is off.

    ``pretrained_model_name_or_path`` semantics mirror the Zero123 path
    (assembly.maybe_build_guidance; the reference loads SD weights
    unconditionally via diffusers from_pretrained and crashes on a bad path,
    threestudio/models/guidance/stable_diffusion_guidance.py:59-95):

    - ``""`` / ``none`` — guidance explicitly off.
    - ``random[:seed]`` — random weights (SDS smoke path; scores meaningless).
    - any other path — a torch SD 1.x LDM ``.ckpt`` or a converted orbax
      cache dir (scripts/convert_sd_ckpt.py); must exist, else
      FileNotFoundError unless ``guidance.allow_missing: true``."""
    gcfg = dict(system.get("guidance", {}))
    path = str(gcfg.get("pretrained_model_name_or_path", "") or "")
    is_random = path == "random" or path.startswith("random:")
    if not path or path.lower() == "none":
        return None
    if not is_random and not os.path.exists(path):
        if gcfg.get("allow_missing", False):
            ds.warn("SD checkpoint not found (%r) — text SDS disabled "
                    "(guidance.allow_missing=true).", path)
            return None
        raise FileNotFoundError(
            f"SD guidance checkpoint not found: {path!r}. Set "
            "system.guidance.pretrained_model_name_or_path to a real "
            "checkpoint (torch .ckpt or convert_sd_ckpt.py cache), "
            "'random[:seed]' for an SDS smoke run, or 'none' / "
            "system.guidance.allow_missing=true to train without text SDS."
        )
    from ..models.guidance.stable_diffusion import (
        PromptProcessorConfig,
        StableDiffusionConfig,
        StableDiffusionGuidance,
        StableDiffusionPromptProcessor,
    )

    guidance_cls = guidance_cls or StableDiffusionGuidance
    config_cls = config_cls or StableDiffusionConfig
    guidance = guidance_cls(_filtered_dataclass(config_cls, gcfg))
    if is_random:
        seed = int(path.partition(":")[2] or 0)
        params = guidance.init_params(jax.random.PRNGKey(seed))
    else:
        from ..models.guidance.zero123.convert import load_sd_checkpoint

        params = load_sd_checkpoint(path, guidance)
    pp_cfg = _filtered_dataclass(PromptProcessorConfig,
                                 dict(system.get("prompt_processor", {})))
    encode_fn = None
    if "text" in params:
        encode_fn = lambda ids: guidance.encode_tokens(params, ids)  # noqa: E731
    prompts = StableDiffusionPromptProcessor(pp_cfg, encode_fn=encode_fn)()
    return guidance, params, prompts


class _ZooNeRFBase:
    """Shared validate/export/checkpoint machinery for NeRF-zoo systems."""

    def _finish_init(self, cfg, geo_cfg, rcfg, material=None):
        from ..models.renderers.nerf_volume_renderer import make_image_renderer

        self.cfg = cfg
        self.geo_cfg = geo_cfg
        self.rcfg = rcfg
        self.saver = Saver(os.path.join(cfg.trial_dir, "save"))
        self._image_renderer = make_image_renderer(geo_cfg, rcfg, material)
        self.rng = jax.random.PRNGKey(cfg.seed + 1)

    def _rand_batch(self, step: int) -> dict:
        batch = self.sampler.sample()
        return batch

    def validate(self, step: int, test: bool = False) -> None:
        from ..ops.cameras import get_ray_directions, get_rays

        R = min(int(getattr(self.sampler.cfg, "eval_height", 128)), 128)
        orbit = self.sampler.orbit(n_views=4, height=R, width=R)
        fovy = _math.radians(float(getattr(self.sampler.cfg, "eval_fovy_deg", 70.0)))
        dirs = get_ray_directions(R, R, 0.5 * R / _math.tan(0.5 * fovy))
        frames = []
        for i in range(4):
            ro, rd = get_rays(dirs, orbit["c2w"][i], keepdim=True)
            out = self._image_renderer(
                self.state.geo_params, ro, rd, jnp.asarray([0.0, 0.0, 3.0]),
                jnp.ones(3), ambient_ratio=1.0,
            )
            img = np.asarray(out["comp_rgb"])
            frames.append(img[..., :3])
        self.saver.save_image_grid(
            f"it{step}-{'test' if test else 'val'}.png",
            [{"type": "rgb", "img": f} for f in frames],
        )

    def export(self) -> None:
        from ..export.isosurface import extract_isosurface
        from ..models.geometry.implicit_volume import (
            export_density_grid,
            forward_field,
        )

        res = int(self.cfg.system.get("exporter", {}).get("isosurface_resolution", 128))
        grid = export_density_grid(self.state.geo_params, self.geo_cfg, res)
        r = self.geo_cfg.radius
        mesh = extract_isosurface(grid, None, (-r,) * 3, (r,) * 3)
        if mesh.n_verts:
            _, feats = forward_field(self.state.geo_params, self.geo_cfg,
                                     jnp.asarray(mesh.v_pos))
            mesh.v_rgb = np.asarray(jax.nn.sigmoid(feats[:, :3]))
        save_obj(self.saver.path("model.obj"), mesh)

    def state_for_checkpoint(self):
        return self.state

    def load_state(self, state):
        self.state = state


class ZooTextExperiment(_ZooNeRFBase):
    """Text-to-3D NeRF systems: dreamfusion / efficient-dreamfusion /
    latentnerf / sjc / magic3d (coarse)."""

    def __init__(self, cfg):
        from ..models.renderers.nerf_volume_renderer import NeRFRendererConfig
        from ..models.geometry.implicit_volume import init_implicit_volume
        from .threestudio_zoo import (
            DreamFusionLosses,
            init_scene_state,
            make_dreamfusion_train_step,
            make_eff_dreamfusion_train_step,
        )
        from .threestudio_zoo2 import (
            LatentNeRFLosses,
            SJCLosses,
            make_latentnerf_train_step,
            make_sjc_train_step,
        )

        system = cfg.system
        st = cfg.system_type
        latent = st == "latentnerf-system" and not bool(system.get("refinement", False))
        geo_cfg, self.hg = _build_implicit_volume(system, 4 if latent else 3)
        rcfg = NeRFRendererConfig(radius=geo_cfg.radius)
        optimizer = _build_optimizer(system)
        self.sampler = RandomCameraSampler(
            make_random_camera_config(dict(cfg.data or {})), seed=cfg.seed)

        pack = maybe_build_sd_guidance(system)
        scale = float(dict(system.get("guidance", {})).get("guidance_scale", 100.0))
        # guidance params/prompt embeddings ride INSIDE the batch dict (added
        # per step by train_step) — closing over them would bake the SD UNet
        # into the jitted program as multi-GB captured constants
        self._gstate = None if pack is None else {"params": pack[1], "prompts": pack[2]}

        def guidance_fn(rng, rgb, batch, rgb_as_latents=False):
            if pack is None:
                return 0.0 * rgb.mean()
            guidance = pack[0]
            g = batch["_guidance"]
            return guidance.sds_loss(
                g["params"], g["prompts"], rng, rgb, batch["elevation"],
                batch["azimuth"], batch["camera_distances"], 0,
                rgb_as_latents=rgb_as_latents)["loss_sds"]

        loss_d = dict(system.get("loss", {}))
        if st == "dreamfusion-system" or st == "magic3d-system":
            losses = _filtered_dataclass(DreamFusionLosses, loss_d)
            self._step = make_dreamfusion_train_step(
                geo_cfg, rcfg, optimizer, losses, guidance_fn)
        elif st == "efficient-dreamfusion-system":
            losses = _filtered_dataclass(DreamFusionLosses, loss_d)
            full_hw = int(dict(cfg.data or {}).get("height", 64))
            self._step = make_eff_dreamfusion_train_step(
                geo_cfg, rcfg, optimizer, losses, guidance_fn, full_hw=full_hw)
        elif st == "latentnerf-system":
            losses = _filtered_dataclass(LatentNeRFLosses, loss_d)
            shape_loss = None
            guide = str(system.get("guide_shape", "") or "")
            if guide and os.path.exists(guide):
                from ..ops.shape_loss import ShapeLoss

                shape_loss = ShapeLoss(guide)
            self._step = make_latentnerf_train_step(
                geo_cfg, rcfg, optimizer, losses,
                lambda k, img, b, ral: guidance_fn(k, img, b, ral),
                refinement=bool(system.get("refinement", False)),
                shape_loss=shape_loss)
        elif st == "sjc-system":
            losses = _filtered_dataclass(SJCLosses, loss_d)
            self._step = make_sjc_train_step(geo_cfg, rcfg, optimizer, losses,
                                             guidance_fn)
        else:
            raise KeyError(st)

        params = init_implicit_volume(geo_cfg, jax.random.PRNGKey(cfg.seed))
        self.state = init_scene_state(params, optimizer)
        self._finish_init(cfg, geo_cfg, rcfg)
        self._eff = st == "efficient-dreamfusion-system"

    def train_step(self, step: int) -> Dict[str, float]:
        if self._eff:
            H = int(self.sampler.cfg.height)
            batch = self.sampler.sample_efficient(max(H // 4, 8), max(H // 4, 8))
        else:
            batch = self.sampler.sample()
        if self._gstate is not None:
            batch = {**batch, "_guidance": self._gstate}
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._step(self.state, batch, k)
        return metrics


class ZooVSDExperiment(_ZooNeRFBase):
    """prolificdreamer-system: VSD with the scene and LoRA-phi optimizers
    stepped inside one jitted step."""

    def __init__(self, cfg):
        import optax

        from ..models.geometry.implicit_volume import init_implicit_volume
        from ..models.renderers.nerf_volume_renderer import NeRFRendererConfig
        from .threestudio_zoo import (
            ProlificDreamerLosses,
            init_vsd_state,
            make_prolificdreamer_train_step,
        )

        system = cfg.system
        geo_cfg, self.hg = _build_implicit_volume(system)
        rcfg = NeRFRendererConfig(radius=geo_cfg.radius)
        optimizer = _build_optimizer(system)
        lora_opt = optax.adam(float(dict(system.get("optimizer", {}).get(
            "args", {})).get("lr_lora", 1e-3)))
        self.sampler = RandomCameraSampler(
            make_random_camera_config(dict(cfg.data or {})), seed=cfg.seed)

        from ..models.guidance.vsd import VSDConfig, VSDGuidance

        pack = maybe_build_sd_guidance(system, VSDGuidance, VSDConfig)
        if pack is not None:
            # the LoRA phi model always trains from scratch (delta starts at
            # zero, so phi == pretrained at step 0) — random init is correct
            # here even with converted base weights
            lora0 = pack[0].init_lora_params(jax.random.PRNGKey(1), pack[1]["unet"])
        else:
            lora0 = {"unused": jnp.zeros((1,))}
        self._gstate = None if pack is None else {"params": pack[1], "prompts": pack[2]}

        def vsd_fn(lora, rng, rgb, batch):
            if pack is None:
                z = 0.0 * rgb.mean()
                return {"loss_vsd": z,
                        "loss_lora": 0.0 * sum(jnp.sum(v) for v in
                                               jax.tree_util.tree_leaves(lora)),
                        "grad_norm": z}
            guidance = pack[0]
            g = batch["_guidance"]
            c2w = batch.get("c2w")
            cam = c2w.reshape(c2w.shape[0], -1) if c2w is not None else \
                jnp.zeros((rgb.shape[0], 16))
            return guidance.vsd_loss(g["params"], lora, g["prompts"], rng, rgb,
                                     batch["elevation"], batch["azimuth"],
                                     cam, 0)

        losses = _filtered_dataclass(ProlificDreamerLosses,
                                     dict(system.get("loss", {})))
        self._step = make_prolificdreamer_train_step(
            geo_cfg, rcfg, optimizer, lora_opt, losses, vsd_fn)
        params = init_implicit_volume(geo_cfg, jax.random.PRNGKey(cfg.seed))
        self.state = init_vsd_state(params, lora0, optimizer, lora_opt)
        self._finish_init(cfg, geo_cfg, rcfg)

    def train_step(self, step: int) -> Dict[str, float]:
        batch = self.sampler.sample()
        if self._gstate is not None:
            batch = {**batch, "_guidance": self._gstate}
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._step(self.state, batch, k)
        return metrics


class ZooImageExperiment(_ZooNeRFBase):
    """Image-conditioned NeRF systems: magic123 /
    image-condition-dreamfusion (single ref image + SDS)."""

    def __init__(self, cfg):
        from ..models.geometry.implicit_volume import init_implicit_volume
        from ..models.materials import DiffuseWithPointLightMaterial
        from ..models.renderers.nerf_volume_renderer import NeRFRendererConfig
        from .threestudio_zoo import (
            Magic123Losses,
            init_scene_state,
            make_magic123_train_step,
        )

        system = cfg.system
        geo_cfg, self.hg = _build_implicit_volume(system)
        rcfg = NeRFRendererConfig(radius=geo_cfg.radius)
        optimizer = _build_optimizer(system)
        self.data = make_single_image_datamodule(cfg.data, cfg.seed)
        self.sampler = self.data.random_sampler
        material = DiffuseWithPointLightMaterial()

        pack2d = maybe_build_sd_guidance(system)
        self._gstate = None
        if pack2d is not None:
            self._gstate = {"2d": {"params": pack2d[1], "prompts": pack2d[2]}}

        def g2d(rng, rgb, batch):
            if pack2d is None:
                return 0.0 * rgb.mean()
            guidance = pack2d[0]
            g = batch["_guidance"]["2d"]
            return guidance.sds_loss(
                g["params"], g["prompts"], rng, rgb, batch["elevation"],
                batch["azimuth"], batch["camera_distances"], 0)["loss_sds"]

        g3d = None
        from .assembly import maybe_build_guidance

        pack3d = maybe_build_guidance(
            {"guidance": dict(system.get("guidance_3d", {}))})
        if pack3d is not None:
            guidance3, g3params = pack3d
            ref = self.data.ref_batch()
            bank = guidance3.prepare_embeddings(g3params, ref["ref_rgb"])
            self._gstate = dict(self._gstate or {})
            self._gstate["3d"] = {"params": g3params, "bank": bank}

            def g3d(rng, rgb, batch):  # noqa: F811
                g = batch["_guidance"]["3d"]
                return guidance3.sds_loss(
                    g["params"], g["bank"], rng, rgb, batch["elevation"],
                    batch["azimuth"], batch["camera_distances"], None, 0,
                )["loss_sds"]

        losses = _filtered_dataclass(Magic123Losses, dict(system.get("loss", {})))
        if cfg.system_type == "image-condition-dreamfusion-system":
            self._step = make_magic123_train_step(
                geo_cfg, rcfg, optimizer, losses, guidance_2d_fn=g2d,
                guidance_3d_fn=None, material=material)
        else:
            self._step = make_magic123_train_step(
                geo_cfg, rcfg, optimizer, losses, guidance_2d_fn=g2d,
                guidance_3d_fn=g3d, material=material)
        params = init_implicit_volume(geo_cfg, jax.random.PRNGKey(cfg.seed))
        self.state = init_scene_state(params, optimizer)
        self._finish_init(cfg, geo_cfg, rcfg, material)

    def train_step(self, step: int) -> Dict[str, float]:
        rand = self.data.train_batch(step)
        ref = self.data.ref_batch()
        batch = {
            "ref_rays_o": ref["ref_rays_o"].reshape(-1, 3),
            "ref_rays_d": ref["ref_rays_d"].reshape(-1, 3),
            "ref_rgb": ref["ref_rgb"].reshape(-1, 3),
            "ref_mask": ref["ref_mask"].reshape(-1, 1),
            "ref_light": jnp.asarray([0.0, 0.0, 3.0]),
            "rays_o": rand["rays_o"],
            "rays_d": rand["rays_d"],
            "light_positions": rand["light_positions"],
            "elevation": rand["elevation"],
            "azimuth": rand["azimuth"],
            "camera_distances": rand["camera_distances"],
        }
        if self._gstate is not None:
            batch["_guidance"] = self._gstate
        self.rng, k = jax.random.split(self.rng)
        self.state, metrics = self._step(self.state, batch, k)
        return metrics


def register_zoo_experiments() -> None:
    from . import assembly

    for name in ("dreamfusion-system", "magic3d-system",
                 "efficient-dreamfusion-system", "latentnerf-system",
                 "sjc-system"):
        assembly.EXPERIMENTS.setdefault(name, ZooTextExperiment)
    assembly.EXPERIMENTS.setdefault("prolificdreamer-system", ZooVSDExperiment)
    for name in ("magic123-system", "image-condition-dreamfusion-system"):
        assembly.EXPERIMENTS.setdefault(name, ZooImageExperiment)


register_zoo_experiments()
