"""threestudio systems zoo, part 2: fantasia3d / latentnerf / sjc / magic3d.

Functional redesigns of the remaining prominent reference systems:

- ``fantasia3d-system`` (threestudio/systems/fantasia3d.py:44-90): DMTet
  geometry with TWO phases — geometry (the rendered normal map + opacity IS
  the SDS input, optionally as latents) and texture (rgb SDS on the fixed
  surface) — plus the mesh normal-consistency regularizer.
- ``latentnerf-system`` (threestudio/systems/latentnerf.py:51-97): the NeRF
  field renders 4 LATENT channels consumed by SDS with rgb_as_latents=True
  (no VAE encode in the loop); a refinement flag switches to rgb.
- ``sjc-system`` (threestudio/systems/sjc.py:60-100): score-jacobian-chaining
  flavored losses — the emptiness log-penalty on ray weights and the
  center-vs-border depth contrast loss.
- ``magic3d-system`` (threestudio/systems/magic3d.py): coarse NeRF stage is
  ``dreamfusion``-shaped; the refine stage optimizes the DMTet surface with
  SDS on rasterized mesh renders (mesh_rasterizer + dmtet here).

Each factory returns one jitted train step; guidance enters as a closure."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

import dreammesh4d_tpu as ds

from ..models.geometry.dmtet import TetSDFGridConfig, forward_features, isosurface
from ..models.geometry.implicit_volume import ImplicitVolumeConfig
from ..models.renderers.mesh_rasterizer import MeshRasterizer
from ..models.renderers.nerf_volume_renderer import NeRFRendererConfig, render_rays
from ..ops.meshops import face_normals
from ..utils.schedule import C_jax
from .threestudio_zoo import SceneTrainState, _regularizers, _total, init_scene_state


# ---------------------------------------------------------------------------
# fantasia3d-system (+ the shared DMTet render helper used by magic3d refine)
# ---------------------------------------------------------------------------


def _dmtet_normal_consistency(verts, faces, fmask):
    """Static-shape normal-consistency for a marching-tets surface: the two
    triangle slots of one tet (rows 2i, 2i+1) share an edge whenever both are
    real — mean (1 - cos) over those pairs (the per-step topology makes
    pytorch3d-style precomputed face adjacency impossible under jit)."""
    from ..ops.safe_math import safe_normalize

    # degenerate masked faces have zero area: normalize via rsqrt(|n|^2+eps)
    # (plain norm division has a NaN cotangent at 0 that the mask can't kill)
    n = safe_normalize(face_normals(verts, faces, normalize=False))  # (2T, 3)
    n0 = n[0::2]
    n1 = n[1::2]
    both = (fmask[0::2] & fmask[1::2]).astype(jnp.float32)
    cos = (n0 * n1).sum(-1)
    return ((1.0 - cos) * both).sum() / jnp.maximum(both.sum(), 1.0)


def _render_dmtet_views(geo_params, geo_cfg: TetSDFGridConfig, cameras,
                        camera_positions, H, W, raster: MeshRasterizer,
                        with_rgb: bool):
    """Render the CURRENT DMTet surface for every view.  The masked
    static-shape surface compacts inside jit via a fixed-size vertex array
    (degenerate faces land on vertex 0 and never rasterize)."""
    surf = isosurface(geo_params, geo_cfg)
    verts = surf.verts
    faces = jnp.where(surf.face_mask[:, None], surf.faces, 0)
    feature_fn = (lambda p: forward_features(geo_params, geo_cfg, p)) if with_rgb else None
    return raster(verts, faces, cameras, camera_positions, H, W,
                  feature_fn=feature_fn), (verts, faces, surf.face_mask)


@dataclass
class Fantasia3DLosses:
    lambda_sds: Any = 1.0
    lambda_normal_consistency: Any = 10000.0


def make_fantasia3d_train_step(
    geo_cfg: TetSDFGridConfig,
    optimizer: optax.GradientTransformation,
    losses: Fantasia3DLosses,
    guidance_fn: Callable,
    raster: Optional[MeshRasterizer] = None,
    texture: bool = False,
    H: int = 64,
    W: int = 64,
):
    """batch: ``cameras`` (list of GSCameraInfo), ``camera_positions`` (B,3)
    + guidance keys.  ``texture=False`` = geometry phase (normal-map SDS,
    fantasia3d.py:49-62); True = texture phase (rgb SDS)."""
    raster = raster or MeshRasterizer()

    def loss_fn(geo_params, batch, rng, step):
        out, (verts, faces, fmask) = _render_dmtet_views(
            geo_params, geo_cfg, batch["cameras"], batch["camera_positions"],
            H, W, raster, with_rgb=texture)
        if texture:
            guidance_inp = out["comp_rgb"]
        else:
            # normal map in [0,1] with opacity — the fantasia3d geometry input
            guidance_inp = jnp.concatenate(
                [out["comp_normal"], out["opacity"]], -1)
        terms: Dict[str, jnp.ndarray] = {
            "sds": guidance_fn(rng, guidance_inp, batch),
            "normal_consistency": _dmtet_normal_consistency(verts, faces, fmask),
        }
        return _total(terms, {
            "sds": losses.lambda_sds,
            "normal_consistency": losses.lambda_normal_consistency,
        }, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("fantasia3d-system")
class Fantasia3DSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# latentnerf-system
# ---------------------------------------------------------------------------


@dataclass
class LatentNeRFLosses:
    lambda_sds: Any = 1.0
    lambda_orient: Any = field(default_factory=lambda: [0, 10.0, 1000.0, 5000])
    lambda_sparsity: Any = 0.0005
    lambda_opaque: Any = 0.0
    lambda_shape: Any = 5.0  # sketch-shape guide (latentnerf.py loss.lambda_shape)


def make_latentnerf_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    losses: LatentNeRFLosses,
    guidance_fn: Callable,
    refinement: bool = False,
    shape_loss=None,
    shape_loss_samples: int = 4096,
):
    """The geometry's feature head must emit 4 latent channels (geo_cfg
    ``n_feature_dims=4``); ``guidance_fn(rng, img, batch, rgb_as_latents)``.
    refinement=True switches to 3-channel rgb SDS (latentnerf.py:51-66).

    ``shape_loss``: an ops.shape_loss.ShapeLoss — the sketch-shape guide
    (latentnerf.py guide_shape).  The reference evaluates it at the
    renderer's (detached) sample points; here it is evaluated at points
    sampled uniformly in the scene bbox each step — same stop-gradient
    occupancy objective without threading (rays × samples, 3) positions out
    of the renderer."""
    bg = jnp.zeros((4 if not refinement else 3,), jnp.float32)

    def loss_fn(geo_params, batch, rng, step):
        k_r, k_g, k_s = jax.random.split(rng, 3)
        B, H, W = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], H * W, axis=0)
        out = render_rays(geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k_r)
        Cc = out["comp_rgb"].shape[-1]
        img = out["comp_rgb"].reshape(B, H, W, Cc)
        terms: Dict[str, jnp.ndarray] = {
            "sds": guidance_fn(k_g, img, batch, not refinement),
        }
        weights_map = {
            "sds": losses.lambda_sds, "orient": losses.lambda_orient,
            "sparsity": losses.lambda_sparsity, "opaque": losses.lambda_opaque,
        }
        if shape_loss is not None:
            from ..models.geometry.implicit_volume import forward_density

            pts = jax.random.uniform(k_s, (shape_loss_samples, 3),
                                     minval=-geo_cfg.radius, maxval=geo_cfg.radius)
            sigmas = forward_density(geo_params, geo_cfg, pts)[..., 0]
            terms["shape"] = shape_loss(pts, sigmas) / shape_loss_samples
            weights_map["shape"] = losses.lambda_shape
        _regularizers(out, terms)
        return _total(terms, weights_map, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("latentnerf-system")
class LatentNeRFSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# sjc-system
# ---------------------------------------------------------------------------


@dataclass
class SJCLosses:
    lambda_sds: Any = 1.0
    lambda_emptiness: Any = field(default_factory=lambda: [10000, 10.0, 200.0, 20000])
    emptiness_scale: float = 10.0
    lambda_depth: Any = 0.0
    center_ratio: float = 0.78125


def make_sjc_train_step(
    geo_cfg: ImplicitVolumeConfig,
    rcfg: NeRFRendererConfig,
    optimizer: optax.GradientTransformation,
    losses: SJCLosses,
    guidance_fn: Callable,
    bg_color=(1.0, 1.0, 1.0),
):
    bg = jnp.asarray(bg_color, jnp.float32)

    def loss_fn(geo_params, batch, rng, step):
        k_r, k_g = jax.random.split(rng)
        B, H, W = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        lp = jnp.repeat(batch["light_positions"], H * W, axis=0)
        out = render_rays(geo_params, geo_cfg, rcfg, ro, rd, lp, bg, k_r)
        rgb = out["comp_rgb"].reshape(B, H, W, 3)
        terms: Dict[str, jnp.ndarray] = {"sds": guidance_fn(k_g, rgb, batch)}
        # emptiness: log(1 + s·w) over ray weights (sjc.py:67-73)
        terms["emptiness"] = jnp.log1p(
            losses.emptiness_scale * out["weights"]).mean()
        weights_map = {"sds": losses.lambda_sds,
                       "emptiness": losses.lambda_emptiness}
        # center-depth contrast (sjc.py:76-95): object in the center should
        # sit NEARER than the border (maximize border minus center depth)
        if losses.lambda_depth:
            depth = out["depth"].reshape(B, H, W)
            opac = out["opacity"].reshape(B, H, W)
            comp_depth = depth + 10.0 * (1.0 - opac)
            ch = int(losses.center_ratio * H)
            cw = int(losses.center_ratio * W)
            bh = (H - ch) // 2
            bw = (W - cw) // 2
            center = comp_depth[:, bh:bh + ch, bw:bw + cw]
            border_sum = comp_depth.sum((1, 2)) - center.sum((1, 2))
            n_border = H * W - ch * cw
            terms["depth"] = -(border_sum / n_border
                               - center.mean((1, 2))).mean()
            weights_map["depth"] = losses.lambda_depth
        return _total(terms, weights_map, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("sjc-system")
class SJCSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# magic3d-system (refine stage; the coarse stage is dreamfusion-shaped)
# ---------------------------------------------------------------------------


@dataclass
class Magic3DLosses:
    lambda_sds: Any = 1.0
    lambda_normal_consistency: Any = 1000.0


def make_magic3d_refine_train_step(
    geo_cfg: TetSDFGridConfig,
    optimizer: optax.GradientTransformation,
    losses: Magic3DLosses,
    guidance_fn: Callable,
    raster: Optional[MeshRasterizer] = None,
    H: int = 64,
    W: int = 64,
):
    """Refine stage: rgb SDS on rasterized DMTet renders + normal
    consistency (magic3d.py second stage over tetrahedra-sdf-grid)."""
    raster = raster or MeshRasterizer()

    def loss_fn(geo_params, batch, rng, step):
        out, (verts, faces, fmask) = _render_dmtet_views(
            geo_params, geo_cfg, batch["cameras"], batch["camera_positions"],
            H, W, raster, with_rgb=True)
        terms: Dict[str, jnp.ndarray] = {
            "sds": guidance_fn(rng, out["comp_rgb"], batch),
            "normal_consistency": _dmtet_normal_consistency(verts, faces, fmask),
        }
        return _total(terms, {
            "sds": losses.lambda_sds,
            "normal_consistency": losses.lambda_normal_consistency,
        }, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("magic3d-system")
class Magic3DSystem:
    def __init__(self, cfg):
        self.cfg = cfg


# ---------------------------------------------------------------------------
# textmesh-system (threestudio/systems/textmesh.py:40-90)
# ---------------------------------------------------------------------------


@dataclass
class TextMeshLosses:
    lambda_sds: Any = 1.0
    lambda_orient: Any = field(default_factory=lambda: [0, 10.0, 1000.0, 5000])
    lambda_sparsity: Any = 1.0
    lambda_opaque: Any = 0.0
    lambda_eikonal: Any = 1000.0


def make_textmesh_train_step(
    geo_cfg,
    rcfg,
    optimizer: optax.GradientTransformation,
    losses: TextMeshLosses,
    guidance_fn: Callable,
    bg_color=(1.0, 1.0, 1.0),
):
    """Text-to-mesh: SDS on a NeuS-rendered implicit-SDF plus the eikonal
    regularizer (textmesh.py:75-80).  The optimized state carries
    ``{"geo": sdf params, "var": neus variance}``; the surface exports via
    implicit_sdf.export_sdf_grid + the mc-cpu isosurface path."""
    from ..models.renderers.neus_volume_renderer import render_rays_neus

    bg = jnp.asarray(bg_color, jnp.float32)

    def loss_fn(params, batch, rng, step):
        k_r, k_g = jax.random.split(rng)
        B, H, W = batch["rays_o"].shape[:3]
        ro = batch["rays_o"].reshape(-1, 3)
        rd = batch["rays_d"].reshape(-1, 3)
        out = render_rays_neus(params["geo"], params["var"], geo_cfg, rcfg,
                               ro, rd, bg, k_r)
        rgb = out["comp_rgb"].reshape(B, H, W, 3)
        terms: Dict[str, jnp.ndarray] = {
            "sds": guidance_fn(k_g, rgb, batch),
            "eikonal": out["eikonal"],
        }
        w_det = jax.lax.stop_gradient(out["weights"])
        ndotd = (out["normal"] * out["t_dirs"]).sum(-1)
        n_opaque = jnp.maximum((out["opacity"] > 0).sum(), 1)
        terms["orient"] = (w_det * jnp.clip(ndotd, 0.0) ** 2).sum() / n_opaque
        terms["sparsity"] = jnp.sqrt(out["opacity"] ** 2 + 0.01).mean()
        oc = jnp.clip(out["opacity"], 1e-3, 1 - 1e-3)
        terms["opaque"] = -(oc * jnp.log(oc) + (1 - oc) * jnp.log(1 - oc)).mean()
        return _total(terms, {
            "sds": losses.lambda_sds, "eikonal": losses.lambda_eikonal,
            "orient": losses.lambda_orient, "sparsity": losses.lambda_sparsity,
            "opaque": losses.lambda_opaque,
        }, step)

    @jax.jit
    def train_step(state: SceneTrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.geo_params, batch, rng, state.step)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.geo_params)
        return (SceneTrainState(optax.apply_updates(state.geo_params, updates),
                                opt_state, state.step + 1), metrics)

    return train_step


@ds.register("textmesh-system")
class TextMeshSystem:
    def __init__(self, cfg):
        self.cfg = cfg


@ds.register("zero123-simple-system")
class Zero123SimpleSystem:
    """Simplified zero123 (threestudio/systems/zero123_simple.py) — shares
    the zero123_system train-step factory; registered for config parity."""

    def __init__(self, cfg):
        self.cfg = cfg
