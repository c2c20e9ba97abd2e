"""sugar-4dgen-system: the dynamic ("motion") stage as one jitted train step.

Functional redesign of the reference Lightning system
(custom/threestudio-dreammesh4d/system/sugar_4dgen.py:28-637).  Per step, for
the T sampled video frames:

- ``zero123`` substep: render timed Gaussians from random cameras → temporal
  SDS (pluggable guidance; stubbed 0 when absent) + TV regs
  (sugar_4dgen.py:232-240);
- ``ref`` substep: render from the fixed reference camera → masked rgb MSE +
  mask MSE vs the video frames + PSNR (sugar_4dgen.py:160-199), timed-mesh
  normal consistency + laplacian (sugar_4dgen.py:214-230), frame-0 anchor
  (lambda_ref_xyz, :287-290), object-centric reg (:293-302), keyframe ARAP
  (:304-311);
- inter-frame substep: ARAP over ``num_inter_frames`` densely sampled
  timestamps in a random window (host samples the window; :331-370).

The static SuGaR parameters are FROZEN (stop_gradient; parity with
dynamic_sugar.py:79-87) — only the deformation network trains.  ARAP rotations
come from the skinning chain (given-rotation mode, not best-fit), matching
``_compute_arap_energy`` (sugar_4dgen.py:371-385).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dreammesh4d_tpu as ds

from ..models.geometry.deformation import DeformationConfig, plane_tv_loss
from ..models.geometry.dynamic_sugar import (
    DynamicStatic,
    timed_all,
)
from ..models.geometry.sugar import SuGaRParams, gaussian_attributes
from ..models.renderers.sugar_rasterizer import CameraBatch, render_batch
from ..ops.gs import RasterizerConfig
from ..ops.meshops import (
    arap_energy_quat_planar,
    face_normals,
    laplacian_smoothing_loss,
    normal_consistency_loss,
    tv_loss,
)
from ..utils.schedule import C_jax
from ..utils.jit import tpu_jit


@dataclass
class Sugar4DGenLosses:
    lambda_sds_zero123: Any = 0.1
    lambda_rgb: Any = 5000.0
    lambda_mask: Any = field(default_factory=lambda: [200, 500.0, 5000.0, 1000])
    # ref-view geometry supervision vs per-frame depth/normal maps
    # (reference sugar_4dgen.py:181-211; zero by default like the shipped yaml)
    lambda_depth: Any = 0.0
    lambda_depth_rel: Any = 0.0
    lambda_normal: Any = 0.0
    lambda_normal_consistency: Any = 100.0
    lambda_laplacian_smoothing: Any = 0.0
    lambda_arap_reg_key_frame: Any = 10.0
    lambda_arap_reg_inter_frame: Any = 10.0
    lambda_ref_xyz: Any = 0.0
    lambda_obj_centric: Any = 0.0
    lambda_rgb_tv: Any = 0.0
    lambda_normal_tv: Any = 0.0
    lambda_depth_tv: Any = 0.0
    lambda_plane_tv: Any = 0.0001
    lambda_time_smoothness: Any = 0.01


class DynTrainState(NamedTuple):
    deform_params: Any
    opt_state: Any
    step: jnp.ndarray


def init_dyn_state(deform_params, optimizer) -> DynTrainState:
    return DynTrainState(deform_params, optimizer.init(deform_params), jnp.zeros((), jnp.int32))


# guidance_fn(guidance_state, rng, rgb, batch) -> scalar SDS loss.  The
# guidance parameters/embedding bank ride through the jitted step as an
# ARGUMENT — closing over them bakes the ~3.4 GB UNet weights into the
# program as constants (3.7 GB captured-constant lowering, unbounded compile).
GuidanceFn = Callable[[Any, jax.Array, jnp.ndarray, Dict[str, jnp.ndarray]], jnp.ndarray]


def make_dynamic_train_step(
    sugar_params: SuGaRParams,
    static: DynamicStatic,
    deform_cfg: DeformationConfig,
    raster_cfg: RasterizerConfig,
    optimizer: optax.GradientTransformation,
    losses: Sugar4DGenLosses,
    arap_weights: jnp.ndarray,  # (V, K) cotangent weights on the rest mesh
    guidance_fn: Optional[GuidanceFn] = None,
    bg_color=(1.0, 1.0, 1.0),
    invert_bg_prob: float = 1.0,
    arap_start_step: int = 0,
    ref_raster_cfg: Optional[RasterizerConfig] = None,
    video_frames: Optional[tuple] = None,
    rand_raster_cfg: Optional[RasterizerConfig] = None,
    video_depths: Optional[jnp.ndarray] = None,  # (L, H, W, 1) device-resident
    video_normals: Optional[jnp.ndarray] = None,  # (L, H, W, 3)
):
    """Build the jitted dynamic train step.  ``batch`` layout:

    - ``timestamps`` (T,), ``frame_indices`` (T,) int32
    - ``ref_cameras`` CameraBatch (T views, the fixed ref camera repeated),
      ``ref_rgb`` (T,H,W,3) video frames, ``ref_mask`` (T,H,W,1)
    - ``rand_cameras`` CameraBatch (T random views, frame-aligned)
    - ``inter_timestamps`` (num_inter,) — densely sampled window (host side)

    ``video_frames=(rgb (L,H,W,3), mask (L,H,W,1))`` keeps the WHOLE video
    device-resident: the step then gathers gt frames by ``frame_indices``
    inside the jit and batches may omit ref_rgb/ref_mask — avoids re-uploading
    ~16MB of frames every step (dominates wall-clock on slow host links)."""
    sugar_params = jax.tree.map(jax.lax.stop_gradient, sugar_params)
    bg_base = jnp.asarray(bg_color, jnp.float32)
    sg = static.sugar
    G = sg.n_per_face
    attrs0 = gaussian_attributes(sugar_params, sg)
    rest_points = sugar_params.points
    ring = (sg.ring_idx, sg.ring_mask)

    ref_cfg = ref_raster_cfg or raster_cfg
    # SDS substep render size: the guidance VAE consumes 256² — rendering the
    # random views at that size directly (rand_raster_cfg) skips both the
    # high-res rasterization and the 512→256 resize in encode_images
    rand_cfg = rand_raster_cfg or raster_cfg

    def _static_zero(w):
        return isinstance(w, (int, float)) and float(w) == 0.0

    # the ref substep's losses (rgb/mask + mesh-space regularizers) read the
    # rendered normal map only under lambda_normal; the rand substep needs it
    # only for normal_tv — dropping the 3 normal channels otherwise shrinks
    # the blend kernel's matmuls 7->4
    rand_normals = not _static_zero(losses.lambda_normal_tv)
    from ..utils.schedule import C_max

    need_depth = C_max(losses.lambda_depth) > 0
    need_depth_rel = C_max(losses.lambda_depth_rel) > 0
    need_ref_normal = C_max(losses.lambda_normal) > 0

    def _timed_render(deform_params, cameras, timestamps, bg, cfg=None,
                      with_normals=True, frame_indices=None):
        gs, vert = timed_all(sugar_params, deform_params, deform_cfg, static,
                             timestamps, frame_indices=frame_indices)
        if with_normals:
            fnorm = face_normals(vert.xyz, sg.faces)  # (T, F, 3)
            gs_normals = jnp.repeat(fnorm, G, axis=-2)
        else:
            gs_normals = None
        out = render_batch(
            attrs0.means3d, attrs0.quats, attrs0.scales, attrs0.opacities,
            attrs0.sh, sg.sh_degree, None, cameras, bg, cfg or raster_cfg,
            timed_attrs=(gs.means3d, gs.quats, gs.scales, gs_normals),
        )
        return out, gs, vert

    # planar ARAP fast path: rest-pose edges precomputed once, rotations
    # applied as quats (ops/meshops.arap_energy_quat_planar)
    _arap_idx_t = sg.ring_idx.T  # (K, V)
    _arap_m_t = ((sg.ring_mask & (sg.ring_idx >= 0)).astype(jnp.float32)
                 * arap_weights).T  # (K, V)
    _rest_p = rest_points.T  # (3, V)
    _e_ref_p = _rest_p[:, None, :] - _rest_p[:, _arap_idx_t]  # (3, K, V)

    def _arap(vert_xyz, vert_rots):
        return arap_energy_quat_planar(
            _e_ref_p, _arap_idx_t, _arap_m_t, vert_xyz, vert_rots
        )

    def loss_fn(deform_params, batch, rng, step, gstate):
        terms: Dict[str, jnp.ndarray] = {}
        rng_bg, rng_guid = jax.random.split(rng)
        invert = jax.random.uniform(rng_bg) > (1.0 - invert_bg_prob)
        train_bg = jnp.where(invert, 1.0 - bg_base, bg_base)
        ts = batch["timestamps"]

        # --- zero123 substep (random cameras) --------------------------------
        # discrete mode indexes its per-frame tables by the TRUE video frame
        # (timestamps are (i+1)/(L+1), so the nearest-frame fallback would
        # alias neighbouring frames onto one table row)
        fi = batch.get("frame_indices")
        rand_out, _, _ = _timed_render(deform_params, batch["rand_cameras"], ts,
                                       train_bg, rand_cfg,
                                       with_normals=rand_normals,
                                       frame_indices=fi)
        if guidance_fn is not None:
            terms["sds_zero123"] = guidance_fn(gstate, rng_guid,
                                               rand_out["comp_rgb"],
                                               {**batch, "step": step})
        if not _static_zero(losses.lambda_rgb_tv):
            terms["rgb_tv"] = tv_loss(rand_out["comp_rgb"])
        if rand_normals:
            terms["normal_tv"] = tv_loss(rand_out["comp_normal"])
        if not _static_zero(losses.lambda_depth_tv):
            terms["depth_tv"] = tv_loss(rand_out["comp_depth"])

        # --- ref substep (video frames) --------------------------------------
        # (rand/ref share timestamps; XLA CSE already merges the two identical
        # timed_all subgraphs — an explicit merged 2T-view batch measured
        # SLOWER, 104 -> 123 ms: bigger live intermediates, worse fusion)
        ref_out, _, vert = _timed_render(deform_params, batch["ref_cameras"], ts,
                                         bg_base, ref_cfg,
                                         with_normals=need_ref_normal,
                                         frame_indices=fi)
        if video_frames is not None:
            gt_mask = video_frames[1][batch["frame_indices"]]
            gt_rgb = video_frames[0][batch["frame_indices"]] * gt_mask
        else:
            gt_mask = batch["ref_mask"]
            gt_rgb = batch["ref_rgb"] * gt_mask
        terms["rgb"] = ((gt_rgb - ref_out["comp_rgb"] * gt_mask) ** 2).mean()
        terms["mask"] = ((gt_mask - ref_out["comp_mask"]) ** 2).mean()

        # ref-view geometry supervision vs per-frame depth/normal maps
        # (reference sugar_4dgen.py:181-211): lstsq-aligned depth MSE,
        # Pearson relative depth, masked normal cosine
        if need_depth or need_depth_rel:
            from .zero123_system import masked_lstsq_depth_loss, masked_pearson

            gt_depth = (video_depths[batch["frame_indices"]]
                        if video_depths is not None else batch["ref_depth"])
            mflat = (gt_mask[..., 0] > 0.5).astype(jnp.float32)
            if need_depth:
                terms["depth"] = masked_lstsq_depth_loss(
                    ref_out["comp_depth"][..., 0], gt_depth[..., 0], mflat)
            if need_depth_rel:
                terms["depth_rel"] = 1.0 - masked_pearson(
                    ref_out["comp_depth"][..., 0], gt_depth[..., 0], mflat)
        if need_ref_normal:
            gt_normal = (video_normals[batch["frame_indices"]]
                         if video_normals is not None else batch["ref_normal"])
            gt_n = 1.0 - 2.0 * gt_normal  # reference flip (zero123.py:125)
            pred_n = 2.0 * ref_out["comp_normal"] - 1.0
            cos = (pred_n * gt_n).sum(-1) / (
                jnp.linalg.norm(pred_n, axis=-1) * jnp.linalg.norm(gt_n, axis=-1) + 1e-8
            )
            m1 = (gt_mask[..., 0] > 0.5).astype(jnp.float32)
            terms["normal"] = 1.0 - (cos * m1).sum() / jnp.maximum(m1.sum(), 1.0)

        terms["normal_consistency"] = normal_consistency_loss(
            vert.xyz, sg.faces, sg.edge_face_pairs
        )
        terms["laplacian_smoothing"] = laplacian_smoothing_loss(vert.xyz, ring)

        arap_on = (step >= arap_start_step).astype(jnp.float32)
        terms["arap_reg_key_frame"] = arap_on * _arap(vert.xyz, vert.rots)

        # frame-0 anchor (sugar_4dgen.py:287-290)
        _, vert_t0 = timed_all(
            sugar_params, deform_params, deform_cfg, static, jnp.zeros((1,), jnp.float32)
        )
        terms["ref_xyz"] = jnp.abs(vert_t0.xyz[0] - rest_points).mean()

        # object-centric reg (sugar_4dgen.py:293-302)
        terms["obj_centric"] = (
            jnp.abs(vert.xyz[..., 0].mean()) + jnp.abs(vert.xyz[..., 1].mean())
        )

        # --- inter-frame ARAP substep ----------------------------------------
        _, vert_inter = timed_all(
            sugar_params, deform_params, deform_cfg, static, batch["inter_timestamps"]
        )
        terms["arap_reg_inter_frame"] = arap_on * _arap(vert_inter.xyz, vert_inter.rots)

        # HexPlane grid regularizers (deformation.py:58-61).  Discrete mode
        # has per-frame tables instead of plane grids — no TV terms
        # (reference training_setup_dynamic only registers grid lrs in
        # deformation mode, dynamic_sugar.py:153-200).
        if static.dynamic_mode == "deformation":
            terms["plane_tv"] = plane_tv_loss(deform_params)
            terms["time_smoothness"] = plane_tv_loss(deform_params, only_time_planes=True)

        weights = {
            "sds_zero123": losses.lambda_sds_zero123,
            "rgb": losses.lambda_rgb,
            "mask": losses.lambda_mask,
            "depth": losses.lambda_depth,
            "depth_rel": losses.lambda_depth_rel,
            "normal": losses.lambda_normal,
            "normal_consistency": losses.lambda_normal_consistency,
            "laplacian_smoothing": losses.lambda_laplacian_smoothing,
            "arap_reg_key_frame": losses.lambda_arap_reg_key_frame,
            "arap_reg_inter_frame": losses.lambda_arap_reg_inter_frame,
            "ref_xyz": losses.lambda_ref_xyz,
            "obj_centric": losses.lambda_obj_centric,
            "rgb_tv": losses.lambda_rgb_tv,
            "normal_tv": losses.lambda_normal_tv,
            "depth_tv": losses.lambda_depth_tv,
            "plane_tv": losses.lambda_plane_tv,
            "time_smoothness": losses.lambda_time_smoothness,
        }
        total = jnp.zeros((), jnp.float32)
        for name, value in terms.items():
            total = total + C_jax(weights[name], step) * value
        metrics = {f"loss_{k}": v for k, v in terms.items()}
        metrics["loss_total"] = total
        metrics["psnr"] = -10.0 * jnp.log10(terms["rgb"] + 1e-8)
        return total, metrics

    @tpu_jit
    def train_step(state: DynTrainState, batch, rng, guidance_state=None):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.deform_params, batch, rng, state.step, guidance_state
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.deform_params)
        deform_params = optax.apply_updates(state.deform_params, updates)
        return DynTrainState(deform_params, opt_state, state.step + 1), metrics

    return train_step


def make_dynamic_render_eval(
    sugar_params: SuGaRParams,
    static: DynamicStatic,
    deform_cfg: DeformationConfig,
    raster_cfg: RasterizerConfig,
    bg_color=(1.0, 1.0, 1.0),
):
    """Jitted timed eval rendering (validation: fixed azimuths × timestamps,
    sugar_4dgen.py:431-504)."""
    sg = static.sugar
    G = sg.n_per_face
    attrs0 = gaussian_attributes(sugar_params, sg)
    bg = jnp.asarray(bg_color, jnp.float32)

    @tpu_jit
    def render_eval(deform_params, cameras: CameraBatch, timestamps,
                    frame_indices=None):
        gs, vert = timed_all(sugar_params, deform_params, deform_cfg, static,
                             timestamps, frame_indices=frame_indices)
        fnorm = face_normals(vert.xyz, sg.faces)
        gs_normals = jnp.repeat(fnorm, G, axis=-2)
        return render_batch(
            attrs0.means3d, attrs0.quats, attrs0.scales, attrs0.opacities,
            attrs0.sh, sg.sh_degree, None, cameras, bg, raster_cfg,
            timed_attrs=(gs.means3d, gs.quats, gs.scales, gs_normals),
        )

    return render_eval

