"""sugar-static-system: SuGaR refinement stage as ONE jitted train step.

Functional redesign of the reference Lightning system
(custom/threestudio-dreammesh4d/system/sugar_static.py:24-504), "sugar" stage:
mesh-bound Gaussians jointly refined with the mesh vertices under

- ref-view losses: masked rgb MSE + mask MSE (sugar_static.py:148-190),
- random-view guidance substep (SDS; pluggable, stubbed to 0 when absent)
  + mesh regularizers: normal consistency, uniform laplacian, opacity-max
  (sugar_static.py:243-271) and rgb/normal/depth TV (sugar_static.py:273-296),
- loss weights are C() schedules evaluated on the traced step counter.

Instead of Lightning hooks + a geometry-owned Adam, the whole update
(render -> losses -> grads -> optax) is a single pure function of
``(TrainState, batch, rng)`` — the idiomatic JAX shape for TPU: every op lands
in one XLA program, nothing crosses the host boundary per step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

import dreammesh4d_tpu as ds

from ..models.geometry.sugar import (
    SuGaRParams,
    SuGaRStatic,
    gaussian_attributes,
)
from ..models.renderers.sugar_rasterizer import (
    CameraBatch,
    depth_to_normal,
    render_batch,
)
from ..ops.gs import RasterizerConfig
from ..ops.meshops import (
    face_normals,
    laplacian_smoothing_loss,
    normal_consistency_loss,
    tv_loss,
)
from ..utils.schedule import C_jax
from ..utils.jit import tpu_jit


@dataclass
class SugarStaticLosses:
    lambda_sds: Any = 0.01
    lambda_rgb: Any = 1000.0
    lambda_mask: Any = 100.0
    lambda_normal_consistency: Any = 10.0
    lambda_laplacian_smoothing: Any = 1.0
    lambda_opacity_max: Any = 0.0
    lambda_rgb_tv: Any = 1.0
    lambda_normal_tv: Any = 1.0
    lambda_depth_tv: Any = 1.0
    # ref-view geometry supervision + the normal/depth agreement term
    # (reference sugar_static.py:160-190, 262-271)
    lambda_depth: Any = 0.0
    lambda_depth_rel: Any = 0.0
    lambda_normal: Any = 0.0
    lambda_normal_depth_consistency: Any = 0.0


class TrainState(NamedTuple):
    params: SuGaRParams
    opt_state: Any
    step: jnp.ndarray  # () int32


def init_state(params: SuGaRParams, optimizer: optax.GradientTransformation) -> TrainState:
    return TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))


GuidanceFn = Callable[[jax.Array, jnp.ndarray, Dict[str, jnp.ndarray]], jnp.ndarray]


def make_train_step(
    static: SuGaRStatic,
    raster_cfg: RasterizerConfig,
    optimizer: optax.GradientTransformation,
    losses: SugarStaticLosses,
    guidance_fn: Optional[GuidanceFn] = None,
    bg_color=(1.0, 1.0, 1.0),
    invert_bg_prob: float = 1.0,
    ref_raster_cfg: Optional[RasterizerConfig] = None,
):
    """Build the jitted train step.  ``batch`` layout:

    - ``ref_cameras``: CameraBatch (B_ref views), ``ref_rgb`` (B,H,W,3),
      ``ref_mask`` (B,H,W,1)
    - ``rand_cameras``: CameraBatch (B_rand views) + any extra keys the
      guidance needs (elevation/azimuth/distance...)
    """
    bg_base = jnp.asarray(bg_color, jnp.float32)
    G = static.n_per_face
    ref_cfg = ref_raster_cfg or raster_cfg
    from ..utils.schedule import C_max

    need_depth = C_max(losses.lambda_depth) > 0
    need_depth_rel = C_max(losses.lambda_depth_rel) > 0
    need_normal = C_max(losses.lambda_normal) > 0
    need_nd_consistency = C_max(losses.lambda_normal_depth_consistency) > 0

    def loss_fn(params: SuGaRParams, batch, rng, step, gstate):
        attrs = gaussian_attributes(params, static)
        fnorm = face_normals(params.points, static.faces)
        gs_normals = jnp.repeat(fnorm, G, axis=0)

        rng_bg, rng_guid = jax.random.split(rng)
        invert = jax.random.uniform(rng_bg) > (1.0 - invert_bg_prob)
        train_bg = jnp.where(invert, 1.0 - bg_base, bg_base)

        terms: Dict[str, jnp.ndarray] = {}

        # --- ref substep (white-composited gt) --------------------------------
        ref_out = render_batch(
            attrs.means3d, attrs.quats, attrs.scales, attrs.opacities, attrs.sh,
            static.sh_degree, gs_normals, batch["ref_cameras"], bg_base, ref_cfg,
        )
        gt_mask = batch["ref_mask"]
        gt_rgb = batch["ref_rgb"] * gt_mask
        terms["rgb"] = ((gt_rgb - ref_out["comp_rgb"] * gt_mask) ** 2).mean()
        terms["mask"] = ((gt_mask - ref_out["comp_mask"]) ** 2).mean()

        # ref-view geometry supervision (sugar_static.py:160-190): lstsq-
        # aligned depth MSE, Pearson relative depth, normal cosine — shared
        # helpers with the zero123 system
        m_bool = gt_mask > 0.5
        if (need_depth or need_depth_rel) and "ref_depth" in batch:
            from .zero123_system import masked_lstsq_depth_loss, masked_pearson

            mflat = m_bool[..., 0].astype(jnp.float32)
            if need_depth:
                terms["depth"] = masked_lstsq_depth_loss(
                    ref_out["comp_depth"][..., 0], batch["ref_depth"][..., 0], mflat
                )
            if need_depth_rel:
                terms["depth_rel"] = 1.0 - masked_pearson(
                    ref_out["comp_depth"][..., 0], batch["ref_depth"][..., 0], mflat
                )
        if need_normal and "ref_normal" in batch:
            gt_n = 1.0 - 2.0 * batch["ref_normal"]  # reference flips (zero123.py:125)
            pred_n = 2.0 * ref_out["comp_normal"] - 1.0
            cos = (pred_n * gt_n).sum(-1) / (
                jnp.linalg.norm(pred_n, axis=-1) * jnp.linalg.norm(gt_n, axis=-1) + 1e-8
            )
            m1 = m_bool[..., 0].astype(jnp.float32)
            terms["normal"] = 1.0 - (cos * m1).sum() / jnp.maximum(m1.sum(), 1.0)

        # --- rand substep -----------------------------------------------------
        rand_out = render_batch(
            attrs.means3d, attrs.quats, attrs.scales, attrs.opacities, attrs.sh,
            static.sh_degree, gs_normals, batch["rand_cameras"], train_bg, raster_cfg,
        )
        if guidance_fn is not None:
            terms["sds"] = guidance_fn(gstate, rng_guid, rand_out["comp_rgb"],
                                       {**batch, "step": step})

        terms["normal_consistency"] = normal_consistency_loss(
            params.points, static.faces, static.edge_face_pairs
        )
        terms["laplacian_smoothing"] = laplacian_smoothing_loss(
            params.points, (static.ring_idx, static.ring_mask)
        )
        terms["opacity_max"] = jnp.abs(attrs.opacities - 1.0).mean()
        if need_nd_consistency:
            # agreement between the rendered gaussian-normal map and the
            # normal derived from the rendered depth (diff_sugar_rasterizer_
            # normal.py:172-181 + sugar_static.py:262-271)
            nd_map = depth_to_normal(
                rand_out["comp_depth"], batch["rand_rays_o"],
                batch["rand_rays_d"], rand_out["comp_mask"],
            )
            raw_n = 2.0 * rand_out["comp_normal"] - 1.0
            raw_nd = 2.0 * nd_map - 1.0
            terms["normal_depth_consistency"] = (
                1.0 - (raw_n * raw_nd).sum(-1)
            ).mean()
        terms["rgb_tv"] = tv_loss(rand_out["comp_rgb"])
        terms["normal_tv"] = tv_loss(rand_out["comp_normal"])
        terms["depth_tv"] = tv_loss(rand_out["comp_depth"])

        total = jnp.zeros((), jnp.float32)
        weights = {
            "rgb": losses.lambda_rgb,
            "mask": losses.lambda_mask,
            "sds": losses.lambda_sds,
            "normal_consistency": losses.lambda_normal_consistency,
            "laplacian_smoothing": losses.lambda_laplacian_smoothing,
            "opacity_max": losses.lambda_opacity_max,
            "rgb_tv": losses.lambda_rgb_tv,
            "normal_tv": losses.lambda_normal_tv,
            "depth_tv": losses.lambda_depth_tv,
            "depth": losses.lambda_depth,
            "depth_rel": losses.lambda_depth_rel,
            "normal": losses.lambda_normal,
            "normal_depth_consistency": losses.lambda_normal_depth_consistency,
        }
        for name, value in terms.items():
            total = total + C_jax(weights[name], step) * value
        metrics = {f"loss_{k}": v for k, v in terms.items()}
        metrics["loss_total"] = total
        metrics["psnr"] = -10.0 * jnp.log10(terms["rgb"] + 1e-8)
        return total, metrics

    @tpu_jit
    def train_step(state: TrainState, batch, rng, guidance_state=None):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng, state.step, guidance_state
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_render_eval(static: SuGaRStatic, raster_cfg: RasterizerConfig, bg_color=(1.0, 1.0, 1.0)):
    """Jitted eval rendering (validation orbits, sugar_static.py:419-470)."""
    bg = jnp.asarray(bg_color, jnp.float32)
    G = static.n_per_face

    @tpu_jit
    def render_eval(params: SuGaRParams, cameras: CameraBatch):
        attrs = gaussian_attributes(params, static)
        fnorm = face_normals(params.points, static.faces)
        gs_normals = jnp.repeat(fnorm, G, axis=0)
        return render_batch(
            attrs.means3d, attrs.quats, attrs.scales, attrs.opacities, attrs.sh,
            static.sh_degree, gs_normals, cameras, bg, raster_cfg,
        )

    return render_eval

