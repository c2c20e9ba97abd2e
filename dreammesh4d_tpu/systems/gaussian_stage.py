"""Vanilla-3DGS ("gaussian") stage of sugar-static: train step + density
control driver.

Re-implements the reference gaussian-stage behavior
(custom/threestudio-dreammesh4d/system/sugar_static.py:309-349 manual
optimization + geometry.update_states):

- ref rgb·mask / mask losses, SDS substep, TV regs;
- opacity-binary entropy on visible gaussians after ``start_sugar_reg``
  (sugar_static.py:217-226);
- SuGaR density/SDF-normal regularization (ops/sugar_reg.py);
- per-step screen-gradient statistics via the means2d_offset trick
  (the reference's retained ``viewspace_points`` gradients);
- ``density_control_step``: host calls it every densify interval —
  clone/split/prune with Adam moment surgery (models/geometry/gaussian.py).

The optimizer is a bespoke per-field Adam (single ScaleByAdam over the float
param pytree + per-field C()-scheduled LRs) so its moments are a plain pytree
mirroring the params — the fixed-capacity slot surgery stays a trivial masked
write instead of optax multi-transform state gymnastics.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.geometry.gaussian import (
    DensifyStats,
    GaussianConfig,
    GaussianState,
    densify_and_prune,
    empty_stats,
    renderable,
    update_stats,
)
from ..ops.cameras import GSCameraInfo
from ..ops.gs import RasterizerConfig, rasterize
from ..ops.meshops import tv_loss
from ..ops.sugar_reg import SugarRegState, refresh_knn, sugar_density_regularization
from ..utils.schedule import C_jax
from ..utils.jit import tpu_jit


class GaussianParams(NamedTuple):
    """The differentiable fields of GaussianState (alive is carried aside)."""

    xyz: jnp.ndarray
    sh_dc: jnp.ndarray
    sh_rest: jnp.ndarray
    log_scales: jnp.ndarray
    quats: jnp.ndarray
    opacity_logits: jnp.ndarray


def split_state(state: GaussianState) -> Tuple[GaussianParams, jnp.ndarray]:
    return GaussianParams(*[getattr(state, f) for f in GaussianParams._fields]), state.alive


def merge_state(params: GaussianParams, alive: jnp.ndarray) -> GaussianState:
    return GaussianState(**params._asdict(), alive=alive)


@dataclass
class GaussianStageLosses:
    lambda_sds: Any = 0.1
    lambda_rgb: Any = 1000.0
    lambda_mask: Any = 100.0
    lambda_opacity_binary: Any = 1.0
    lambda_sugar_density_reg: Any = 1.0
    lambda_sugar_sdf_normal_reg: Any = 1.0
    lambda_rgb_tv: Any = 1.0


class GaussianAdamState(NamedTuple):
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray


def gaussian_optimizer(position_lr: Any = 0.00016, feature_lr: Any = 0.0025,
                       opacity_lr: Any = 0.05, scaling_lr: Any = 0.005,
                       rotation_lr: Any = 0.001, spatial_lr_scale: float = 1.0,
                       b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
    """Per-field Adam over GaussianParams with exp-interp C() LR schedules
    (training_setup + update_learning_rate, gaussian_base.py:471-573).
    State = (mu, nu, count) pytrees mirroring the params."""

    lrs = {
        "xyz": (position_lr, spatial_lr_scale),
        "sh_dc": (feature_lr, 1.0),
        "sh_rest": (feature_lr, 1.0 / 20.0),
        "log_scales": (scaling_lr, 1.0),
        "quats": (rotation_lr, 1.0),
        "opacity_logits": (opacity_lr, 1.0),
    }

    def init(params: GaussianParams) -> GaussianAdamState:
        z = jax.tree.map(jnp.zeros_like, params)
        return GaussianAdamState(z, z, jnp.zeros((), jnp.int32))

    def update(grads: GaussianParams, state: GaussianAdamState,
               params: Optional[GaussianParams] = None):
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        def upd(field, m, v):
            sched, scale = lrs[field]
            lr = C_jax(sched, count, interpolation="exp") * scale
            return -lr * (m / c1) / (jnp.sqrt(v / c2) + eps)

        updates = GaussianParams(**{
            f: upd(f, getattr(mu, f), getattr(nu, f)) for f in GaussianParams._fields
        })
        return updates, GaussianAdamState(mu, nu, count)

    return optax.GradientTransformation(init, update)


class GaussianTrainState(NamedTuple):
    gaussians: GaussianState
    opt_state: GaussianAdamState
    stats: DensifyStats
    step: jnp.ndarray


def init_gaussian_train_state(gaussians: GaussianState, optimizer) -> GaussianTrainState:
    params, _ = split_state(gaussians)
    return GaussianTrainState(
        gaussians, optimizer.init(params), empty_stats(gaussians.xyz.shape[0]),
        jnp.zeros((), jnp.int32),
    )


def make_gaussian_train_step(
    gcfg: GaussianConfig,
    raster_cfg: RasterizerConfig,
    optimizer,
    losses: GaussianStageLosses,
    guidance_fn: Optional[Callable] = None,
    bg_color=(1.0, 1.0, 1.0),
    invert_bg_prob: float = 1.0,
    sugar_reg_start: int = 3000,
    n_sdf_samples: int = 1000,
):
    bg_base = jnp.asarray(bg_color, jnp.float32)
    C = gcfg.capacity

    def render_view(gaussians: GaussianState, camera: GSCameraInfo, bg, offset):
        means, quats, scales, opac, sh = renderable(gaussians)
        return rasterize(
            means, opac, camera, raster_cfg, bg, sh=sh, sh_degree=gcfg.sh_degree,
            scales=scales, quats=quats, means2d_offset=offset,
        )

    def loss_fn(params: GaussianParams, offset, alive, batch, reg_state, rng, step, gstate):
        gaussians = merge_state(params, alive)
        terms: Dict[str, jnp.ndarray] = {}
        rng_bg, rng_guid, rng_reg = jax.random.split(rng, 3)
        invert = jax.random.uniform(rng_bg) > (1.0 - invert_bg_prob)
        train_bg = jnp.where(invert, 1.0 - bg_base, bg_base)

        def ref_one(wv, fp, cc):
            return render_view(gaussians, GSCameraInfo(wv, fp, cc), bg_base, offset)

        rc = batch["ref_cameras"]
        ref_out = jax.vmap(ref_one)(rc.world_view, rc.full_proj, rc.camera_center)
        gt_mask = batch["ref_mask"]
        gt_rgb = batch["ref_rgb"] * gt_mask
        terms["rgb"] = ((gt_rgb - jnp.clip(ref_out.rgb, 0, 1) * gt_mask) ** 2).mean()
        terms["mask"] = ((gt_mask - ref_out.alpha) ** 2).mean()

        def rand_one(wv, fp, cc):
            return render_view(gaussians, GSCameraInfo(wv, fp, cc), train_bg, offset)

        rb = batch["rand_cameras"]
        rand_out = jax.vmap(rand_one)(rb.world_view, rb.full_proj, rb.camera_center)
        if guidance_fn is not None:
            terms["sds"] = guidance_fn(gstate, rng_guid, jnp.clip(rand_out.rgb, 0, 1),
                                       {**batch, "step": step})
        terms["rgb_tv"] = tv_loss(rand_out.rgb)

        visibility = (ref_out.radii > 0).any(0) | (rand_out.radii > 0).any(0)

        reg_on = (step >= sugar_reg_start).astype(jnp.float32)
        opac = jax.nn.sigmoid(params.opacity_logits)
        vis_w = (visibility & alive).astype(jnp.float32)
        entropy = -(opac * jnp.log(opac + 1e-10) + (1 - opac) * jnp.log(1 - opac + 1e-10))
        terms["opacity_binary"] = reg_on * (entropy * vis_w).sum() / jnp.maximum(vis_w.sum(), 1.0)

        means, quats, scales, opac_r, _ = renderable(gaussians)
        reg = sugar_density_regularization(
            rng_reg, reg_state, means, quats, scales, opac_r, alive,
            n_samples=n_sdf_samples,
        )
        terms["sugar_density_reg"] = reg_on * reg["density_regulation"]
        terms["sugar_sdf_normal_reg"] = reg_on * reg["normal_regulation"]

        weights = {
            "sds": losses.lambda_sds, "rgb": losses.lambda_rgb,
            "mask": losses.lambda_mask, "opacity_binary": losses.lambda_opacity_binary,
            "sugar_density_reg": losses.lambda_sugar_density_reg,
            "sugar_sdf_normal_reg": losses.lambda_sugar_sdf_normal_reg,
            "rgb_tv": losses.lambda_rgb_tv,
        }
        total = jnp.zeros((), jnp.float32)
        for name, value in terms.items():
            total = total + C_jax(weights[name], step) * value
        metrics = {f"loss_{k}": v for k, v in terms.items()}
        metrics["loss_total"] = total
        metrics["psnr"] = -10.0 * jnp.log10(terms["rgb"] + 1e-8)
        aux = {
            "metrics": metrics,
            "radii": jnp.maximum(ref_out.radii.max(0), rand_out.radii.max(0)),
            "visibility": visibility,
        }
        return total, aux

    @tpu_jit
    def train_step(state: GaussianTrainState, batch, reg_state: SugarRegState, rng,
                   guidance_state=None):
        params, alive = split_state(state.gaussians)
        offset0 = jnp.zeros((C, 2), jnp.float32)
        (loss, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            params, offset0, alive, batch, reg_state, rng, state.step, guidance_state
        )
        g_params, g_offset = grads
        updates, opt_state = optimizer.update(g_params, state.opt_state, params)
        params = optax.apply_updates(params, updates)
        stats = update_stats(state.stats, g_offset, aux["radii"], aux["visibility"])
        new_state = GaussianTrainState(merge_state(params, alive), opt_state, stats,
                                       state.step + 1)
        return new_state, aux["metrics"]

    def density_control_step(state: GaussianTrainState, rng):
        """Host-invoked every densification interval."""
        gaussians, stats, mu, nu, info = densify_and_prune(
            state.gaussians, state.stats, rng, gcfg,
            state.opt_state.mu._asdict(), state.opt_state.nu._asdict(),
        )
        opt_state = GaussianAdamState(
            GaussianParams(**mu), GaussianParams(**nu), state.opt_state.count
        )
        return GaussianTrainState(gaussians, opt_state, stats, state.step), info

    return train_step, density_control_step


def make_reg_state(state: GaussianTrainState) -> SugarRegState:
    return refresh_knn(state.gaussians.xyz, state.gaussians.alive)
