"""Temporal datamodule parity: resolution milestones, norm_timestamp,
per-frame depth/normal supervision (reference sugar_dynamic_dg.yaml:10-20 +
temporal_image.py:120-137,215-250,326-339) and the dynamic-stage depth/normal
ref losses (reference sugar_4dgen.py:181-211)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dreammesh4d_tpu.data.temporal_image import TemporalImageConfig, TemporalImageDataModule
from dreammesh4d_tpu.data.uncond import RandomCameraConfig

pytestmark = pytest.mark.quick


def _write_frames(dirpath, n=4, size=32, with_depth=False, with_normal=False):
    import cv2

    os.makedirs(dirpath, exist_ok=True)
    for i in range(n):
        img = np.zeros((size, size, 4), np.uint8)
        img[8:24, 8:24, 0] = 200
        img[8:24, 8:24, 3] = 255
        cv2.imwrite(os.path.join(dirpath, f"{i:03d}_rgba.png"), img)
        if with_depth:
            cv2.imwrite(os.path.join(dirpath, f"{i:03d}_depth.png"),
                        np.full((size, size), 128, np.uint8))
        if with_normal:
            cv2.imwrite(os.path.join(dirpath, f"{i:03d}_normal.png"),
                        np.full((size, size, 3), 128, np.uint8))


def _cfg(frames_dir, **kw):
    kw.setdefault("random_camera", RandomCameraConfig(height=16, width=16, batch_size=1))
    return TemporalImageConfig(video_frames_dir=frames_dir, num_frames=2,
                               video_length=4, **kw)


def test_milestone_transition(tmp_path):
    _write_frames(str(tmp_path), n=4, size=32)
    dm = TemporalImageDataModule(_cfg(str(tmp_path), height=[16, 24], width=[16, 24],
                                      resolution_milestones=[3]))
    b0 = dm.train_batch(0)
    assert b0["ref_rgb"].shape[1:3] == (16, 16)
    b1 = dm.train_batch(5)  # past the milestone: frames reload at 24
    assert b1["ref_rgb"].shape[1:3] == (24, 24)
    # both resolutions cached
    assert (16, 16) in dm._frames_cache and (24, 24) in dm._frames_cache


def test_scalar_height_ignores_milestones(tmp_path):
    """Reference warns and ignores milestones when height/width are scalars
    (temporal_image.py:128-137)."""
    _write_frames(str(tmp_path), n=4, size=32)
    dm = TemporalImageDataModule(_cfg(str(tmp_path), height=16, width=16,
                                      resolution_milestones=[100]))
    assert dm.milestones == [-1]
    b = dm.train_batch(500)
    assert b["ref_rgb"].shape[1:3] == (16, 16)


def test_set_final_resolution_pins(tmp_path):
    _write_frames(str(tmp_path), n=4, size=32)
    dm = TemporalImageDataModule(_cfg(str(tmp_path), height=[16, 24], width=[16, 24],
                                      resolution_milestones=[3]))
    dm.set_final_resolution()
    b = dm.train_batch(0)  # update(0) must not drop back to 16
    assert b["ref_rgb"].shape[1:3] == (24, 24)


def test_norm_timestamp_key_accepted(tmp_path):
    """Declared-only reference knob (temporal_image.py:45): accepted, and the
    timestamps stay the normalized linspace regardless."""
    _write_frames(str(tmp_path), n=4, size=32)
    dm = TemporalImageDataModule(_cfg(str(tmp_path), height=16, width=16,
                                      norm_timestamp=True))
    b = dm.train_batch(0)
    assert float(b["timestamps"].min()) > 0.0 and float(b["timestamps"].max()) < 1.0


def test_requires_depth_normal_loading(tmp_path):
    _write_frames(str(tmp_path), n=4, size=32, with_depth=True, with_normal=True)
    dm = TemporalImageDataModule(_cfg(str(tmp_path), height=16, width=16,
                                      requires_depth=True, requires_normal=True))
    b = dm.train_batch(0)
    assert b["ref_depth"].shape == (2, 16, 16, 1)
    assert b["ref_normal"].shape == (2, 16, 16, 3)
    np.testing.assert_allclose(b["ref_depth"], 128 / 255.0, atol=1e-3)


def test_requires_depth_missing_is_hard_error(tmp_path):
    _write_frames(str(tmp_path), n=4, size=32)
    dm = TemporalImageDataModule(_cfg(str(tmp_path), height=16, width=16,
                                      requires_depth=True))
    with pytest.raises(FileNotFoundError):
        dm.train_batch(0)


def test_dynamic_step_depth_normal_losses():
    """lambda_depth / lambda_depth_rel / lambda_normal active in the dynamic
    train step with device-resident per-frame banks."""
    from tests.test_train_4dgen import setup, render_gt_frames
    from dreammesh4d_tpu.models.geometry.sugar import gaussian_attributes
    from dreammesh4d_tpu.systems.sugar_4dgen import (
        Sugar4DGenLosses,
        init_dyn_state,
        make_dynamic_train_step,
    )

    mesh, params, static, cfg, dparams, raster_cfg, sampler, arap_w = setup(W=32)
    T = 2
    ts = jnp.asarray([0.25, 0.75])
    offsets = jnp.stack([jnp.asarray([0.0, 0.0, 0.2 * float(t)]) for t in ts])
    ref = sampler.orbit(n_views=T, height=32, width=32)
    gt = render_gt_frames(params, static, raster_cfg, ref["rand_cameras"], offsets)

    losses = Sugar4DGenLosses(
        lambda_rgb=100.0, lambda_mask=10.0, lambda_depth=1.0, lambda_depth_rel=1.0,
        lambda_normal=1.0, lambda_normal_consistency=1.0,
        lambda_arap_reg_key_frame=0.1, lambda_arap_reg_inter_frame=0.1,
    )
    video_depths = gt["comp_depth"]
    video_normals = gt["comp_normal"]
    optimizer = optax.adam(1e-3)
    train_step = make_dynamic_train_step(
        params, static, cfg.deformation, raster_cfg, optimizer, losses, arap_w,
        guidance_fn=None, invert_bg_prob=0.0,
        video_frames=(gt["comp_rgb"], (gt["comp_mask"] > 0.5).astype(jnp.float32)),
        video_depths=video_depths, video_normals=video_normals,
    )
    state = init_dyn_state(dparams, optimizer)
    batch = {
        "timestamps": ts,
        "frame_indices": jnp.arange(T, dtype=jnp.int32),
        "ref_cameras": ref["rand_cameras"],
        "rand_cameras": sampler.sample(batch_size=T)["rand_cameras"],
        "inter_timestamps": jnp.linspace(0.2, 0.4, 4),
    }
    state, m = train_step(state, batch, jax.random.PRNGKey(0))
    for key in ("loss_depth", "loss_depth_rel", "loss_normal"):
        assert key in m and np.isfinite(float(m[key])), key
    # grads stay finite with the new terms on
    for leaf in jax.tree.leaves(state.deform_params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_gs_stage_milestone_transition_launch_surface(tmp_path):
    """VERDICT r4 #6: list-valued heights on a GS stage must be honored with
    per-milestone COMPILED steps (not pinned to the final size).  Drives
    sugar_dynamic_dg through launch.py with height=[24,32] and a milestone at
    step 2, then checks the experiment compiled one step per resolution and
    the datamodule actually served both sizes."""
    import launch

    from dreammesh4d_tpu.export.mesh_io import MeshData, save_ply_mesh
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    _write_frames(str(tmp_path / "frames"), n=4, size=32)
    m = make_icosphere(2, radius=0.6)
    mesh = str(tmp_path / "mesh.ply")
    save_ply_mesh(mesh, MeshData(v_pos=np.asarray(m.v_pos),
                                 t_pos_idx=np.asarray(m.t_pos_idx)))

    class Args:
        train = True
        validate = test = export = False
        typecheck = False
        platform = "cpu"
        gpu = "0"

    args = Args()
    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args.config = os.path.join(REPO, "configs/sugar_dynamic_dg.yaml")
    captured = {}
    from dreammesh4d_tpu.systems import assembly

    orig_cls = assembly.EXPERIMENTS["sugar-4dgen-system"]

    class Spy(orig_cls):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            captured["exp"] = self

    assembly.EXPERIMENTS["sugar-4dgen-system"] = Spy
    try:
        launch.main(args, [
            "system.guidance.pretrained_model_name_or_path=none",
            f"data.video_frames_dir={tmp_path / 'frames'}",
            "data.height=[24,32]", "data.width=[24,32]",
            "data.resolution_milestones=[2]",
            "data.num_frames=2",
            "data.random_camera.height=24", "data.random_camera.width=24",
            "data.random_camera.batch_size=2",
            "system.geometry.num_frames=4",
            f"system.geometry.surface_mesh_to_bind_path={mesh}",
            "system.geometry.n_dg_nodes=16", "system.geometry.dg_node_connectivity=4",
            "system.geometry.dist_mode=eucdisc",
            "system.geometry.deformation.base_resolution=[8,8,8,4]",
            "system.geometry.deformation.multires=[1,2]",
            "system.renderer.backend=xla", "system.renderer.tile_capacity=128",
            "trainer.max_steps=4", "trainer.val_check_interval=100",
            f"exp_root_dir={tmp_path}/out", "use_timestamp=false", "tag=ms",
        ])
    finally:
        assembly.EXPERIMENTS["sugar-4dgen-system"] = orig_cls

    exp = captured["exp"]
    # one compiled step per milestone resolution, keyed (rc_h, rc_w, ref_h, ref_w)
    ref_sizes = sorted({k[2:] for k in exp._steps})
    assert ref_sizes == [(24, 24), (32, 32)], exp._steps.keys()
    # frame bank cached at BOTH resolutions (served, not pinned)
    assert (24, 24) in exp.data._frames_cache
    assert (32, 32) in exp.data._frames_cache
    assert not exp.data._pinned
    trial = os.path.join(str(tmp_path), "out", "sugar-dynamic", "ms")
    assert os.path.isdir(os.path.join(trial, "ckpts", "step_00000004"))
