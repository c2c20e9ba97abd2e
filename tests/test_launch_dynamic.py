"""Drive the sugar_dynamic_dg config end-to-end through launch.py (tiny CPU
run, synthetic video + icosphere bind mesh, no SDS checkpoint)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture()
def assets(tmp_path):
    import imageio.v2 as imageio

    from dreammesh4d_tpu.export.mesh_io import MeshData, save_ply_mesh
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(8):
        rgba = np.zeros((48, 48, 4), np.uint8)
        cx = 24 + int(6 * np.sin(2 * np.pi * i / 8))
        rgba[16:32, cx - 8:cx + 8] = [200, 80, 60, 255]
        imageio.imwrite(str(frames / f"{i:03d}_rgba.png"), rgba)

    m = make_icosphere(2, radius=0.6)
    mesh = tmp_path / "mesh.ply"
    save_ply_mesh(str(mesh), MeshData(v_pos=np.asarray(m.v_pos),
                                      t_pos_idx=np.asarray(m.t_pos_idx)))
    return str(frames), str(mesh)


def test_dynamic_stage_launches(assets, tmp_path):
    import launch

    frames, mesh = assets

    class Args:
        train = True
        validate = test = export = False
        typecheck = False
        platform = "cpu"
        gpu = "0"

    args = Args()
    args.config = os.path.join(REPO, "configs/sugar_dynamic_dg.yaml")
    launch.main(args, [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.video_frames_dir={frames}",
        "data.height=32", "data.width=32", "data.num_frames=2",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        "system.geometry.num_frames=8",
        f"system.geometry.surface_mesh_to_bind_path={mesh}",
        "system.geometry.n_dg_nodes=32", "system.geometry.dg_node_connectivity=4",
        "system.geometry.dist_mode=eucdisc",
        "system.geometry.deformation.base_resolution=[8,8,8,4]",
        "system.geometry.deformation.multires=[1,2]",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=128",
        "trainer.max_steps=3", "trainer.val_check_interval=100",
        f"exp_root_dir={tmp_path}/out", "use_timestamp=false", "tag=dyn",
    ])
    trial = os.path.join(str(tmp_path), "out", "sugar-dynamic", "dyn")
    assert os.path.isdir(os.path.join(trial, "ckpts", "step_00000003"))
    assert os.path.exists(os.path.join(trial, "configs", "parsed.yaml"))
    assert os.path.exists(os.path.join(trial, "metrics.csv"))

    # 4D export: per-timestamp OBJs sharing one baked texture (resume=LAST)
    args.train = False
    args.export = True
    launch.main(args, [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.video_frames_dir={frames}",
        "data.height=32", "data.width=32", "data.num_frames=2",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        "system.geometry.num_frames=8",
        f"system.geometry.surface_mesh_to_bind_path={mesh}",
        "system.geometry.n_dg_nodes=32", "system.geometry.dg_node_connectivity=4",
        "system.geometry.dist_mode=eucdisc",
        "system.geometry.deformation.base_resolution=[8,8,8,4]",
        "system.geometry.deformation.multires=[1,2]",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=128",
        "trainer.max_steps=3", "trainer.val_check_interval=100",
        f"exp_root_dir={tmp_path}/out", "use_timestamp=false", "tag=dyn",
        "data.predict_height=64", "data.predict_width=64",
        # exercise the xatlas-style chart unwrap from the launch surface
        # (system.exporter.atlas plumbs through to bake_texture)
        "system.exporter.atlas=charts",
        "resume=LAST",
    ])
    objs = []
    for root, _, files in os.walk(os.path.join(trial, "save")):
        objs += [f for f in files if f.endswith(".obj")]
    assert len(objs) >= 8, objs  # one deformed mesh per video frame


def test_dynamic_stage_discrete_mode(assets, tmp_path):
    """dynamic_mode=discrete through the launch surface: per-frame learned
    node tables replace the HexPlane (reference dynamic_sugar.py:102-139);
    the train step must run and checkpoint with the table pytree."""
    import launch

    frames, mesh = assets

    class Args:
        train = True
        validate = test = export = False
        typecheck = False
        platform = "cpu"
        gpu = "0"

    args = Args()
    args.config = os.path.join(REPO, "configs/sugar_dynamic_dg.yaml")
    launch.main(args, [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.video_frames_dir={frames}",
        "data.height=32", "data.width=32", "data.num_frames=2",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        "system.geometry.num_frames=8",
        "system.geometry.dynamic_mode=discrete",
        f"system.geometry.surface_mesh_to_bind_path={mesh}",
        "system.geometry.n_dg_nodes=32", "system.geometry.dg_node_connectivity=4",
        "system.geometry.dist_mode=eucdisc",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=128",
        "trainer.max_steps=2", "trainer.val_check_interval=100",
        f"exp_root_dir={tmp_path}/out", "use_timestamp=false", "tag=dyndisc",
    ])
    trial = os.path.join(str(tmp_path), "out", "sugar-dynamic", "dyndisc")
    assert os.path.isdir(os.path.join(trial, "ckpts", "step_00000002"))
    import csv

    with open(os.path.join(trial, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows and float(rows[-1]["loss_total"]) == float(rows[-1]["loss_total"])
    assert "loss_plane_tv" not in rows[-1]  # no plane grids in discrete mode

    # serving surface: load the trial, render novel (view, time) frames
    from dreammesh4d_tpu.serving import Viewer4D

    viewer = Viewer4D.from_trial(trial, height=32, width=32)
    img = viewer.render(elevation_deg=10, azimuth_deg=45, distance=3.5, t=0.3)
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()
    assert img.min() < 0.9  # the object renders (not all background)
    frames = viewer.play(azimuth_deg=0, n_frames=4)
    assert len(frames) == 4 and all(f.shape == (32, 32, 3) for f in frames)


def test_dynamic_stage_with_sds_guidance(assets, tmp_path):
    """Launch-surface run with the SDS term ACTIVE: a tiny Stable-Zero123
    checkpoint (reference LDM layout) is converted at startup and temporal
    SDS runs inside the jitted step — loss_sds_zero123 must be logged,
    finite and nonzero (VERDICT round-2 item 1)."""
    import csv
    import math

    import pytest

    pytest.importorskip("torch")
    from ldm_ref import (
        TINY_CLIP_OVERRIDES,
        TINY_GUIDANCE_OVERRIDES,
        import_ldm,
        make_tiny_clip_visual,
        make_tiny_ldm_checkpoint,
    )

    ldm = import_ldm()
    if ldm is None:
        pytest.skip("reference tree unavailable")

    import launch

    frames, mesh = assets
    ckpt = str(tmp_path / "tiny_zero123.ckpt")
    # include a CLIP visual tower so this run exercises use_clip=true end to
    # end: convert_clip_vision at startup, prepare_embeddings conditioning on
    # real image features inside the launch surface (VERDICT round-2 item 2)
    make_tiny_ldm_checkpoint(ckpt, ldm,
                             clip_visual=make_tiny_clip_visual(proj_dim=16))

    class Args:
        train = True
        validate = test = export = False
        typecheck = False
        platform = "cpu"
        gpu = "0"

    args = Args()
    args.config = os.path.join(REPO, "configs/sugar_dynamic_dg.yaml")
    launch.main(args, [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.video_frames_dir={frames}",
        "data.height=32", "data.width=32", "data.num_frames=2",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        "system.geometry.num_frames=8",
        f"system.geometry.surface_mesh_to_bind_path={mesh}",
        "system.geometry.n_dg_nodes=32", "system.geometry.dg_node_connectivity=4",
        "system.geometry.dist_mode=eucdisc",
        "system.geometry.deformation.base_resolution=[8,8,8,4]",
        "system.geometry.deformation.multires=[1,2]",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=128",
        "trainer.max_steps=2", "trainer.val_check_interval=100",
        f"exp_root_dir={tmp_path}/out", "use_timestamp=false", "tag=dynsds",
        f"system.guidance.pretrained_model_name_or_path={ckpt}",
        "system.freq.guidance_eval=2",
        # render the SDS views at a second (smaller) raster size — covers the
        # dual-rasterizer-variant path (guidance_render_size, PERF.md)
        "system.guidance.guidance_render_size=24",
        *TINY_GUIDANCE_OVERRIDES,
        *TINY_CLIP_OVERRIDES,  # later dotlist wins: flips use_clip back on
    ])
    trial = os.path.join(str(tmp_path), "out", "sugar-dynamic", "dynsds")
    with open(os.path.join(trial, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows, "no metrics logged"
    assert "loss_sds_zero123" in rows[0], sorted(rows[0])
    vals = [float(r["loss_sds_zero123"]) for r in rows]
    assert all(math.isfinite(v) for v in vals), vals
    assert any(v != 0.0 for v in vals), vals
    # freq.guidance_eval cadence: SDS diagnostics grid saved at step 2
    # (reference base.py:344-402)
    assert os.path.exists(os.path.join(trial, "save", "it2-guidance.png"))
