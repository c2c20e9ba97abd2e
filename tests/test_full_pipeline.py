"""Chained full-pipeline test mirroring the reference README recipe
(/root/reference/README.md:60-107): static NeRF (stable-zero123) → OBJ export
→ mesh simplification → SuGaR refine bound to the simplified mesh → dynamic
stage seeded with the refined weights → 4D textured export.

Each stage consumes the PREVIOUS stage's artifact — this is the integration
surface the per-stage launch tests cannot cover.  Tiny sizes, CPU, no SDS
checkpoint (guidance degrades to reconstruction losses, same as the per-stage
tests).
"""

import glob
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

pytestmark = pytest.mark.slow


class Args:
    train = validate = test = export = False
    typecheck = False
    platform = "cpu"
    gpu = "0"
    config = ""


def _args(config, **flags):
    a = Args()
    a.config = os.path.join(REPO, "configs", config)
    for k, v in flags.items():
        setattr(a, k, v)
    return a


def test_readme_pipeline_chain(tmp_path):
    import imageio.v2 as imageio

    import launch

    out_root = str(tmp_path / "outputs")

    # ---- assets: single ref image + video frames -------------------------
    rgba = np.zeros((48, 48, 4), np.uint8)
    rgba[12:36, 12:36] = [200, 120, 60, 255]
    img = str(tmp_path / "ball_rgba.png")
    imageio.imwrite(img, rgba)
    frames = tmp_path / "frames"
    frames.mkdir()
    for i in range(8):
        f = np.zeros((48, 48, 4), np.uint8)
        cx = 24 + int(5 * np.sin(2 * np.pi * i / 8))
        f[14:34, cx - 9:cx + 9] = [200, 120, 60, 255]
        imageio.imwrite(str(frames / f"{i:03d}_rgba.png"), f)

    # ---- stage 1: static NeRF (stable-zero123), train + OBJ export -------
    nerf_over = [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.image_path={img}", "data.height=48", "data.width=48",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2", "data.random_camera.eval_height=48",
        "data.random_camera.eval_width=48",
        "system.geometry.pos_encoding_config.n_levels=6",
        "system.geometry.pos_encoding_config.log2_hashmap_size=14",
        "system.exporter.isosurface_resolution=48",
        "trainer.max_steps=25", "trainer.val_check_interval=100",
        f"exp_root_dir={out_root}", "use_timestamp=false", "tag=nerf",
    ]
    launch.main(_args("stable-zero123.yaml", train=True), nerf_over)
    launch.main(_args("stable-zero123.yaml", export=True),
                nerf_over + ["resume=LAST"])
    nerf_obj = os.path.join(out_root, "zero123-sai", "nerf", "save", "model.obj")
    assert os.path.exists(nerf_obj), "stage-1 OBJ export missing"

    # ---- stage 2: mesh simplification (scripts/mesh_simplification.py) ---
    from scripts.mesh_simplification import main as simplify_main

    old_argv = sys.argv
    sys.argv = ["mesh_simplification.py", "--mesh_path", nerf_obj, "--scale", "8"]
    try:
        simplify_main()
    finally:
        sys.argv = old_argv
    simplified = glob.glob(os.path.join(os.path.dirname(nerf_obj), "model_*.ply"))
    assert simplified, "simplified mesh missing"
    bind_mesh = simplified[0]

    # ---- stage 3: SuGaR static refine bound to the simplified mesh -------
    refine_over = [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.image_path={img}", "data.height=32", "data.width=32",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        f"system.geometry.surface_mesh_to_bind_path={bind_mesh}",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=256",
        "trainer.max_steps=3", "trainer.val_check_interval=100",
        f"exp_root_dir={out_root}", "use_timestamp=false", "tag=refine",
    ]
    launch.main(_args("sugar_static_refine.yaml", train=True), refine_over)
    refine_ckpt = os.path.join(out_root, "sugar-refine", "refine", "ckpts",
                               "step_00000003")
    assert os.path.isdir(refine_ckpt), "stage-3 checkpoint missing"

    # ---- stage 4: dynamic stage seeded with the refined weights ----------
    dyn_over = [
        "system.guidance.pretrained_model_name_or_path=none",
        f"data.video_frames_dir={frames}", "data.height=32", "data.width=32",
        "data.num_frames=2",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        "system.geometry.num_frames=8",
        f"system.geometry.surface_mesh_to_bind_path={bind_mesh}",
        f"system.weights={refine_ckpt}",
        "system.geometry.n_dg_nodes=32", "system.geometry.dg_node_connectivity=4",
        "system.geometry.dist_mode=eucdisc",
        "system.geometry.deformation.base_resolution=[8,8,8,4]",
        "system.geometry.deformation.multires=[1,2]",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=256",
        # enough steps for the deformation deltas to exceed the OBJ writer's
        # 1e-6 precision (2 steps of zero-init residual heads round to the
        # rest pose in the text output)
        "trainer.max_steps=10", "trainer.val_check_interval=100",
        "data.predict_height=64", "data.predict_width=64",
        f"exp_root_dir={out_root}", "use_timestamp=false", "tag=dyn",
    ]
    launch.main(_args("sugar_dynamic_dg.yaml", train=True), dyn_over)
    launch.main(_args("sugar_dynamic_dg.yaml", export=True),
                dyn_over + ["resume=LAST"])

    # ---- 4D export: per-frame OBJs sharing one baked texture -------------
    exp_dir = os.path.join(out_root, "sugar-dynamic", "dyn", "save", "4d_export")
    objs = sorted(glob.glob(os.path.join(exp_dir, "frame_*.obj")))
    assert len(objs) >= 8, f"expected >=8 4D frames, got {objs}"
    assert glob.glob(os.path.join(exp_dir, "*.png")), "shared baked texture missing"

    # per-frame meshes actually deform (the video has horizontal motion)
    def verts(p):
        return np.asarray([
            [float(x) for x in l.split()[1:4]]
            for l in open(p) if l.startswith("v ")
        ])

    v0, v4 = verts(objs[0]), verts(objs[4])
    assert v0.shape == v4.shape and np.abs(v0 - v4).max() > 1e-5
