"""Multi-device training REACHABLE FROM THE LAUNCH SURFACE (VERDICT round-2
item 3).

Reference parity bar: ``Trainer(accelerator="gpu", devices=-1)`` + DDP just
works from the published commands (/root/reference/launch.py:228-235).  Here
the YAML surface is::

    trainer:
      devices: 8
      mesh: [2, 4]   # optional [data, model]; default [devices, 1]

and the experiment builds the dp×tp mesh itself (ParallelContext,
dreammesh4d_tpu/parallel/context.py): batch over ``data``, Zero123 UNet
weights over ``model``, scene params replicated.  These tests run launch.main
for BOTH flagship stages on the 8-virtual-CPU mesh with dp=2×tp=4 — with SDS
active through a random-weight tiny guidance so the tensor-parallel axis is
genuinely exercised — and assert per-step loss equality with the
single-device run at rtol 1e-5 (conftest pins highest matmul precision).
"""

import csv
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY_RANDOM_GUIDANCE = [
    "system.guidance.pretrained_model_name_or_path=random:0",
    "system.guidance.model_channels=32",
    "system.guidance.channel_mult=[1,2]",
    "system.guidance.num_res_blocks=1",
    "system.guidance.num_heads=4",
    "system.guidance.context_dim=16",
    "system.guidance.vae_ch=32",
    "system.guidance.vae_ch_mult=[1,2]",
    "system.guidance.vae_num_res_blocks=1",
    "system.guidance.image_size=32",
    "system.guidance.latent_size=16",
    "system.guidance.use_clip=false",
    # render SDS views at the data size (256-px default would add a
    # second 256^2 rasterizer compile to these tiny-CPU runs)
    "system.guidance.guidance_render_size=0",
]

MULTI = ["trainer.devices=8", "trainer.mesh=[2,4]"]


class _Args:
    train = True
    validate = test = export = False
    typecheck = False
    platform = "cpu"
    gpu = "0"


def _losses(trial):
    with open(os.path.join(trial, "metrics.csv")) as f:
        rows = list(csv.DictReader(f))
    assert rows, f"no metrics in {trial}"
    return {k: [float(r[k]) for r in rows]
            for k in rows[0] if k.startswith("loss")}


@pytest.fixture()
def static_assets(tmp_path):
    import imageio.v2 as imageio

    from dreammesh4d_tpu.export.mesh_io import MeshData, save_ply_mesh
    from dreammesh4d_tpu.utils.procedural import make_icosphere

    rgba = np.zeros((48, 48, 4), np.uint8)
    rgba[12:36, 12:36] = [90, 160, 220, 255]
    img = str(tmp_path / "obj_rgba.png")
    imageio.imwrite(img, rgba)
    m = make_icosphere(2, radius=0.6)
    mesh = str(tmp_path / "mesh.ply")
    save_ply_mesh(mesh, MeshData(v_pos=np.asarray(m.v_pos),
                                 t_pos_idx=np.asarray(m.t_pos_idx)))
    return img, mesh


@pytest.fixture()
def dynamic_assets(tmp_path):
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


def _static_overrides(img, mesh, out, tag):
    return [
        f"data.image_path={img}",
        "data.height=32", "data.width=32",
        "data.random_camera.height=32", "data.random_camera.width=32",
        "data.random_camera.batch_size=2",
        f"system.geometry.surface_mesh_to_bind_path={mesh}",
        "system.renderer.backend=xla", "system.renderer.tile_capacity=128",
        "trainer.max_steps=3", "trainer.val_check_interval=100",
        "trainer.log_every_n_steps=1",
        f"exp_root_dir={out}", "use_timestamp=false", f"tag={tag}",
        *TINY_RANDOM_GUIDANCE,
    ]


def _dynamic_overrides(frames, mesh, out, tag):
    return [
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
        "trainer.log_every_n_steps=1",
        f"exp_root_dir={out}", "use_timestamp=false", f"tag={tag}",
        *TINY_RANDOM_GUIDANCE,
    ]


def test_static_multidevice_matches_single(static_assets, tmp_path):
    """sugar_static_refine with trainer.devices=8 mesh=[2,4]: runs through
    launch.main, and every logged loss matches the single-device run."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest mesh")
    import launch

    img, mesh = static_assets
    args = _Args()
    args.config = os.path.join(REPO, "configs/sugar_static_refine.yaml")

    launch.main(args, _static_overrides(img, mesh, f"{tmp_path}/out", "single"))
    launch.main(args, _static_overrides(img, mesh, f"{tmp_path}/out", "multi")
                + MULTI)

    single = _losses(os.path.join(str(tmp_path), "out", "sugar-refine", "single"))
    multi = _losses(os.path.join(str(tmp_path), "out", "sugar-refine", "multi"))
    assert "loss_sds" in single, sorted(single)
    for k in single:
        # atol floors reduction-order noise on near-zero regularizer terms
        np.testing.assert_allclose(multi[k], single[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_dynamic_multidevice_matches_single(dynamic_assets, tmp_path):
    """sugar_dynamic_dg (HexPlane + hybrid skinning + temporal SDS) with
    dp=2×tp=4 from the launch surface matches single-device numerics —
    including the frame-indexed embedding-bank gathers and the inter-frame
    ARAP reduction under a dp-sharded frame batch (VERDICT round-2 item 6)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest mesh")
    import launch

    frames, mesh = dynamic_assets
    args = _Args()
    args.config = os.path.join(REPO, "configs/sugar_dynamic_dg.yaml")

    launch.main(args, _dynamic_overrides(frames, mesh, f"{tmp_path}/out", "single"))
    launch.main(args, _dynamic_overrides(frames, mesh, f"{tmp_path}/out", "multi")
                + MULTI)

    single = _losses(os.path.join(str(tmp_path), "out", "sugar-dynamic", "single"))
    multi = _losses(os.path.join(str(tmp_path), "out", "sugar-dynamic", "multi"))
    assert "loss_sds_zero123" in single, sorted(single)
    for k in single:
        np.testing.assert_allclose(multi[k], single[k], rtol=1e-5, atol=1e-7,
                                   err_msg=k)


def test_bad_mesh_shape_errors(static_assets, tmp_path):
    import launch

    img, mesh = static_assets
    args = _Args()
    args.config = os.path.join(REPO, "configs/sugar_static_refine.yaml")
    with pytest.raises(ValueError, match="factor"):
        launch.main(args, _static_overrides(img, mesh, f"{tmp_path}/out", "bad")
                    + ["trainer.devices=8", "trainer.mesh=[3,2]"])


def test_indivisible_batch_errors(static_assets, tmp_path):
    import launch

    img, mesh = static_assets
    args = _Args()
    args.config = os.path.join(REPO, "configs/sugar_static_refine.yaml")
    overrides = _static_overrides(img, mesh, f"{tmp_path}/out", "odd")
    overrides = [o if not o.startswith("data.random_camera.batch_size")
                 else "data.random_camera.batch_size=3" for o in overrides]
    with pytest.raises(ValueError, match="divisible"):
        launch.main(args, overrides + ["trainer.devices=8", "trainer.mesh=[2,4]"])
