"""Zoo configs drive end-to-end through the launcher (tiny, CPU, no SDS)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TINY_TEXT = [
    "data.width=16", "data.height=16", "data.batch_size=1",
    "system.geometry.pos_encoding_config.n_levels=4",
    "system.geometry.pos_encoding_config.log2_hashmap_size=8",
    # SDS explicitly off (a missing checkpoint path is now a hard error)
    "system.guidance.pretrained_model_name_or_path=none",
    "trainer.max_steps=2", "trainer.val_check_interval=100",
    "use_timestamp=false",
]


def _launch(config, extras, tmp_path, tag):
    import launch

    class Args:
        train = True
        validate = test = export = False
        typecheck = False
        platform = "auto"
        gpu = "0"

    args = Args()
    args.config = config
    launch.main(args, extras + [f"exp_root_dir={tmp_path}", f"tag={tag}",
                                "name=zootest"])
    trial = os.path.join(str(tmp_path), "zootest", tag)
    assert os.path.isdir(trial), trial
    assert os.path.exists(os.path.join(trial, "configs", "parsed.yaml"))
    csvs = []
    for root, _, files in os.walk(trial):
        csvs += [os.path.join(root, f) for f in files if f.endswith(".csv")]
    assert csvs, f"no metrics csv under {trial}"
    return trial


@pytest.mark.parametrize("config,prompt_needed", [
    ("configs/zoo/dreamfusion-sd.yaml", True),
    ("configs/zoo/magic3d-coarse-sd.yaml", True),
    ("configs/zoo/sjc.yaml", True),
    ("configs/zoo/latentnerf.yaml", True),
    ("configs/zoo/prolificdreamer.yaml", True),
])
def test_text_zoo_config_launches(config, prompt_needed, tmp_path):
    extras = list(TINY_TEXT)
    if prompt_needed:
        extras.append("system.prompt_processor.prompt=a test object")
    _launch(os.path.join(REPO, config), extras,
            tmp_path, os.path.basename(config).split(".")[0])


def _write_ref_image(tmp_path):
    import imageio.v2 as imageio

    rgba = np.zeros((32, 32, 4), np.uint8)
    rgba[8:24, 8:24] = [200, 60, 60, 255]
    path = os.path.join(str(tmp_path), "obj_rgba.png")
    imageio.imwrite(path, rgba)
    return path


@pytest.mark.parametrize("config", [
    "configs/zoo/magic123-coarse-sd.yaml",
    "configs/zoo/imagecondition.yaml",
])
def test_image_zoo_config_launches(config, tmp_path):
    img = _write_ref_image(tmp_path)
    extras = [
        f"data.image_path={img}",
        "data.width=16", "data.height=16",
        "data.random_camera.width=16", "data.random_camera.height=16",
        "data.random_camera.batch_size=1",
        "system.geometry.pos_encoding_config.n_levels=4",
        "system.geometry.pos_encoding_config.log2_hashmap_size=8",
        "system.prompt_processor.prompt=a test object",
        "system.guidance.pretrained_model_name_or_path=none",
        "trainer.max_steps=2", "trainer.val_check_interval=100",
        "use_timestamp=false",
    ]
    if "magic123" in config:
        extras.append("system.guidance_3d.pretrained_model_name_or_path=none")
    _launch(os.path.join(REPO, config), extras,
            tmp_path, os.path.basename(config).split(".")[0])


def test_eff_dreamfusion_config_launches(tmp_path):
    extras = list(TINY_TEXT) + ["system.prompt_processor.prompt=a test object"]
    _launch(os.path.join(REPO, "configs/zoo/dreamfusion-sd-eff.yaml"), extras,
            tmp_path, "eff")


def test_sketchshape_config_launches(tmp_path):
    # tiny guide cube for the winding-number shape loss
    obj = os.path.join(str(tmp_path), "cube.obj")
    v = [(x, y, z) for x in (-0.3, 0.3) for y in (-0.3, 0.3) for z in (-0.3, 0.3)]
    f = [(1, 2, 4), (1, 4, 3), (5, 8, 6), (5, 7, 8), (1, 6, 2), (1, 5, 6),
         (3, 4, 8), (3, 8, 7), (1, 3, 7), (1, 7, 5), (2, 6, 8), (2, 8, 4)]
    with open(obj, "w") as fh:
        for x, y, z in v:
            fh.write(f"v {x} {y} {z}\n")
        for a, b, c in f:
            fh.write(f"f {a} {b} {c}\n")
    extras = list(TINY_TEXT) + [
        "system.prompt_processor.prompt=a test object",
        f"system.guide_shape={obj}",
    ]
    _launch(os.path.join(REPO, "configs/zoo/sketchshape.yaml"), extras,
            tmp_path, "sketchshape")
