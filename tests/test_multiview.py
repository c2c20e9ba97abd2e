import json
import math
import os

import jax.numpy as jnp
import numpy as np


def test_multiview_datamodule(tmp_path):
    import imageio.v2 as imageio

    from dreammesh4d_tpu.data.multiview import MultiviewConfig, MultiviewDataModule

    # synthetic dataset: 4 posed views of nothing
    root = tmp_path / "mv"
    os.makedirs(root)
    frames = []
    rng = np.random.RandomState(0)
    for i in range(4):
        img = (rng.rand(32, 32, 4) * 255).astype(np.uint8)
        imageio.imwrite(str(root / f"r_{i}.png"), img)
        az = i * 90.0
        from dreammesh4d_tpu.ops.cameras import make_c2w_numpy

        c2w = make_c2w_numpy(10.0, az, 3.0)
        frames.append({"file_path": f"r_{i}", "transform_matrix": c2w.tolist()})
    with open(root / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)

    dm = MultiviewDataModule(MultiviewConfig(dataroot=str(root), height=32, width=32,
                                             batch_size=2, eval_split="train"))
    b = dm.train_batch()
    assert b["rgb"].shape == (2, 32, 32, 3)
    assert b["rays_o"].shape == (2, 32, 32, 3)
    assert b["cameras"].world_view.shape == (2, 4, 4)
    evals = list(dm.eval_batches())
    assert len(evals) == 4
