

def test_sample_efficient_subgrid():
    # uncond_eff parity: subsampled ray grid with back-mapping indices
    from dreammesh4d_tpu.data.uncond import RandomCameraConfig, RandomCameraSampler
    import numpy as np
    import jax.numpy as jnp

    cfg = RandomCameraConfig(height=32, width=32, batch_size=2,
                             camera_distance_range=(2.0, 2.0),
                             fovy_range=(40.0, 40.0),
                             eval_fovy_deg=40.0, eval_camera_distance=2.0)
    s = RandomCameraSampler(cfg, seed=0)
    batch = s.sample_efficient(8, 8)
    assert batch["rays_o"].shape == (2, 8, 8, 3)
    assert batch["rays_d"].shape == (2, 8, 8, 3)
    idx = np.asarray(batch["ray_indices"])
    assert idx.shape == (64,)
    assert idx.min() >= 0 and idx.max() < 32 * 32
    assert len(np.unique(idx)) == 64  # distinct pixels
    # subsampled rays literally come from the full-res bundle
    full = s.sample(2)
    # (new random cameras, so just check the mask geometry: strides cover
    # the inner 3/4 with an offset)
    xs = idx % 32
    ys = idx // 32
    assert xs.max() - xs.min() <= 0.75 * 32 + 1
    assert ys.max() - ys.min() <= 0.75 * 32 + 1
