"""Checkpoint-onboarding CLI (scripts/convert_zero123_ckpt.py): tiny
LDM-layout torch ckpt -> orbax cache -> restored by load_zero123_checkpoint
with no torch on the load path; unmapped keys are a hard, listed error.

VERDICT round-2 item 7: when the real stable_zero123.ckpt appears, the
pipeline runs with zero code changes (point
system.guidance.pretrained_model_name_or_path at the cache dir).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

torch = pytest.importorskip("torch")

from ldm_ref import import_ldm, make_tiny_clip_visual, make_tiny_ldm_checkpoint  # noqa: E402

TINY_ARGS = [
    "system.guidance.model_channels=32", "system.guidance.channel_mult=[1,2]",
    "system.guidance.num_res_blocks=1", "system.guidance.num_heads=4",
    "system.guidance.context_dim=16", "system.guidance.vae_ch=32",
    "system.guidance.vae_ch_mult=[1,2]", "system.guidance.vae_num_res_blocks=1",
    "system.guidance.image_size=32", "system.guidance.latent_size=16",
    "system.guidance.use_clip=true", "system.guidance.clip_hidden_size=32",
    "system.guidance.clip_layers=2", "system.guidance.clip_heads=4",
    "system.guidance.clip_intermediate=64", "system.guidance.clip_image_size=16",
    "system.guidance.clip_patch_size=8",
]


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    ldm = import_ldm()
    if ldm is None:
        pytest.skip("reference tree unavailable")
    path = str(tmp_path_factory.mktemp("ckpt") / "tiny.ckpt")
    make_tiny_ldm_checkpoint(path, ldm, clip_visual=make_tiny_clip_visual(proj_dim=16))
    return path


def _modules():
    from dreammesh4d_tpu.models.guidance.zero123 import Zero123Config, Zero123Modules

    cfg = Zero123Config(
        model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
        context_dim=16, vae_ch=32, vae_ch_mult=(1, 2), vae_num_res_blocks=1,
        image_size=32, latent_size=16, use_clip=True, clip_hidden_size=32,
        clip_layers=2, clip_heads=4, clip_intermediate=64, clip_image_size=16,
        clip_patch_size=8,
    )
    return Zero123Modules(cfg)


def test_cli_roundtrip(tiny_ckpt, tmp_path):
    import jax

    from convert_zero123_ckpt import main
    from dreammesh4d_tpu.models.guidance.zero123.convert import (
        load_zero123_checkpoint,
    )

    out = main([tiny_ckpt, "--out", str(tmp_path / "cache"), *TINY_ARGS])
    assert os.path.exists(os.path.join(out, "manifest.json"))

    mod = _modules()
    direct = load_zero123_checkpoint(tiny_ckpt, mod)
    cached = load_zero123_checkpoint(out, mod)  # orbax path, no torch
    assert sorted(cached) == sorted(direct) == [
        "cc_projection", "clip", "unet", "vae"]
    flat_d = jax.tree_util.tree_leaves_with_path(direct)
    flat_c = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(cached)}
    for k, v in flat_d:
        np.testing.assert_array_equal(np.asarray(flat_c[jax.tree_util.keystr(k)]),
                                      np.asarray(v), err_msg=jax.tree_util.keystr(k))


def test_cli_errors_on_unmapped(tiny_ckpt, tmp_path):
    ckpt = torch.load(tiny_ckpt, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"]
    sd["model.diffusion_model.some_new_block.weight"] = torch.zeros(3)
    bad = str(tmp_path / "bad.ckpt")
    torch.save({"state_dict": sd}, bad)

    from convert_zero123_ckpt import main

    with pytest.raises(KeyError, match="some_new_block"):
        main([bad, "--out", str(tmp_path / "cache"), *TINY_ARGS])
    # --allow-unmapped downgrades to a warning
    main([bad, "--out", str(tmp_path / "cache2"), "--allow-unmapped", *TINY_ARGS])


def test_report_classifies_schedule_buffers(tiny_ckpt):
    """DDPM schedule buffers / EMA / text-tower keys land in ``skipped``,
    never ``unmapped``."""
    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_state_dict

    ckpt = torch.load(tiny_ckpt, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    sd["betas"] = np.zeros(10, np.float32)
    sd["alphas_cumprod"] = np.zeros(10, np.float32)
    sd["model_ema.decay"] = np.zeros(1, np.float32)
    sd["cond_stage_model.model.ln_final.weight"] = np.zeros(4, np.float32)
    params, report = convert_state_dict(sd, _modules())
    assert not report["unmapped"], report["unmapped"]
    for k in ("betas", "alphas_cumprod", "model_ema.decay",
              "cond_stage_model.model.ln_final.weight"):
        assert k in report["skipped"]
