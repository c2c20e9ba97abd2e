"""SD weight onboarding: LDM-layout checkpoint -> flax guidance params.

Closes the round-3 "zoo guidance trains with random weights" gap
(systems/assembly_zoo.py maybe_build_sd_guidance): the converter maps the SD
1.x state-dict layout (same UNet family as Zero123 with in_channels=4 + the
CLIP text tower, reference stable_diffusion_guidance.py:59-95) and the launch
surface hard-errors on missing checkpoints like the Zero123 path does."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ldm_ref import (  # noqa: E402
    TINY_SD_GUIDANCE_OVERRIDES,
    import_ldm,
    make_tiny_clip_text,
    make_tiny_sd_checkpoint,
)

# converter/CLI tests are quick-tier; the launch-surface run compiles the
# full (tiny) UNet+VAE through the trainer and stays in the default tier
QUICK = pytest.mark.quick

TINY_CFG = dict(
    model_channels=32, channel_mult=(1, 2), num_res_blocks=1, num_heads=4,
    context_dim=16, vae_ch=32, vae_ch_mult=(1, 2), vae_num_res_blocks=1,
    image_size=32, latent_size=16, text_layers=2, text_heads=2,
    text_intermediate=32, vocab_size=1000,
)


def _guidance():
    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        StableDiffusionConfig,
        StableDiffusionGuidance,
    )

    return StableDiffusionGuidance(StableDiffusionConfig(**TINY_CFG))


@pytest.fixture(scope="module")
def ldm():
    mods = import_ldm()
    if mods is None:
        pytest.skip("reference tree unavailable")
    return mods


@pytest.fixture(scope="module")
def tiny_sd_ckpt(tmp_path_factory, ldm):
    path = str(tmp_path_factory.mktemp("sd") / "tiny_sd.ckpt")
    make_tiny_sd_checkpoint(path, ldm, clip_text=make_tiny_clip_text())
    return path


@QUICK
def test_clip_text_conversion_parity():
    """Converted text tower matches the torch CLIPTextModel at 1e-4
    (same oracle pattern as test_clip_parity.py for the vision tower)."""
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_clip_text

    tmodel = make_tiny_clip_text()
    sd = {k: v.detach().cpu().numpy() for k, v in tmodel.state_dict().items()}
    params = convert_clip_text(sd)

    guidance = _guidance()
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 1000, (2, 77)).astype(np.int64)
    with torch.no_grad():
        ref = tmodel(input_ids=torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(guidance.encode_tokens({"text": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-3)


@QUICK
def test_sd_checkpoint_conversion_strict(tiny_sd_ckpt):
    """strict load consumes every weight (schedule buffers / position_ids
    classified as expected-skip, not unmapped) and the converted params run
    the full SDS loss."""
    import jax
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        PromptProcessorConfig,
        StableDiffusionPromptProcessor,
    )
    from dreammesh4d_tpu.models.guidance.zero123.convert import load_sd_checkpoint

    guidance = _guidance()
    params = load_sd_checkpoint(tiny_sd_ckpt, guidance, strict=True)
    assert set(params) == {"unet", "vae", "text"}

    prompts = StableDiffusionPromptProcessor(
        PromptProcessorConfig(prompt="test", context_dim=16, use_cache=False,
                              cache_dir=os.path.join("/tmp", "sdconv_cache")))()
    rgb = jnp.full((1, 32, 32, 3), 0.5)
    out = guidance.sds_loss(params, prompts, jax.random.PRNGKey(0), rgb,
                            jnp.zeros(1), jnp.zeros(1), jnp.full(1, 3.8), 0)
    assert np.isfinite(float(out["loss_sds"]))


@QUICK
def test_sd_unet_parity_text_conditioned(tiny_sd_ckpt, ldm):
    """Converted SD UNet (in_channels=4, 77-token text context) matches the
    reference torch UNet forward."""
    import jax.numpy as jnp

    from dreammesh4d_tpu.models.guidance.zero123.convert import load_sd_checkpoint

    openaimodel, _ = ldm
    torch.manual_seed(0)
    tm = openaimodel.UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(4, 2, 1), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, context_dim=16, legacy=False,
    ).eval()

    guidance = _guidance()
    params = load_sd_checkpoint(tiny_sd_ckpt, guidance)

    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 4, 16, 16)).astype(np.float32)
    t = np.asarray([7.0, 423.0], np.float32)
    ctx = rng.normal(0, 1, (2, 77, 16)).astype(np.float32)
    with torch.no_grad():
        yt = tm(torch.from_numpy(x), torch.from_numpy(t),
                torch.from_numpy(ctx)).numpy()
    yf = guidance.unet.apply({"params": params["unet"]},
                             jnp.asarray(x.transpose(0, 2, 3, 1)),
                             jnp.asarray(t), jnp.asarray(ctx))
    np.testing.assert_allclose(np.asarray(yf).transpose(0, 3, 1, 2), yt,
                               atol=1e-4, rtol=1e-3)


@QUICK
def test_cli_roundtrip(tiny_sd_ckpt, tmp_path):
    """convert_sd_ckpt.py writes an orbax cache that load_sd_checkpoint
    restores identically to direct conversion, with zero torch imports."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from convert_sd_ckpt import main

    from dreammesh4d_tpu.models.guidance.zero123.convert import load_sd_checkpoint

    overrides = [ov for ov in TINY_SD_GUIDANCE_OVERRIDES
                 if ov.startswith("system.guidance.")]
    out = main([tiny_sd_ckpt, "--out", str(tmp_path / "cache"), *overrides])
    assert os.path.exists(os.path.join(out, "manifest.json"))

    guidance = _guidance()
    direct = load_sd_checkpoint(tiny_sd_ckpt, guidance)
    cached = load_sd_checkpoint(out, guidance)
    import jax

    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(direct)[0], key=lambda kv: str(kv[0])),
            sorted(jax.tree_util.tree_flatten_with_path(cached)[0], key=lambda kv: str(kv[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@QUICK
def test_cli_errors_on_unmapped(tiny_sd_ckpt, tmp_path):
    ckpt = torch.load(tiny_sd_ckpt, map_location="cpu", weights_only=False)
    ckpt["state_dict"]["model.diffusion_model.mystery.weight"] = torch.zeros(3)
    bad = str(tmp_path / "bad.ckpt")
    torch.save(ckpt, bad)

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from convert_sd_ckpt import main

    overrides = [ov for ov in TINY_SD_GUIDANCE_OVERRIDES
                 if ov.startswith("system.guidance.")]
    with pytest.raises(KeyError, match="mystery"):
        main([bad, "--out", str(tmp_path / "cache2"), *overrides])


@QUICK
def test_missing_sd_checkpoint_hard_errors():
    from dreammesh4d_tpu.systems.assembly_zoo import maybe_build_sd_guidance

    system = {"guidance": {"pretrained_model_name_or_path": "/no/such/sd.ckpt",
                           **{k: v for k, v in TINY_CFG.items()}}}
    with pytest.raises(FileNotFoundError):
        maybe_build_sd_guidance(system)
    # explicit opt-outs still work
    system["guidance"]["allow_missing"] = True
    assert maybe_build_sd_guidance(system) is None
    system["guidance"]["pretrained_model_name_or_path"] = "none"
    del system["guidance"]["allow_missing"]
    assert maybe_build_sd_guidance(system) is None


@QUICK
def test_random_sentinel_builds_random_weights():
    from dreammesh4d_tpu.systems.assembly_zoo import maybe_build_sd_guidance

    system = {"guidance": {"pretrained_model_name_or_path": "random:3",
                           **{k: v for k, v in TINY_CFG.items()}},
              "prompt_processor": {"prompt": "x", "context_dim": 16,
                                   "use_cache": False}}
    pack = maybe_build_sd_guidance(system)
    assert pack is not None
    guidance, params, prompts = pack
    assert "unet" in params and "vae" in params


def test_launch_dreamfusion_with_converted_weights(tiny_sd_ckpt, tmp_path):
    """The reference dreamfusion recipe with REAL converted SD weights through
    the launch surface (round-3 VERDICT item 3 'done' gate)."""
    import launch

    class Args:
        train = True
        validate = test = export = False
        typecheck = False
        platform = "auto"
        gpu = "0"

    args = Args()
    args.config = os.path.join(REPO, "configs/zoo/dreamfusion-sd.yaml")
    extras = [
        "data.width=16", "data.height=16", "data.batch_size=1",
        "system.geometry.pos_encoding_config.n_levels=4",
        "system.geometry.pos_encoding_config.log2_hashmap_size=8",
        f"system.guidance.pretrained_model_name_or_path={tiny_sd_ckpt}",
        *TINY_SD_GUIDANCE_OVERRIDES,
        "system.prompt_processor.prompt=a test object",
        "trainer.max_steps=2", "trainer.val_check_interval=100",
        f"exp_root_dir={tmp_path}", "tag=dfconv", "name=sdtest",
        "use_timestamp=false",
    ]
    launch.main(args, extras)
    trial = os.path.join(str(tmp_path), "sdtest", "dfconv")
    assert os.path.isdir(trial)
    csvs = []
    for root, _, files in os.walk(trial):
        csvs += [os.path.join(root, f) for f in files if f.endswith(".csv")]
    assert csvs, f"no metrics csv under {trial}"
