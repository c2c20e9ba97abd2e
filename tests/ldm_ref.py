"""Helpers to import the reference torch LDM modules (read-only, at
/root/reference/extern/ldm_zero123) and synthesize tiny Stable-Zero123-layout
checkpoints for converter/SDS tests."""

import os
import sys
import types

REFERENCE = "/root/reference"


def import_ldm():
    """Import (openaimodel, ldm_vae_model) with stubs for torchvision/omegaconf
    (unused on the code paths these tests exercise)."""
    if not os.path.isdir(REFERENCE):
        return None
    if "torchvision" not in sys.modules:
        import importlib.machinery

        tv = types.ModuleType("torchvision")
        # a stub with __spec__ = None breaks transformers' later
        # find_spec("torchvision") probe (ValueError) — give it a real spec
        tv.__spec__ = importlib.machinery.ModuleSpec("torchvision", None)
        sys.modules["torchvision"] = tv
    if "omegaconf" not in sys.modules:
        oc = types.ModuleType("omegaconf")
        lc = types.ModuleType("omegaconf.listconfig")

        class ListConfig(list):
            pass

        lc.ListConfig = ListConfig
        oc.listconfig = lc
        sys.modules["omegaconf"] = oc
        sys.modules["omegaconf.listconfig"] = lc
    if REFERENCE not in sys.path:
        # APPEND so the reference's launch.py / configs never shadow the
        # repo's own top-level modules
        sys.path.append(REFERENCE)
    from extern.ldm_zero123.modules.diffusionmodules import model as ldm_vae
    from extern.ldm_zero123.modules.diffusionmodules import openaimodel

    return openaimodel, ldm_vae


def make_tiny_ldm_checkpoint(path, ldm, context_dim=16, seed=0):
    """Write a torch ``.ckpt`` in the Stable-Zero123 state-dict layout
    (model.diffusion_model.* / first_stage_model.* / cc_projection.*) from
    freshly-initialized reference modules.  Returns the torch modules."""
    import torch

    openaimodel, ldm_vae = ldm
    torch.manual_seed(seed)
    tm = openaimodel.UNetModel(
        image_size=32, in_channels=8, out_channels=4, model_channels=32,
        num_res_blocks=1, attention_resolutions=(4, 2, 1), channel_mult=(1, 2),
        num_heads=4, use_spatial_transformer=True, context_dim=context_dim,
        legacy=False,
    ).eval()
    te = ldm_vae.Encoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=[], dropout=0.0, in_channels=3,
                         resolution=64, z_channels=4, double_z=True).eval()
    td = ldm_vae.Decoder(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                         attn_resolutions=[], dropout=0.0, in_channels=3,
                         resolution=64, z_channels=4).eval()
    tq, tpq = torch.nn.Conv2d(8, 8, 1), torch.nn.Conv2d(4, 4, 1)
    cc = torch.nn.Linear(context_dim + 4, context_dim)

    sd = {}
    for prefix, mod in (("model.diffusion_model", tm),
                        ("first_stage_model.encoder", te),
                        ("first_stage_model.decoder", td),
                        ("first_stage_model.quant_conv", tq),
                        ("first_stage_model.post_quant_conv", tpq),
                        ("cc_projection", cc)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    torch.save({"state_dict": sd}, path)
    return tm, (te, td, tq, tpq), cc


# dotlist overrides that configure the guidance to the tiny architecture the
# checkpoint above carries (pass to launch.main alongside the ckpt path)
TINY_GUIDANCE_OVERRIDES = [
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
]
