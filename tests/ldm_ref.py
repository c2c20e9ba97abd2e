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


def make_tiny_clip_visual(width=32, layers=2, heads=4, image_size=16,
                          patch_size=8, intermediate=64, proj_dim=16, seed=0):
    """A minimal torch module matching OpenAI CLIP's VisionTransformer in
    both state-dict layout (``visual.*`` keys: fused attn.in_proj qkv,
    mlp.c_fc/c_proj, ln_pre/ln_post, proj) and forward semantics
    (encode_image: class token prepend, pre-LN transformer with QuickGELU,
    ln_post(x[:, 0]) @ proj) — the tower ``clip.load("ViT-L/14")`` gives
    FrozenCLIPImageEmbedder (extern/ldm_zero123/modules/encoders/
    modules.py:432-447).  Used as the conversion oracle for
    convert_clip_vision."""
    import torch
    import torch.nn as nn

    class QuickGELU(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class ResBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = nn.MultiheadAttention(width, heads)
            self.ln_1 = nn.LayerNorm(width)
            self.mlp = nn.Sequential()
            self.mlp.add_module("c_fc", nn.Linear(width, intermediate))
            self.mlp.add_module("gelu", QuickGELU())
            self.mlp.add_module("c_proj", nn.Linear(intermediate, width))
            self.ln_2 = nn.LayerNorm(width)

        def forward(self, x):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            return x + self.mlp(self.ln_2(x))

    class Transformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.resblocks = nn.Sequential(*[ResBlock() for _ in range(layers)])

        def forward(self, x):
            return self.resblocks(x)

    class Visual(nn.Module):
        def __init__(self):
            super().__init__()
            scale = width ** -0.5
            self.conv1 = nn.Conv2d(3, width, kernel_size=patch_size,
                                   stride=patch_size, bias=False)
            self.class_embedding = nn.Parameter(scale * torch.randn(width))
            n_pos = (image_size // patch_size) ** 2 + 1
            self.positional_embedding = nn.Parameter(scale * torch.randn(n_pos, width))
            self.ln_pre = nn.LayerNorm(width)
            self.transformer = Transformer()
            self.ln_post = nn.LayerNorm(width)
            self.proj = nn.Parameter(scale * torch.randn(width, proj_dim))

        def forward(self, x):
            x = self.conv1(x)  # (B, width, g, g)
            x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
            cls = self.class_embedding.to(x.dtype) + torch.zeros(
                x.shape[0], 1, x.shape[-1], dtype=x.dtype)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding.to(x.dtype)
            x = self.ln_pre(x)
            x = x.permute(1, 0, 2)  # NLD -> LND (batch_first=False MHA)
            x = self.transformer(x)
            x = x.permute(1, 0, 2)
            return self.ln_post(x[:, 0, :]) @ self.proj

    torch.manual_seed(seed)
    return Visual().eval()


# Zero123Config dims matching make_tiny_clip_visual's defaults (proj_dim must
# equal context_dim — OpenAI CLIP projects the pooled width to the
# cross-attention context width)
TINY_CLIP_OVERRIDES = [
    "system.guidance.use_clip=true",
    "system.guidance.clip_hidden_size=32",
    "system.guidance.clip_layers=2",
    "system.guidance.clip_heads=4",
    "system.guidance.clip_intermediate=64",
    "system.guidance.clip_image_size=16",
    "system.guidance.clip_patch_size=8",
]


def make_tiny_ldm_checkpoint(path, ldm, context_dim=16, seed=0, clip_visual=None):
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
    if clip_visual is not None:
        # the shipped ckpt stores the CLIP tower under cond_stage_model.model
        # (FrozenCLIPImageEmbedder's ``self.model`` = the full clip.load()
        # model; only visual.* survives the text-transformer delete)
        for k, v in clip_visual.state_dict().items():
            sd[f"cond_stage_model.model.visual.{k}"] = v
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


def make_tiny_clip_text(context_dim=16, layers=2, heads=2, intermediate=32,
                        vocab_size=1000, max_pos=77, seed=0):
    """Tiny torch transformers CLIPTextModel (the module FrozenCLIPEmbedder
    wraps, extern/ldm_zero123/modules/encoders/modules.py:235-255) — the
    conversion oracle for convert_clip_text."""
    import torch
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=context_dim,
        intermediate_size=intermediate, num_hidden_layers=layers,
        num_attention_heads=heads, max_position_embeddings=max_pos,
    )
    torch.manual_seed(seed)
    return CLIPTextModel(cfg).eval()


def make_tiny_sd_checkpoint(path, ldm, context_dim=16, seed=0, clip_text=None):
    """Write a torch ``.ckpt`` in the Stable Diffusion 1.x state-dict layout
    (model.diffusion_model.* in_channels=4 / first_stage_model.* /
    cond_stage_model.transformer.text_model.*) from freshly-initialized
    reference modules.  Returns (torch unet, vae modules, torch text model)."""
    import torch

    openaimodel, ldm_vae = ldm
    torch.manual_seed(seed)
    tm = openaimodel.UNetModel(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
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

    sd = {}
    for prefix, mod in (("model.diffusion_model", tm),
                        ("first_stage_model.encoder", te),
                        ("first_stage_model.decoder", td),
                        ("first_stage_model.quant_conv", tq),
                        ("first_stage_model.post_quant_conv", tpq)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    if clip_text is not None:
        # SD 1.x stores the text tower under cond_stage_model.transformer
        # (FrozenCLIPEmbedder's ``self.transformer`` = CLIPTextModel)
        for k, v in clip_text.state_dict().items():
            sd[f"cond_stage_model.transformer.{k}"] = v
        # buffers the real ckpt carries that the converter must classify as
        # expected-skip, not unmapped
        import numpy as _np

        sd["cond_stage_model.transformer.text_model.embeddings.position_ids"] = (
            torch.from_numpy(_np.arange(77, dtype=_np.int64)[None]))
    sd["betas"] = torch.linspace(1e-4, 2e-2, 8)
    sd["alphas_cumprod"] = torch.cumprod(1 - sd["betas"], 0)
    torch.save({"state_dict": sd}, path)
    return tm, (te, td, tq, tpq), clip_text


# dotlist overrides matching make_tiny_sd_checkpoint's architecture
TINY_SD_GUIDANCE_OVERRIDES = [
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
    "system.guidance.text_layers=2",
    "system.guidance.text_heads=2",
    "system.guidance.text_intermediate=32",
    "system.guidance.vocab_size=1000",
    "system.prompt_processor.context_dim=16",
]
