"""Torch LDM checkpoint -> flax parameter conversion.

Maps the Stable-Zero123 checkpoint state dict (the LDM layout defined by
load/zero123/sd-objaverse-finetune-c_concat-256.yaml and
extern/ldm_zero123/models/diffusion/ddpm.py) onto the flax module trees in
unet.py / vae.py: convs transpose OIHW->HWIO, linears transpose (out,in)->
(in,out), GroupNorm weight/bias -> scale/bias, attention qkv splits.  The
CLIP vision tower maps onto transformers' FlaxCLIPVisionModel layout.

Loading runs on host CPU (torch is CPU-only in this image) and produces
numpy arrays; callers device-put with their chosen sharding.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


class _TrackedDict(dict):
    """State dict that records every key the converters consume, so the
    onboarding CLI can report unmapped weights instead of silently dropping
    them (scripts/convert_zero123_ckpt.py)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.consumed = set()

    def __getitem__(self, k):
        self.consumed.add(k)
        return super().__getitem__(k)


# Checkpoint keys that are CORRECT to leave unconverted: DDPM schedule
# buffers (recomputed by scheduler.make_schedule), EMA shadows, the CLIP
# text tower (Zero123 is image-conditioned; FrozenCLIPImageEmbedder deletes
# model.transformer — modules.py:447), and VAE training-loss heads.
EXPECTED_SKIP = [
    r"^betas$", r"^alphas_cumprod", r"^sqrt_", r"^log_one_minus_",
    r"^posterior_", r"^logvar$", r"^model_ema\.",
    r"^cond_stage_model\.model\.(?!visual\.)",
    r"^cond_stage_model\.(?!model\.)",
    r"^first_stage_model\.loss\.",
]


def _t(x):
    return np.asarray(x, np.float32)


def _conv(sd, key):
    # torch conv weight OIHW -> flax HWIO
    return {"kernel": _t(sd[f"{key}.weight"]).transpose(2, 3, 1, 0),
            "bias": _t(sd[f"{key}.bias"])}


def _dense(sd, key, bias=True):
    out = {"kernel": _t(sd[f"{key}.weight"]).T}
    if bias:
        out["bias"] = _t(sd[f"{key}.bias"])
    return out


def _norm(sd, key):
    return {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}


def _gn(sd, key):
    return {"GroupNorm_0": _norm(sd, key)}


def _ln(sd, key):
    return {"LayerNorm_0": _norm(sd, key)}


def _res_block(sd, p):
    out = {
        "norm_in": _gn(sd, f"{p}.in_layers.0"),
        "conv_in": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "norm_out": _gn(sd, f"{p}.out_layers.0"),
        "conv_out": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _cross_attn(sd, p):
    return {
        "to_q": {"kernel": _t(sd[f"{p}.to_q.weight"]).T},
        "to_k": {"kernel": _t(sd[f"{p}.to_k.weight"]).T},
        "to_v": {"kernel": _t(sd[f"{p}.to_v.weight"]).T},
        "to_out": _dense(sd, f"{p}.to_out.0"),
    }


def _transformer_block(sd, p):
    return {
        "norm1": _ln(sd, f"{p}.norm1"),
        "attn1": _cross_attn(sd, f"{p}.attn1"),
        "norm2": _ln(sd, f"{p}.norm2"),
        "attn2": _cross_attn(sd, f"{p}.attn2"),
        "norm3": _ln(sd, f"{p}.norm3"),
        "ff": {
            "proj_in": _dense(sd, f"{p}.ff.net.0.proj"),
            "proj_out": _dense(sd, f"{p}.ff.net.2"),
        },
    }


def _spatial_transformer(sd, p, depth=1):
    out = {
        "norm": _gn(sd, f"{p}.norm"),
        "proj_in": _conv(sd, f"{p}.proj_in"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }
    for i in range(depth):
        out[f"block_{i}"] = _transformer_block(sd, f"{p}.transformer_blocks.{i}")
    return out


def convert_unet(sd: Dict[str, Any], channel_mult=(1, 2, 4, 4), num_res_blocks=2,
                 attention_resolutions=(4, 2, 1)) -> Dict[str, Any]:
    """LDM ``model.diffusion_model.*`` -> flax UNetModel param tree.

    The LDM input_blocks/output_blocks are flat ModuleLists; this walks them
    in the same construction order as openaimodel.UNetModel."""
    p = {}
    p["time_embed_0"] = _dense(sd, "time_embed.0")
    p["time_embed_2"] = _dense(sd, "time_embed.2")
    p["conv_in"] = _conv(sd, "input_blocks.0.0")

    idx = 1
    ds = 1
    for level, mult in enumerate(channel_mult):
        for i in range(num_res_blocks):
            p[f"down_{level}_{i}_res"] = _res_block(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                p[f"down_{level}_{i}_attn"] = _spatial_transformer(sd, f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            p[f"down_{level}_ds"] = {"op": _conv(sd, f"input_blocks.{idx}.0.op")}
            idx += 1
            ds *= 2

    p["mid_res1"] = _res_block(sd, "middle_block.0")
    p["mid_attn"] = _spatial_transformer(sd, "middle_block.1")
    p["mid_res2"] = _res_block(sd, "middle_block.2")

    idx = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            p[f"up_{level}_{i}_res"] = _res_block(sd, f"output_blocks.{idx}.0")
            sub = 1
            if ds in attention_resolutions:
                p[f"up_{level}_{i}_attn"] = _spatial_transformer(sd, f"output_blocks.{idx}.{sub}")
                sub += 1
            if level != 0 and i == num_res_blocks:
                p[f"up_{level}_us"] = {"conv": _conv(sd, f"output_blocks.{idx}.{sub}.conv")}
            idx += 1
        if level != 0:
            ds //= 2

    p["norm_out"] = _gn(sd, "out.0")
    p["conv_out"] = _conv(sd, "out.2")
    return p


def _vae_res(sd, p):
    out = {
        "norm1": _gn(sd, f"{p}.norm1"), "conv1": _conv(sd, f"{p}.conv1"),
        "norm2": _gn(sd, f"{p}.norm2"), "conv2": _conv(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _gn(sd, f"{p}.norm"),
        "q": _conv(sd, f"{p}.q"), "k": _conv(sd, f"{p}.k"), "v": _conv(sd, f"{p}.v"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }


def convert_vae(sd: Dict[str, Any], ch_mult=(1, 2, 4, 4), num_res_blocks=2) -> Dict[str, Any]:
    """LDM ``first_stage_model.*`` -> flax AutoencoderKL param tree."""
    enc = {"conv_in": _conv(sd, "encoder.conv_in")}
    for level in range(len(ch_mult)):
        for i in range(num_res_blocks):
            enc[f"down_{level}_{i}"] = _vae_res(sd, f"encoder.down.{level}.block.{i}")
        if level != len(ch_mult) - 1:
            enc[f"down_{level}_ds"] = _conv(sd, f"encoder.down.{level}.downsample.conv")
    enc["mid_res1"] = _vae_res(sd, "encoder.mid.block_1")
    enc["mid_attn"] = _vae_attn(sd, "encoder.mid.attn_1")
    enc["mid_res2"] = _vae_res(sd, "encoder.mid.block_2")
    enc["norm_out"] = _gn(sd, "encoder.norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid_res1"] = _vae_res(sd, "decoder.mid.block_1")
    dec["mid_attn"] = _vae_attn(sd, "decoder.mid.attn_1")
    dec["mid_res2"] = _vae_res(sd, "decoder.mid.block_2")
    n_levels = len(ch_mult)
    for level in range(n_levels):
        # ldm decoder up list is indexed by level directly (up.3 = coarsest)
        for i in range(num_res_blocks + 1):
            dec[f"up_{level}_{i}"] = _vae_res(sd, f"decoder.up.{level}.block.{i}")
        if level != 0:
            dec[f"up_{level}_us"] = _conv(sd, f"decoder.up.{level}.upsample.conv")
    dec["norm_out"] = _gn(sd, "decoder.norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_state_dict(sd: Dict[str, Any], modules) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Numpy state dict (Stable-Zero123 LDM layout) -> (flax params, report).

    ``report`` maps key names to their fate: ``consumed`` (converted),
    ``skipped`` (EXPECTED_SKIP — schedule buffers / EMA / text tower),
    ``unmapped`` (present in the checkpoint but converted by nothing — a
    layout mismatch the caller should surface, not swallow)."""
    cfg = modules.cfg

    unet_sd = _TrackedDict({k[len("model.diffusion_model."):]: v
                            for k, v in sd.items()
                            if k.startswith("model.diffusion_model.")})
    vae_sd = _TrackedDict({k[len("first_stage_model."):]: v for k, v in sd.items()
                           if k.startswith("first_stage_model.")})

    params: Dict[str, Any] = {
        "unet": convert_unet(unet_sd, channel_mult=tuple(cfg.channel_mult),
                             num_res_blocks=cfg.num_res_blocks),
        "vae": convert_vae(vae_sd, ch_mult=tuple(cfg.vae_ch_mult),
                           num_res_blocks=cfg.vae_num_res_blocks),
        "cc_projection": {
            "kernel": _t(sd["cc_projection.weight"]).T,
            "bias": _t(sd["cc_projection.bias"]),
        },
    }
    consumed = {f"model.diffusion_model.{k}" for k in unet_sd.consumed}
    consumed |= {f"first_stage_model.{k}" for k in vae_sd.consumed}
    consumed |= {"cc_projection.weight", "cc_projection.bias"}

    clip_prefix = "cond_stage_model.model."
    clip_sd = _TrackedDict({k[len(clip_prefix):]: v for k, v in sd.items()
                            if k.startswith(clip_prefix)})
    if any(k.startswith("visual.") for k in clip_sd) and modules.clip is not None:
        params["clip"] = convert_clip_vision(clip_sd, modules)
        consumed |= {f"{clip_prefix}{k}" for k in clip_sd.consumed}
    elif modules.clip is None:
        # test/stub configs (use_clip=False): deterministic mean-color
        # projector so prepare_embeddings stays runnable
        rng = np.random.default_rng(0)
        params["clip_proj"] = rng.normal(0, 0.02, (3, cfg.context_dim)).astype(np.float32)

    skipped, unmapped = [], []
    skip_re = [re.compile(p) for p in EXPECTED_SKIP]
    for k in sd:
        if k in consumed:
            continue
        (skipped if any(r.search(k) for r in skip_re) else unmapped).append(k)
    report = {"consumed": sorted(consumed), "skipped": sorted(skipped),
              "unmapped": sorted(unmapped)}
    return params, report


def load_zero123_checkpoint(path: str, modules, strict: bool = False) -> Dict[str, Any]:
    """Load a torch Stable-Zero123 ``.ckpt`` and convert every component the
    guidance needs (UNet, VAE, cc_projection, CLIP vision tower).

    Architecture dims (channel_mult, res blocks) come from ``modules.cfg`` so
    tiny test checkpoints convert the same way as the shipped 320-ch model.
    ``strict=True`` raises with the full key list if any non-schedule weight
    would be dropped (the onboarding CLI uses this).

    ``path`` may also be a cache directory written by
    scripts/convert_zero123_ckpt.py — restored via orbax, no torch import."""
    import os

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "manifest.json")):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(os.path.join(path, "params")))
        return restored

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, report = convert_state_dict(sd, modules)
    if strict and report["unmapped"]:
        raise KeyError(
            "Checkpoint keys not mapped by the converter (layout mismatch?):\n  "
            + "\n  ".join(report["unmapped"]))
    return params


# ---------------------------------------------------------------------------
# Stable Diffusion (text-conditioned LDM) layout
# ---------------------------------------------------------------------------

# SD 1.x checkpoints carry the CLIP text tower under
# cond_stage_model.transformer.text_model.* (FrozenCLIPEmbedder wraps a
# transformers CLIPTextModel); position_ids is a buffer, not a weight.
SD_EXPECTED_SKIP = [
    r"^betas$", r"^alphas_cumprod", r"^sqrt_", r"^log_one_minus_",
    r"^posterior_", r"^logvar$", r"^model_ema\.",
    r"\.position_ids$",
    r"^cond_stage_model\.transformer\.text_model\.embeddings\.position_ids$",
    r"^first_stage_model\.loss\.",
]


def convert_clip_text(sd: Dict[str, Any]) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict (``text_model.*`` keys) ->
    FlaxCLIPTextModel param tree.  Same per-layer shapes as the vision tower
    but with separate q/k/v projections already (no fused in_proj) and
    token + position embedding tables."""
    t = _TrackedDict({k[len("text_model."):]: v for k, v in sd.items()
                      if k.startswith("text_model.")})
    if not t:
        raise KeyError("No text_model.* keys in CLIP text state dict")
    layers = {}
    i = 0
    while f"encoder.layers.{i}.layer_norm1.weight" in t:
        p = f"encoder.layers.{i}"
        layers[str(i)] = {
            "layer_norm1": _norm(t, f"{p}.layer_norm1"),
            "self_attn": {
                "q_proj": _dense(t, f"{p}.self_attn.q_proj"),
                "k_proj": _dense(t, f"{p}.self_attn.k_proj"),
                "v_proj": _dense(t, f"{p}.self_attn.v_proj"),
                "out_proj": _dense(t, f"{p}.self_attn.out_proj"),
            },
            "layer_norm2": _norm(t, f"{p}.layer_norm2"),
            "mlp": {
                "fc1": _dense(t, f"{p}.mlp.fc1"),
                "fc2": _dense(t, f"{p}.mlp.fc2"),
            },
        }
        i += 1
    params = {
        "text_model": {
            "embeddings": {
                "token_embedding": {"embedding": _t(t["embeddings.token_embedding.weight"])},
                "position_embedding": {"embedding": _t(t["embeddings.position_embedding.weight"])},
            },
            "encoder": {"layers": layers},
            "final_layer_norm": _norm(t, "final_layer_norm"),
        }
    }
    if isinstance(sd, _TrackedDict):
        sd.consumed |= {f"text_model.{k}" for k in t.consumed}
    return params


def convert_sd_state_dict(sd: Dict[str, Any], guidance) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Numpy state dict (Stable Diffusion 1.x LDM layout) -> (flax params,
    report).  Same UNet/VAE family as Zero123 (in_channels=4, text
    cross-attention; reference stable_diffusion_guidance.py:59-95 loads the
    same weights via diffusers from_pretrained) plus the CLIP text tower.
    ``guidance`` is a StableDiffusionGuidance (architecture dims from its
    cfg)."""
    cfg = guidance.cfg

    unet_sd = _TrackedDict({k[len("model.diffusion_model."):]: v
                            for k, v in sd.items()
                            if k.startswith("model.diffusion_model.")})
    vae_sd = _TrackedDict({k[len("first_stage_model."):]: v for k, v in sd.items()
                           if k.startswith("first_stage_model.")})

    params: Dict[str, Any] = {
        "unet": convert_unet(unet_sd, channel_mult=tuple(cfg.channel_mult),
                             num_res_blocks=cfg.num_res_blocks),
        "vae": convert_vae(vae_sd, ch_mult=tuple(getattr(cfg, "vae_ch_mult", (1, 2, 4, 4))),
                           num_res_blocks=int(getattr(cfg, "vae_num_res_blocks", 2))),
    }
    consumed = {f"model.diffusion_model.{k}" for k in unet_sd.consumed}
    consumed |= {f"first_stage_model.{k}" for k in vae_sd.consumed}

    text_prefix = "cond_stage_model.transformer."
    text_sd = _TrackedDict({k[len(text_prefix):]: v for k, v in sd.items()
                            if k.startswith(text_prefix)})
    if any(k.startswith("text_model.") for k in text_sd):
        params["text"] = convert_clip_text(text_sd)
        consumed |= {f"{text_prefix}{k}" for k in text_sd.consumed}

    skipped, unmapped = [], []
    skip_re = [re.compile(p) for p in SD_EXPECTED_SKIP]
    for k in sd:
        if k in consumed:
            continue
        (skipped if any(r.search(k) for r in skip_re) else unmapped).append(k)
    report = {"consumed": sorted(consumed), "skipped": sorted(skipped),
              "unmapped": sorted(unmapped)}
    return params, report


def load_sd_checkpoint(path: str, guidance, strict: bool = False) -> Dict[str, Any]:
    """Load a torch Stable Diffusion 1.x ``.ckpt`` (LDM layout) and convert
    UNet + VAE + CLIP text tower; or restore a converted orbax cache directory
    written by scripts/convert_sd_ckpt.py (zero torch imports)."""
    import os

    if os.path.isdir(path) and os.path.exists(os.path.join(path, "manifest.json")):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(os.path.abspath(os.path.join(path, "params")))

    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, report = convert_sd_state_dict(sd, guidance)
    if strict and report["unmapped"]:
        raise KeyError(
            "Checkpoint keys not mapped by the SD converter (layout mismatch?):\n  "
            + "\n  ".join(report["unmapped"]))
    return params


def convert_clip_vision(sd: Dict[str, Any], modules) -> Dict[str, Any]:
    """OpenAI-CLIP visual tower -> transformers FlaxCLIPVisionModel params.

    Handles the ``visual.*`` layout (ViT-L/14): class/pos embeddings, 24
    transformer blocks with in_proj qkv fused, final layernorm + projection."""
    v = _TrackedDict({k[len("visual."):]: val for k, val in sd.items()
                      if k.startswith("visual.")})
    if not v:
        raise KeyError("No visual.* keys in CLIP state dict")
    width = _t(v["conv1.weight"]).shape[0]
    layers = {}
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in v:
        p = f"transformer.resblocks.{i}"
        qkv_w = _t(v[f"{p}.attn.in_proj_weight"])  # (3w, w)
        qkv_b = _t(v[f"{p}.attn.in_proj_bias"])
        qw, kw, vw = np.split(qkv_w, 3, 0)
        qb, kb, vb = np.split(qkv_b, 3, 0)
        layers[str(i)] = {
            "layer_norm1": {"scale": _t(v[f"{p}.ln_1.weight"]), "bias": _t(v[f"{p}.ln_1.bias"])},
            "self_attn": {
                "q_proj": {"kernel": qw.T, "bias": qb},
                "k_proj": {"kernel": kw.T, "bias": kb},
                "v_proj": {"kernel": vw.T, "bias": vb},
                "out_proj": {"kernel": _t(v[f"{p}.attn.out_proj.weight"]).T,
                             "bias": _t(v[f"{p}.attn.out_proj.bias"])},
            },
            "layer_norm2": {"scale": _t(v[f"{p}.ln_2.weight"]), "bias": _t(v[f"{p}.ln_2.bias"])},
            "mlp": {
                "fc1": {"kernel": _t(v[f"{p}.mlp.c_fc.weight"]).T, "bias": _t(v[f"{p}.mlp.c_fc.bias"])},
                "fc2": {"kernel": _t(v[f"{p}.mlp.c_proj.weight"]).T, "bias": _t(v[f"{p}.mlp.c_proj.bias"])},
            },
        }
        i += 1

    vision = {
        "vision_model": {
            "embeddings": {
                "class_embedding": _t(v["class_embedding"]),
                "patch_embedding": {"kernel": _t(v["conv1.weight"]).transpose(2, 3, 1, 0)},
                "position_embedding": {"embedding": _t(v["positional_embedding"])},
            },
            "pre_layrnorm": {"scale": _t(v["ln_pre.weight"]), "bias": _t(v["ln_pre.bias"])},
            "encoder": {"layers": layers},
            "post_layernorm": {"scale": _t(v["ln_post.weight"]), "bias": _t(v["ln_post.bias"])},
        }
    }
    out = {"vision": vision, "projection": _t(v["proj"])}
    if isinstance(sd, _TrackedDict):
        sd.consumed |= {f"visual.{k}" for k in v.consumed}
    return out
