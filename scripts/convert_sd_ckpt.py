"""Onboarding CLI: torch Stable Diffusion 1.x ``.ckpt`` -> converted orbax cache.

SD companion to scripts/convert_zero123_ckpt.py (the reference loads SD
weights via diffusers from_pretrained at every startup,
threestudio/models/guidance/stable_diffusion_guidance.py:59-95; here
conversion is a one-time host-CPU step):

    python scripts/convert_sd_ckpt.py sd-v1-5.ckpt --out sd_cache \
        [--config configs/zoo/dreamfusion-sd.yaml] [dotlist overrides...]

writes ``<out>/params`` (orbax: unet + vae + CLIP text tower) +
``<out>/manifest.json`` (architecture dims + key-fate report).  Point
``system.guidance.pretrained_model_name_or_path`` at the cache directory and
``load_sd_checkpoint`` restores it without importing torch.

Fails loudly (listing the keys) if the checkpoint carries weights the
converter does not map — a silent drop is how conversion bugs ship.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("ckpt", help="torch .ckpt in the SD 1.x LDM layout")
    ap.add_argument("--out", required=True, help="output cache directory")
    ap.add_argument("--config", default=None,
                    help="stage YAML whose system.guidance block sets the "
                         "architecture dims (default: shipped SD 1.x dims)")
    ap.add_argument("--allow-unmapped", action="store_true",
                    help="warn instead of erroring on unmapped keys")
    ap.add_argument("overrides", nargs="*", help="dotlist overrides, e.g. "
                    "system.guidance.model_channels=32")
    args = ap.parse_args(argv)

    from dreammesh4d_tpu.models.guidance.stable_diffusion import (
        StableDiffusionConfig,
        StableDiffusionGuidance,
    )
    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_sd_state_dict
    from dreammesh4d_tpu.systems.assembly import _filtered_dataclass

    gcfg: dict = {}
    if args.config:
        from dreammesh4d_tpu.config import load_config

        cfg = load_config(args.config, cli_args=list(args.overrides))
        gcfg = dict(cfg["system"].get("guidance", {}))
    else:
        for ov in args.overrides:
            k, _, v = ov.partition("=")
            k = k.removeprefix("system.guidance.")
            try:
                v = json.loads(v)
            except json.JSONDecodeError:
                pass
            gcfg[k] = v
    guidance = StableDiffusionGuidance(_filtered_dataclass(StableDiffusionConfig, gcfg))

    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, report = convert_sd_state_dict(sd, guidance)

    if report["unmapped"]:
        msg = ("Checkpoint keys not mapped by the converter "
               f"({len(report['unmapped'])}):\n  " + "\n  ".join(report["unmapped"]))
        if not args.allow_unmapped:
            raise KeyError(msg + "\n(pass --allow-unmapped to proceed anyway)")
        print("WARNING:", msg, file=sys.stderr)

    import orbax.checkpoint as ocp

    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(out, "params"), params, force=True)
    ckptr.wait_until_finished()
    import dataclasses

    manifest = {
        "layout": "sd-ldm",
        "source": os.path.abspath(args.ckpt),
        "guidance_config": {k: v for k, v in dataclasses.asdict(guidance.cfg).items()
                            if isinstance(v, (int, float, str, bool, list, tuple))},
        "report": {k: len(v) for k, v in report.items()},
        "unmapped": report["unmapped"],
        "has_text_tower": "text" in params,
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"converted {args.ckpt} -> {out} "
          f"({manifest['report']['consumed']} keys consumed, "
          f"{manifest['report']['skipped']} skipped, "
          f"{manifest['report']['unmapped']} unmapped)")
    return out


if __name__ == "__main__":
    main()
