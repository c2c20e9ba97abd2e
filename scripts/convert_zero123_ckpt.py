"""Onboarding CLI: torch Stable-Zero123 ``.ckpt`` -> converted orbax cache.

The reference pipeline points ``system.guidance.pretrained_model_name_or_path``
at a torch checkpoint and converts at every startup (stable_zero123_guidance
loads the LDM from config+ckpt).  Here conversion is a one-time host-CPU step:

    python scripts/convert_zero123_ckpt.py stable_zero123.ckpt --out ckpt_cache \
        [--config configs/sugar_dynamic_dg.yaml] [dotlist overrides...]

writes ``<out>/params`` (orbax) + ``<out>/manifest.json`` (architecture dims +
key-fate report).  Training then runs with ZERO code changes: point
``pretrained_model_name_or_path`` at the cache directory and
``load_zero123_checkpoint`` restores it without importing torch at all.

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
    ap.add_argument("ckpt", help="torch .ckpt in the Stable-Zero123 LDM layout")
    ap.add_argument("--out", required=True, help="output cache directory")
    ap.add_argument("--config", default=None,
                    help="stage YAML whose system.guidance block sets the "
                         "architecture dims (default: shipped Zero123 dims)")
    ap.add_argument("--allow-unmapped", action="store_true",
                    help="warn instead of erroring on unmapped keys")
    ap.add_argument("overrides", nargs="*", help="dotlist overrides, e.g. "
                    "system.guidance.use_clip=false")
    args = ap.parse_args(argv)

    from dreammesh4d_tpu.models.guidance.zero123 import Zero123Config, Zero123Modules
    from dreammesh4d_tpu.models.guidance.zero123.convert import convert_state_dict
    from dreammesh4d_tpu.systems.assembly import _filtered_dataclass

    gcfg: dict = {}
    if args.config:
        from dreammesh4d_tpu.config import load_config

        cfg = load_config(args.config, cli_args=list(args.overrides))
        gcfg = dict(cfg["system"].get("guidance", {}))
    else:
        # dotlist-only mode: accept system.guidance.* overrides directly
        for ov in args.overrides:
            k, _, v = ov.partition("=")
            k = k.removeprefix("system.guidance.")
            try:
                v = json.loads(v)
            except json.JSONDecodeError:
                pass
            gcfg[k] = v
    zcfg = _filtered_dataclass(Zero123Config, gcfg)
    modules = Zero123Modules(zcfg)

    import torch

    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params, report = convert_state_dict(sd, modules)

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

    arch = {f.name: getattr(zcfg, f.name) for f in dataclasses.fields(zcfg)
            if f.name != "dtype" and not f.name.startswith("pretrained")}
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump({"source": os.path.abspath(args.ckpt), "arch": arch,
                   "components": sorted(params),
                   "n_consumed": len(report["consumed"]),
                   "skipped": report["skipped"],
                   "unmapped": report["unmapped"]}, f, indent=2)
    print(f"converted {len(report['consumed'])} keys -> {out}")
    print(f"components: {sorted(params)}; skipped {len(report['skipped'])} "
          f"schedule/EMA/text keys; unmapped: {len(report['unmapped'])}")
    return out


if __name__ == "__main__":
    main()
