"""Onboarding CLI: torchvision VGG16 (+ LPIPS lin heads) -> orbax cache.

LPIPS companion to scripts/convert_zero123_ckpt.py.  The reference downloads
``vgg_lpips`` + torchvision VGG16 at first use
(threestudio/utils/perceptual/perceptual.py:41-56 — get_ckpt_path fetches
from heibox); this image has zero egress, so conversion is an explicit
one-time host step from user-provided torch files:

    python scripts/convert_perceptual_ckpt.py vgg16_features.pth \
        [--lpips vgg_lpips.pth] --out lpips_cache

``vgg16_features.pth`` is ``torchvision.models.vgg16(pretrained=True)
.features.state_dict()`` (or the full-model state dict — the ``features.``
prefix is stripped); ``--lpips`` is the richzhang ``vgg.pth`` lin-head state
dict the reference downloads.  The cache restores torch-free via
``utils.perceptual.load_perceptual`` and plugs into
``utils.metrics.LPIPSMetric(weights_path=...)``.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("vgg", help="torch .pth: torchvision vgg16 features state dict")
    ap.add_argument("--lpips", default=None,
                    help="optional torch .pth with LPIPS lin{k}.model.1.weight heads")
    ap.add_argument("--out", required=True, help="output cache directory")
    args = ap.parse_args(argv)

    import torch

    def _load(path):
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.get("state_dict", obj) if isinstance(obj, dict) else obj.state_dict()
        return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}

    from dreammesh4d_tpu.utils.perceptual import load_torch_weights, save_perceptual

    vgg_sd = _load(args.vgg)
    lpips_sd = _load(args.lpips) if args.lpips else None
    params = load_torch_weights(vgg_sd, lpips_sd)

    out = os.path.abspath(args.out)
    save_perceptual(out, params)
    manifest = {
        "layout": "vgg16-lpips",
        "source_vgg": os.path.abspath(args.vgg),
        "source_lpips": os.path.abspath(args.lpips) if args.lpips else None,
        "has_lpips_lins": lpips_sd is not None,
        "stage_widths": [int(c[-1]["b"].shape[0]) for c in params["stages"]],
    }
    with open(os.path.join(out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"converted {args.vgg} -> {out} "
          f"(lpips lins: {manifest['has_lpips_lins']})")
    return out


if __name__ == "__main__":
    main()
