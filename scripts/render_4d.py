"""Render a trained dynamic trial from the command line (serving surface).

Examples:
  # azimuth orbit at a fixed time
  python scripts/render_4d.py --trial outputs/sugar-dynamic/mytag \
      --mode orbit --t 0.0 --n 60 --out orbit.gif
  # fixed view, sweep the trained video's timeline
  python scripts/render_4d.py --trial outputs/sugar-dynamic/mytag \
      --mode play --azimuth 30 --out play.gif
  # single frame
  python scripts/render_4d.py --trial outputs/sugar-dynamic/mytag \
      --mode frame --azimuth 45 --elevation 10 --t 0.5 --out frame.png
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trial", required=True, help="trial dir (contains configs/parsed.yaml, ckpts/)")
    p.add_argument("--mode", choices=["frame", "orbit", "play"], default="orbit")
    p.add_argument("--checkpoint", default="LAST")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--elevation", type=float, default=15.0)
    p.add_argument("--azimuth", type=float, default=0.0)
    p.add_argument("--distance", type=float, default=2.2)
    p.add_argument("--t", type=float, default=0.0, help="normalized time in [0,1]")
    p.add_argument("--n", type=int, default=30, help="orbit views / play frames")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--out", default="render.gif")
    p.add_argument("--platform", default=None, help="force a JAX platform (e.g. cpu)")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import imageio.v2 as imageio
    import numpy as np

    from dreammesh4d_tpu.serving import Viewer4D

    viewer = Viewer4D.from_trial(args.trial, checkpoint=args.checkpoint,
                                 height=args.height, width=args.width)
    if args.mode == "frame":
        img = viewer.render(args.elevation, args.azimuth, args.distance, args.t)
        imageio.imwrite(args.out, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    else:
        if args.mode == "orbit":
            frames = viewer.orbit(args.n, args.elevation, args.distance, args.t)
        else:
            frames = viewer.play(args.elevation, args.azimuth, args.distance, args.n)
        frames_u8 = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
        imageio.mimwrite(args.out, frames_u8, duration=1.0 / args.fps, loop=0)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
