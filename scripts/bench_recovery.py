"""Recovery benchmark at full scale (TPU or any accelerator): the offline
proxy for the LPIPS/CLIP-parity north star (BASELINE.json).

Same recipe as tests/test_recovery_benchmark.py (procedurally animated
vertex-colored mesh -> GT video via the repo's mesh rasterizer -> REAL
static-refine + dynamic stages through launch.py -> held-out (view, time)
PSNRs vs ground truth) at 128²/16 frames with full step budgets.  Writes
RECOVERY.json beside the repo's BENCH artifacts.

Usage: python scripts/bench_recovery.py [--cpu] [H] [static_steps] [dyn_steps]
"""

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    if "--cpu" in sys.argv:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    H = int(args[0]) if args else 128
    static_steps = int(args[1]) if len(args) > 1 else 1500
    dyn_steps = int(args[2]) if len(args) > 2 else 1000

    import pathlib

    from test_recovery_benchmark import run_recovery

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="recovery_"))
    res = run_recovery(tmp, H=H, W=H, static_steps=static_steps,
                       dynamic_steps=dyn_steps,
                       platform="cpu" if "--cpu" in sys.argv else "auto")
    res = {k: (v if isinstance(v, bool) else round(float(v), 3))
           for k, v in res.items()}
    res.update({"resolution": H, "static_steps": static_steps,
                "dynamic_steps": dyn_steps,
                "feature_provenance": "converted weights" if res.get(
                    "lpips_converted") else
                "deterministic-random features (zero-egress image has no "
                "checkpoints on disk): LPIPS/CLIP valid for RELATIVE margins "
                "only, not comparable to published numbers"})
    print(json.dumps(res))
    # same asserts as the slow-tier test — the committed artifact is gated
    from test_recovery_benchmark import assert_recovery_gate

    assert_recovery_gate(res, tier="full" if H >= 128 else "cpu")
    with open(os.path.join(REPO, "RECOVERY.json"), "w") as f:
        json.dump(res, f, indent=2)


if __name__ == "__main__":
    main()
