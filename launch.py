"""threestudio-compatible launcher for the TPU-native framework.

Command surface parity with the reference (launch.py:104-294):

    python launch.py --config configs/stable-zero123.yaml --train \
        data.image_path=./load/images/demo_rgba.png
    python launch.py --config configs/sugar_static_refine.yaml --train \
        system.geometry.surface_mesh_to_bind_path=<coarse mesh> ...
    python launch.py --config configs/sugar_dynamic_dg.yaml --train \
        data.video_frames_dir=<frames> system.weights=<static ckpt> ...
    python launch.py --export --config ... resume=<ckpt>

``--gpu`` is accepted and ignored (device selection is JAX's); dotlist
overrides work exactly like OmegaConf's.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def load_custom_modules(custom_dir: str = "custom") -> None:
    """Import every package under custom/ for @register side effects
    (parity with reference launch.py:70-101)."""
    if not os.path.isdir(custom_dir):
        return
    sys.path.insert(0, custom_dir)
    import importlib

    for name in os.listdir(custom_dir):
        pkg = os.path.join(custom_dir, name)
        if os.path.isdir(pkg) and os.path.exists(os.path.join(pkg, "__init__.py")):
            try:
                importlib.import_module(name.replace("-", "_"))
                print(f"[INFO] imported custom module {name}")
            except Exception as e:  # noqa: BLE001
                print(f"[WARN] failed to import custom module {name}: {e}")


def main(args, extras) -> None:
    logging.basicConfig(level=logging.INFO)

    # honor an explicit platform request before any jax use (the session
    # sitecustomize registers the axon TPU backend at interpreter start and
    # the env alone does not always win)
    if args.platform != "auto":
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    # persistent XLA compilation cache: the flagship steps (859M-UNet SDS +
    # Pallas rasterizer) take minutes to compile; identical-shape runs —
    # stage restarts, resume, the 3-stage pipeline rerun — then restore in
    # seconds.  Opt out with JAX_CACHE_DIR="" (the CUDA reference has no
    # compile step to amortize; this is the TPU-native equivalent).
    cache_dir = os.environ.get(
        "JAX_CACHE_DIR", os.path.expanduser("~/.cache/dreammesh4d_tpu_xla"))
    if cache_dir:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

    if args.typecheck:
        # runtime jaxtyping shape enforcement on annotated ops (reference
        # --typecheck semantics, launch.py:130-133)
        from dreammesh4d_tpu.utils.typing import enable_typecheck

        enable_typecheck(True)

    import dreammesh4d_tpu as ds
    from dreammesh4d_tpu.config import load_config
    from dreammesh4d_tpu.systems.assembly import build_experiment
    from dreammesh4d_tpu.trainer import Trainer, TrainerConfig

    load_custom_modules()
    ds._import_builtin_modules()

    cfg = load_config(args.config, cli_args=extras)

    import numpy as np

    np.random.seed(cfg.seed)

    # snapshot config + command line (reference callbacks.py:60-111, launch.py:221-226)
    from dreammesh4d_tpu.config import dump_config

    os.makedirs(os.path.join(cfg.trial_dir, "configs"), exist_ok=True)
    dump_config(os.path.join(cfg.trial_dir, "configs", "parsed.yaml"), cfg)
    with open(os.path.join(cfg.trial_dir, "cmd.txt"), "w") as f:
        f.write(" ".join(sys.argv) + "\n")
    # code snapshot (reference CodeSnapshotCallback, callbacks.py:60-89)
    try:
        import subprocess

        rev = subprocess.run(["git", "rev-parse", "HEAD"], capture_output=True,
                             text=True, timeout=10)
        diff = subprocess.run(["git", "diff", "HEAD"], capture_output=True,
                              text=True, timeout=30)
        with open(os.path.join(cfg.trial_dir, "code_snapshot.txt"), "w") as f:
            f.write(f"commit: {rev.stdout.strip()}\n\n{diff.stdout}")
    except Exception:  # noqa: BLE001
        pass

    experiment = build_experiment(cfg)

    tcfg_d = dict(cfg.trainer or {})
    tcfg = TrainerConfig(
        max_steps=int(tcfg_d.get("max_steps", 2000)),
        log_every_n_steps=int(tcfg_d.get("log_every_n_steps", 10)),
        val_check_interval=int(tcfg_d.get("val_check_interval", 200)),
        checkpoint_every=int(dict(cfg.checkpoint or {}).get("every_n_train_steps",
                                                            tcfg_d.get("max_steps", 2000))),
        loggers=tuple(tcfg_d.get("loggers", ("csv",))),
        profile_start_step=int(tcfg_d.get("profile_start_step", -1)),
        profile_steps=int(tcfg_d.get("profile_steps", 5)),
    )
    trainer = Trainer(tcfg, cfg.trial_dir)

    if args.train:
        trainer.fit(experiment, resume=cfg.resume)
        trainer.test(experiment)
    elif args.validate:
        _maybe_resume(experiment, cfg)
        trainer.validate(experiment)
    elif args.test:
        _maybe_resume(experiment, cfg)
        trainer.test(experiment)
    elif args.export:
        _maybe_resume(experiment, cfg)
        trainer.predict(experiment)
    else:
        raise ValueError("Specify one of --train / --validate / --test / --export")


def _maybe_resume(experiment, cfg) -> None:
    if cfg.resume:
        from dreammesh4d_tpu.utils.checkpoint import (
            find_last_path,
            latest_checkpoint,
            restore_checkpoint,
        )

        resume = str(cfg.resume)
        if resume == "LAST":
            path = latest_checkpoint(os.path.join(cfg.trial_dir, "ckpts"))
            if path is None:
                raise FileNotFoundError(f"No checkpoints in {cfg.trial_dir}/ckpts")
        else:
            path = find_last_path(resume)
        experiment.load_state(restore_checkpoint(path, experiment.state_for_checkpoint()))
        print(f"[INFO] restored {path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True, help="path to config file")
    parser.add_argument("--gpu", default="0", help="accepted for compatibility; unused on TPU")
    group = parser.add_mutually_exclusive_group(required=True)
    group.add_argument("--train", action="store_true")
    group.add_argument("--validate", action="store_true")
    group.add_argument("--test", action="store_true")
    group.add_argument("--export", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--typecheck", action="store_true",
                        help="enable runtime jaxtyping shape checking")
    parser.add_argument("--platform", default="auto", choices=["auto", "cpu", "tpu", "axon"],
                        help="force a JAX platform (auto = environment default)")
    args, extras = parser.parse_known_args()
    main(args, extras)
