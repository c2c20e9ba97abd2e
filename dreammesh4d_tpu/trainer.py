"""Training loop (Lightning-Trainer replacement).

The reference delegates the run loop to PyTorch Lightning
(launch.py:228-259).  Here the loop is a plain host loop around jitted train
steps: metrics logging (CSV + stdout), periodic validation, orbax
checkpointing, resume, and the ``C()``-schedule step bookkeeping
(``true_global_step`` semantics, threestudio/systems/base.py:64-99).

An *experiment* object provides the stage-specific callbacks:

    experiment.state                      # current train-state pytree
    experiment.train_step(step) -> metrics (dict of scalars)
    experiment.validate(step)             # render + save artifacts
    experiment.export()                   # predict/export path
    experiment.state_for_checkpoint() / load_state(state)
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass
from typing import Any, Optional

import numpy as np

import dreammesh4d_tpu as ds

from .utils.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint, step_from_path


@dataclass
class TrainerConfig:
    max_steps: int = 2000
    log_every_n_steps: int = 10
    val_check_interval: int = 200
    checkpoint_every: int = 2000
    precision: int = 32  # accepted for config parity; dtype set per-module
    # profiling (SURVEY §5: designed-in replacement for the reference's
    # commented-out timing probes): capture a jax.profiler trace over
    # [profile_start_step, profile_start_step + profile_steps)
    profile_start_step: int = -1
    profile_steps: int = 5
    # logger backends (reference: lightning TensorBoardLogger/WandbLogger,
    # launch.py:150-170); unavailable backends degrade to warn + no-op
    loggers: tuple = ("csv",)


class Trainer:
    def __init__(self, cfg: TrainerConfig, trial_dir: str):
        self.cfg = cfg
        self.trial_dir = trial_dir
        self.ckpt_dir = os.path.join(trial_dir, "ckpts")
        os.makedirs(trial_dir, exist_ok=True)
        from .utils.loggers import LoggerCollection, build_loggers

        self.logger = LoggerCollection(build_loggers(cfg.loggers, trial_dir))

    def _log(self, step: int, metrics: dict):
        self.logger.log_metrics(metrics, step)

    def fit(self, experiment, resume: Optional[str] = None) -> None:
        start_step = 0
        if resume:
            path = resume if resume != "LAST" else latest_checkpoint(self.ckpt_dir)
            if path:
                experiment.load_state(restore_checkpoint(path, experiment.state_for_checkpoint()))
                start_step = step_from_path(path)
                ds.info("Resumed from %s (step %d)", path, start_step)

        t0 = time.time()
        window = t0
        for step in range(start_step, self.cfg.max_steps):
            if step == self.cfg.profile_start_step:
                import jax

                jax.profiler.start_trace(os.path.join(self.trial_dir, "profile"))
            metrics = experiment.train_step(step)
            if (self.cfg.profile_start_step >= 0
                    and step == self.cfg.profile_start_step + self.cfg.profile_steps):
                import jax

                jax.profiler.stop_trace()
                ds.info("Profiler trace saved to %s/profile", self.trial_dir)
            if step % self.cfg.log_every_n_steps == 0 or step == self.cfg.max_steps - 1:
                self._log(step, metrics)
                dt = time.time() - window
                window = time.time()
                loss = float(metrics.get("loss_total", 0.0))
                print(
                    f"[step {step}/{self.cfg.max_steps}] loss={loss:.4f} "
                    f"({dt / max(self.cfg.log_every_n_steps, 1):.3f}s/it)",
                    flush=True,
                )
                # progress file for UI polling (reference ProgressCallback,
                # threestudio/utils/callbacks.py:122-156)
                with open(os.path.join(self.trial_dir, "progress"), "w") as pf:
                    pf.write(f"{step}/{self.cfg.max_steps} loss={loss:.4f}")
            if self.cfg.val_check_interval > 0 and (step + 1) % self.cfg.val_check_interval == 0:
                experiment.validate(step + 1)
            if (step + 1) % self.cfg.checkpoint_every == 0 or step == self.cfg.max_steps - 1:
                save_checkpoint(self.ckpt_dir, step + 1, experiment.state_for_checkpoint())
        total = time.time() - t0
        self.logger.finalize()
        with open(os.path.join(self.trial_dir, "train_summary.json"), "w") as f:
            json.dump({"steps": self.cfg.max_steps, "wall_s": total}, f)
        print(f"Training finished in {total:.1f}s", flush=True)

    def validate(self, experiment) -> None:
        experiment.validate(step_hint := getattr(experiment, "global_step", 0))

    def test(self, experiment) -> None:
        experiment.validate(self.cfg.max_steps, test=True)

    def predict(self, experiment) -> None:
        experiment.export()
