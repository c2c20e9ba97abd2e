"""Launch-surface multi-device context.

The reference reaches multi-GPU by constructing its Lightning Trainer with
``devices=-1`` and letting DDP wrap the system (reference launch.py:228-235).
The TPU-native equivalent is a dp×tp ``jax.sharding.Mesh`` owned by the
experiment: view/frame batches shard over the ``data`` axis, the Zero123
UNet's weights over the ``model`` axis (Megatron-style specs,
:mod:`.sharding_rules`), scene parameters replicate, and XLA inserts the ICI
collectives for the gradient combine — no DDP object, no NCCL.

YAML surface::

    trainer:
      devices: 8        # -1 / "auto" = all visible devices; 1 = off (default)
      mesh: [2, 4]      # optional [data, model] shape; default [devices, 1]

Every experiment in :mod:`..systems.assembly` builds one of these from
``cfg.trainer`` and routes its state/batch/guidance placement through it;
``__graft_entry__.dryrun_multichip`` drives the same code path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax
from jax.sharding import Mesh

from .mesh import make_mesh, replicate_pytree, shard_batch
from .sharding_rules import shard_guidance_params


@dataclass
class ParallelContext:
    """No-op when ``mesh`` is None (single device, the default)."""

    mesh: Optional[Mesh] = None

    @property
    def active(self) -> bool:
        return self.mesh is not None

    @property
    def dp(self) -> int:
        return self.mesh.shape["data"] if self.mesh is not None else 1

    @property
    def tp(self) -> int:
        return self.mesh.shape["model"] if self.mesh is not None else 1

    @classmethod
    def from_trainer_cfg(cls, trainer_cfg: Optional[dict]) -> "ParallelContext":
        tcfg = dict(trainer_cfg or {})
        devices = tcfg.get("devices", 1)
        if devices in ("auto", "-1", -1):
            n = len(jax.devices())
        else:
            n = int(devices)
        if n <= 1:
            return cls(None)
        avail = len(jax.devices())
        if n > avail:
            raise ValueError(
                f"trainer.devices={n} but only {avail} JAX devices are visible")
        shape = tcfg.get("mesh")
        if shape is not None:
            dp, tp = int(shape[0]), int(shape[1])
            if dp * tp != n:
                raise ValueError(
                    f"trainer.mesh={list(shape)} does not factor "
                    f"trainer.devices={n} (need data*model == devices)")
        else:
            dp, tp = n, 1
        return cls(make_mesh(n, ("data", "model"), shape=(dp, tp)))

    # -- placement -----------------------------------------------------------

    def replicate(self, tree: Any) -> Any:
        if self.mesh is None:
            return tree
        return replicate_pytree(tree, self.mesh)

    def shard_batch(self, batch: Any) -> Any:
        """Leading (view/frame) dims over ``data``; scalars replicated."""
        if self.mesh is None:
            return batch
        return shard_batch(batch, self.mesh)

    def shard_guidance(self, gstate: Any) -> Any:
        """(guidance params, embedding bank): UNet/VAE weights get the
        Megatron column/row specs over ``model``; the bank replicates (it is
        per-frame conditioning data, gathered by frame index inside the
        step)."""
        if self.mesh is None or gstate is None:
            return gstate
        gparams, bank = gstate
        return (shard_guidance_params(gparams, self.mesh, axis="model"),
                replicate_pytree(bank, self.mesh))

    def check_batch_size(self, batch_size: Any, what: str) -> None:
        """Hard error early: a batch that does not divide dp would silently
        fall back to replication in shard_batch."""
        sizes = batch_size if isinstance(batch_size, (list, tuple)) else [batch_size]
        for b in sizes:
            if int(b) % self.dp != 0:
                raise ValueError(
                    f"{what}={b} must be divisible by the data-parallel axis "
                    f"(dp={self.dp}); set data batch sizes to a multiple of dp")
