"""Checkpointing: orbax-backed save/restore of train-state pytrees.

Replaces Lightning ModelCheckpoint + resume (launch.py:184-187,244;
threestudio/utils/misc.py:33-63 ``load_module_weights``): checkpoints carry
the full state pytree + step, support module-filtered partial loading for the
cross-stage weight transfer (``system.weights=<prev ckpt>``), and a "LAST"
symlink-style resolution (find_last_path, misc.py:139-161).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> str:
    ocp = _ocp()
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    os.makedirs(ckpt_dir, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        m = re.fullmatch(r"step_(\d+)", d)
        if m:
            steps.append((int(m.group(1)), os.path.join(ckpt_dir, d)))
    return max(steps)[1] if steps else None


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template pytree)."""
    ocp = _ocp()
    path = find_last_path(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def step_from_path(path: str) -> int:
    m = re.search(r"step_(\d+)", path)
    return int(m.group(1)) if m else 0


def find_last_path(path: str) -> str:
    """Resolve a 'LAST' placeholder to the newest checkpoint in the directory
    (parity with misc.py:139-161)."""
    if path and "LAST" in os.path.basename(path):
        parent = os.path.dirname(path)
        last = latest_checkpoint(parent)
        if last is None:
            raise FileNotFoundError(f"No checkpoints under {parent}")
        return last
    return path


def load_filtered(path: str, target: Any, module_prefix: Optional[str] = None) -> Any:
    """Cross-stage partial loading: restore only the subtree named
    ``module_prefix`` from a checkpointed dict state (load_module_weights
    parity, misc.py:33-63)."""
    restored = restore_checkpoint(path, target if module_prefix is None else None)
    if module_prefix is None:
        return restored
    return restored[module_prefix]
