"""Checkpoint save/restore (reference train.py:269-281, 144-167).

Saves {params, batch_stats, opt_state, epoch, global_iter, last_iter} with
orbax; a ``latest`` pointer file mirrors the reference's latest.pth
symlink auto-resume.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
except ImportError:  # pragma: no cover
    ocp = None


def _ckpt_dir(work_dir: str, step: int) -> str:
    return os.path.join(os.path.abspath(work_dir), f"ckpt_{step:09d}")


def save_checkpoint(work_dir: str, step: int, state: Dict[str, Any]):
    os.makedirs(work_dir, exist_ok=True)
    path = _ckpt_dir(work_dir, step)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    with open(os.path.join(work_dir, "latest"), "w") as f:
        f.write(os.path.basename(path))
    return path


def latest_checkpoint(work_dir: str) -> Optional[str]:
    pointer = os.path.join(work_dir, "latest")
    if not os.path.exists(pointer):
        return None
    with open(pointer) as f:
        name = f.read().strip()
    path = os.path.join(work_dir, name)
    return path if os.path.exists(path) else None


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None):
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, item=jax.device_get(target))
    return ckptr.restore(path)
