"""Process-level XLA flag setup for TPU runs.

XLA's space-to-batch conv rewrite splits the big early-stage ResNet
convolutions (e.g. [6, 216, 400, 256] stride-4 maps) into many-tile
batches, and its layout assignment then disagrees with itself about the
tile layouts — the flagship forward pays ~13 ms/frame in pure
{3,1,2,0} -> {3,0,2,1} relayout copies inside stage1/stem (measured on
v5e, round 3; disabling the pass: 3.72 -> 3.91 FPS with conv fusions
already at 72-98% MXU). Must run BEFORE the jax backend initializes.
"""
from __future__ import annotations

import os

_DISABLED_PASSES = ("space-to-batch-converter",)


def apply_perf_flags() -> None:
    """Merge our pass-disable list into XLA_FLAGS (idempotent; a
    pre-existing --xla_disable_hlo_passes list is extended, not
    clobbered — repeated absl flags would otherwise last-write-win)."""
    flags = os.environ.get("XLA_FLAGS", "")
    parts = [f for f in flags.split() if f]
    existing: list = []
    kept = []
    for f in parts:
        if f.startswith("--xla_disable_hlo_passes="):
            existing.extend(f.split("=", 1)[1].split(","))
        else:
            kept.append(f)
    for p in _DISABLED_PASSES:
        if p not in existing:
            existing.append(p)
    kept.append("--xla_disable_hlo_passes=" + ",".join(existing))
    os.environ["XLA_FLAGS"] = " ".join(kept)
