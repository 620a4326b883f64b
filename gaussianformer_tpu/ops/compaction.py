"""Stream-compaction helpers (TPU-shaped).

XLA's 1-D cumsum over a few hundred thousand elements lowers to a
serial scan (~1.2 ms on v5e); the blocked [rows, 512] row-scan plus a
tiny row-offset scan vectorizes across sublanes. A bool argsort of the
same size costs ~1 ms — compaction by prefix positions + one unique
scatter is ~3x cheaper and keeps stable order.
"""
from __future__ import annotations

import jax.numpy as jnp


def blocked_positions(mask, block: int = 512):
    """0-based rank of each True element of 1-D bool ``mask`` among the
    True elements (stable order); arbitrary values at False elements."""
    n = mask.shape[0]
    n_pad = -(-n // block) * block
    mi = jnp.pad(mask.astype(jnp.int32), (0, n_pad - n)).reshape(-1, block)
    row = jnp.cumsum(mi, axis=1)
    offs = jnp.cumsum(row[:, -1]) - row[:, -1]
    return (row + offs[:, None]).reshape(-1)[:n] - 1


def compact_indices(mask, size: int):
    """Indices of the first ``size`` True elements of ``mask`` in stable
    order, as a [size] int32 buffer (entries beyond the True count are
    0). The scatter routes False elements out of bounds (dropped), so
    every in-bounds write is unique — the fast scatter path."""
    n = mask.shape[0]
    pos = blocked_positions(mask)
    slot = jnp.where(mask & (pos < size), pos, size + n)
    return jnp.zeros((size,), jnp.int32).at[slot].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
