"""Pallas TPU kernel for masked farthest-point sampling.

The XLA formulation (ops/fps.py) runs the inherently-sequential selection
loop as a `lax.fori_loop` of whole-array ops — every iteration pays
multi-microsecond op-dispatch latency, which at 4000 selections over 130k
candidates costs ~140 ms on v5e (the single most expensive part of the
GaussianLifterV2 forward after the towers). Here the whole loop runs
inside one kernel with all state resident in VMEM: per iteration a
distance pass, a running min, a global argmax, and a masked coordinate
extraction — ~2 µs instead of ~35 µs.

Selection semantics match ops/fps.farthest_point_sampling except for
argmax tie-breaking (first-index vs highest-index), which only matters
for exactly-equidistant candidates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xyz_ref, dist0_ref, seed_ref, out_ref, *, num_samples: int):
    rows = dist0_ref.shape[0]
    iota = (jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 0) * 128
            + jax.lax.broadcasted_iota(jnp.int32, (rows, 128), 1))

    x = xyz_ref[0]
    y = xyz_ref[1]
    z = xyz_ref[2]

    seed = seed_ref[0, 0]
    out_ref[0:1, :] = jnp.full((1, 1), seed, jnp.int32)

    def body(i, carry):
        dist, idx = carry
        sel = (iota == idx).astype(jnp.float32)
        px = jnp.sum(x * sel)
        py = jnp.sum(y * sel)
        pz = jnp.sum(z * sel)
        d2 = ((x - px) * (x - px) + (y - py) * (y - py)
              + (z - pz) * (z - pz))
        # invalid candidates carry -inf and stay -inf through the min
        dist = jnp.minimum(dist, d2)
        m = jnp.max(dist)
        nxt = jnp.max(jnp.where(dist == m, iota, -1))
        out_ref[pl.ds(i, 1), :] = jnp.full((1, 1), nxt, jnp.int32)
        return dist, nxt

    jax.lax.fori_loop(1, num_samples, body, (dist0_ref[:], seed))


def farthest_point_sampling_pallas(points, num_samples: int,
                                   valid_mask=None, *,
                                   interpret: bool = False):
    """points: [N, 3] float32; valid_mask: [N] bool. Returns [num_samples]
    int32 indices (invalid points only selected once valid ones are
    exhausted, mirroring ops/fps.farthest_point_sampling)."""
    n = points.shape[0]
    if valid_mask is None:
        valid_mask = jnp.ones((n,), bool)
    rows = -(-n // 128)
    rows = -(-rows // 8) * 8
    n_pad = rows * 128

    pts = jnp.pad(points.astype(jnp.float32), ((0, n_pad - n), (0, 0)))
    valid = jnp.pad(valid_mask, (0, n_pad - n))
    xyz = jnp.stack([pts[:, 0].reshape(rows, 128),
                     pts[:, 1].reshape(rows, 128),
                     pts[:, 2].reshape(rows, 128)])
    dist0 = jnp.where(valid, jnp.inf, -jnp.inf).astype(
        jnp.float32).reshape(rows, 128)
    first = jnp.argmax(valid).astype(jnp.int32)
    seed = jnp.where(jnp.any(valid), first, 0).reshape(1, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, num_samples=num_samples),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_samples, 1), jnp.int32),
        interpret=interpret,
    )(xyz, dist0, seed)
    return out[:, 0]
