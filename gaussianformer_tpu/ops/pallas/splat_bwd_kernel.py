"""Pallas TPU kernel for the Gaussian→voxel splat BACKWARD pass.

Hand-derived gradients (mirrors localagg_prob/src/backward.cu:23-123 and
the XLA formulation in ops/splat.splat_backward). The forward kernel
iterates voxel tiles with the Gaussian table resident in VMEM; the
backward transposes that structure: the grid is

    (gaussian chunk i, point tile j)   — row-major, j fastest —

with point-side data (positions, voxel coords, logits cotangent,
per-point scalars) STREAMED as pipelined blocks and per-chunk gradient
accumulators living in the (revisited) output blocks / scratch. Per
block:

    power    = exp(-1/2 d^T A d) * aabb_mask          (recompute, VPU)
    gprob    = gl @ sem^T - dot_gl                    (MXU)
    gpower   = g_density + bin_term/(1-p+eps) + gprob*w
    glogit   = gpower * power * (logit < 30)
    t       += glogit^T @ [phi(x), 1]                 (MXU moments)
    gw      += column-sum(gprob * power)
    gsem    += (power w)^T @ gl                       (MXU)

At the last point tile the chunk's moments are folded into the
mean/covariance/opacity gradients exactly as the reference backward does
(incl. the det(Σ⁻¹) term of the GMM normalizer). Blocks whose AABBs
cannot overlap are skipped via the same scalar-prefetched bounds test as
the forward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NORM_3D = 0.06349363593424097  # (2*pi)^{-3/2}


def _kernel(tile_bounds_ref, chunk_bounds_ref,
            pts_ref, pint_ref, gl_ref, sc_ref,
            gdata_ref, box_ref, sem_ref,
            gmu_ref, gopa_ref, gcov_ref, gsem_ref,
            t_acc, gw_acc,
            *, num_ptiles: int, chunk_g: int, variant: str,
            prune: bool = True):
    i = pl.program_id(0)          # gaussian chunk
    j = pl.program_id(1)          # point tile
    nt = pts_ref.shape[0]
    prob = variant == "prob"

    @pl.when(j == 0)
    def _():
        t_acc[...] = jnp.zeros_like(t_acc)
        gw_acc[...] = jnp.zeros_like(gw_acc)
        gsem_ref[...] = jnp.zeros_like(gsem_ref)

    if prune:
        overlap = (
            (chunk_bounds_ref[i, 0] <= tile_bounds_ref[j, 4])
            & (chunk_bounds_ref[i, 4] >= tile_bounds_ref[j, 0])
            & (chunk_bounds_ref[i, 1] <= tile_bounds_ref[j, 5])
            & (chunk_bounds_ref[i, 5] >= tile_bounds_ref[j, 1])
            & (chunk_bounds_ref[i, 2] <= tile_bounds_ref[j, 6])
            & (chunk_bounds_ref[i, 6] >= tile_bounds_ref[j, 2])
        )
    else:
        overlap = jnp.bool_(True)

    @pl.when(overlap)
    def _():
        g = gdata_ref[...]                     # [16, Gc]
        box = box_ref[...]                     # [8, Gc]
        x = pts_ref[:, 0:1]
        y = pts_ref[:, 1:2]
        z = pts_ref[:, 2:3]

        dx = g[0:1, :] - x                     # [Nt, Gc]
        dy = g[1:2, :] - y
        dz = g[2:3, :] - z
        logit = (-0.5 * (g[3:4, :] * dx * dx
                         + g[4:5, :] * dy * dy
                         + g[5:6, :] * dz * dz)
                 - (g[6:7, :] * dx * dy
                    + g[7:8, :] * dy * dz
                    + g[8:9, :] * dx * dz))
        mask = ((jnp.abs(pint_ref[:, 0:1] - box[0:1, :]) <= box[3:4, :])
                & (jnp.abs(pint_ref[:, 1:2] - box[1:2, :]) <= box[4:5, :])
                & (jnp.abs(pint_ref[:, 2:3] - box[2:3, :]) <= box[5:6, :]))
        unclamped = logit < 30.0
        power = jnp.exp(jnp.minimum(logit, 30.0)) * mask

        gl = gl_ref[...]                       # [Nt, C] f32
        w_row = g[10:11, :]                    # w_g (norm*opa | opa)
        hi = jax.lax.Precision.HIGHEST
        if prob:
            gprob = jax.lax.dot_general(
                gl, sem_ref[...], (((1,), (1,)), ((), ())),
                precision=hi,
                preferred_element_type=jnp.float32) \
                - sc_ref[:, 0:1]                       # [Nt, Gc]
            one_m = 1.0 - jnp.minimum(power, 1.0 - 1e-9) + 1e-9
            gpower = (sc_ref[:, 2:3] + sc_ref[:, 1:2] / one_m
                      + gprob * w_row)
        else:
            gprob = jax.lax.dot_general(
                gl, sem_ref[...], (((1,), (1,)), ((), ())),
                precision=hi, preferred_element_type=jnp.float32)
            gpower = gprob * w_row
        glogit = gpower * power * unclamped

        # moment accumulation: phi-augmented matmul over this point tile
        ones = jnp.ones_like(x)
        phi = jnp.concatenate(
            [x * x, y * y, z * z, x * y, y * z, x * z, x, y, z, ones],
            axis=1)                            # [Nt, 10]
        t_blk = jax.lax.dot_general(
            glogit, phi, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)  # [Gc, 10]
        t_acc[:, 0:10] = t_acc[:, 0:10] + t_blk

        gw_acc[0:1, :] = gw_acc[0:1, :] + jnp.sum(
            gprob * power, axis=0, keepdims=True)

        prob_blk = power * w_row
        gsem_ref[...] = gsem_ref[...] + jax.lax.dot_general(
            prob_blk, gl, (((0,), (0,)), ((), ())),
            precision=hi, preferred_element_type=jnp.float32)  # [Gc, C]

    @pl.when(j == num_ptiles - 1)
    def _():
        # fold moments into per-Gaussian grads (backward.cu:78-107 /
        # ops/splat._splat_bwd_single finalization)
        g = gdata_ref[...]
        t = t_acc[...]
        s2 = t[:, 0:6]
        s1 = t[:, 6:9]
        s0 = t[:, 9:10]
        mu = jnp.transpose(g[0:3, :])          # [Gc, 3]
        a6 = jnp.transpose(g[3:9, :])          # [Gc, 6]
        opa = jnp.transpose(g[9:10, :])        # [Gc, 1]
        gw = jnp.transpose(gw_acc[0:1, :])     # [Gc, 1]

        v = mu * s0 - s1                       # [Gc, 3]
        gmu = -jnp.concatenate([
            (a6[:, 0:1] * v[:, 0:1] + a6[:, 3:4] * v[:, 1:2]
             + a6[:, 5:6] * v[:, 2:3]),
            (a6[:, 3:4] * v[:, 0:1] + a6[:, 1:2] * v[:, 1:2]
             + a6[:, 4:5] * v[:, 2:3]),
            (a6[:, 5:6] * v[:, 0:1] + a6[:, 4:5] * v[:, 1:2]
             + a6[:, 2:3] * v[:, 2:3]),
        ], axis=1)
        m0, m1, m2 = mu[:, 0:1], mu[:, 1:2], mu[:, 2:3]
        gcov = jnp.concatenate([
            -0.5 * (m0 * m0 * s0 - 2.0 * m0 * s1[:, 0:1] + s2[:, 0:1]),
            -0.5 * (m1 * m1 * s0 - 2.0 * m1 * s1[:, 1:2] + s2[:, 1:2]),
            -0.5 * (m2 * m2 * s0 - 2.0 * m2 * s1[:, 2:3] + s2[:, 2:3]),
            -(m0 * m1 * s0 - m0 * s1[:, 1:2] - m1 * s1[:, 0:1]
              + s2[:, 3:4]),
            -(m1 * m2 * s0 - m1 * s1[:, 2:3] - m2 * s1[:, 1:2]
              + s2[:, 4:5]),
            -(m0 * m2 * s0 - m0 * s1[:, 2:3] - m2 * s1[:, 0:1]
              + s2[:, 5:6]),
        ], axis=1)

        if variant == "prob":
            xx, yy, zz = a6[:, 0:1], a6[:, 1:2], a6[:, 2:3]
            xy, yz, xz = a6[:, 3:4], a6[:, 4:5], a6[:, 5:6]
            det = (xx * yy * zz + 2.0 * xy * yz * xz
                   - xx * yz * yz - yy * xz * xz - zz * xy * xy)
            sqrt_det = jnp.sqrt(jnp.maximum(det, 1e-30))
            gopa = gw * _NORM_3D * sqrt_det
            gdet = jnp.where(det > 1e-30,
                             gw * opa * _NORM_3D / (2.0 * sqrt_det), 0.0)
            ddet = jnp.concatenate([
                yy * zz - yz * yz,
                xx * zz - xz * xz,
                xx * yy - xy * xy,
                2.0 * (yz * xz - zz * xy),
                2.0 * (xy * xz - xx * yz),
                2.0 * (xy * yz - yy * xz),
            ], axis=1)
            gcov = gcov + gdet * ddet
        else:
            gopa = gw

        pad2 = jnp.zeros((gmu.shape[0], 5), jnp.float32)
        gmu_ref[...] = jnp.concatenate([gmu, pad2], axis=1)
        gopa_ref[...] = jnp.concatenate(
            [gopa, jnp.zeros((gmu.shape[0], 7), jnp.float32)], axis=1)
        gcov_ref[...] = jnp.concatenate(
            [gcov, jnp.zeros((gmu.shape[0], 2), jnp.float32)], axis=1)


def splat_bwd_raw_pallas(pts, pts_int, gdata, box, sem, gl, scalars, *,
                         variant: str = "prob", tile_n: int = 2048,
                         chunk_g: int = 512, interpret: bool = False,
                         prune: bool = True):
    """Raw backward accumulators for one batch element (sorted order).

    pts:     [N, 4]  f32 query points.
    pts_int: [N, 4]  i32 voxel coords.
    gdata:   [P, 16] f32 [mu(3), A6(6), opa(1), w_g(1), 0...].
    box:     [P, 8]  i32 [mx, my, mz, rx, ry, rz, 0, 0] (radii -1 = dummy).
    sem:     [P, C]  f32 raw semantics.
    gl:      [N, C]  f32 (prob: g_logits * covered / prob_sum; additive:
             g_logits).
    scalars: [N, 4]  f32 [dot_gl, bin_term, g_density, 0].

    Returns (gmu [P, 3], gopa [P], gcov [P, 6], gsem [P, C]).
    """
    n, p = pts.shape[0], gdata.shape[0]
    c = sem.shape[1]
    n_pad = -(-n // tile_n) * tile_n
    p_pad = -(-p // chunk_g) * chunk_g
    num_ptiles = n_pad // tile_n
    num_chunks = p_pad // chunk_g

    def pad_rows(x, rows, value=0.0):
        if x.shape[0] == rows:
            return x
        return jnp.pad(x, [(0, rows - x.shape[0])] + [(0, 0)] *
                       (x.ndim - 1), constant_values=value)

    pts = pad_rows(pts, n_pad)
    pts_int = pad_rows(pts_int, n_pad, value=-(10 ** 6))
    gl = pad_rows(gl, n_pad)
    scalars = pad_rows(scalars, n_pad)
    gdata = pad_rows(gdata, p_pad)
    box = pad_rows(box, p_pad, value=-1)
    sem = pad_rows(sem, p_pad)
    gdata_t = gdata.T
    box_t = box.T

    pi3 = pts_int[:, :3].reshape(num_ptiles, tile_n, 3)
    lo = jnp.min(jnp.where(pi3 < -(10 ** 5), 10 ** 6, pi3), axis=1)
    hi = jnp.max(pi3, axis=1)
    zero = jnp.zeros((num_ptiles, 1), jnp.int32)
    tile_bounds = jnp.concatenate(
        [lo, zero, hi, zero], axis=-1).astype(jnp.int32)

    glo = (box[:, :3] - box[:, 3:6]).reshape(num_chunks, chunk_g, 3)
    ghi = (box[:, :3] + box[:, 3:6]).reshape(num_chunks, chunk_g, 3)
    zero_c = jnp.zeros((num_chunks, 1), jnp.int32)
    chunk_bounds = jnp.concatenate(
        [jnp.min(glo, axis=1), zero_c, jnp.max(ghi, axis=1), zero_c],
        axis=-1).astype(jnp.int32)

    kernel = functools.partial(_kernel, num_ptiles=num_ptiles,
                               chunk_g=chunk_g, variant=variant,
                               prune=prune)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_chunks, num_ptiles),
        in_specs=[
            pl.BlockSpec((tile_n, 4), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),     # pts
            pl.BlockSpec((tile_n, 4), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),     # pts_int
            pl.BlockSpec((tile_n, c), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),     # gl
            pl.BlockSpec((tile_n, 4), lambda i, j, *_: (j, 0),
                         memory_space=pltpu.VMEM),     # scalars
            pl.BlockSpec((16, chunk_g), lambda i, j, *_: (0, i),
                         memory_space=pltpu.VMEM),     # gdata_t
            pl.BlockSpec((8, chunk_g), lambda i, j, *_: (0, i),
                         memory_space=pltpu.VMEM),     # box_t
            pl.BlockSpec((chunk_g, c), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),     # sem
        ],
        out_specs=[
            pl.BlockSpec((chunk_g, 8), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),     # gmu
            pl.BlockSpec((chunk_g, 8), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),     # gopa
            pl.BlockSpec((chunk_g, 8), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),     # gcov
            pl.BlockSpec((chunk_g, c), lambda i, j, *_: (i, 0),
                         memory_space=pltpu.VMEM),     # gsem
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk_g, 16), jnp.float32),    # t moments
            pltpu.VMEM((8, chunk_g), jnp.float32),     # gw row
        ],
    )
    gmu, gopa, gcov, gsem = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((p_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, 8), jnp.float32),
            jax.ShapeDtypeStruct((p_pad, c), jnp.float32),
        ],
        # the double-buffered point blocks (pts/pint/gl/scalars at
        # tile_n=2048) exceed the 16 MB default scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(tile_bounds, chunk_bounds, pts, pts_int, gl, scalars,
      gdata_t, box_t, sem)
    return gmu[:p, :3], gopa[:p, 0], gcov[:p, :6], gsem[:p]
