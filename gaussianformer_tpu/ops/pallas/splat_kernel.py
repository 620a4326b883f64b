"""Pallas TPU kernel for the Gaussian → voxel splat.

One fused kernel replaces the reference's five-stage CUDA binning pipeline
(localagg*/src/aggregator_impl.cu: preprocess → scan → duplicate →
radix-sort → render): the grid iterates over voxel tiles; the full
(x-sorted) Gaussian table lives in VMEM; per tile an inner loop walks
Gaussian chunks and *skips chunks whose AABB cannot overlap the tile*
(scalar-prefetched bounds — the TPU analog of the CUDA voxel binning).

Per (tile, chunk) block:

    d           = mu - x  (per axis, VPU broadcasts — computing the
                  exponent from the displacement avoids the catastrophic
                  cancellation a phi(x)·psi(g) matmul would hit in low
                  precision)
    power       = exp(-1/2 d^T A d) * aabb_mask          (VPU)
    acc        += power @ [sem*w, w, 1]                  (MXU — semantics,
                  prob_sum and density in one augmented matmul)
    one_minus  *= prod(1 - power)                        (VPU — the
                  superposition product, linear space like forward.cu:88)

The kernel returns raw accumulators; normalization / uniform-fallback and
the backward pass are shared with the XLA path (ops/splat.py).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tc_ref,                             # [1, 1, 1+nc] SMEM block:
                                                # col 0 = count, cols 1..
                                                # = overlapping chunk ids
                                                # with the COVERS bit in
                                                # bit 30 (host-computed)
            pts_ref, pts_int_ref, gdata_ref, box_ref, sem_aug_ref,
            acc_ref, om_ref, *ref_tail, num_chunks: int, chunk_g: int,
            needs_om: bool, prune: bool = True, zrun: int = 0,
            emit_labels=None):
    """zrun > 0 enables the INCREMENTAL-Z fast path: the tile's points
    are zrun-long z-columns of a regular voxel grid, laid out z-major
    (rows z * cols + col — the wrapper permutes), so the exponent is a
    quadratic in z per (column, gaussian) and each z step costs two adds
    instead of the full ~20-pass quadratic-form build:

        logit(z+1) = logit(z) + delta(z),  delta(z+1) = delta(z) + 2B

    with the per-gaussian constants (B = -izz*vs^2/2 etc.) precomputed
    into gdata rows 9-12 by the wrapper."""
    tile_n = pts_ref.shape[0]
    c_aug = sem_aug_ref.shape[1] // 2    # (hi, lo) bf16 column pairs

    x = pts_ref[:, 0:1]                   # [tile_n, 1] float
    y = pts_ref[:, 1:2]
    z = pts_ref[:, 2:3]
    px = pts_int_ref[:, 0:1]              # [tile_n, 1] int
    py = pts_int_ref[:, 1:2]
    pz = pts_int_ref[:, 2:3]

    def body(k, carry):
        # prune mode: iterate ONLY the tile's overlapping chunks via the
        # host-built id table (dynamic trip count) — no per-block
        # lax.cond scalar/vector sync, no wasted blocks. The table is
        # exact, so the old AABB-overlap test is gone entirely. Bit 30
        # of each entry carries the host-computed COVERS flag: every
        # gaussian box in the chunk contains the whole tile, so the
        # AABB mask is all-ones and its ~11 VPU passes can be skipped —
        # the common case in the big-radius regime.
        if prune:
            e = tc_ref[0, 0, k + 1]
            j = jnp.bitwise_and(e, (1 << 30) - 1)
            covers = e >= (1 << 30)
        else:
            j = k
            covers = jnp.bool_(False)
        acc, om = carry

        def compute(with_mask, carry):
            acc, om = carry
            start = j * chunk_g
            # gaussian data is stored transposed ([row, P]) so each chunk
            # slice is a lane-aligned [1, Pc] row — no sublane→lane
            # transposes inside the loop.
            g = gdata_ref[:, pl.ds(start, chunk_g)]         # [16, Pc]
            sem_c = sem_aug_ref[pl.ds(start, chunk_g), :]   # [Pc, C+2]

            if zrun:
                cols = tile_n // zrun
                xc = x[0:cols, :]
                yc = y[0:cols, :]
                z0 = z[0:cols, :]
                dx = g[0:1, :] - xc                          # [cols, Pc]
                dy = g[1:2, :] - yc
                dz = g[2:3, :] - z0
                quad = (g[3:4, :] * dx * dx
                        + g[4:5, :] * dy * dy
                        + g[5:6, :] * dz * dz)
                logit0 = (-0.5 * quad
                          - (g[6:7, :] * dx * dy
                             + g[7:8, :] * dy * dz
                             + g[8:9, :] * dx * dz))
                delta = (g[9:10, :] * dz + g[10:11, :]
                         + g[11:12, :] * dy + g[12:13, :] * dx)
                two_b = g[10:11, :] * 2.0
                slices = []
                l_z = logit0
                d_z = delta
                for _ in range(zrun):
                    slices.append(l_z)
                    l_z = l_z + d_z
                    d_z = d_z + two_b
                logit = jnp.concatenate(slices, axis=0)      # [tile_n, Pc]
            else:
                dx = g[0:1, :] - x                           # [tile_n, Pc]
                dy = g[1:2, :] - y
                dz = g[2:3, :] - z
                quad = (g[3:4, :] * dx * dx
                        + g[4:5, :] * dy * dy
                        + g[5:6, :] * dz * dz)
                logit = (-0.5 * quad
                         - (g[6:7, :] * dx * dy
                            + g[7:8, :] * dy * dz
                            + g[8:9, :] * dx * dz))

            power = jnp.exp(jnp.minimum(logit, 30.0))
            if with_mask:
                box_c = box_ref[:, pl.ds(start, chunk_g)]   # [8, Pc] int32
                # box rows are (lo, hi) bounds: two compares per axis
                # instead of sub+abs+compare
                mask = ((px >= box_c[0:1, :]) & (px <= box_c[3:4, :])
                        & (py >= box_c[1:2, :]) & (py <= box_c[4:5, :])
                        & (pz >= box_c[2:3, :]) & (pz <= box_c[5:6, :]))
                power = power * mask

            # compensated bf16x2 matmul (Mosaic supports only DEFAULT /
            # HIGHEST): err ~2^-17 at half the HIGHEST pass count
            p_hi = power.astype(jnp.bfloat16)
            p_lo = (power - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            s_hi = sem_c[:, 0:c_aug]                         # bf16 tables
            s_lo = sem_c[:, c_aug:]

            def mm(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = acc + (mm(p_hi, s_hi) + (mm(p_hi, s_lo)
                                           + mm(p_lo, s_hi)))
            if needs_om:
                # log-space product (Mosaic has no reduce_prod); exact at
                # the power→1 pole: log(0) = -inf → exp(-inf) = 0.
                om = om + jnp.sum(jnp.log1p(-power), axis=1, keepdims=True)
            return acc, om

        return jax.lax.cond(covers,
                            functools.partial(compute, False),
                            functools.partial(compute, True), (acc, om))

    acc0 = jnp.zeros((tile_n, c_aug), jnp.float32)
    om0 = jnp.zeros((tile_n, 1), jnp.float32)
    n_iter = tc_ref[0, 0, 0] if prune else num_chunks
    acc, om_log = jax.lax.fori_loop(0, n_iter, body, (acc0, om0))
    acc_ref[:] = acc
    om_ref[:] = jnp.exp(om_log)
    if emit_labels is not None:
        # final-occ label epilogue (inference): the identical math the
        # head would run in XLA over the full [N, C] logits — GMM
        # normalization w/ uniform fallback (_postprocess_prob), the
        # combine_geosem or bin-threshold composition (reference
        # gaussian_head.py:165-183), and a first-index lane argmax —
        # runs here per tile while acc is still in VMEM, so the
        # downstream chain (~4.6 ms/frame of [640k, 18] fusions at
        # flagship size) dies to DCE when only final_occ is fetched.
        labels_ref = ref_tail[0]
        mode = emit_labels["mode"]
        c = emit_labels["c"]
        if mode == "additive":
            comb = acc[:, :c]
        else:
            prob_sum = acc[:, c:c + 1]
            covered = prob_sum > 1e-9
            denom = jnp.where(covered, prob_sum, 1.0)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
            uniform = jnp.where(lane == c - 1, 0.0, 1.0 / (c - 1))
            logits = jnp.where(covered, acc[:, :c] / denom, uniform)
            bins = 1.0 - jnp.exp(om_log)                 # [tile_n, 1]
            if mode == "combine":
                # argmax([sem*bins, 1-bins]) — scale-invariant per row,
                # identical to the head's concat form
                comb = jnp.where(lane == c - 1, 1.0 - bins,
                                 logits * bins)
            else:                                        # "threshold"
                comb = logits
        lane_c = jax.lax.broadcasted_iota(jnp.int32, comb.shape, 1)
        m = jnp.max(comb, axis=1, keepdims=True)
        label = jnp.min(jnp.where(comb == m, lane_c, jnp.int32(2 ** 30)),
                        axis=1, keepdims=True)           # first max
        if mode == "threshold":
            label = jnp.where(bins > emit_labels["thresh"], label,
                              jnp.int32(emit_labels["empty_label"]))
        labels_ref[:] = label


def _pad_rows(x, rows, value=0.0):
    pad = rows - x.shape[0]
    if pad == 0:
        return x
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths, constant_values=value)


#: VMEM the resident tables may use (v5e/v5p have 128 MiB/core; leave
#: room for the per-tile blocks, accumulators, and compiler spills).
VMEM_TABLE_BUDGET_BYTES = 96 * 1024 * 1024


def _check_vmem_budget(p_pad: int, c_aug: int, tile_n: int, chunk_g: int):
    """The whole Gaussian table lives in VMEM; fail loudly (naming the
    knobs) instead of letting Mosaic die with an opaque allocation error
    when a config outgrows the budget."""
    table = p_pad * (16 * 4 + 8 * 4 + c_aug * 4)     # gdata+box+sem_aug
    blocks = tile_n * (4 + 4 + c_aug + 1) * 4 * 2    # in/out double-buffer
    total = table + blocks
    if total > VMEM_TABLE_BUDGET_BYTES:
        raise ValueError(
            f"splat_raw_pallas: resident tables need {total / 2**20:.0f}"
            f" MiB VMEM for {p_pad} Gaussians x {c_aug} channels, over the"
            f" {VMEM_TABLE_BUDGET_BYTES / 2**20:.0f} MiB budget. Shard the"
            " Gaussians across devices, reduce num_anchor, or use the XLA"
            " backend (ops.splat.splat(..., backend='xla')), which streams"
            " chunks through HBM.")


def unpermute_zrun(a, zrun: int, tile_n: int):
    """Inverse of the kernel's tile-local z-major permute for a batched
    row tensor ``a`` of shape [..., N, D] (N a multiple of tile_n)."""
    cols = tile_n // zrun
    lead = a.shape[:-2]
    n, d = a.shape[-2:]
    return a.reshape(lead + (-1, zrun, cols, d)).swapaxes(-2, -3).reshape(
        lead + (n, d))


def splat_raw_pallas(pts, pts_int, gdata, box, sem_aug, *, tile_n: int = 512,
                     chunk_g: int = 512, needs_om: bool = True,
                     interpret: bool = False, prune: bool = True,
                     zrun: int = 0, defer_zrun: bool = False,
                     emit_labels=None):
    """Raw splat accumulators for one batch element.

    pts:     [N, 4]   float32 query points (xyz, pad).
    pts_int: [N, 4]   int32 voxel coords (col 3 unused).
    gdata:   [P, 16]  float32 [mu(3), ixx, iyy, izz, ixy, iyz, ixz, 0...].
    box:     [P, 8]   int32 [mx, my, mz, rx, ry, rz, 0, 0]; dummy rows
                      must use radii -1 so they never match.
    sem_aug: [P, C+2] [sem * w, w, 1] (prob) or [sem * opa, ...] (additive).
    zrun:    declare that the points are consecutive z-columns of a
             regular grid, ``zrun`` voxels per column (z fastest, uniform
             z spacing): enables the incremental-z kernel path (~2x on
             the VPU-bound exponent build). The wrapper permutes each
             tile z-major and inverse-permutes the outputs, so results
             stay in input order.

    defer_zrun: return the outputs still in the tile-local z-major
             kernel order (requires N % tile_n == 0 so no pad rows mix
             in); the caller inverts later with :func:`unpermute_zrun`.
             Lets elementwise consumers (logits math, argmax) run in
             kernel order so only the final small tensor pays the
             relayout.

    Returns (acc [N, C+2], one_minus [N]).
    """
    n, p = pts.shape[0], gdata.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    p_pad = -(-p // chunk_g) * chunk_g
    num_tiles = n_pad // tile_n
    num_chunks = p_pad // chunk_g
    _check_vmem_budget(p_pad, sem_aug.shape[1], tile_n, chunk_g)
    if zrun and (tile_n % zrun != 0 or n % zrun != 0):
        zrun = 0

    pts = _pad_rows(pts, n_pad)
    pts_int = _pad_rows(pts_int, n_pad, value=-(10 ** 6))
    gdata = _pad_rows(gdata, p_pad)
    box = _pad_rows(box, p_pad, value=-1)
    sem_aug = _pad_rows(sem_aug, p_pad)

    if zrun:
        # per-gaussian z-step constants (rows 9-12, see _kernel): the z
        # spacing is read off the first column of the first tile
        z_step = pts[1, 2] - pts[0, 2]
        izz = gdata[:, 5]
        consts = jnp.stack([
            izz * z_step, -0.5 * izz * z_step * z_step,
            gdata[:, 7] * z_step, gdata[:, 8] * z_step], axis=1)
        gdata = jnp.concatenate(
            [gdata[:, :9], consts, gdata[:, 13:]], axis=1)
        # permute each tile z-major (kernel row zi*cols + col <- input
        # row col*zrun + zi). The permutation is tile-local and static,
        # so it is a pure reshape/transpose — XLA lowers it as a relayout
        # copy (~1 ms for the [640k, 20] output) instead of the ~19 ms
        # row gather an index-array formulation costs.
        cols = tile_n // zrun

        def _to_kernel_order(a):
            d = a.shape[1]
            return a.reshape(-1, cols, zrun, d).transpose(
                0, 2, 1, 3).reshape(n_pad, d)

        pts = _to_kernel_order(pts)
        pts_int = _to_kernel_order(pts_int)

    gdata_t = gdata.T                    # [16, P]
    # box rows become (lo(3), hi(3)): two compares per axis in-kernel
    # instead of sub+abs+compare. Dummy rows (radius -1) give lo > hi and
    # never match, padding rows (-1) match only px == -1 (impossible:
    # real voxels are >= 0, sentinels are -1e6).
    box_lh = jnp.concatenate(
        [box[:, :3] - box[:, 3:6], box[:, :3] + box[:, 3:6],
         box[:, 6:]], axis=1)
    box_t = box_lh.T                     # [8, P]
    # semantic table as compensated bf16 pairs (hi, lo): Mosaic supports
    # only DEFAULT/HIGHEST dot precision; hi/lo splitting gets ~f32
    # accuracy at half the HIGHEST pass count. Same bytes as f32.
    sem_hi = sem_aug.astype(jnp.bfloat16)
    sem_lo = (sem_aug - sem_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    sem_pair = jnp.concatenate([sem_hi, sem_lo], axis=1)

    # per-tile bounds (lo over valid rows only: sentinels pushed to +inf
    # for the min; the max ignores the -1e6 sentinels naturally)
    pi3 = pts_int[:, :3].reshape(num_tiles, tile_n, 3)
    lo = jnp.min(jnp.where(pi3 < -(10 ** 5), 10 ** 6, pi3), axis=1)
    hi = jnp.max(pi3, axis=1)

    glo = (box[:, :3] - box[:, 3:6]).reshape(num_chunks, chunk_g, 3)
    ghi = (box[:, :3] + box[:, 3:6]).reshape(num_chunks, chunk_g, 3)
    # exact per-tile chunk-id table: overlap matrix -> per-row compaction
    # (overlapping ids first, ascending). Cheap ([tiles, chunks] bools)
    # and removes every in-kernel overlap cond — the kernel's chunk loop
    # has a dynamic trip count of exactly the overlapping chunks. Each
    # id entry carries the COVERS flag in bit 30 (chunk j's boxes ALL
    # contain the tile → the per-pair AABB mask can be skipped); padded
    # / dummy rows (negative radii) force non-cover — their zero sem row
    # is harmless in acc but power=1 would poison the om product. The
    # whole test lives host-side: the kernel needs no bounds tables at
    # all (scalar-prefetched bounds were 128-lane padded in SMEM and
    # overflowed the 1 MB budget at gs144000 scale).
    lo_cb = jnp.min(glo, axis=1)
    hi_cb = jnp.max(ghi, axis=1)
    ov = jnp.all((lo_cb[None, :] <= hi[:, None])
                 & (hi_cb[None, :] >= lo[:, None]), axis=-1)  # [nt, nc]
    dummy = (box[:, 3:6] < 0).any(-1).reshape(num_chunks, chunk_g, 1)
    big = jnp.int32(10 ** 6)
    cov_lo = jnp.max(jnp.where(dummy, big, glo), axis=1)
    cov_hi = jnp.min(jnp.where(dummy, -big, ghi), axis=1)
    cov = (jnp.all(cov_lo[None, :] <= lo[:, None], axis=-1)
           & jnp.all(cov_hi[None, :] >= hi[:, None], axis=-1))  # [nt, nc]
    count = jnp.sum(ov, axis=1, dtype=jnp.int32)
    ids = jnp.argsort(~ov, axis=1, stable=True).astype(jnp.int32)
    entries = ids + (jnp.take_along_axis(
        cov, ids, axis=1).astype(jnp.int32) << 30)
    tw = -(-(num_chunks + 1) // 8) * 8
    table = jnp.concatenate([count[:, None], entries], axis=1)
    # [nt, 1, tw] with a (1, 1, tw) block: trailing block dims must equal
    # the array dims for SMEM blocks (Mosaic block-shape rule)
    table = jnp.pad(table, ((0, 0), (0, tw - 1 - num_chunks)))[:, None, :]

    c_aug = sem_aug.shape[1]
    kernel = functools.partial(_kernel, num_chunks=num_chunks,
                               chunk_g=chunk_g, needs_om=needs_om,
                               prune=prune, zrun=zrun,
                               emit_labels=emit_labels)
    out_specs = [
        pl.BlockSpec((tile_n, c_aug), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad, c_aug), jnp.float32),
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
    ]
    if emit_labels is not None:
        out_specs.append(pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_pad, 1), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1, tw), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),   # chunk-id table row
            pl.BlockSpec((tile_n, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # gdata_t (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # box_t (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # sem_aug (full)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        # the resident gaussian tables exceed the 16.5 MB default scoped
        # budget at gs144000 scale (_check_vmem_budget guards the true
        # ceiling)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_TABLE_BUDGET_BYTES
            + 16 * 1024 * 1024),
        interpret=interpret,
    )(table, pts, pts_int, gdata_t, box_t, sem_pair)
    acc, om = outs[0], outs[1]
    labels = outs[2] if emit_labels is not None else None
    if zrun and defer_zrun:
        assert n == n_pad, (n, n_pad)
        if labels is not None:
            return acc, om[:, 0], labels[:, 0]
        return acc, om[:, 0]
    if zrun:
        acc = unpermute_zrun(acc, zrun, tile_n)
        om = unpermute_zrun(om, zrun, tile_n)
        if labels is not None:
            labels = unpermute_zrun(labels, zrun, tile_n)
    if labels is not None:
        return acc[:n], om[:n, 0], labels[:n, 0]
    return acc[:n], om[:n, 0]
