"""Multi-camera multi-scale deformable feature aggregation — TPU-native.

The reference's fused CUDA op (model/encoder/gaussian_encoder/ops/src/
deformable_aggregation_cuda.cu) bilinearly samples 6-camera x 4-level packed
feature columns at projected key points and accumulates with per-group
weights. The TPU formulation packs ALL cameras and ALL pyramid levels into
one flat row table (the reference's `feature_maps_format` column packing,
ops/deformable_aggregation.py:80-117, generalized across cameras) so the
whole op is ONE row gather — TPU gathers have a multi-ms fixed cost, so
fusing the 96 per-(cam, level, corner) lookups into a single one is the
difference between ~95 ms and ~15 ms per call — followed by fused
einsum arithmetic for the bilinear lerp and the weighted reduction.

Conventions copied from the reference kernel:
  - sampling locations are normalized to [0, 1] per camera image;
  - a location participates only when strictly inside (0, 1) on both axes
    (deformable_aggregation_cuda.cu:166);
  - pixel coords are ``h_im = loc_h * H - 0.5`` (align_corners=False,
    deformable_aggregation_cuda.cu:174-175);
  - out-of-bounds bilinear corners contribute zero.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def bilinear_sample_nchw(feat, loc):
    """Bilinear sample with zero padding (small-scale reference used by
    tests and the v1 fallback path).

    feat: [H, W, C]; loc: [..., 2] normalized (w, h). Returns [..., C].
    """
    h, w, c = feat.shape
    w_im = loc[..., 0] * w - 0.5
    h_im = loc[..., 1] * h - 0.5
    h0 = jnp.floor(h_im)
    w0 = jnp.floor(w_im)
    lh = h_im - h0
    lw = w_im - w0
    h0 = h0.astype(jnp.int32)
    w0 = w0.astype(jnp.int32)

    def corner(hi, wi):
        valid = (hi >= 0) & (hi <= h - 1) & (wi >= 0) & (wi <= w - 1)
        v = feat[jnp.clip(hi, 0, h - 1), jnp.clip(wi, 0, w - 1)]
        return v * valid[..., None]

    v00 = corner(h0, w0)
    v01 = corner(h0, w0 + 1)
    v10 = corner(h0 + 1, w0)
    v11 = corner(h0 + 1, w0 + 1)
    hh, hw = 1.0 - lh, 1.0 - lw
    return (v00 * (hh * hw)[..., None] + v01 * (hh * lw)[..., None]
            + v10 * (lh * hw)[..., None] + v11 * (lh * lw)[..., None])


def pack_feature_maps(feature_maps: Sequence[jax.Array]):
    """Column-pack multi-level camera features into one flat row table.

    The reference packs once per forward and feeds every decoder layer's
    DAF call (ops/deformable_aggregation.py:80-117 feature_maps_format).
    Pack ONCE outside the op-order loop: the concat moves ~130 MB of
    bf16 rows, and rebuilding it inside each of the 4 deformable ops
    costs ~12 ms/call on v5e (XLA does not CSE it across remat
    boundaries).

    Returns (flat [B, cams * sum(H*W), C], shapes [(H_l, W_l), ...]).
    """
    b, num_cams = feature_maps[0].shape[:2]
    c = feature_maps[0].shape[-1]
    shapes = tuple((f.shape[2], f.shape[3]) for f in feature_maps)
    total = sum(h * w for h, w in shapes)
    flat = jnp.concatenate(
        [f.reshape(b, num_cams, -1, c) for f in feature_maps], axis=2)
    return flat.reshape(b, num_cams * total, c), shapes


def deformable_aggregation(feature_maps,
                           points_2d: jax.Array,
                           weights: jax.Array,
                           num_groups: int):
    """Fused multi-cam multi-scale sampling + weighted group aggregation.

    Args:
      feature_maps: list over levels of [B, num_cams, H_l, W_l, C], or a
                    prepacked ``pack_feature_maps`` result (preferred when
                    several ops share the same maps).
      points_2d:    [B, Q, num_cams, 2] normalized (w, h) locations, where
                    Q = num_anchor * num_pts.
      weights:      [B, Q, num_cams, num_levels, num_groups].
      num_groups:   G such that C % G == 0.

    Returns [B, Q, C] float32 aggregated features
    (matches DAF.apply output reshaped, ops/deformable_aggregation.py:7-75).
    """
    b, q, num_cams, _ = points_2d.shape

    if isinstance(feature_maps, tuple) and len(feature_maps) == 2 and \
            isinstance(feature_maps[1], tuple):
        flat, shapes = feature_maps
    else:
        flat, shapes = pack_feature_maps(feature_maps)
    num_levels = len(shapes)
    c = flat.shape[-1]
    gdim = c // num_groups
    dtype = flat.dtype

    inside = ((points_2d[..., 0] > 0.0) & (points_2d[..., 0] < 1.0)
              & (points_2d[..., 1] > 0.0) & (points_2d[..., 1] < 1.0))

    sizes = [h * w for h, w in shapes]
    level_start = [0]
    for s in sizes[:-1]:
        level_start.append(level_start[-1] + s)
    total = sum(sizes)

    # ---- per-(level, corner) indices and lerp weights, all fused
    idx_parts = []
    w_parts = []
    cam_base = (jnp.arange(num_cams, dtype=jnp.int32) * total)[None, None, :]
    for lvl, (h, w) in enumerate(shapes):
        w_im = points_2d[..., 0] * w - 0.5
        h_im = points_2d[..., 1] * h - 0.5
        h0 = jnp.floor(h_im)
        w0 = jnp.floor(w_im)
        lh = h_im - h0
        lw = w_im - w0
        h0 = h0.astype(jnp.int32)
        w0 = w0.astype(jnp.int32)
        hs = jnp.stack([h0, h0, h0 + 1, h0 + 1], axis=-1)
        ws = jnp.stack([w0, w0 + 1, w0, w0 + 1], axis=-1)
        cw = jnp.stack([(1 - lh) * (1 - lw), (1 - lh) * lw,
                        lh * (1 - lw), lh * lw], axis=-1)
        valid = ((hs >= 0) & (hs <= h - 1) & (ws >= 0) & (ws <= w - 1)
                 & inside[..., None])
        cw = cw * valid
        rows = (jnp.clip(hs, 0, h - 1) * w + jnp.clip(ws, 0, w - 1)
                + level_start[lvl] + cam_base[..., None])
        idx_parts.append(rows)          # [B, Q, cams, 4]
        w_parts.append(cw)

    idx = jnp.stack(idx_parts, axis=3)   # [B, Q, cams, lvls, 4]
    cw = jnp.stack(w_parts, axis=3)      # [B, Q, cams, lvls, 4]

    kl = num_cams * num_levels
    kl4 = kl * 4

    # Fold the bilinear corner weights and the per-group attention into
    # ONE combined weight table before the gather loop, so the gathered
    # rows are consumed by a fused multiply-reduce (the original two-einsum
    # form materialized a ~550 MB fp32 intermediate per call). Layout
    # [B, G, Q, kl4]: the reduced axis kl4 sits in lanes, and the gathered
    # rows are consumed per group-slice of their natural 128-lane layout —
    # storing w2 as [.., kl4, G] makes XLA relayout-copy the full gathered
    # block instead (~5.7 ms/call), and G-minor lane-pads 32x.
    dtype = flat.dtype
    w2 = jnp.einsum("bqkr,bqkg->bgqkr", cw.reshape(b, q, kl, 4),
                    weights.reshape(b, q, kl, num_groups)).reshape(
        b, num_groups, q, kl4).astype(dtype)
    idx_flat = idx.reshape(b, q, kl4)

    # Gather in ~250k-row chunks via lax.scan: XLA's TPU gather degrades
    # badly above ~1M rows per op (53 ms vs 15 ms for the same 4.3M rows
    # chunked, measured on v5e), and a scan with small carried state beats
    # the old lax.map whose xs/carry churned ~0.8 GB per call.
    chunk = 2800
    q_pad = -(-q // chunk) * chunk
    nq = q_pad // chunk

    def pad_axis(x, axis):
        if x.shape[axis] == q_pad:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, q_pad - q)
        return jnp.pad(x, widths)

    idx_c = pad_axis(idx_flat, 1).reshape(b, nq, chunk, kl4)
    w2_c = jnp.moveaxis(
        pad_axis(w2, 2).reshape(b, num_groups, nq, chunk, kl4), 2, 1)

    @jax.checkpoint
    def chunk_fn(flat_b, ic, wc):
        # g stays in its natural [rows, 128] lane layout; each group reads
        # a 32-lane slice, with only the small wc slice broadcast-relaid.
        g = flat_b[ic.reshape(-1)].reshape(chunk, kl4, c)
        parts = [
            jnp.sum(g[:, :, gi * gdim:(gi + 1) * gdim]
                    * wc[gi][:, :, None], axis=1, dtype=jnp.float32)
            for gi in range(num_groups)
        ]
        return jnp.concatenate(parts, axis=-1)

    def one_batch(flat_b, idx_b, w2_b):
        def body(carry, xs):
            ic, wc = xs
            return carry, chunk_fn(flat_b, ic, wc)
        _, outs = jax.lax.scan(body, 0, (idx_b, w2_b))
        return outs.reshape(q_pad, c)[:q]

    out = jnp.stack([one_batch(flat[bi], idx_c[bi], w2_c[bi])
                     for bi in range(b)])
    return out


# ---------------------------------------------------------------------------
# Fused Pallas path (ops/pallas/deformable_kernel.py): anchors sorted per
# camera by projected x so windowed MXU sampling replaces the row gather.
# ---------------------------------------------------------------------------

_BIGKEY = 1 << 20


def _fused_chunk_geometry(num_pts: int):
    """Pick the anchors-per-chunk so S = a_chunk * num_pts is a sublane
    multiple (8) and stays in the MXU sweet spot."""
    best = None
    for a in range(1, 513):
        s = a * num_pts
        if s > 320:
            break
        if s % 8 == 0:
            best = a
    return best


def _pad8(x):
    return -(-x // 8) * 8


def _window_widths(shapes):
    """Window x-widths per level: narrow for the big levels (the sorted
    chunks are x-compact), the full (tile-padded) level for the small
    ones. All widths are sublane multiples — Mosaic requires DMA slice
    widths aligned to the tiling. 40/24 rather than 32/16: the extra
    margin cuts the spill rate ~3x (4.6% → ~1.5% at flagship density)
    for ~0.5 ms more matmul work per call — cleanup gathers are the
    more expensive side of that trade."""
    return (min(40, _pad8(shapes[0][1])), min(24, _pad8(shapes[1][1])),
            _pad8(shapes[2][1]), _pad8(shapes[3][1]))


def deformable_aggregation_fused(feature_maps, points_2d, weights,
                                 num_groups: int, num_pts: int, *,
                                 spill_budget: int = 8192,
                                 interpret: bool = False):
    """Fused deformable aggregation; returns ANCHOR-level features.

    Args match :func:`deformable_aggregation` except ``feature_maps`` must
    be the raw per-level list ([B, cams, H_l, W_l, C] each) and the
    key-point dimension is reduced here (the caller's
    ``reshape(b, p, pts, C).sum(2)`` is fused into the kernel).

    Returns [B, P, C] float32, P = Q // num_pts.

    Pairs whose bilinear corners escape a chunk's static window are
    zero-weighted in the kernel and recomputed exactly by a small gather
    (``spill_budget`` pairs; beyond that they are dropped — use
    :func:`deformable_fused_spill_stats` to validate a config's rate).
    """
    b, q, cams = points_2d.shape[:3]
    p = q // num_pts
    pts_cm = jnp.moveaxis(points_2d, 2, 1)          # [B, C, Q, 2]
    w_cm = jnp.moveaxis(weights.reshape(b, q, cams, -1), 2, 1)
    return deformable_aggregation_fused_cm(
        feature_maps,
        (pts_cm[..., 0].reshape(b, cams, p, num_pts),
         pts_cm[..., 1].reshape(b, cams, p, num_pts)),
        w_cm.reshape(b, cams, p, num_pts * w_cm.shape[-1]),
        num_groups, num_pts, spill_budget=spill_budget,
        interpret=interpret)


def prepack_feature_maps_cm(feature_maps):
    """One-time prep of the per-level maps for the fused TPU kernel:
    pad W to a sublane multiple (so full-level windows DMA cleanly) and
    cast to bf16. The encoder calls this ONCE per forward — the padded
    265 MB stride-4 level would otherwise be rebuilt by each of the 4
    deformable ops (the reference likewise hoists feature_maps_format,
    ops/deformable_aggregation.py:80-117)."""
    padded = tuple(
        jnp.pad(f, ((0, 0), (0, 0), (0, 0),
                    (0, _pad8(f.shape[3]) - f.shape[3]), (0, 0))
                ).astype(jnp.bfloat16)
        for f in feature_maps)
    shapes = tuple((f.shape[2], f.shape[3]) for f in feature_maps)
    return ("cm_prepacked", padded, shapes)


def deformable_aggregation_fused_cm(feature_maps, points_cm, weights_cm,
                                    num_groups: int, num_pts: int, *,
                                    spill_budget: int = 8192,
                                    return_spill_count: bool = False,
                                    interpret: bool = False):
    """Camera-major fused deformable aggregation.

    feature_maps: raw per-level list ([B, cams, H_l, W_l, C] each) or a
    :func:`prepack_feature_maps_cm` result.
    points_cm: an SoA tuple (u, v), each [B, cams, P, num_pts]
    (pair-row layout — the shape the SoA projection produces; keeping
    num_pts on lanes avoids the [Q]↔[P, K] relayouts);
    weights_cm: [B, cams, P, num_pts*L*G] with per-pair lanes in
    (K, L, G) order (i.e. pair k occupies lanes [k*16, (k+1)*16) in
    (L, G) order).

    The kernel's pair rows hard-code 16 weight lanes per pair and a
    g=4 group split of the feature channels: only num_groups == 4 with
    num_levels == 4 is supported (all reference configs use 4/4).
    """
    from .pallas.deformable_kernel import (deformable_fused_fwd,
                                           deformable_fused_bwd)
    assert num_groups == 4, (
        "fused deformable kernel supports num_groups=4 only "
        f"(got {num_groups}); use backend='xla' otherwise")
    if (isinstance(feature_maps, tuple) and len(feature_maps) == 3
            and feature_maps[0] == "cm_prepacked"):
        _, padded, shapes = feature_maps
    else:
        assert len(feature_maps) == 4
        _, padded, shapes = prepack_feature_maps_cm(feature_maps)
    b, cams = padded[0].shape[:2]
    c_dim = padded[0].shape[-1]
    wx = _window_widths(shapes)
    a_chunk = _fused_chunk_geometry(num_pts)
    u_all, v_all = points_cm
    assert u_all.ndim == 4, u_all.shape  # [B, cams, P, num_pts]
    p = u_all.shape[2]
    lg = 4 * num_groups                  # num_levels * num_groups
    assert weights_cm.shape[-1] == num_pts * lg, weights_cm.shape

    outs = []
    spills = []
    for bi in range(b):
        feats = tuple(f[bi] for f in padded)
        out_b, n_spill = _fused_single(
            feats, (u_all[bi], v_all[bi]), weights_cm[bi], shapes, wx,
            num_pts, a_chunk, p, cams, c_dim, spill_budget,
            deformable_fused_fwd, deformable_fused_bwd, interpret)
        outs.append(out_b)
        spills.append(n_spill)
    out = jnp.stack(outs)
    if return_spill_count:
        return out, jnp.stack(spills)
    return out


def _fused_single(feats, points_cm, weights_cm, shapes, wx, num_pts,
                  a_chunk, p, cams, c_dim, spill_budget, fwd_fn, bwd_fn,
                  interpret):
    """One batch element. points_cm: (u, v) each [cams, P, num_pts];
    weights_cm [cams, P, num_pts*L*G] in (K, L, G) lane order."""
    u, v = points_cm                              # [cams, P, K] each
    p_pad = -(-p // a_chunk) * a_chunk
    qp = p_pad * num_pts
    nchunk = p_pad // a_chunk
    s_len = a_chunk * num_pts
    inside = ((u > 0.0) & (u < 1.0) & (v > 0.0) & (v < 1.0))
    h0, w0 = shapes[0]
    x0_l0 = jnp.floor(u * w0 - 0.5).astype(jnp.int32)
    pair_key = jnp.where(inside, x0_l0, _BIGKEY)
    anchor_key = pair_key.min(-1)                 # [cams, P]
    anchor_key = jnp.pad(anchor_key, ((0, 0), (0, p_pad - p)),
                         constant_values=_BIGKEY)
    order = jnp.argsort(anchor_key, axis=-1)      # [cams, p_pad]
    pair_perm = (order[..., None] * num_pts
                 + jnp.arange(num_pts, dtype=order.dtype)).reshape(
        cams, qp)

    # ONE packed row gather for ALL per-pair data (u, v, inside,
    # 16 weights), permuted at ANCHOR granularity: TPU gathers are
    # row-descriptor-bound, so gathering [cams, p_pad] rows of
    # num_pts*20 floats costs ~num_pts times less than the same bytes
    # as pair rows (measured 2.9 -> 0.7 ms per call at flagship size).
    # Pair k occupies lanes [32k, 32k+32): u, v, inside, 0, 16 weights,
    # 12 pad — the gathered table doubles as the kernel's pairdat block.
    # The lane interleave is FOUR one-hot MXU matmuls (inputs stay
    # lane-major [.., P, K]/[.., P, 16K]; output lanes land directly in
    # (k, slot) order) instead of a 6*num_pts-slice concat — the concat
    # relayout-copied every slice (~5.4 ms/frame traced at flagship
    # size, docs/PERF.md round-4 notes); the matmuls are a few GFLOP.
    # HIGHEST precision: the pack must be an EXACT copy — u/v feed
    # f32 floor/frac chains and the kernel-side spill gate.
    ins_f = inside.astype(u.dtype)

    def _lane_oh(src_lanes, dst_of):
        m = np.zeros((src_lanes, 32 * num_pts), np.float32)
        for s_ in range(src_lanes):
            m[s_, dst_of(s_)] = 1.0
        return jnp.asarray(m)

    oh_u = _lane_oh(num_pts, lambda k: 32 * k)
    oh_v = _lane_oh(num_pts, lambda k: 32 * k + 1)
    oh_i = _lane_oh(num_pts, lambda k: 32 * k + 2)
    oh_w = _lane_oh(16 * num_pts, lambda j: 32 * (j // 16) + 4 + j % 16)
    dot = functools.partial(
        jax.lax.dot_general, dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    packed = (dot(u, oh_u) + dot(v, oh_v) + dot(ins_f, oh_i)
              + dot(weights_cm, oh_w))            # [cams, P, 32*K]
    packed = jnp.pad(packed, ((0, 0), (0, p_pad - p), (0, 0)))
    # materialize before gathering: without the barrier XLA fuses the
    # interleave chain above INTO the gather's fused computation and
    # re-evaluates it per gathered element (~9 ms/frame vs 0.33 ms for
    # the plain row gather at flagship size)
    packed = jax.lax.optimization_barrier(packed)
    # padded anchors carry u = 0 → outside, inside-flag col = 0
    packed_s = jnp.take_along_axis(
        packed, order[..., None], axis=1).reshape(cams, qp, 32)
    u_s = packed_s[..., 0]
    ins_s = packed_s[..., 2] > 0.5

    # per-chunk window starts + spill detection for the windowed levels
    spill = jnp.zeros_like(ins_s)
    xs_cols = []
    for l in range(2):
        hl, wl = shapes[l]
        x0l = jnp.floor(u_s * wl - 0.5).astype(jnp.int32)
        keyl = jnp.where(ins_s, x0l, _BIGKEY)
        mins = keyl.reshape(cams, nchunk, s_len).min(-1)
        # align down to the sublane tiling: Mosaic requires the dynamic
        # DMA start on the W dimension to be divisible by 8
        xs = (jnp.clip(mins, 0, wl - wx[l]) // 8) * 8  # [cams, nchunk]
        xs_b = jnp.repeat(xs, s_len, axis=1)
        # spill when the rightmost IN-IMAGE corner escapes the window
        # (x0+1 may be right of the image with x0 still in it)
        spill_l = (ins_s
                   & (jnp.minimum(x0l + 1, wl - 1) > xs_b + wx[l] - 1))
        spill = spill | spill_l
        xs_cols.append(xs)
    # The reference op contributes only strictly-inside samples
    # (deformable_aggregation_cuda.cu:166); that gate and the spill
    # gate are recomputed IN-KERNEL from u, v and xs (`_pair_gate` —
    # bit-identical f32 chains), so the kernel's per-pair input is the
    # gathered `packed_s` table itself, lane-padded to 32 — no separate
    # uvq / gated-weight tables (each cost a full lane-padded rewrite,
    # ~3 ms/call of pure data movement at flagship size). The `spill`
    # flags computed above still route the cleanup gather.
    valid_chunk = ins_s.reshape(cams, nchunk, s_len).any(-1)
    cam_ids = jnp.broadcast_to(
        jnp.arange(cams, dtype=jnp.int32)[:, None], (cams, nchunk))
    starts = jnp.stack(
        [cam_ids, valid_chunk.astype(jnp.int32),
         xs_cols[0] // 8, xs_cols[1] // 8]
        + [jnp.zeros_like(cam_ids)] * 4, axis=-1).reshape(
        cams * nchunk, 8)

    pairdat = packed_s.reshape(cams * nchunk, s_len, 32)

    @jax.custom_vjp
    def op(feats, pairdat):
        return fwd_fn(feats, pairdat, starts, shapes=shapes, wx=wx,
                      num_pts=num_pts, a_chunk=a_chunk,
                      interpret=interpret)

    def op_fwd(feats, pairdat):
        return op(feats, pairdat), (feats, pairdat)

    def op_bwd(res, g):
        feats, pairdat = res
        gf, gpair = bwd_fn(feats, pairdat, starts, g, shapes=shapes,
                           wx=wx, num_pts=num_pts, a_chunk=a_chunk,
                           interpret=interpret)
        return (tuple(gf[l].astype(feats[l].dtype) for l in range(4)),
                gpair)

    op.defvjp(op_fwd, op_bwd)
    out_chunks = op(feats, pairdat)               # [cams*nchunk, A, C]

    # unsort (anchor level) + camera sum
    out_sorted = out_chunks.reshape(cams, p_pad, c_dim)
    inv = jnp.zeros_like(order).at[
        jnp.arange(cams)[:, None], order].set(
        jnp.broadcast_to(jnp.arange(p_pad, dtype=order.dtype),
                         (cams, p_pad)))
    out = jnp.take_along_axis(out_sorted, inv[:, :p, None],
                              axis=1).sum(0)      # [P, C]

    # exact spill cleanup: compact spilled pairs to a static budget and
    # recompute their contribution with the reference bilinear gather
    out = out + _spill_cleanup(
        feats, packed_s, spill, pair_perm, shapes, num_pts, p,
        c_dim, cams, qp, spill_budget)
    # spill accounting: pairs beyond spill_budget are DROPPED (silent
    # attention-mass loss); callers sow/check this count against the
    # budget (same failure class as the DCN offset margin)
    n_spill = spill.sum(dtype=jnp.int32)
    return out, n_spill


def _spill_cleanup(feats, packed_s, spill, pair_perm, shapes,
                   num_pts, p, c_dim, cams, qp, budget):
    """Exact contribution of window-spilled pairs, scatter-added at the
    anchor level (bilinear math identical to the reference kernel)."""
    g = 4
    gd = c_dim // g
    sp = spill.reshape(-1)
    qtot = sp.shape[0]
    # blocked prefix sum: XLA's 1-D cumsum over ~270k elements runs at
    # ~1.2 ms on v5e; the [rows, 512] row-scan + tiny row-offset scan
    # form vectorizes across sublanes
    blk = 512
    qt_pad = -(-qtot // blk) * blk
    nblk = qt_pad // blk
    spi = jnp.pad(sp.astype(jnp.int32), (0, qt_pad - qtot)).reshape(
        -1, blk)
    row = jnp.cumsum(spi, axis=1)
    offs = jnp.cumsum(row[:, -1]) - row[:, -1]
    # compact via a TWO-LEVEL first-reach search on the blocked cumsum
    # (slot i = first row where the inclusive count reaches i+1). A flat
    # jnp.searchsorted over the 270k-row cumsum lowers to ~19 serialized
    # gather rounds (~2.2 ms/call traced); the blocked form is two dense
    # compare-counts ([budget, nblk] and [budget, blk]) plus one 512-int
    # row gather — all full-lane VPU passes.
    tgt = jnp.arange(1, budget + 1, dtype=jnp.int32)       # [budget]
    ends = offs + row[:, -1]                               # block ends
    blk_of = jnp.sum((ends[None, :] < tgt[:, None]).astype(jnp.int32),
                     axis=1)
    blk_of = jnp.minimum(blk_of, nblk - 1)
    loc_t = tgt - offs[blk_of]                             # local target
    rows_blk = row[blk_of]                                 # [budget, blk]
    j = jnp.sum((rows_blk < loc_t[:, None]).astype(jnp.int32), axis=1)
    flat_idx = blk_of * blk + jnp.minimum(j, blk - 1)
    # slots past the last spilled row: clamp explicitly rather than
    # leaning on JAX's gather-clamp downstream; `used` zeroes them
    flat_idx = jnp.minimum(flat_idx, qtot - 1)
    n_spill = ends[-1]
    used = (jnp.arange(budget) < jnp.minimum(n_spill, budget))
    # one row gather from the 32-col pair table (u, v, -, -, w16, pad)
    rows = packed_s.reshape(-1, packed_s.shape[-1])[flat_idx]
    su = rows[:, 0]
    sv = rows[:, 1]
    sw = rows[:, 4:20]
    cam_of = (flat_idx // qp).astype(jnp.int32)

    contrib = jnp.zeros((budget, c_dim), jnp.float32)
    for l, (hl, wl) in enumerate(shapes):
        wp = feats[l].shape[2]                    # padded width
        flat = feats[l].reshape(cams * hl * wp, c_dim)
        x_im = su * wl - 0.5
        y_im = sv * hl - 0.5
        x0 = jnp.floor(x_im)
        y0 = jnp.floor(y_im)
        fx = x_im - x0
        fy = y_im - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        sample = jnp.zeros((budget, c_dim), jnp.float32)
        for dy in (0, 1):
            for dx in (0, 1):
                cy = y0 + dy
                cx = x0 + dx
                ok = ((cy >= 0) & (cy <= hl - 1)
                      & (cx >= 0) & (cx <= wl - 1))
                wgt = ((fy if dy else 1.0 - fy)
                       * (fx if dx else 1.0 - fx) * ok)
                idx = (cam_of * (hl * wp)
                       + jnp.clip(cy, 0, hl - 1) * wp
                       + jnp.clip(cx, 0, wl - 1))
                sample = sample + flat[idx].astype(jnp.float32) \
                    * wgt[:, None]
        wl4 = sw[:, 4 * l:4 * l + 4]              # [budget, G]
        contrib = contrib + (sample.reshape(budget, g, gd)
                             * wl4[:, :, None]).reshape(budget, c_dim)
    contrib = contrib * used[:, None]

    orig_pair = pair_perm.reshape(-1)[flat_idx]   # within-cam pair index
    anchor_idx = orig_pair // num_pts
    # scatter-add as a one-hot MXU matmul: XLA's TPU scatter serializes
    # the `budget` row updates (~5 ms/frame at budget=8192); the
    # [budget, P] one-hot contraction is ~0.3 ms of matmul + compares.
    # `used` already zeroes dead rows, so clamp their target to row 0.
    tgt = jnp.where(used, jnp.minimum(anchor_idx, p - 1), 0)
    onehot = (tgt[:, None]
              == jnp.arange(p, dtype=tgt.dtype)[None, :])
    return jax.lax.dot_general(
        onehot.astype(jnp.float32), contrib,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def deformable_fused_spill_stats(points_2d, num_pts: int, shapes,
                                 budget: int = 4096):
    """Host-side spill-rate diagnostic for the fused path: fraction of
    valid pairs whose corners escape the static windows (those are exact
    up to ``budget``, dropped beyond it). Log this when validating a new
    config, like ops.splat.splat_pruning_stats."""
    import numpy as np
    pts = np.asarray(points_2d)
    b, q, cams, _ = pts.shape
    p = q // num_pts
    wx = _window_widths(shapes)
    a_chunk = _fused_chunk_geometry(num_pts)
    p_pad = -(-p // a_chunk) * a_chunk
    total_spill = 0
    total_valid = 0
    for bi in range(b):
        u = pts[bi, :, :, 0].T
        v = pts[bi, :, :, 1].T
        inside = (u > 0) & (u < 1) & (v > 0) & (v < 1)
        h0, w0 = shapes[0]
        key = np.where(inside, np.floor(u * w0 - 0.5).astype(np.int64),
                       _BIGKEY)
        akey = key.reshape(cams, p, num_pts).min(-1)
        akey = np.pad(akey, ((0, 0), (0, p_pad - p)),
                      constant_values=_BIGKEY)
        order = np.argsort(akey, axis=-1, kind="stable")
        perm = (order[..., None] * num_pts
                + np.arange(num_pts)).reshape(cams, -1)
        qp = p_pad * num_pts
        u_s = np.take_along_axis(
            np.pad(u, ((0, 0), (0, qp - q)), constant_values=2.0),
            perm, 1)
        ins_s = np.take_along_axis(
            np.pad(inside, ((0, 0), (0, qp - q))), perm, 1)
        s_len = a_chunk * num_pts
        spill = np.zeros_like(ins_s)
        for l in range(2):
            hl, wl = shapes[l]
            x0 = np.floor(u_s * wl - 0.5).astype(np.int64)
            keyl = np.where(ins_s, x0, _BIGKEY)
            mins = keyl.reshape(cams, -1, s_len).min(-1)
            xs = (np.clip(mins, 0, wl - wx[l]) // 8) * 8
            xs_b = np.repeat(xs, s_len, axis=1)
            spill |= ins_s & (np.minimum(x0 + 1, wl - 1)
                              > xs_b + wx[l] - 1)
        total_spill += int(spill.sum())
        total_valid += int(ins_s.sum())
    return {"spilled_pairs": total_spill, "valid_pairs": total_valid,
            "fraction": total_spill / max(total_valid, 1),
            "budget": budget,
            "dropped": max(0, total_spill - budget * b)}
