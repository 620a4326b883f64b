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

from typing import Sequence

import jax
import jax.numpy as jnp


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
