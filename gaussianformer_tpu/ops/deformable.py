"""Multi-camera multi-scale deformable feature aggregation — TPU-native.

The reference's fused CUDA op (model/encoder/gaussian_encoder/ops/src/
deformable_aggregation_cuda.cu) bilinearly samples 6-camera x 4-level packed
feature columns at projected key points and accumulates with per-group
weights. On TPU we express the same computation as vectorized XLA gathers +
einsums over static shapes; XLA fuses the lerp math, and autodiff provides
the exact backward (matching the CUDA atomicAdd backward math).

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
    """Bilinear sample with zero padding.

    feat: [H, W, C] feature map.
    loc:  [..., 2] normalized (w, h) in [0, 1].
    Returns [..., C].
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
        hi_c = jnp.clip(hi, 0, h - 1)
        wi_c = jnp.clip(wi, 0, w - 1)
        v = feat[hi_c, wi_c]  # [..., C]
        return v * valid[..., None]

    v00 = corner(h0, w0)
    v01 = corner(h0, w0 + 1)
    v10 = corner(h0 + 1, w0)
    v11 = corner(h0 + 1, w0 + 1)
    hh, hw = 1.0 - lh, 1.0 - lw
    return (v00 * (hh * hw)[..., None] + v01 * (hh * lw)[..., None]
            + v10 * (lh * hw)[..., None] + v11 * (lh * lw)[..., None])


def deformable_aggregation(feature_maps: Sequence[jax.Array],
                           points_2d: jax.Array,
                           weights: jax.Array,
                           num_groups: int):
    """Fused multi-cam multi-scale sampling + weighted group aggregation.

    Args:
      feature_maps: list over levels of [B, num_cams, H_l, W_l, C].
      points_2d:    [B, Q, num_cams, 2] normalized (w, h) locations, where
                    Q = num_anchor * num_pts.
      weights:      [B, Q, num_cams, num_levels, num_groups].
      num_groups:   G such that C % G == 0.

    Returns [B, Q, C] aggregated features
    (matches DAF.apply output reshaped, ops/deformable_aggregation.py:7-75).
    """
    b, q, num_cams, _ = points_2d.shape
    c = feature_maps[0].shape[-1]
    gdim = c // num_groups

    inside = ((points_2d[..., 0] > 0.0) & (points_2d[..., 0] < 1.0)
              & (points_2d[..., 1] > 0.0) & (points_2d[..., 1] < 1.0))

    out = jnp.zeros((b, q, c), dtype=jnp.float32)
    for lvl, feat in enumerate(feature_maps):
        # sample: vmap over batch and cams
        sample = jax.vmap(jax.vmap(bilinear_sample_nchw, in_axes=(0, 0)),
                          in_axes=(0, 0))
        # feat: [B, N_cam, H, W, C]; loc per cam: [B, N_cam, Q, 2]
        loc = jnp.swapaxes(points_2d, 1, 2)  # [B, cams, Q, 2]
        vals = sample(feat, loc)  # [B, cams, Q, C]
        vals = jnp.swapaxes(vals, 1, 2)  # [B, Q, cams, C]
        vals = vals * inside[..., None].astype(vals.dtype)
        w_l = weights[:, :, :, lvl, :]  # [B, Q, cams, G]
        vals = vals.reshape(b, q, num_cams, num_groups, gdim)
        out = out + jnp.einsum(
            "bqkgd,bqkg->bqgd", vals.astype(jnp.float32),
            w_l.astype(jnp.float32)).reshape(b, q, c)
    return out
