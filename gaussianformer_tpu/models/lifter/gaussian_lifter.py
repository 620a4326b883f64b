"""GaussianLifter (v1): a learnable bank of anchor Gaussians.

Parity with reference model/lifter/gaussian_lifter.py:30-87: anchors are
initialized uniform-random in the unit cube (inverse-sigmoid-ed), scales
likewise, identity quaternion, opacity 0.5; instance features zero.
Freezing (anchor_grad / feat_grad) is handled by the optimizer partition.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.safe_ops import safe_inverse_sigmoid


def _init_anchor(key, num_anchor, semantic_dim, include_opa):
    k_xyz, k_scale, k_sem = jax.random.split(key, 3)
    xyz = safe_inverse_sigmoid(
        jax.random.uniform(k_xyz, (num_anchor, 3), jnp.float32))
    scale = safe_inverse_sigmoid(
        jax.random.uniform(k_scale, (num_anchor, 3), jnp.float32))
    rots = jnp.zeros((num_anchor, 4), jnp.float32).at[:, 0].set(1.0)
    parts = [xyz, scale, rots]
    if include_opa:
        parts.append(safe_inverse_sigmoid(
            0.5 * jnp.ones((num_anchor, 1), jnp.float32)))
    if semantic_dim > 0:
        parts.append(jax.random.normal(
            k_sem, (num_anchor, semantic_dim), jnp.float32))
    return jnp.concatenate(parts, axis=-1)


class GaussianLifter(nn.Module):
    num_anchor: int
    embed_dims: int = 128
    semantic_dim: int = 17
    include_opa: bool = True
    pts_init: bool = False   # xyz from lidar anchor points instead of bank

    @nn.compact
    def __call__(self, batch_size: int, anchor_points=None):
        """anchor_points: [B, num_anchor, 3] normalized lidar anchors,
        required when pts_init (reference gaussian_lifter.py:76-82)."""
        anchor = self.param(
            "anchor",
            lambda key: _init_anchor(key, self.num_anchor,
                                     self.semantic_dim, self.include_opa))
        instance_feature = self.param(
            "instance_feature", nn.initializers.zeros,
            (self.num_anchor, self.embed_dims))
        if self.pts_init:
            assert anchor_points is not None, "pts_init needs anchor_points"
            xyz = safe_inverse_sigmoid(anchor_points)
            rest = jnp.broadcast_to(
                anchor[None, :, 3:],
                (batch_size, self.num_anchor, anchor.shape[-1] - 3))
            rep = jnp.concatenate([xyz, rest], axis=-1)
        else:
            rep = jnp.broadcast_to(
                anchor[None], (batch_size,) + anchor.shape)
        return {
            "representation": rep,
            "rep_features": jnp.broadcast_to(
                instance_feature[None],
                (batch_size,) + instance_feature.shape),
        }
