"""Shared small layers (reference: linear_relu_ln, mmcv Scale)."""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class LinearReluLn(nn.Module):
    """[Linear → ReLU] * in_loops followed by LayerNorm, repeated out_loops
    times (reference model/encoder/gaussian_encoder/utils.py:54-64)."""
    embed_dims: int
    in_loops: int = 1
    out_loops: int = 2
    input_dims: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(self.out_loops):
            for _ in range(self.in_loops):
                x = nn.Dense(self.embed_dims)(x)
                x = nn.relu(x)
            x = nn.LayerNorm(epsilon=1e-5)(x)
        return x


class ChannelScale(nn.Module):
    """Learnable per-channel scale, init 1.0 (mmcv.cnn.Scale)."""
    dim: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        return x * scale
