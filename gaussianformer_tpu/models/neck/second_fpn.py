"""SECOND-style FPN (capability parity with mmdet3d SECONDFPN as configured
by the reference initializer: config/prob/nuscenes_gs6400.py:141-146 —
in [256, 512, 1024, 2048] → 4 x 128 channels, upsample_strides
[0.5, 1, 2, 4], outputs concatenated to one 512-channel map at stride 8).

A fractional stride (0.5) becomes a strided conv; integer strides become
transposed convs; each branch is conv → BN → ReLU. BN runs with stored
statistics (the initializer is used frozen/pretrained in the reference's
shipped configs; see resnet.FrozenBatchNorm).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbone.resnet import FrozenBatchNorm


class SECONDFPN(nn.Module):
    out_channels: Tuple[int, ...] = (128, 128, 128, 128)
    upsample_strides: Tuple[float, ...] = (0.5, 1, 2, 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> jax.Array:
        outs = []
        for i, x in enumerate(inputs):
            stride = self.upsample_strides[i]
            ch = self.out_channels[i]
            if stride >= 1:
                s = int(stride)
                y = nn.ConvTranspose(ch, (s, s), strides=(s, s),
                                     use_bias=False, dtype=self.dtype,
                                     name=f"deblock_{i}_deconv")(x)
            else:
                s = int(round(1.0 / stride))
                y = nn.Conv(ch, (s, s), strides=(s, s), use_bias=False,
                            dtype=self.dtype,
                            name=f"deblock_{i}_conv")(x)
            y = FrozenBatchNorm(ch, epsilon=1e-3, name=f"deblock_{i}_bn")(y)
            y = nn.relu(y)
            outs.append(y)
        # with non-power-of-two inputs ceil-division strides can leave the
        # branches a pixel apart; crop to the common extent (production
        # shapes are exact multiples and this is a no-op)
        mh = min(o.shape[1] for o in outs)
        mw = min(o.shape[2] for o in outs)
        outs = [o[:, :mh, :mw] for o in outs]
        return jnp.concatenate(outs, axis=-1)
