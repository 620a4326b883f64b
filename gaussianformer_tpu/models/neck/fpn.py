"""Feature Pyramid Network (capability parity with mmdet FPN as configured
by the reference: config/_base_/model.py:32-40 + config/*:img_neck —
4 outputs, start_level=1, out_channels=128, add_extra_convs='on_output',
relu_before_extra_convs=True).

NHWC; nearest-neighbor top-down upsampling (mmdet default)."""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest(x, shape):
    b, h, w, c = x.shape
    th, tw = shape
    if th % h == 0 and tw % w == 0:
        # exact integer scale (the production case: pyramid levels are
        # powers of two) — a repeat, matching F.interpolate(scale_factor)
        return jnp.repeat(jnp.repeat(x, th // h, axis=1), tw // w, axis=2)
    iy = (jnp.arange(th) * h) // th
    ix = (jnp.arange(tw) * w) // tw
    return x[:, iy][:, :, ix]


class FPN(nn.Module):
    out_channels: int = 128
    num_outs: int = 4
    start_level: int = 1
    add_extra_convs: str = "on_output"
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> Tuple[jax.Array, ...]:
        used = list(inputs[self.start_level:])
        num_backbone = len(used)

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                    name=f"lateral_{i}")(x)
            for i, x in enumerate(used)
        ]
        for i in range(num_backbone - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest(
                laterals[i], laterals[i - 1].shape[1:3])

        outs = [
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"fpn_conv_{i}")(laterals[i])
            for i in range(num_backbone)
        ]

        if self.num_outs > len(outs):
            if self.add_extra_convs == "on_output":
                extra_src = outs[-1]
            else:
                extra_src = used[-1]
            for i in range(self.num_outs - num_backbone):
                src = extra_src if i == 0 else outs[-1]
                if self.relu_before_extra_convs and i > 0:
                    src = nn.relu(src)
                outs.append(
                    nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                            padding=1, dtype=self.dtype,
                            name=f"extra_conv_{i}")(src))
        return tuple(outs)
