"""Pixel-aligned initializer backbone: ResNet + SECONDFPN
(reference model/lifter/gaussian_initializer/resnet_secondfpn.py:9-37)."""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn

from ..backbone.resnet import ResNet
from ..neck.second_fpn import SECONDFPN


class ResNetSecondFPN(nn.Module):
    depth: int = 101
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    stage_with_dcn: Tuple[bool, bool, bool, bool] = (False, False, True,
                                                    True)
    style: str = "caffe"
    with_cp: bool = True
    base_channels: int = 64
    out_channels: Tuple[int, ...] = (128, 128, 128, 128)
    upsample_strides: Tuple[float, ...] = (0.5, 1, 2, 4)
    dtype: str = "float32"
    fuse_dcn_epilogue: bool = False
    dcn_win: int = 24

    @nn.compact
    def __call__(self, imgs):
        """imgs: [B*N, H, W, 3] → [B*N, H/8, W/8, sum(out_channels)]."""
        import jax.numpy as jnp
        dt = jnp.dtype(self.dtype)
        feats = ResNet(
            depth=self.depth, out_indices=self.out_indices,
            style=self.style, stage_with_dcn=self.stage_with_dcn,
            with_cp=self.with_cp, base_channels=self.base_channels,
            dtype=dt, fuse_dcn_epilogue=self.fuse_dcn_epilogue,
            dcn_win=self.dcn_win,
            name="img_backbone")(imgs)
        out = SECONDFPN(
            out_channels=self.out_channels,
            upsample_strides=self.upsample_strides, dtype=dt,
            name="img_neck")(feats)
        return out.astype(jnp.float32)
