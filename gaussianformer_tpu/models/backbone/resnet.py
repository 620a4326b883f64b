"""ResNet image backbone (caffe / pytorch styles, optional DCNv2 stages).

Capability parity with the mmseg ResNet used by the reference
(config/nuscenes_gs144000.py:80-92: ResNet-101, caffe style, BN frozen
[norm_eval + requires_grad=False], DCNv2 in stages 3-4, frozen_stages=1,
gradient checkpointing). TPU-native design notes:

  - NHWC layout throughout (TPU conv-friendly);
  - BatchNorm is evaluated with running statistics ("frozen BN"): the
    shipped reference configs never train BN (norm_eval=True), so the
    stats live in the ``batch_stats`` collection and are treated as
    constants. Parameter freezing (frozen_stages / lr_mult) is handled by
    the optimizer partition, not the module;
  - DCNv2 stages use :func:`gaussianformer_tpu.ops.dcn.deform_conv2d`;
  - per-stage ``jax.checkpoint`` (`with_cp`) to trade FLOPs for HBM.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.dcn import deform_conv2d

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    26: ("bottleneck", (1, 1, 1, 1)),   # tiny bottleneck (tests)
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def stem_conv_apply(x, kernel, dtype):
    """The ResNet stem (7x7, stride 2, pad 3, no bias) computed on a
    2x2 space-to-depth input.

    A direct C_in=3 conv runs at ~6 TF/s on TPU (the MXU contraction is
    3/128 occupied); re-indexing to a 4x4 stride-1 conv over 12-channel
    2x2-blocked input is bit-identical math at 4x the contraction depth
    and ~1/4 the taps. ``kernel`` keeps the reference [7,7,C,F] layout:
    out[y] = sum_ky in[2y+ky-3] W[ky] with ky = 2A+dy-1, A in 0..3,
    dy in {0,1}, so W2[A,B,(dy,dx,c)] = Wpad[2A+dy, 2B+dx, c] and the
    sliding window runs over s2d rows y-2..y+1 (asym padding (2,1))."""
    b, h, w, c = x.shape
    features = kernel.shape[-1]
    if h % 2 or w % 2:
        return jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype),
            (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # cast BEFORE the space-to-depth shuffle: the transpose is a real
    # relayout copy of the full image and costs half in bf16
    x = x.astype(dtype)
    x2 = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
    wp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = wp.reshape(4, 2, 4, 2, c, features).transpose(
        0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, features)
    return jax.lax.conv_general_dilated(
        x2.astype(dtype), w2.astype(dtype), (1, 1),
        [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class StemConv(nn.Module):
    """Flax wrapper over :func:`stem_conv_apply` (owns the [7,7,3,F]
    reference-layout parameter)."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, x.shape[-1], self.features))
        return stem_conv_apply(x, kernel, self.dtype)


class FrozenBatchNorm(nn.Module):
    """BN evaluated with stored running statistics.

    ``__call__(None)`` returns the affine coefficients ``(inv, shift)``
    instead of applying them — used to fold the BN into a preceding
    Pallas kernel's epilogue (same parameters/collections either way).
    """
    features: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x=None):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.features,)))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.features,)))
        inv = jax.lax.rsqrt(var.value + self.epsilon) * scale
        shift = bias - mean.value * inv
        if x is None:
            return inv, shift
        return x * inv.astype(x.dtype) + shift.astype(x.dtype)


class DeformConv2d(nn.Module):
    """Modulated deformable conv (DCNv2), deform_groups=1.

    backend "auto" uses the fused Pallas interpolation-matrix kernel on
    TPU whenever the shapes qualify (C_in % 128 == 0, map at least one
    window wide, stride 1) — ~4x faster than the XLA gather path on v5e —
    and falls back to the exact gather formulation otherwise."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    backend: str = "auto"
    # Pallas window size (multiple of 8, > tile+3). Samples beyond
    # ±(win-2*tile)/2 feature px of their tap are dropped — widen via
    # the config's ``dcn_win`` if utils.check_dcn_offset_margin flags a
    # checkpoint whose learned offsets exceed the margin.
    win: int = 24

    @nn.compact
    def __call__(self, x, epilogue=None):
        k = self.kernel
        pad = self.dilation * (k - 1) // 2
        # offset/mask conv — zero-init as in DCNv2
        om = nn.Conv(3 * k * k, (k, k), strides=(self.stride, self.stride),
                     padding=pad, kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     name="conv_offset")(x)
        offset, mask_logit = om[..., :2 * k * k], om[..., 2 * k * k:]
        mask = jax.nn.sigmoid(mask_logit)
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.features))

        win = self.win
        # Observability for the Pallas kernel's static window: samples
        # beyond ±(win - 2*tile)/2 px of their tap are dropped (value
        # AND gradient). Sown so a forward with
        # mutable=["intermediates"] (utils.check_dcn_offset_margin) can
        # verify a converted checkpoint / a training run stays inside
        # the representable window.
        self.sow("intermediates", "dcn_offset_max",
                 jnp.max(jnp.abs(offset.astype(jnp.float32))))
        use_pallas = (
            self.backend in ("auto", "pallas")
            and (jax.default_backend() != "cpu" or self.backend == "pallas")
            and k == 3 and self.stride == 1 and self.dilation == 1
            and x.shape[-1] % 128 == 0
            and x.shape[1] >= win and x.shape[2] >= win)
        if use_pallas:
            from ...ops.pallas.dcn_kernel import deform_conv2d_pallas
            return deform_conv2d_pallas(
                x, offset.astype(jnp.float32), mask.astype(jnp.float32),
                weight.astype(self.dtype), win=win, epilogue=epilogue)
        out = deform_conv2d(
            x, offset.astype(jnp.float32), mask.astype(jnp.float32),
            weight.astype(self.dtype), stride=self.stride, padding=pad,
            dilation=self.dilation)
        if epilogue is not None:
            inv, shift = epilogue
            out = nn.relu(out * inv.astype(out.dtype)
                          + shift.astype(out.dtype))
        return out


class Bottleneck(nn.Module):
    planes: int          # bottleneck width; out channels = planes * 4
    stride: int = 1
    dilation: int = 1
    style: str = "caffe"  # caffe: stride on 1x1; pytorch: stride on 3x3
    with_dcn: bool = False
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32
    fuse_dcn_epilogue: bool = False   # inference: bn2+relu inside the
                                      # Pallas DCN kernel (forward-only)
    dcn_win: int = 24

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride

        out = nn.Conv(self.planes, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)

        bn2 = FrozenBatchNorm(self.planes, name="bn2")
        if self.with_dcn and self.fuse_dcn_epilogue:
            out = DeformConv2d(self.planes, 3, stride=s2,
                               dilation=self.dilation, dtype=self.dtype,
                               win=self.dcn_win,
                               name="conv2")(out, epilogue=bn2(None))
        elif self.with_dcn:
            out = DeformConv2d(self.planes, 3, stride=s2,
                               dilation=self.dilation, dtype=self.dtype,
                               win=self.dcn_win,
                               name="conv2")(out)
            out = nn.relu(bn2(out))
        else:
            out = nn.Conv(self.planes, (3, 3), strides=(s2, s2),
                          padding=self.dilation,
                          kernel_dilation=(self.dilation, self.dilation),
                          use_bias=False, dtype=self.dtype,
                          name="conv2")(out)
            out = nn.relu(bn2(out))

        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBatchNorm(self.planes * 4, name="bn3")(out)

        if self.downsample:
            idn = nn.Conv(self.planes * 4, (1, 1),
                          strides=(self.stride, self.stride), use_bias=False,
                          dtype=self.dtype, name="downsample_conv")(x)
            idn = FrozenBatchNorm(self.planes * 4, name="downsample_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    style: str = "pytorch"
    with_dcn: bool = False
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=self.dilation,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        if self.downsample:
            idn = nn.Conv(self.planes, (1, 1),
                          strides=(self.stride, self.stride), use_bias=False,
                          dtype=self.dtype, name="downsample_conv")(x)
            idn = FrozenBatchNorm(self.planes, name="downsample_bn")(idn)
        else:
            idn = x
        return nn.relu(out + idn)


class ResNetStage(nn.Module):
    """One residual stage (a run of blocks). Factored out so `with_cp`
    can rematerialize at stage granularity: per-block remat still saves
    every block input (33 tensors for R101, >2GB at 6x864x1600), while
    stage remat saves only the 4 stage inputs."""
    block: str                 # "bottleneck" | "basic"
    planes: int
    num_blocks: int
    stride: int
    dilation: int = 1
    style: str = "caffe"
    with_dcn: bool = False
    dtype: jnp.dtype = jnp.float32
    fuse_dcn_epilogue: bool = False
    dcn_win: int = 24

    @nn.compact
    def __call__(self, x):
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        for j in range(self.num_blocks):
            blk_stride = self.stride if j == 0 else 1
            need_ds = j == 0 and (
                blk_stride != 1 or x.shape[-1] != self.planes * expansion)
            extra = ({"fuse_dcn_epilogue": self.fuse_dcn_epilogue,
                      "dcn_win": self.dcn_win}
                     if self.block == "bottleneck" else {})
            x = block_cls(
                planes=self.planes, stride=blk_stride,
                dilation=self.dilation, style=self.style,
                with_dcn=self.with_dcn, dtype=self.dtype,
                downsample=need_ds, name=f"layer_{j}", **extra)(x)
        return x


class ResNet(nn.Module):
    depth: int = 101
    num_stages: int = 4
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    strides: Tuple[int, ...] = (1, 2, 2, 2)
    dilations: Tuple[int, ...] = (1, 1, 1, 1)
    style: str = "caffe"
    stage_with_dcn: Tuple[bool, ...] = (False, False, False, False)
    base_channels: int = 64
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32
    # inference-only: fold bn2+relu into the Pallas DCN kernel epilogue
    # (forward-only path; the segmentor sets this when not training)
    fuse_dcn_epilogue: bool = False
    # Pallas DCN sampling window; widen (multiples of 8) when
    # utils.check_dcn_offset_margin reports out-of-margin offsets
    dcn_win: int = 24

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, 3] → tuple of stage outputs (NHWC).

        Compute runs in ``dtype`` (bf16 recommended on TPU); parameters and
        BN statistics stay float32."""
        x = x.astype(self.dtype)
        block_kind, stage_blocks = ARCH_SETTINGS[self.depth]
        stage_cls = ResNetStage
        if self.with_cp:
            # stage-level rematerialization (coarser than the reference's
            # per-block `with_cp` — fits grad training in 16GB HBM)
            stage_cls = nn.remat(ResNetStage)

        x = StemConv(self.base_channels, dtype=self.dtype,
                     name="conv1")(x)
        x = FrozenBatchNorm(self.base_channels, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = self.base_channels
        for i in range(self.num_stages):
            x = stage_cls(
                block=block_kind, planes=planes,
                num_blocks=stage_blocks[i], stride=self.strides[i],
                dilation=self.dilations[i], style=self.style,
                with_dcn=self.stage_with_dcn[i], dtype=self.dtype,
                fuse_dcn_epilogue=self.fuse_dcn_epilogue,
                dcn_win=self.dcn_win,
                name=f"stage{i + 1}")(x)
            if i in self.out_indices:
                outs.append(x)
            planes *= 2
        return tuple(outs)
