"""Tower-level torch ↔ JAX parity THROUGH THE CHECKPOINT CONVERTER.

VERDICT r3 item 3: the e2e parity harness (tests/test_torch_parity.py)
covers encoder+head; this file closes the tower hole. Both flagship
image towers are transcribed into plain torch with mmcv/mmdet-style
module naming — caffe-style bottleneck ResNet with DCNv2 stages
(reference mmseg ResNet config, /root/reference/config/nuscenes_gs144000.py:80-92),
FPN (mmdet conventions, config/_base_/model.py:32-40) and SECONDFPN
(mmdet3d, reference gaussian_initializer/resnet_secondfpn.py:9-37) — a
random torch state_dict is converted with utils/torch_convert and loaded
into the JAX modules, and the feature maps must match <= 1e-4.

The torch DCNv2 oracle reproduces mmcv ModulatedDeformConv2d semantics
(offset channels (dy, dx) interleaved, sigmoid mask, zero padding
outside the image) — the same convention ops/dcn.deform_conv2d follows.
"""
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from gaussianformer_tpu.models.backbone.resnet import ResNet
from gaussianformer_tpu.models.neck.fpn import FPN
from gaussianformer_tpu.models.lifter.initializer import ResNetSecondFPN
from gaussianformer_tpu.utils.torch_convert import (
    convert_backbone_and_neck, convert_initializer)

torch.manual_seed(0)

DEPTH = 26                      # tiny bottleneck arch (1 block/stage)
BASE = 8
DCN_STAGES = (False, False, True, True)
EMBED = 32
H_IMG, W_IMG = 64, 96


# ------------------------------------------------------------ torch DCNv2
def t_deform_conv2d(x, offset, mask, weight, stride=1, padding=1):
    """mmcv ModulatedDeformConv2d forward (NCHW, K=3).

    offset: [B, 18, Ho, Wo] with (dy, dx) interleaved per tap;
    mask: [B, 9, Ho, Wo] already sigmoid-ed; weight [Cout, Cin, 3, 3]."""
    b, c, h, w = x.shape
    cout = weight.shape[0]
    ho, wo = offset.shape[2:]
    taps = []
    for t in range(9):
        ky, kx = t // 3, t % 3
        dy = offset[:, 2 * t]
        dx = offset[:, 2 * t + 1]
        base_y = (torch.arange(ho, dtype=x.dtype) * stride
                  - padding + ky)[None, :, None]
        base_x = (torch.arange(wo, dtype=x.dtype) * stride
                  - padding + kx)[None, None, :]
        sy = base_y + dy
        sx = base_x + dx
        y0 = torch.floor(sy)
        x0 = torch.floor(sx)
        ly = sy - y0
        lx = sx - x0
        val = torch.zeros(b, ho, wo, c, dtype=x.dtype)
        for yy, xx, wgt in ((y0, x0, (1 - ly) * (1 - lx)),
                            (y0, x0 + 1, (1 - ly) * lx),
                            (y0 + 1, x0, ly * (1 - lx)),
                            (y0 + 1, x0 + 1, ly * lx)):
            ok = ((yy >= 0) & (yy <= h - 1)
                  & (xx >= 0) & (xx <= w - 1)).to(x.dtype)
            yi = yy.clamp(0, h - 1).long()
            xi = xx.clamp(0, w - 1).long()
            g = x.permute(0, 2, 3, 1)[
                torch.arange(b)[:, None, None], yi, xi]   # [B, Ho, Wo, C]
            val = val + g * (wgt * ok)[..., None]
        taps.append(val * mask[:, t][..., None])
    patch = torch.stack(taps, dim=3).reshape(b, ho, wo, 9 * c)
    wk = torch.stack([weight[:, :, t // 3, t % 3].T for t in range(9)]
                     ).reshape(9 * c, cout)
    return (patch @ wk).permute(0, 3, 1, 2)


class TDCN(tnn.Module):
    """ModulatedDeformConv2dPack naming: .weight + .conv_offset."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv_offset = tnn.Conv2d(cin, 27, 3, stride=stride, padding=1)
        self.weight = tnn.Parameter(torch.randn(cout, cin, 3, 3) * 0.1)
        self.stride = stride

    def forward(self, x):
        om = self.conv_offset(x)
        offset = om[:, :18]
        mask = torch.sigmoid(om[:, 18:])
        return t_deform_conv2d(x, offset, mask, self.weight,
                               stride=self.stride)


class TBottleneck(tnn.Module):
    def __init__(self, cin, planes, stride=1, dcn=False, downsample=False):
        super().__init__()
        # caffe style: stride on the 1x1 conv1
        self.conv1 = tnn.Conv2d(cin, planes, 1, stride=stride, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        if dcn:
            self.conv2 = TDCN(planes, planes)
        else:
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1,
                                    bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4))
        else:
            self.downsample = None

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = tF.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        idn = x if self.downsample is None else self.downsample(x)
        return tF.relu(out + idn)


class TBasicBlock(tnn.Module):
    def __init__(self, cin, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, planes, 3, stride=stride, padding=1,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, planes, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes))
        else:
            self.downsample = None

    def forward(self, x):
        out = tF.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        idn = x if self.downsample is None else self.downsample(x)
        return tF.relu(out + idn)


class TResNet(tnn.Module):
    """mmseg ResNet naming: conv1/bn1/layer{1..4}.{j}."""

    def __init__(self, base=BASE, dcn_stages=DCN_STAGES,
                 blocks=(1, 1, 1, 1), block="bottleneck"):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, base, 7, stride=2, padding=3,
                                bias=False)
        self.bn1 = tnn.BatchNorm2d(base)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        exp = 4 if block == "bottleneck" else 1
        cin = base
        for i in range(4):
            planes = base * (2 ** i)
            stride = 1 if i == 0 else 2
            mods = []
            for j in range(blocks[i]):
                s = stride if j == 0 else 1
                need_ds = j == 0 and (s != 1 or cin != planes * exp)
                if block == "bottleneck":
                    mods.append(TBottleneck(cin, planes, stride=s,
                                            dcn=dcn_stages[i],
                                            downsample=need_ds))
                else:
                    mods.append(TBasicBlock(cin, planes, stride=s,
                                            downsample=need_ds))
                cin = planes * exp
            setattr(self, f"layer{i + 1}", tnn.Sequential(*mods))

    def forward(self, x):
        x = self.maxpool(tF.relu(self.bn1(self.conv1(x))))
        outs = []
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            outs.append(x)
        return outs


class TConvModule(tnn.Module):
    def __init__(self, cin, cout, k, stride=1, pad=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=pad)

    def forward(self, x):
        return self.conv(x)


class TFPN(tnn.Module):
    """mmdet FPN: start_level=1, add_extra_convs='on_output',
    relu_before_extra_convs=True, 4 outs from 3 used levels."""

    def __init__(self, in_channels, out_channels=EMBED):
        super().__init__()
        used = in_channels[1:]
        self.lateral_convs = tnn.ModuleList(
            [TConvModule(c, out_channels, 1) for c in used])
        self.fpn_convs = tnn.ModuleList(
            [TConvModule(out_channels, out_channels, 3, pad=1)
             for _ in used]
            + [TConvModule(out_channels, out_channels, 3, stride=2,
                           pad=1)])

    def forward(self, inputs):
        used = inputs[1:]
        laterals = [l(x) for l, x in zip(self.lateral_convs, used)]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + tF.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:],
                mode="nearest")
        outs = [self.fpn_convs[i](laterals[i])
                for i in range(len(laterals))]
        outs.append(self.fpn_convs[-1](outs[-1]))   # extra conv, i == 0:
        return outs                                  # no relu before it


class TSECONDFPN(tnn.Module):
    """mmdet3d SECONDFPN: deblocks.{i} = (deconv|conv, BN(eps 1e-3),
    ReLU); upsample_strides (0.5, 1, 2, 4); outputs concatenated."""

    def __init__(self, in_channels, out_channels=(8, 8, 8, 8),
                 strides=(0.5, 1, 2, 4)):
        super().__init__()
        blocks = []
        for cin, cout, s in zip(in_channels, out_channels, strides):
            if s >= 1:
                s = int(s)
                conv = tnn.ConvTranspose2d(cin, cout, s, stride=s,
                                           bias=False)
            else:
                s = int(round(1 / s))
                conv = tnn.Conv2d(cin, cout, s, stride=s, bias=False)
            blocks.append(tnn.Sequential(
                conv, tnn.BatchNorm2d(cout, eps=1e-3),
                tnn.ReLU(inplace=True)))
        self.deblocks = tnn.ModuleList(blocks)

    def forward(self, inputs):
        outs = [blk(x) for blk, x in zip(self.deblocks, inputs)]
        return torch.cat(outs, dim=1)


def _randomize_bn_stats(module):
    """Random (non-identity) running stats so frozen-BN folding is
    actually exercised."""
    rs = np.random.RandomState(11)
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.tensor(
                    rs.randn(m.num_features), dtype=torch.float32))
                m.running_var.copy_(torch.tensor(
                    np.abs(rs.randn(m.num_features)) + 0.5,
                    dtype=torch.float32))
                m.weight.copy_(torch.tensor(
                    rs.randn(m.num_features) * 0.3 + 1.0,
                    dtype=torch.float32))
                m.bias.copy_(torch.tensor(
                    rs.randn(m.num_features) * 0.3, dtype=torch.float32))


def _imgs():
    rs = np.random.RandomState(5)
    return rs.randn(2, H_IMG, W_IMG, 3).astype(np.float32)


def test_main_tower_parity():
    """Caffe ResNet(+DCN) + FPN, torch → converter → JAX, features
    match <= 1e-4 at every stage and FPN level."""
    tbackbone = TResNet().eval()
    in_ch = [BASE * 4 * (2 ** i) for i in range(4)]
    tneck = TFPN(in_ch).eval()
    _randomize_bn_stats(tbackbone)

    imgs = _imgs()
    with torch.no_grad():
        x_t = torch.tensor(imgs).permute(0, 3, 1, 2)
        stages_t = tbackbone(x_t)
        fpn_t = tneck(stages_t)

    sd = {f"img_backbone.{k}": v
          for k, v in tbackbone.state_dict().items()}
    sd.update({f"img_neck.{k}": v for k, v in tneck.state_dict().items()})
    params, stats = convert_backbone_and_neck(sd)

    jbackbone = ResNet(depth=DEPTH, out_indices=(0, 1, 2, 3),
                       style="caffe", stage_with_dcn=DCN_STAGES,
                       base_channels=BASE, dtype=jnp.float32)
    stages_j = jbackbone.apply(
        {"params": params["img_backbone"],
         "batch_stats": stats["img_backbone"]}, jnp.asarray(imgs))
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(stages_j[i]),
            stages_t[i].permute(0, 2, 3, 1).numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"stage {i}")

    jneck = FPN(out_channels=EMBED, num_outs=4, start_level=1,
                add_extra_convs="on_output",
                relu_before_extra_convs=True, dtype=jnp.float32)
    fpn_j = jneck.apply({"params": params["img_neck"]}, stages_j)
    assert len(fpn_j) == len(fpn_t) == 4
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(fpn_j[i]),
            fpn_t[i].permute(0, 2, 3, 1).numpy(),
            atol=1e-4, rtol=1e-4, err_msg=f"fpn level {i}")


def test_initializer_tower_parity():
    """Initializer ResNet + SECONDFPN (reference
    resnet_secondfpn.py:9-37), torch → converter → JAX."""
    tbackbone = TResNet().eval()
    in_ch = [BASE * 4 * (2 ** i) for i in range(4)]
    tneck = TSECONDFPN(in_ch).eval()
    _randomize_bn_stats(tbackbone)
    _randomize_bn_stats(tneck)

    imgs = _imgs()
    with torch.no_grad():
        x_t = torch.tensor(imgs).permute(0, 3, 1, 2)
        out_t = tneck(tbackbone(x_t))

    sd = {f"img_backbone.{k}": v
          for k, v in tbackbone.state_dict().items()}
    sd.update({f"img_neck.{k}": v for k, v in tneck.state_dict().items()})
    params, stats = convert_initializer(sd)

    jmodel = ResNetSecondFPN(
        depth=DEPTH, stage_with_dcn=DCN_STAGES, base_channels=BASE,
        out_channels=(8, 8, 8, 8), dtype="float32")
    out_j = jmodel.apply({"params": params, "batch_stats": stats},
                         jnp.asarray(imgs))
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(),
        atol=1e-4, rtol=1e-4)
