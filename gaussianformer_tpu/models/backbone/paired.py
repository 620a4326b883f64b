"""Channel-stacked paired execution of the two identical R101 trunks.

The flagship model runs TWO ResNet-101(+DCN) towers over the same six
camera images — the main backbone (reference
model/segmentor/bev_segmentor.py:40-69) and the lifter-v2 initializer
(reference model/lifter/gaussian_lifter_v2.py:155-163). Their topology is
identical (depth, strides, caffe style, DCN stages); only the weights
differ. Running them as separate module stacks costs two full passes of
XLA op launches and two Pallas DCN grids per block pair.

Here the towers run CHANNEL-STACKED through one op sequence:

  - stem: shared input, kernels stacked along the output axis (one conv);
  - every residual conv: ``feature_group_count=2`` with kernels stacked
    along the output axis — each group convolves its own tower's channel
    half;
  - frozen BN / ReLU / maxpool / residual adds: elementwise over the
    stacked channels (per-tower affine coefficients concatenated);
  - DCN blocks: both towers' offsets/masks packed into ONE Pallas grid
    (ops/pallas/dcn_kernel.deform_conv2d_pallas_paired_fwd) on the
    inference path — halving kernel launches and strip DMAs, and letting
    tower B's VPU M-build overlap tower A's MXU matmuls; the training
    path differentiates through two single-tower custom-VJP kernels on
    the channel halves.

This is a pure function over the two towers' *existing* parameter
subtrees (params stay owned by `img_backbone` and
`lifter/initialize_backbone/img_backbone` — checkpoint layout, the torch
converter and the optimizer partition are unchanged). The segmentor
reads both subtrees via ``self.variables`` and calls this at apply time;
``model.init`` still runs the unpaired modules (see BEVSegmentor).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .resnet import ARCH_SETTINGS, stem_conv_apply
from ...ops.dcn import deform_conv2d


def _conv(x, w, *, stride=1, padding=0, dilation=1, fgc=1, dtype):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=fgc)


def _cat_out(pa, pb):
    """Stack two towers' conv kernels along the output-channel axis."""
    return jnp.concatenate([pa["kernel"], pb["kernel"]], axis=-1)


def _bn_coeffs(p, s, eps=1e-5):
    inv = jax.lax.rsqrt(s["var"] + eps) * p["scale"]
    return inv, p["bias"] - s["mean"] * inv


def _paired_bn(pa, sa, pb, sb):
    """Concatenated frozen-BN affine coefficients (inv, shift)."""
    ia, ha = _bn_coeffs(pa, sa)
    ib, hb = _bn_coeffs(pb, sb)
    return jnp.concatenate([ia, ib]), jnp.concatenate([ha, hb])


def _apply_bn(x, coeffs):
    inv, shift = coeffs
    return x * inv.astype(x.dtype) + shift.astype(x.dtype)


def _paired_dcn(x, pa, pb, *, stride, dilation, dtype, win,
                epilogues, backend):
    """Both towers' modulated deformable conv on the channel-stacked
    input. ``pa``/``pb``: the DeformConv2d param subtrees
    ({conv_offset: {kernel, bias}, kernel})."""
    c_half = x.shape[-1] // 2
    k = 3
    pad = dilation * (k - 1) // 2
    kk2 = 2 * k * k

    # offset/mask conv, grouped (zero-init params as in DCNv2)
    om_w = jnp.concatenate(
        [pa["conv_offset"]["kernel"], pb["conv_offset"]["kernel"]],
        axis=-1)
    om_b = jnp.concatenate(
        [pa["conv_offset"]["bias"], pb["conv_offset"]["bias"]])
    om = _conv(x, om_w, stride=stride, padding=pad, fgc=2, dtype=dtype)
    om = om + om_b.astype(om.dtype)
    oms = (om[..., :3 * k * k], om[..., 3 * k * k:])
    offsets = tuple(o[..., :kk2].astype(jnp.float32) for o in oms)
    masks = tuple(jax.nn.sigmoid(o[..., kk2:].astype(jnp.float32))
                  for o in oms)

    use_pallas = (
        backend in ("auto", "pallas")
        and (jax.default_backend() != "cpu" or backend == "pallas")
        and stride == 1 and dilation == 1
        and c_half % 128 == 0
        and x.shape[1] >= win and x.shape[2] >= win)
    wa = pa["kernel"].astype(dtype)
    wb = pb["kernel"].astype(dtype)
    if use_pallas and epilogues is not None:
        from ...ops.pallas.dcn_kernel import deform_conv2d_pallas_paired_fwd
        return deform_conv2d_pallas_paired_fwd(
            x, offsets, masks, (wa, wb), win=win, epilogues=epilogues)
    if use_pallas:
        # training path: two single-tower custom-VJP kernels
        from ...ops.pallas.dcn_kernel import deform_conv2d_pallas
        out = jnp.concatenate([
            deform_conv2d_pallas(x[..., :c_half], offsets[0], masks[0],
                                 wa, win=win),
            deform_conv2d_pallas(x[..., c_half:], offsets[1], masks[1],
                                 wb, win=win)], axis=-1)
    else:
        out = jnp.concatenate([
            deform_conv2d(x[..., :c_half], offsets[0], masks[0], wa,
                          stride=stride, padding=pad, dilation=dilation),
            deform_conv2d(x[..., c_half:], offsets[1], masks[1], wb,
                          stride=stride, padding=pad, dilation=dilation)],
            axis=-1)
    if epilogues is not None:
        inv = jnp.concatenate([epilogues[0][0], epilogues[1][0]])
        shift = jnp.concatenate([epilogues[0][1], epilogues[1][1]])
        out = jax.nn.relu(_apply_bn(out, (inv, shift)))
    return out


def _paired_bottleneck(x, pa, sa, pb, sb, *, planes, stride, dilation,
                       style, with_dcn, downsample, dtype, dcn_win,
                       fuse_dcn_epilogue, dcn_backend):
    s1 = stride if style == "caffe" else 1
    s2 = 1 if style == "caffe" else stride

    out = _conv(x, _cat_out(pa["conv1"], pb["conv1"]), stride=s1, fgc=2,
                dtype=dtype)
    out = jax.nn.relu(_apply_bn(
        out, _paired_bn(pa["bn1"], sa["bn1"], pb["bn1"], sb["bn1"])))

    bn2 = _paired_bn(pa["bn2"], sa["bn2"], pb["bn2"], sb["bn2"])
    if with_dcn and fuse_dcn_epilogue:
        epis = (_bn_coeffs(pa["bn2"], sa["bn2"]),
                _bn_coeffs(pb["bn2"], sb["bn2"]))
        out = _paired_dcn(out, pa["conv2"], pb["conv2"], stride=s2,
                          dilation=dilation, dtype=dtype, win=dcn_win,
                          epilogues=epis, backend=dcn_backend)
    elif with_dcn:
        out = _paired_dcn(out, pa["conv2"], pb["conv2"], stride=s2,
                          dilation=dilation, dtype=dtype, win=dcn_win,
                          epilogues=None, backend=dcn_backend)
        out = jax.nn.relu(_apply_bn(out, bn2))
    else:
        out = _conv(out, _cat_out(pa["conv2"], pb["conv2"]), stride=s2,
                    padding=dilation, dilation=dilation, fgc=2,
                    dtype=dtype)
        out = jax.nn.relu(_apply_bn(out, bn2))

    out = _conv(out, _cat_out(pa["conv3"], pb["conv3"]), fgc=2,
                dtype=dtype)
    out = _apply_bn(
        out, _paired_bn(pa["bn3"], sa["bn3"], pb["bn3"], sb["bn3"]))

    if downsample:
        idn = _conv(x, _cat_out(pa["downsample_conv"],
                                pb["downsample_conv"]),
                    stride=stride, fgc=2, dtype=dtype)
        idn = _apply_bn(idn, _paired_bn(
            pa["downsample_bn"], sa["downsample_bn"],
            pb["downsample_bn"], sb["downsample_bn"]))
    else:
        idn = x
    return jax.nn.relu(out + idn)


def _paired_stage(x, pa, sa, pb, sb, *, planes, num_blocks, stride,
                  dilation, style, with_dcn, dtype, dcn_win,
                  fuse_dcn_epilogue, dcn_backend):
    expansion = 4
    for j in range(num_blocks):
        blk_stride = stride if j == 0 else 1
        need_ds = j == 0 and (
            blk_stride != 1
            or x.shape[-1] != 2 * planes * expansion)
        name = f"layer_{j}"
        x = _paired_bottleneck(
            x, pa[name], sa[name], pb[name], sb[name],
            planes=planes, stride=blk_stride, dilation=dilation,
            style=style, with_dcn=with_dcn, downsample=need_ds,
            dtype=dtype, dcn_win=dcn_win,
            fuse_dcn_epilogue=fuse_dcn_epilogue,
            dcn_backend=dcn_backend)
    return x


def paired_resnet_apply(params_a, stats_a, params_b, stats_b, x, *,
                        depth: int = 101,
                        strides: Tuple[int, ...] = (1, 2, 2, 2),
                        dilations: Tuple[int, ...] = (1, 1, 1, 1),
                        stage_with_dcn=(False, False, True, True),
                        style: str = "caffe", base_channels: int = 64,
                        dtype=jnp.bfloat16, dcn_win: int = 24,
                        fuse_dcn_epilogue: bool = False,
                        with_cp: bool = False,
                        dcn_backend: str = "auto"):
    """Run both towers channel-stacked. Returns (feats_a, feats_b):
    4-tuples of per-stage NHWC maps with the stacked channels split.

    params_*/stats_*: the ResNet param / batch_stats subtrees of each
    tower (identical topology required)."""
    block_kind, stage_blocks = ARCH_SETTINGS[depth]
    assert block_kind == "bottleneck", "paired trunk: bottleneck only"
    dtype = jnp.dtype(dtype)

    stem_w = jnp.concatenate(
        [params_a["conv1"]["kernel"], params_b["conv1"]["kernel"]],
        axis=-1)
    x = stem_conv_apply(x.astype(dtype), stem_w, dtype)
    x = jax.nn.relu(_apply_bn(
        x, _paired_bn(params_a["bn1"], stats_a["bn1"],
                      params_b["bn1"], stats_b["bn1"])))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))

    outs = []
    planes = base_channels
    for i in range(4):
        stage_fn = functools.partial(
            _paired_stage,
            planes=planes, num_blocks=stage_blocks[i],
            stride=strides[i], dilation=dilations[i], style=style,
            with_dcn=stage_with_dcn[i], dtype=dtype, dcn_win=dcn_win,
            fuse_dcn_epilogue=fuse_dcn_epilogue,
            dcn_backend=dcn_backend)
        if with_cp:
            stage_fn = jax.checkpoint(stage_fn)
        name = f"stage{i + 1}"
        x = stage_fn(x, params_a[name], stats_a[name],
                     params_b[name], stats_b[name])
        outs.append(x)
        planes *= 2

    half = [o.shape[-1] // 2 for o in outs]
    feats_a = tuple(o[..., :h] for o, h in zip(outs, half))
    feats_b = tuple(o[..., h:] for o, h in zip(outs, half))
    return feats_a, feats_b
