"""PyTorch → JAX checkpoint converter.

Maps reference state_dict keys (mmseg ResNet / FPN / SECONDFPN / encoder /
head module names) onto this framework's flax parameter tree so released
reference checkpoints can be evaluated here (fidelity target,
BASELINE.md). Tensor layout conversions:

  - Conv2d weight   [O, I, kh, kw]  → kernel [kh, kw, I, O]
  - ConvTranspose2d [I, O, kh, kw]  → kernel [kh, kw, I, O]
  - Linear weight   [O, I]          → kernel [I, O]
  - BatchNorm       weight/bias     → scale/bias (params),
                    running_mean/var → batch_stats mean/var
  - LayerNorm       weight/bias     → scale/bias
  - SubMConv3d      [O, kx, ky, kz, I] (spconv) → [kx, ky, kz, I, O]

Use :func:`convert_state_dict` with a raw ``torch.load(...)['state_dict']``
(tensors or numpy arrays).
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def conv_w(t):
    return _np(t).transpose(2, 3, 1, 0)


def deconv_w(t):
    return _np(t).transpose(2, 3, 0, 1)


def linear_w(t):
    return _np(t).transpose(1, 0)


def spconv_w(t):
    a = _np(t)
    if a.ndim == 5:  # [O, kx, ky, kz, I] → [kx, ky, kz, I, O]
        return a.transpose(1, 2, 3, 4, 0)
    return a


def _set(tree: Dict, path: str, value):
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


def _convert_resnet(sd, prefix: str, out_params: Dict, out_stats: Dict,
                    dst_prefix: str):
    """mmseg ResNet keys: conv1, bn1, layer{1..4}.{j}.(conv|bn)(1..3),
    downsample.0/1, DCN conv2.conv_offset."""
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        m = re.match(r"layer(\d+)\.(\d+)\.(.*)", k)
        if m:
            stage, block, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = f"{dst_prefix}/stage{stage}/layer_{block}"
            if rest.startswith("downsample.0."):
                _set(out_params, f"{base}/downsample_conv/kernel",
                     conv_w(val))
            elif rest.startswith("downsample.1."):
                _bn(rest.split(".")[-1], val, f"{base}/downsample_bn",
                    out_params, out_stats)
            elif re.match(r"conv(\d)\.conv_offset\.weight", rest):
                i = rest[4]
                _set(out_params, f"{base}/conv{i}/conv_offset/kernel",
                     conv_w(val))
            elif re.match(r"conv(\d)\.conv_offset\.bias", rest):
                i = rest[4]
                _set(out_params, f"{base}/conv{i}/conv_offset/bias", _np(val))
            elif re.match(r"conv(\d)\.weight", rest):
                i = rest[4]
                _set(out_params, f"{base}/conv{i}/kernel", conv_w(val))
            elif re.match(r"bn(\d)\.", rest):
                i = rest[2]
                _bn(rest.split(".")[-1], val, f"{base}/bn{i}", out_params,
                    out_stats)
        elif k.startswith("conv1."):
            _set(out_params, f"{dst_prefix}/conv1/kernel", conv_w(val))
        elif k.startswith("bn1."):
            _bn(k.split(".")[-1], val, f"{dst_prefix}/bn1", out_params,
                out_stats)


def _bn(leaf: str, val, base: str, out_params: Dict, out_stats: Dict):
    if leaf == "weight":
        _set(out_params, f"{base}/scale", _np(val))
    elif leaf == "bias":
        _set(out_params, f"{base}/bias", _np(val))
    elif leaf == "running_mean":
        _set(out_stats, f"{base}/mean", _np(val))
    elif leaf == "running_var":
        _set(out_stats, f"{base}/var", _np(val))


def _convert_fpn(sd, prefix: str, out_params: Dict, dst_prefix: str):
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        m = re.match(r"lateral_convs\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            _set(out_params, f"{dst_prefix}/lateral_{i}/"
                 f"{'kernel' if leaf == 'weight' else 'bias'}",
                 conv_w(val) if leaf == "weight" else _np(val))
            continue
        m = re.match(r"fpn_convs\.(\d+)\.conv\.(weight|bias)", k)
        if m:
            i, leaf = int(m.group(1)), m.group(2)
            # mmdet stores extra convs as trailing fpn_convs entries; with
            # 3 backbone levels + 1 extra, index 3 → extra_conv_0
            name = f"fpn_conv_{i}" if i < 3 else f"extra_conv_{i - 3}"
            _set(out_params, f"{dst_prefix}/{name}/"
                 f"{'kernel' if leaf == 'weight' else 'bias'}",
                 conv_w(val) if leaf == "weight" else _np(val))


def _convert_secondfpn(sd, prefix: str, out_params: Dict, out_stats: Dict,
                       dst_prefix: str, upsample_strides=(0.5, 1, 2, 4)):
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        m = re.match(r"deblocks\.(\d+)\.(\d+)\.(.*)", k)
        if not m:
            continue
        i, layer, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
        if layer == 0:  # conv or deconv
            if upsample_strides[i] >= 1:
                _set(out_params, f"{dst_prefix}/deblock_{i}_deconv/kernel",
                     deconv_w(val))
            else:
                _set(out_params, f"{dst_prefix}/deblock_{i}_conv/kernel",
                     conv_w(val))
        else:  # BN
            _bn(leaf, val, f"{dst_prefix}/deblock_{i}_bn", out_params,
                out_stats)


def convert_backbone_and_neck(sd) -> Tuple[Dict, Dict]:
    """Convert the image backbone + FPN neck of a reference checkpoint
    (e.g. r101_dcn_fcos3d_pretrain.pth or a full model state_dict)."""
    params: Dict = {}
    stats: Dict = {}
    prefix = "img_backbone." if any(
        k.startswith("img_backbone.") for k in sd) else "backbone."
    _convert_resnet(sd, prefix, params, stats, "img_backbone")
    if any(k.startswith("img_neck.") for k in sd):
        _convert_fpn(sd, "img_neck.", params, "img_neck")
    return params, stats


def convert_initializer(sd) -> Tuple[Dict, Dict]:
    """Convert a ResNetSecondFPN initializer checkpoint (init.pth)."""
    params: Dict = {}
    stats: Dict = {}
    _convert_resnet(sd, "img_backbone.", params, stats, "img_backbone")
    _convert_secondfpn(sd, "img_neck.", params, stats, "img_neck")
    return params, stats


def merge_into(variables: Dict, params: Dict, stats: Dict,
               strict: bool = False):
    """Overlay converted subtrees onto a flax variables dict (in place on a
    copy). Missing destinations raise only when strict."""
    import copy
    out = copy.deepcopy(
        {k: dict(v) if isinstance(v, dict) else v
         for k, v in variables.items()})

    def overlay(dst, src, path=""):
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in dst:
                    if strict:
                        raise KeyError(f"missing subtree {path}/{k}")
                    dst[k] = {}
                overlay(dst[k], v, f"{path}/{k}")
            else:
                if strict and k in dst and np.shape(dst[k]) != np.shape(v):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{np.shape(dst[k])} vs {np.shape(v)}")
                dst[k] = v

    overlay(out.setdefault("params", {}), params)
    overlay(out.setdefault("batch_stats", {}), stats)
    return out
