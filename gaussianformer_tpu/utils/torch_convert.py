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
    """torch ConvTranspose2d [Cin, Cout, kh, kw] → flax ConvTranspose
    (transpose_kernel=False) [kh, kw, Cin, Cout], SPATIALLY FLIPPED:
    flax's fractionally-strided formulation places kernel[k-1-a] where
    torch places kernel[a] (verified against torch for k=s; the k=s=1
    deblocks masked this until the SECONDFPN tower-parity test)."""
    w = _np(t).transpose(2, 3, 0, 1)
    return np.ascontiguousarray(w[::-1, ::-1])


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
                    dst_prefix: str, consumed=None):
    """mmseg ResNet keys: conv1, bn1, layer{1..4}.{j}.(conv|bn)(1..3),
    downsample.0/1, DCN conv2.conv_offset."""
    if consumed is None:
        consumed = set()
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k.endswith("num_batches_tracked"):
            consumed.add(key)
            continue
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
            else:
                continue
            consumed.add(key)
        elif k.startswith("conv1."):
            _set(out_params, f"{dst_prefix}/conv1/kernel", conv_w(val))
            consumed.add(key)
        elif k.startswith("bn1."):
            _bn(k.split(".")[-1], val, f"{dst_prefix}/bn1", out_params,
                out_stats)
            consumed.add(key)


def _bn(leaf: str, val, base: str, out_params: Dict, out_stats: Dict):
    if leaf == "weight":
        _set(out_params, f"{base}/scale", _np(val))
    elif leaf == "bias":
        _set(out_params, f"{base}/bias", _np(val))
    elif leaf == "running_mean":
        _set(out_stats, f"{base}/mean", _np(val))
    elif leaf == "running_var":
        _set(out_stats, f"{base}/var", _np(val))


def _convert_fpn(sd, prefix: str, out_params: Dict, dst_prefix: str,
                 consumed=None):
    if consumed is None:
        consumed = set()
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
            consumed.add(key)
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
            consumed.add(key)


def _convert_secondfpn(sd, prefix: str, out_params: Dict, out_stats: Dict,
                       dst_prefix: str, upsample_strides=(0.5, 1, 2, 4),
                       consumed=None):
    if consumed is None:
        consumed = set()
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        k = key[len(prefix):]
        if k.endswith("num_batches_tracked"):
            consumed.add(key)
            continue
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
        consumed.add(key)


# ---------------------------------------------------------------------------
# Full-model conversion: lifter / encoder / head
# ---------------------------------------------------------------------------

def _lrl_map(in_loops: int, out_loops: int) -> Dict[int, str]:
    """torch ``linear_relu_ln`` Sequential index → flax child name
    (reference model/encoder/gaussian_encoder/utils.py:54-64 vs
    models/layers.py LinearReluLn auto-naming)."""
    mapping: Dict[int, str] = {}
    idx = dense = ln = 0
    for _ in range(out_loops):
        for _ in range(in_loops):
            mapping[idx] = f"Dense_{dense}"
            dense += 1
            idx += 2  # skip the ReLU entry
        mapping[idx] = f"LayerNorm_{ln}"
        ln += 1
        idx += 1
    return mapping


def _convert_lrl(sd, prefix: str, dst: str, out_params: Dict,
                 in_loops: int, out_loops: int, consumed):
    """Convert a torch linear_relu_ln Sequential rooted at ``prefix``
    (keys like ``{prefix}0.weight``) into a flax LinearReluLn at ``dst``."""
    mapping = _lrl_map(in_loops, out_loops)
    for key, val in sd.items():
        if not key.startswith(prefix):
            continue
        m = re.match(r"(\d+)\.(weight|bias)$", key[len(prefix):])
        if not m:
            continue
        i, leaf = int(m.group(1)), m.group(2)
        name = mapping.get(i)
        if name is None:
            continue
        if name.startswith("Dense"):
            _set(out_params, f"{dst}/{name}/"
                 f"{'kernel' if leaf == 'weight' else 'bias'}",
                 linear_w(val) if leaf == "weight" else _np(val))
        else:  # LayerNorm
            _set(out_params, f"{dst}/{name}/"
                 f"{'scale' if leaf == 'weight' else 'bias'}", _np(val))
        consumed.add(key)


def _convert_linear(sd, prefix: str, dst: str, out_params: Dict, consumed):
    for leaf in ("weight", "bias"):
        key = prefix + leaf
        if key in sd:
            _set(out_params, f"{dst}/{'kernel' if leaf == 'weight' else 'bias'}",
                 linear_w(sd[key]) if leaf == "weight" else _np(sd[key]))
            consumed.add(key)


def _convert_ln(sd, prefix: str, dst: str, out_params: Dict, consumed):
    for leaf, flax_leaf in (("weight", "scale"), ("bias", "bias")):
        key = prefix + leaf
        if key in sd:
            _set(out_params, f"{dst}/{flax_leaf}", _np(sd[key]))
            consumed.add(key)


def convert_encoder(sd, operation_order, out_params: Dict, consumed,
                    prefix: str = "encoder.", dst: str = "encoder"):
    """Map the reference GaussianOccEncoder state_dict onto the flax tree.

    Reference layout (model/encoder/gaussian_encoder/gaussian_encoder.py:
    45-59): ``anchor_encoder`` plus one ``layers.{i}`` entry per
    operation_order element; flax names are ``op{i}_{op}``."""
    # anchor encoder: per-part linear_relu_ln(embed, 1, 2, in)
    for part in ("xyz_fc", "scale_fc", "rot_fc", "opacity_fc",
                 "semantics_fc", "output_fc"):
        _convert_lrl(sd, f"{prefix}anchor_encoder.{part}.",
                     f"{dst}/anchor_encoder/{part}", out_params, 1, 2,
                     consumed)

    for i, op in enumerate(operation_order):
        p = f"{prefix}layers.{i}."
        if op == "norm":
            _convert_ln(sd, p, f"{dst}/op{i}_norm", out_params, consumed)
        elif op == "ffn":
            base = f"{dst}/op{i}_ffn"
            # layers.0 = Sequential(Linear, ReLU, Dropout); layers.1 = Linear
            _convert_linear(sd, f"{p}layers.0.0.", f"{base}/fc1",
                            out_params, consumed)
            _convert_linear(sd, f"{p}layers.1.", f"{base}/fc2",
                            out_params, consumed)
            _convert_ln(sd, f"{p}pre_norm.", f"{base}/pre_norm",
                        out_params, consumed)
            _convert_linear(sd, f"{p}identity_fc.", f"{base}/identity_fc",
                            out_params, consumed)
        elif op == "deformable":
            base = f"{dst}/op{i}_deformable"
            _convert_linear(sd, f"{p}kps_generator.learnable_fc.",
                            f"{base}/kps_generator/learnable_fc",
                            out_params, consumed)
            _convert_lrl(sd, f"{p}camera_encoder.",
                         f"{base}/camera_encoder", out_params, 1, 2,
                         consumed)
            _convert_linear(sd, f"{p}weights_fc.", f"{base}/weights_fc",
                            out_params, consumed)
            _convert_linear(sd, f"{p}output_proj.", f"{base}/output_proj",
                            out_params, consumed)
        elif op == "spconv":
            base = f"{dst}/op{i}_spconv"
            if f"{p}layer.weight" in sd:  # single SubMConv3d, bias=False
                _set(out_params, f"{base}/conv0_kernel",
                     spconv_w(sd[f"{p}layer.weight"]))
                consumed.add(f"{p}layer.weight")
            else:  # multi-layer: conv at seq 0/3/6, LN at 1/4/7
                for j, seq in enumerate((0, 3, 6)):
                    wkey = f"{p}layer.{seq}.weight"
                    if wkey in sd:
                        _set(out_params, f"{base}/conv{j}_kernel",
                             spconv_w(sd[wkey]))
                        consumed.add(wkey)
                    bkey = f"{p}layer.{seq}.bias"
                    if bkey in sd:
                        _set(out_params, f"{base}/conv{j}_bias",
                             _np(sd[bkey]))
                        consumed.add(bkey)
                for j, seq in enumerate((1, 4, 7)):
                    _convert_ln(sd, f"{p}layer.{seq}.", f"{base}/ln{j}",
                                out_params, consumed)
            _convert_linear(sd, f"{p}output_proj.", f"{base}/output_proj",
                            out_params, consumed)
            # pc_range / grid_size persistent buffers are config here
            for buf in ("pc_range", "grid_size"):
                if f"{p}{buf}" in sd:
                    consumed.add(f"{p}{buf}")
        elif "refine" in op:
            base = f"{dst}/op{i}_refine"
            # Sequential(*linear_relu_ln(embed,2,2), Linear, Scale)
            _convert_lrl(sd, f"{p}layers.", f"{base}/layers", out_params,
                         2, 2, consumed)
            _convert_linear(sd, f"{p}layers.10.", f"{base}/out_fc",
                            out_params, consumed)
            key = f"{p}layers.11.scale"
            if key in sd:
                _set(out_params, f"{base}/out_scale/scale", _np(sd[key]))
                consumed.add(key)


def convert_lifter_v2(sd, out_params: Dict, out_stats: Dict, consumed,
                      prefix: str = "lifter.", dst: str = "lifter"):
    """GaussianLifterV2 keys (model/lifter/gaussian_lifter_v2.py:54-105):
    anchor, random_anchors, instance_feature, projection.1 (Sequential
    [ReLU, Linear]), initialize_backbone.{img_backbone,img_neck}."""
    for name in ("anchor", "random_anchors", "instance_feature"):
        key = prefix + name
        if key in sd:
            _set(out_params, f"{dst}/{name}", _np(sd[key]))
            consumed.add(key)
    _convert_linear(sd, f"{prefix}projection.1.", f"{dst}/projection",
                    out_params, consumed)
    init_pre = f"{prefix}initialize_backbone."
    if any(k.startswith(init_pre) for k in sd):
        _convert_resnet(sd, init_pre + "img_backbone.", out_params,
                        out_stats, f"{dst}/initialize_backbone/img_backbone",
                        consumed)
        _convert_secondfpn(sd, init_pre + "img_neck.", out_params,
                           out_stats,
                           f"{dst}/initialize_backbone/img_neck",
                           consumed=consumed)


def convert_lifter_v1(sd, out_params: Dict, consumed,
                      prefix: str = "lifter.", dst: str = "lifter"):
    for name in ("anchor", "instance_feature"):
        key = prefix + name
        if key in sd:
            _set(out_params, f"{dst}/{name}", _np(sd[key]))
            consumed.add(key)


def convert_head(sd, out_params: Dict, consumed, prefix: str = "head.",
                 dst: str = "head"):
    key = prefix + "empty_scalar"
    if key in sd:
        _set(out_params, f"{dst}/empty_scalar", _np(sd[key]))
        consumed.add(key)
    # empty_* buffers are config constants in this framework
    for buf in ("empty_mean", "empty_scale", "empty_rot", "empty_sem",
                "empty_opa"):
        if prefix + buf in sd:
            consumed.add(prefix + buf)


def convert_full_state_dict(sd, operation_order,
                            lifter: str = "v2"):
    """Convert a complete reference BEVSegmentor state_dict.

    Returns ``(params, batch_stats, unmapped_keys)``; an empty
    ``unmapped_keys`` list means 100% coverage. ``operation_order`` must
    match the checkpoint's config (e.g. configs.nuscenes operation_order
    for the variant)."""
    sd = {k: v for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}
    consumed = set()
    _convert_resnet(sd, "img_backbone.", params, stats, "img_backbone",
                    consumed)
    _convert_fpn(sd, "img_neck.", params, "img_neck", consumed)
    if lifter == "v2":
        convert_lifter_v2(sd, params, stats, consumed)
    else:
        convert_lifter_v1(sd, params, consumed)
    convert_encoder(sd, operation_order, params, consumed)
    convert_head(sd, params, consumed)
    unmapped = sorted(k for k in sd if k not in consumed)
    return params, stats, unmapped


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
