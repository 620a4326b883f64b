"""Torch→JAX converter: name mapping + shape conversion against a real
flax parameter tree (synthetic state_dict — mm-libs are not installed)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianformer_tpu.models.backbone.resnet import ResNet
from gaussianformer_tpu.utils.torch_convert import (
    convert_backbone_and_neck, merge_into, conv_w, linear_w)


def synth_resnet18_state_dict(rng):
    """Torch-style key/value layout for a small ResNet (mmseg naming)."""
    sd = {}
    sd["img_backbone.conv1.weight"] = rng.randn(8, 3, 7, 7)
    for leaf, v in (("weight", np.ones(8)), ("bias", np.zeros(8)),
                    ("running_mean", np.zeros(8)),
                    ("running_var", np.ones(8))):
        sd[f"img_backbone.bn1.{leaf}"] = v
    ch = 8
    for stage in range(1, 5):
        for block in range(2):
            pre = f"img_backbone.layer{stage}.{block}"
            out_ch = ch if block == 0 and stage == 1 else ch
            in_ch = ch if not (block == 0 and stage > 1) else ch // 2
            sd[f"{pre}.conv1.weight"] = rng.randn(ch, in_ch, 3, 3)
            sd[f"{pre}.conv2.weight"] = rng.randn(ch, ch, 3, 3)
            for bn in ("bn1", "bn2"):
                for leaf, v in (("weight", np.ones(ch)),
                                ("bias", np.zeros(ch)),
                                ("running_mean", np.zeros(ch)),
                                ("running_var", np.ones(ch))):
                    sd[f"{pre}.{bn}.{leaf}"] = v
            if block == 0 and stage > 1:
                sd[f"{pre}.downsample.0.weight"] = rng.randn(ch, in_ch, 1, 1)
                for leaf, v in (("weight", np.ones(ch)),
                                ("bias", np.zeros(ch)),
                                ("running_mean", np.zeros(ch)),
                                ("running_var", np.ones(ch))):
                    sd[f"{pre}.downsample.1.{leaf}"] = v
        ch *= 2
    return sd


def test_convert_resnet_into_model():
    rng = np.random.RandomState(0)
    sd = synth_resnet18_state_dict(rng)
    params, stats = convert_backbone_and_neck(sd)

    model = ResNet(depth=18, base_channels=8, style="pytorch",
                   stage_with_dcn=(False,) * 4, with_cp=False)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 64, 64, 3)))
    target_p = jax.tree_util.tree_map(np.asarray, variables["params"])

    # every converted leaf must exist in the model tree with matching shape
    merged = merge_into(
        {"params": {"img_backbone": target_p},
         "batch_stats": {"img_backbone": jax.tree_util.tree_map(
             np.asarray, variables["batch_stats"])}},
        params, stats, strict=True)

    # spot check: stem conv transposed correctly
    np.testing.assert_allclose(
        merged["params"]["img_backbone"]["conv1"]["kernel"],
        conv_w(sd["img_backbone.conv1.weight"]))
    # stage 2 block 0 conv1 lands at stage2/layer_0
    assert "stage2" in merged["params"]["img_backbone"]
    assert merged["params"]["img_backbone"]["stage2"]["layer_0"][
        "conv1"]["kernel"].shape == (3, 3, 8, 16)


def test_linear_weight_transpose():
    w = np.arange(6).reshape(2, 3)
    np.testing.assert_array_equal(linear_w(w), w.T)
