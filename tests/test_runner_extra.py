"""Trainer helpers: host-side random_k layer draw (reference
gaussian_head.py:133-137), inference-only state init, and torch
pretrain loading."""
import dataclasses

import numpy as np
import pytest

from gaussianformer_tpu.configs import get_config
from gaussianformer_tpu.train.runner import Trainer


def make_trainer(apply_loss_type):
    cfg = dataclasses.replace(get_config("prob_gs6400"),
                              apply_loss_type=apply_loss_type)
    return Trainer(cfg, train_loader=None, val_loader=None,
                   work_dir="/tmp/t", use_mesh=False)


def test_draw_loss_layers_random_1_is_none():
    t = make_trainer("random_1")
    assert t._draw_loss_layers() is None


def test_draw_loss_layers_all_is_none():
    t = make_trainer("all")
    assert t._draw_loss_layers() is None


def test_draw_loss_layers_random_3():
    t = make_trainer("random_3")
    d = t.cfg.num_decoder
    seen = set()
    for it in range(50):
        t.global_iter = it
        layers = t._draw_loss_layers()
        assert len(layers) == 3
        assert layers[-1] == d - 1          # last layer always supervised
        assert len(set(layers)) == 3        # draws without replacement
        assert all(0 <= x < d for x in layers)
        # deterministic in (seed, global_iter): every data-parallel rank
        # must draw the SAME subset or they compile different programs
        assert t._draw_loss_layers() == layers
        seen.add(layers)
    assert len(seen) > 1                    # varies across iterations


def test_head_random_k_requires_host_draw():
    """random_k with k>1 and no host-drawn apply_loss_layers must raise —
    a silent 'last k layers' fallback would diverge from the reference's
    np.random.choice draw (gaussian_head.py:133-137) with no signal."""
    import jax.numpy as jnp
    from gaussianformer_tpu.models.head.gaussian_head import GaussianHead
    from gaussianformer_tpu.models.encoder.modules import GaussianPrediction
    from gaussianformer_tpu.ops.splat import SplatGridSpec

    grid = SplatGridSpec(H=4, W=4, D=2, pc_min=(-4.0, -4.0, -1.0),
                         grid_size=2.0, scale_multiplier=4.0, radii_min=1)
    head = GaussianHead(apply_loss_type="random_3", grid=grid,
                        splat_tile_n=32, splat_chunk_g=8)
    gp = GaussianPrediction(
        means=jnp.zeros((1, 4, 3)), scales=jnp.ones((1, 4, 3)),
        rotations=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (1, 4, 1)),
        opacities=jnp.ones((1, 4, 1)), semantics=jnp.zeros((1, 4, 17)))
    occ_xyz = jnp.zeros((1, 4, 4, 2, 3))
    kw = dict(occ_label=jnp.zeros((1, 4, 4, 2), jnp.int32),
              occ_cam_mask=jnp.ones((1, 4, 4, 2), bool), training=True)
    with pytest.raises(ValueError, match="apply_loss_layers"):
        head.apply({"params": {}}, [gp, gp, gp, gp], occ_xyz=occ_xyz, **kw)
    # host-drawn layers keep working
    out = head.apply({"params": {}}, [gp, gp, gp, gp], occ_xyz=occ_xyz,
                     apply_loss_layers=(0, 2, 3), **kw)
    assert len(out["pred_occ"]) == 3


def test_verify_dcn_margin_auto_widen(tmp_path):
    """Out-of-margin DCN offsets on the live state trigger a loud model
    rebuild with a wider Pallas window (parameters untouched); in-margin
    offsets pass through."""
    import flax
    from gaussianformer_tpu.data import DataLoader, SyntheticOccDataset
    from gaussianformer_tpu.models import BEVSegmentor
    from gaussianformer_tpu.ops.splat import SplatGridSpec

    cfg = dataclasses.replace(
        get_config("prob_gs6400"), embed_dims=16, num_decoder=1,
        num_anchor=16, random_samples=8, num_depth_samples=8,
        num_learnable_pts=2)
    ds = SyntheticOccDataset(num_samples=1, image_size=(64, 96),
                             grid=(20, 20, 8))
    loader = DataLoader(ds, 1)
    t = Trainer(cfg, loader, None, str(tmp_path), use_mesh=False)
    seg = cfg.segmentor_cfg()
    seg["backbone_cfg"].update(depth=50, base_channels=8, with_cp=False)
    seg["lifter_cfg"].update(num_samples=8, occ_resolution=(20, 20, 8),
                             voxel_size=5.0, initializer_depth=18,
                             initializer_dcn=(False,) * 4,
                             initializer_base_channels=8,
                             initializer_out_channels=(8, 8, 8, 8))
    seg["head_cfg"]["grid"] = SplatGridSpec(
        H=20, W=20, D=8, pc_min=(-50.0, -50.0, -5.0), grid_size=5.0,
        scale_multiplier=4.0)
    seg["head_cfg"].update(splat_tile_n=320, splat_chunk_g=16)
    t.model = BEVSegmentor(**seg)
    t.init_state(next(iter(loader)), inference_only=True)
    batch = next(iter(loader))

    rep = t.verify_dcn_margin(batch)
    assert rep["ok"] and rep["per_block"]      # zero-init offsets pass

    params = flax.core.unfreeze(t._state.params)

    def bump(tree):
        for k, v in tree.items():
            if k == "conv_offset":
                v["bias"] = v["bias"] + 10.0
                return True
            if isinstance(v, dict) and bump(v):
                return True
        return False

    assert bump(params)
    t._state = t._state.replace(params=params)
    with pytest.raises(ValueError, match="dcn_win"):
        t.verify_dcn_margin(batch, auto_widen=False)
    rep2 = t.verify_dcn_margin(batch)          # auto-widen path
    assert rep2["ok"]
    assert t.cfg.dcn_win > 24
    assert t.model.backbone_cfg["dcn_win"] == t.cfg.dcn_win
    assert t.model.lifter_cfg["dcn_win"] == t.cfg.dcn_win


def test_load_torch_pretrained_lifter_init(tmp_path):
    """A synthetic torch init.pth (reference naming) lands on the live
    train state's lifter initializer tower with matching shapes."""
    import torch
    from gaussianformer_tpu.data import DataLoader, SyntheticOccDataset
    from gaussianformer_tpu.ops.splat import SplatGridSpec
    from tests.test_converter_full import synth_resnet18, _bn_keys

    cfg = dataclasses.replace(
        get_config("prob_gs6400"), embed_dims=16, num_decoder=1,
        num_anchor=16, random_samples=8, num_depth_samples=8,
        num_learnable_pts=2)
    ds = SyntheticOccDataset(num_samples=2, image_size=(64, 112),
                             grid=(20, 20, 8))
    loader = DataLoader(ds, 1)
    t = Trainer(cfg, loader, None, str(tmp_path), use_mesh=False)
    seg = cfg.segmentor_cfg()
    seg["backbone_cfg"].update(depth=18, base_channels=8, with_cp=False,
                               stage_with_dcn=(False,) * 4)
    seg["lifter_cfg"].update(num_samples=8, occ_resolution=(20, 20, 8),
                             voxel_size=5.0, initializer_depth=18,
                             initializer_dcn=(False,) * 4,
                             initializer_base_channels=8,
                             initializer_out_channels=(8, 8, 8, 8))
    seg["head_cfg"]["grid"] = SplatGridSpec(
        H=20, W=20, D=8, pc_min=(-50.0, -50.0, -5.0), grid_size=5.0,
        scale_multiplier=4.0)
    seg["head_cfg"].update(splat_tile_n=320, splat_chunk_g=16)
    from gaussianformer_tpu.models import BEVSegmentor
    t.model = BEVSegmentor(**seg)
    t.init_state(next(iter(loader)), inference_only=True)

    sd = {}
    synth_resnet18(sd, "img_backbone.", 8, (False,) * 4)
    rng = np.random.RandomState(0)
    for i, ch in enumerate((8, 8, 8, 8)):
        cin = [8, 16, 32, 64][i]
        if i == 0:
            sd[f"img_neck.deblocks.{i}.0.weight"] = rng.randn(ch, cin, 2, 2)
        else:
            k = max(int(round((0.5, 1, 2, 4)[i])), 1)
            sd[f"img_neck.deblocks.{i}.0.weight"] = rng.randn(cin, ch, k, k)
        _bn_keys(sd, f"img_neck.deblocks.{i}.1", ch)
    sd["anchor"] = np.zeros((16, 25))               # must be dropped
    sd["instance_feature"] = np.zeros((24, 16))
    path = tmp_path / "init.pth"
    torch.save({"state_dict": {k: torch.as_tensor(np.asarray(v, np.float32))
                               for k, v in sd.items()}}, path)

    before = np.asarray(
        t._state.params["lifter"]["initialize_backbone"]["img_backbone"]
        ["conv1"]["kernel"]).copy()
    t.load_torch_pretrained(lifter_init_path=str(path))
    after = np.asarray(
        t._state.params["lifter"]["initialize_backbone"]["img_backbone"]
        ["conv1"]["kernel"])
    assert after.shape == before.shape
    assert not np.allclose(after, before)
    np.testing.assert_allclose(
        after, np.transpose(sd["img_backbone.conv1.weight"], (2, 3, 1, 0)),
        rtol=1e-6)
