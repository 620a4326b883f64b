"""Tests for deformable aggregation, sparse conv, FPS, DCN ops."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.ops.deformable import (bilinear_sample_nchw,
                                               deformable_aggregation)
from gaussianformer_tpu.ops.sparse_conv import (submanifold_conv3d,
                                                voxel_indices)
from gaussianformer_tpu.ops.fps import farthest_point_sampling
from gaussianformer_tpu.ops.dcn import deform_conv2d


def test_bilinear_center_exact():
    """Sampling at a pixel center returns that pixel's value.

    Convention: h_im = loc_h * H - 0.5 (deformable CUDA kernel :174-175),
    so pixel i center is loc = (i + 0.5) / H."""
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(5, 7, 3).astype(np.float32))
    loc = jnp.array([[(2 + 0.5) / 7, (1 + 0.5) / 5]])  # (w, h)
    out = bilinear_sample_nchw(feat, loc)
    np.testing.assert_allclose(out[0], feat[1, 2], atol=1e-6)


def test_bilinear_interpolates():
    feat = jnp.zeros((4, 4, 1)).at[1, 1, 0].set(1.0)
    # halfway between pixel (1,1) and (1,2) in w
    loc = jnp.array([[(2.0) / 4, (1 + 0.5) / 4]])
    out = bilinear_sample_nchw(feat, loc)
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-6)


def test_bilinear_oob_zero():
    feat = jnp.ones((4, 4, 2))
    loc = jnp.array([[-0.3, 0.5], [1.2, 0.5]])
    out = bilinear_sample_nchw(feat, loc)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_deformable_aggregation_weights():
    """Weighted sum over cams/levels/groups matches a manual computation."""
    rng = np.random.RandomState(1)
    b, q, cams, lvls, g, c = 1, 5, 2, 2, 2, 8
    feats = [jnp.asarray(rng.randn(b, cams, 6, 6, c).astype(np.float32)),
             jnp.asarray(rng.randn(b, cams, 3, 3, c).astype(np.float32))]
    pts = jnp.asarray(rng.uniform(0.1, 0.9, (b, q, cams, 2))
                      .astype(np.float32))
    w = jnp.asarray(rng.rand(b, q, cams, lvls, g).astype(np.float32))
    out = deformable_aggregation(feats, pts, w, g)
    assert out.shape == (b, q, c)

    # manual
    manual = np.zeros((b, q, c), np.float32)
    for lvl in range(lvls):
        for cam in range(cams):
            s = bilinear_sample_nchw(feats[lvl][0, cam], pts[0, :, cam, :])
            s = np.asarray(s).reshape(q, g, c // g)
            manual[0] += (s * np.asarray(w)[0, :, cam, lvl, :, None]
                          ).reshape(q, c)
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-4,
                               atol=1e-5)


def test_deformable_outside_gate():
    """Locations outside (0,1) contribute nothing even with weight."""
    feats = [jnp.ones((1, 1, 4, 4, 4))]
    pts = jnp.array([[[[1.5, 0.5]]]])  # outside
    w = jnp.ones((1, 1, 1, 1, 2))
    out = deformable_aggregation(feats, pts, w, 2)
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_submanifold_conv_identity_kernel():
    """A kernel with identity at the center offset reproduces features."""
    rng = np.random.RandomState(2)
    p, c = 17, 6
    feats = jnp.asarray(rng.randn(p, c).astype(np.float32))
    coords = jnp.asarray(rng.randint(0, 8, (p, 3)), jnp.int32)
    w = np.zeros((3, 3, 3, c, c), np.float32)
    w[1, 1, 1] = np.eye(c)
    out = submanifold_conv3d(feats, coords, (8, 8, 8), jnp.asarray(w))
    # anchors whose voxel was overwritten by a later anchor lose their
    # self-lookup; anchors in unique voxels must be exact.
    flat = np.asarray((coords[:, 0] * 8 + coords[:, 1]) * 8 + coords[:, 2])
    unique_mask = np.array(
        [np.sum(flat == f) == 1 for f in flat])
    np.testing.assert_allclose(np.asarray(out)[unique_mask],
                               np.asarray(feats)[unique_mask], atol=1e-5)


def test_submanifold_conv_neighbor_sum():
    """Uniform kernel sums features of occupied neighbor voxels."""
    feats = jnp.asarray([[1.0], [2.0], [4.0]])
    coords = jnp.asarray([[1, 1, 1], [1, 1, 2], [3, 3, 3]], jnp.int32)
    w = jnp.ones((3, 3, 3, 1, 1))
    out = submanifold_conv3d(feats, coords, (8, 8, 8), w)
    np.testing.assert_allclose(np.asarray(out)[:, 0], [3.0, 3.0, 4.0],
                               atol=1e-5)


def test_voxel_indices_truncation():
    xyz = jnp.array([[0.9, -0.9, 0.4]])
    idx, shape = voxel_indices(xyz, (-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
                               (0.5, 0.5, 0.5))
    assert shape == (4, 4, 4)
    np.testing.assert_array_equal(np.asarray(idx), [[3, 0, 2]])


def test_fps_spreads_points():
    """FPS on a cube's corners + center picks all corners first."""
    corners = np.array([[x, y, z] for x in (0, 10.0) for y in (0, 10.0)
                        for z in (0, 10.0)], np.float32)
    center = np.full((20, 3), 5.0, np.float32)
    pts = jnp.asarray(np.concatenate([center[:1], corners, center[1:]]))
    sel = farthest_point_sampling(pts, 9)
    sel = np.sort(np.asarray(sel))
    # must include the first point (index 0) and all 8 corners (1..8)
    np.testing.assert_array_equal(sel, np.arange(9))


def test_fps_respects_mask():
    pts = jnp.asarray(np.array(
        [[0, 0, 0], [100, 0, 0], [0, 100, 0], [1, 1, 1]], np.float32))
    valid = jnp.asarray([True, False, False, True])
    sel = np.asarray(farthest_point_sampling(pts, 2, valid))
    assert set(sel.tolist()) == {0, 3}


def test_dcn_zero_offset_matches_conv():
    """With zero offsets and mask=1, deform_conv2d equals a standard
    3x3 convolution."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 6, 6, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))
    offset = jnp.zeros((1, 6, 6, 18))
    mask = jnp.ones((1, 6, 6, 9))
    out = deform_conv2d(x, offset, mask, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_dcn_shifted_offset():
    """An integer offset of (+1, 0) shifts the sampling window down one
    row for every tap."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 8, 8, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 2).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 18)).at[..., 0::2].set(1.0)  # dy = 1
    mask = jnp.ones((1, 8, 8, 9))
    out = deform_conv2d(x, offset, mask, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(0, 2), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


class TestPallasDCN:
    def test_matches_gather_path_interpret(self):
        """Pallas DCN (interpret mode) == exact gather path for offsets
        within the window capacity."""
        import jax
        import jax.numpy as jnp
        from gaussianformer_tpu.ops.dcn import deform_conv2d
        from gaussianformer_tpu.ops.pallas.dcn_kernel import (
            deform_conv2d_pallas_fwd)

        ks = jax.random.split(jax.random.PRNGKey(3), 5)
        b, h, w, c = 2, 26, 30, 128
        x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
        # quantized offsets keep floor() decisions stable across paths;
        # clipped inside the per-tap row margin ±(win - 2*tile)/2 = 4
        off = jnp.clip(jnp.round(
            jax.random.normal(ks[1], (b, h, w, 18)) * 1.5 * 16) / 16,
            -3.9, 3.9) + 1 / 32
        mask = jax.nn.sigmoid(jax.random.normal(ks[2], (b, h, w, 9)))
        wgt = jax.random.normal(ks[3], (3, 3, c, 8)) * 0.1

        ref = deform_conv2d(x, off, mask, wgt)
        out = deform_conv2d_pallas_fwd(x, off, mask, wgt, interpret=True)
        assert jnp.max(jnp.abs(ref - out)) < 1e-4

    def test_hand_backward_matches_autodiff(self):
        """The hand-derived Pallas DCN backward == autodiff of the exact
        gather path (for in-capacity offsets), all four gradients."""
        import numpy as np
        import jax
        import jax.numpy as jnp
        from gaussianformer_tpu.ops.dcn import deform_conv2d
        from gaussianformer_tpu.ops.pallas.dcn_kernel import (
            deform_conv2d_pallas)

        ks = jax.random.split(jax.random.PRNGKey(7), 5)
        b, h, w, c = 2, 26, 30, 128
        x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
        off = jnp.clip(jnp.round(
            jax.random.normal(ks[1], (b, h, w, 18)) * 1.5 * 16) / 16,
            -3.9, 3.9) + 1 / 32
        mask = jax.nn.sigmoid(jax.random.normal(ks[2], (b, h, w, 9)))
        wgt = jax.random.normal(ks[3], (3, 3, c, 8)) * 0.1
        g_up = jax.random.normal(ks[4], (b, h, w, 8))

        def loss_ref(x, off, mask, wgt):
            return jnp.sum(deform_conv2d(x, off, mask, wgt) * g_up)

        def loss_pal(x, off, mask, wgt):
            return jnp.sum(deform_conv2d_pallas(
                x, off, mask, wgt, interpret=True) * g_up)

        gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
        gp = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(x, off, mask, wgt)
        for name, a, p in zip(("x", "offset", "mask", "weight"), gr, gp):
            np.testing.assert_allclose(
                np.asarray(p), np.asarray(a), rtol=1e-4, atol=1e-3,
                err_msg=f"grad mismatch for {name}")

    def test_pallas_dcn_grad_bf16(self):
        """Grad through the Pallas DCN wrapper with bf16 activations:
        the backward's XLA recompute must accept the bf16 cotangent
        (regression — the f32 gather output made jax.vjp reject it,
        breaking full-size TPU training)."""
        import jax
        import jax.numpy as jnp
        from gaussianformer_tpu.ops.pallas.dcn_kernel import (
            deform_conv2d_pallas)

        ks = jax.random.split(jax.random.PRNGKey(5), 4)
        b, h, w, c = 1, 26, 30, 128
        x = jax.random.normal(ks[0], (b, h, w, c), jnp.bfloat16)
        off = jax.random.normal(ks[1], (b, h, w, 18)) * 1.5
        mask = jax.nn.sigmoid(jax.random.normal(ks[2], (b, h, w, 9)))
        wgt = jax.random.normal(ks[3], (3, 3, c, 8), jnp.bfloat16) * 0.1

        def loss(x, wgt):
            out = deform_conv2d_pallas(x, off, mask, wgt, interpret=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gx, gw = jax.grad(loss, argnums=(0, 1))(x, wgt)
        assert gx.shape == x.shape and gw.shape == wgt.shape
        assert bool(jnp.any(gx.astype(jnp.float32) != 0))

    def test_out_of_window_corners_dropped(self):
        """Offsets beyond the window capacity zero out (documented
        divergence from the unbounded reference op)."""
        import jax
        import jax.numpy as jnp
        from gaussianformer_tpu.ops.pallas.dcn_kernel import (
            deform_conv2d_pallas_fwd)

        ks = jax.random.split(jax.random.PRNGKey(4), 4)
        b, h, w, c = 1, 32, 32, 128
        x = jax.random.normal(ks[0], (b, h, w, c), jnp.float32)
        off = jnp.full((b, h, w, 18), 50.0)   # all samples far outside
        mask = jnp.ones((b, h, w, 9))
        wgt = jax.random.normal(ks[1], (3, 3, c, 4)) * 0.1
        out = deform_conv2d_pallas_fwd(x, off, mask, wgt, interpret=True)
        assert jnp.max(jnp.abs(out)) == 0.0


def test_dcn_offset_margin_check():
    """The sown per-block offset maxima surface through
    utils.check_dcn_offset_margin and flag out-of-window offsets."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    from gaussianformer_tpu.configs import get_config
    from gaussianformer_tpu.models import BEVSegmentor
    from gaussianformer_tpu.ops.splat import SplatGridSpec
    from gaussianformer_tpu.utils import check_dcn_offset_margin
    from gaussianformer_tpu.data.synthetic import SyntheticOccDataset

    cfg = dataclasses.replace(
        get_config("prob_gs6400"), embed_dims=32, num_decoder=1,
        num_anchor=32, random_samples=16, num_depth_samples=8,
        num_learnable_pts=2)
    seg = cfg.segmentor_cfg()
    seg["backbone_cfg"].update(depth=50, base_channels=8, with_cp=False,
                               stage_with_dcn=(False, False, True, True))
    seg["lifter_cfg"].update(num_samples=8, occ_resolution=(20, 20, 8),
                             voxel_size=5.0, initializer_depth=18,
                             initializer_dcn=(False,) * 4,
                             initializer_base_channels=8,
                             initializer_out_channels=(8, 8, 8, 8))
    seg["head_cfg"]["grid"] = SplatGridSpec(
        H=20, W=20, D=8, pc_min=(-50.0, -50.0, -5.0), grid_size=5.0,
        scale_multiplier=4.0)
    seg["head_cfg"].update(splat_tile_n=320, splat_chunk_g=16)
    model = BEVSegmentor(**seg)

    ds = SyntheticOccDataset(num_samples=1, image_size=(64, 96),
                             grid=(20, 20, 8))
    s = ds[0]
    batch = {k: jnp.asarray(v)[None] for k, v in s.items()}
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": rng}, batch["imgs"],
        batch["projection_mat"], batch["image_wh"],
        occ_xyz=batch["occ_xyz"], occ_label=batch["occ_label"],
        occ_cam_mask=batch["occ_cam_mask"], training=False, rng=rng)

    # zero-init offset convs → max offset 0, inside any margin
    rep = check_dcn_offset_margin(model, variables, batch)
    assert rep["per_block"], "no DCN blocks sown"
    assert rep["ok"] and rep["max_offset"] == 0.0

    # inject a large bias into one offset conv → flagged
    import flax
    params = flax.core.unfreeze(variables["params"])

    def bump(tree):
        for k, v in tree.items():
            if k == "conv_offset":
                v["bias"] = v["bias"] + 10.0
                return True
            if isinstance(v, dict) and bump(v):
                return True
        return False

    assert bump(params)
    rep2 = check_dcn_offset_margin(
        model, {**variables, "params": params}, batch)
    assert not rep2["ok"] and rep2["max_offset"] > rep2["margin"]


def test_submanifold_dense2d_matches_gather_path():
    """The batched-2D dense formulation (TPU path, incl. the
    sublane-padded internal grid) must equal the voxel-hash gather
    formulation on a ragged (non-multiple-of-8) grid."""
    from gaussianformer_tpu.ops.sparse_conv import (
        submanifold_conv3d, submanifold_conv3d_dense2d)
    rng = np.random.RandomState(0)
    P, C, k = 60, 16, 5
    coords = jnp.asarray(rng.randint(0, [10, 11, 6], size=(P, 3)),
                         jnp.int32)
    feats = jnp.asarray(rng.randn(P, C), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, C, C) * 0.1, jnp.float32)
    a = submanifold_conv3d(feats, coords, (10, 11, 6), w)
    b = submanifold_conv3d_dense2d(feats, coords, (10, 11, 6), w)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                               rtol=2e-4, atol=2e-4)


def test_submanifold_dense2d_reuse_table_equivalent():
    """Recycling the previous layer's scatter table (dense_reuse) must
    be exactly equivalent to a fresh zero-filled table: the anchor rows
    are overwritten at identical flat indices and all other rows are
    still zero."""
    from gaussianformer_tpu.ops.sparse_conv import (
        submanifold_conv3d_dense2d)
    rng = np.random.RandomState(1)
    P, C, k = 60, 16, 3
    coords = jnp.asarray(rng.randint(0, [10, 11, 6], size=(P, 3)),
                         jnp.int32)
    f0 = jnp.asarray(rng.randn(P, C), jnp.float32)
    f1 = jnp.asarray(rng.randn(P, C), jnp.float32)
    w = jnp.asarray(rng.randn(k, k, k, C, C) * 0.1, jnp.float32)
    _, dense = submanifold_conv3d_dense2d(
        f0, coords, (10, 11, 6), w, return_dense=True)
    fresh = submanifold_conv3d_dense2d(f1, coords, (10, 11, 6), w)
    reused = submanifold_conv3d_dense2d(
        f1, coords, (10, 11, 6), w, dense_reuse=dense)
    np.testing.assert_array_equal(np.asarray(reused), np.asarray(fresh))


def test_dcn_pallas_epilogue_matches_separate_bn_relu():
    """The fused frozen-BN+ReLU epilogue in the Pallas DCN forward must
    equal kernel-then-BN-then-ReLU."""
    from gaussianformer_tpu.ops.pallas.dcn_kernel import (
        deform_conv2d_pallas_fwd)
    rng = np.random.RandomState(6)
    B, H, W, C = 1, 24, 32, 128
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    off = jnp.asarray(rng.randn(B, H, W, 18) * 2.0, jnp.float32)
    msk = jnp.asarray(1 / (1 + np.exp(-rng.randn(B, H, W, 9))), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)
    inv = jnp.asarray(rng.rand(C) + 0.5, jnp.float32)
    shift = jnp.asarray(rng.randn(C), jnp.float32)

    base = deform_conv2d_pallas_fwd(x, off, msk, wgt, interpret=True)
    want = jnp.maximum(base * inv + shift, 0.0)
    got = deform_conv2d_pallas_fwd(x, off, msk, wgt, interpret=True,
                                   epilogue=(inv, shift))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pallas_dcn_win16_zero_offsets_exact():
    """dcn_win=16 (margin 0) samples the VALUE path exactly at the init
    condition (conv_offset == 0, reference zero-init) — the basis of the
    inference-only auto-narrow (utils.all_dcn_offsets_zero,
    Trainer.verify_dcn_margin(allow_narrow=True))."""
    import numpy as np
    import jax.numpy as jnp
    from gaussianformer_tpu.ops.dcn import deform_conv2d
    from gaussianformer_tpu.ops.pallas.dcn_kernel import (
        deform_conv2d_pallas_fwd)

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(1, 24, 40, 16), jnp.float32)
    wgt = jnp.asarray(rs.randn(3, 3, 16, 24) * 0.1, jnp.float32)
    off = jnp.zeros((1, 24, 40, 18), jnp.float32)
    mask = jnp.full((1, 24, 40, 9), 0.5, jnp.float32)
    ref = deform_conv2d(x, off, mask, wgt)
    out = deform_conv2d_pallas_fwd(x, off, mask, wgt, win=16,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_all_dcn_offsets_zero():
    import jax.numpy as jnp
    from gaussianformer_tpu.utils import all_dcn_offsets_zero

    params = {"img_backbone": {"stage3": {"layer_0": {"conv_offset": {
        "kernel": jnp.zeros((3, 3, 8, 27)), "bias": jnp.zeros((27,))}}}}}
    assert all_dcn_offsets_zero(params)
    params["img_backbone"]["stage3"]["layer_0"]["conv_offset"]["bias"] = \
        jnp.full((27,), 0.25)
    assert not all_dcn_offsets_zero(params)
    assert not all_dcn_offsets_zero({"no": {"dcn": {}}})
