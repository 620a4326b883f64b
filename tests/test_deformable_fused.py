"""Fused Pallas deformable aggregation vs the XLA gather reference.

The XLA path (ops/deformable.deformable_aggregation) is itself
golden-tested against the reference CUDA math
(tests/test_golden_parity.py), so matching it end-to-end — forward and
gradients, including out-of-view points and window-spilled pairs —
carries the parity chain to the fused kernel.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.ops.deformable import (
    deformable_aggregation, deformable_aggregation_fused,
    deformable_fused_spill_stats)

SHAPES = ((12, 48), (6, 24), (3, 12), (2, 6))
CAMS = 2
C = 32
G = 4
NUM_PTS = 3
P = 24
Q = P * NUM_PTS
B = 1


def _make_inputs(seed=0, wild=False):
    rng = np.random.RandomState(seed)
    feats = [jnp.asarray(rng.randn(B, CAMS, h, w, C), jnp.float32)
             for (h, w) in SHAPES]
    # locations: mostly inside, some outside / near edges; "wild" spreads
    # points over the full image so chunks spill the 32-wide l0 window
    if wild:
        loc = rng.uniform(-0.1, 1.1, size=(B, Q, CAMS, 2))
    else:
        loc = rng.uniform(0.05, 0.45, size=(B, Q, CAMS, 2))
        loc[:, Q // 2:] += 0.4    # second half far from first → spill
    loc = jnp.asarray(loc, jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.randn(B, Q, CAMS, 4, G), jnp.float32), axis=-2)
    return feats, loc, w


def _anchor_ref(feats, loc, w):
    """Reference: XLA path + key-point reduction."""
    out = deformable_aggregation(feats, loc, w, G)
    return out.reshape(B, P, NUM_PTS, C).sum(axis=2)


@pytest.mark.parametrize("wild", [False, True])
def test_fused_forward_matches_xla(wild):
    feats, loc, w = _make_inputs(wild=wild)
    ref = _anchor_ref(feats, loc, w)
    got = deformable_aggregation_fused(feats, loc, w, G, NUM_PTS,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_spill_exactness():
    """Points forced to spill must still be exact (cleanup path)."""
    feats, loc, w = _make_inputs(seed=3, wild=True)
    stats = deformable_fused_spill_stats(np.asarray(loc), NUM_PTS, SHAPES)
    assert stats["spilled_pairs"] > 0, "test should exercise spill"
    assert stats["dropped"] == 0
    ref = _anchor_ref(feats, loc, w)
    got = deformable_aggregation_fused(feats, loc, w, G, NUM_PTS,
                                       interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_fused_grads_match_xla():
    feats, loc, w = _make_inputs(seed=1)
    cot = jnp.asarray(np.random.RandomState(9).randn(B, P, C), jnp.float32)

    def loss_ref(feats, loc, w):
        return jnp.sum(_anchor_ref(feats, loc, w) * cot)

    def loss_fused(feats, loc, w):
        return jnp.sum(deformable_aggregation_fused(
            feats, loc, w, G, NUM_PTS, interpret=True) * cot)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(feats, loc, w)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(feats, loc, w)

    for l in range(4):
        np.testing.assert_allclose(np.asarray(g_fus[0][l]),
                                   np.asarray(g_ref[0][l]),
                                   rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(g_fus[1]), np.asarray(g_ref[1]),
                               rtol=5e-2, atol=5e-1)
    np.testing.assert_allclose(np.asarray(g_fus[2]), np.asarray(g_ref[2]),
                               rtol=5e-2, atol=5e-2)


def test_keypoints_projection_soa_matches_aos():
    """The SoA keypoints+projection fast path (modules.py) must match the
    AoS generator + project_points bit-for-bit-ish (same math, different
    op order)."""
    from gaussianformer_tpu.models.encoder.modules import (
        SparseGaussian3DKeyPointsGenerator, project_points,
        keypoints_projection_soa)

    rng = np.random.RandomState(3)
    b, p, cams, nl = 1, 40, 3, 2
    fix_scale = ((0.0, 0.0, 0.0), (0.5, 0.0, 0.0), (0.0, -0.5, 0.0))
    anchor = jnp.asarray(rng.randn(b, p, 11) * 1.5, jnp.float32)
    feat = jnp.asarray(rng.randn(b, p, 16), jnp.float32)
    projection_mat = jnp.asarray(
        rng.randn(b, cams, 4, 4) * np.asarray(
            [200.0, 200.0, 1.0, 30.0])[None, None, :, None],
        jnp.float32)
    image_wh = jnp.asarray(
        np.tile(np.asarray([640.0, 480.0]), (b, cams, 1)), jnp.float32)
    pc_range = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
    scale_range = (0.01, 3.2)

    gen = SparseGaussian3DKeyPointsGenerator(
        embed_dims=16, num_learnable_pts=nl, learnable_fixed_scale=2.0,
        fix_scale=fix_scale, pc_range=pc_range, scale_range=scale_range)
    params = gen.init(jax.random.PRNGKey(0), anchor, feat)
    kp = gen.apply(params, anchor, feat)
    uv, mask = project_points(kp, projection_mat, image_wh)

    learn_raw = gen.apply(params, anchor, feat, learn_only=True)
    u2, v2, mask2 = keypoints_projection_soa(
        anchor, learn_raw, fix_scale, 2.0, scale_range, pc_range,
        projection_mat, image_wh)

    np.testing.assert_allclose(np.asarray(u2), np.asarray(uv[..., 0]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(uv[..., 1]),
                               rtol=2e-5, atol=2e-6)
    # mask comes back pair-row order [B, C, P, K] (same as u/v)
    np.testing.assert_array_equal(np.asarray(mask2), np.asarray(mask))


def test_flat_lane_softmax_matches_generic():
    """The fused branch's flat-lane masked softmax (global-max
    stabilizer + group-indicator matmul, modules.py fused branch) must
    equal the generic path's (pts, cams, lvls)-softmax per group on the
    same logits + vis mask."""
    rng = np.random.RandomState(7)
    b, p, cams, L, K, G = 1, 10, 3, 4, 5, 4
    klg = K * L * G
    weights = jnp.asarray(rng.randn(b, p, cams, L, K, G) * 4.0,
                          jnp.float32)
    vis = jnp.asarray(rng.rand(b, cams, p, K) > 0.3)       # [B,C,P,K]
    # one anchor missing from every camera → uniform-zero row
    vis = vis.at[:, :, 3].set(False)

    # generic-path formula (modules.py else-branch): [B,P,K,C,L,G]
    w_g = jnp.transpose(weights, (0, 1, 4, 2, 3, 5))
    vis_g = jnp.transpose(vis, (0, 2, 3, 1))               # [B,P,K,C]
    mask = vis_g[..., None, None] & jnp.ones(w_g.shape, bool)
    all_miss = jnp.sum(mask, axis=(2, 3, 4), keepdims=True) == 0
    miss_b = jnp.broadcast_to(all_miss, mask.shape)
    w = jnp.where(mask, w_g, -jnp.inf)
    w = jnp.where(miss_b, 0.0, w)
    w_flat = w.reshape(b, p, K * cams * L, G)
    w_soft = jax.nn.softmax(w_flat, axis=-2)
    w_soft = jnp.where(miss_b.reshape(w_flat.shape), 0.0, w_soft)
    want = w_soft.reshape(b, p, K, cams, L, G)

    # flat-lane formula (fused branch): [B, C, P, KLG], (K, L, G) lanes
    raw = jnp.moveaxis(weights, 2, 1).reshape(b, cams, p, L * K * G)
    perm = jnp.asarray([(l * K + k) * G + g
                        for k in range(K) for l in range(L)
                        for g in range(G)], jnp.int32)
    wf = raw[..., perm]
    maskf = jnp.repeat(vis, L * G, axis=-1).astype(jnp.float32)
    grp = jnp.arange(klg) % G
    same_g = (grp[:, None] == grp[None, :]).astype(jnp.float32)
    cnt = jax.lax.dot_general(maskf.sum(1), same_g,
                              (((2,), (0,)), ((), ())))
    miss = cnt == 0.0
    m = jnp.max(jnp.where(maskf > 0, wf, -jnp.inf), axis=(1, 3),
                keepdims=True)
    e = jnp.exp(jnp.minimum(wf - jnp.maximum(m, -1e30), 0.0)) * maskf
    s = jax.lax.dot_general(e.sum(1, dtype=jnp.float32), same_g,
                            (((2,), (0,)), ((), ())))
    got_flat = e / jnp.where(miss, 1.0, s)[:, None]        # [B,C,P,KLG]
    got = jnp.transpose(
        got_flat.reshape(b, cams, p, K, L, G), (0, 2, 3, 1, 4, 5))

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=1e-7)


def test_module_fused_branch_matches_generic():
    """End-to-end DeformableFeatureAggregation: the fused branch (SoA
    keypoints/projection + P-minor softmax + pair-table kernel, run in
    interpret mode) must match the generic XLA branch."""
    from gaussianformer_tpu.models.encoder.modules import (
        DeformableFeatureAggregation)
    from gaussianformer_tpu.ops.deformable import pack_feature_maps

    rng = np.random.RandomState(5)
    b, p, cams, C = 1, 24, 2, 32
    shapes = ((12, 48), (6, 24), (3, 12), (2, 6))
    feats = [jnp.asarray(rng.randn(b, cams, h, w, C), jnp.float32)
             for (h, w) in shapes]
    inst = jnp.asarray(rng.randn(b, p, C), jnp.float32)
    anchor = jnp.asarray(rng.randn(b, p, 11 + 4) * 1.2, jnp.float32)
    embed = jnp.asarray(rng.randn(b, p, C), jnp.float32)
    proj = jnp.asarray(
        rng.randn(b, cams, 4, 4) * np.asarray(
            [20.0, 20.0, 1.0, 5.0])[None, None, :, None], jnp.float32)
    wh = jnp.asarray(np.tile([48.0, 12.0], (b, cams, 1)), jnp.float32)

    kw = dict(embed_dims=C, num_cams=cams, num_levels=4, num_groups=4,
              num_learnable_pts=2, fix_scale=((0., 0., 0.),
                                              (0.5, 0., 0.)))
    mod_f = DeformableFeatureAggregation(backend="fused", interpret=True,
                                         **kw)
    mod_g = DeformableFeatureAggregation(backend="xla", **kw)
    params = mod_f.init(jax.random.PRNGKey(0), inst, anchor, embed,
                        feats, proj, wh)
    got = mod_f.apply(params, inst, anchor, embed, feats, proj, wh)
    want = mod_g.apply(params, inst, anchor, embed,
                       pack_feature_maps(feats), proj, wh)
    # kernel samples in bf16 (same tolerance as the op-level tests)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_spill_count_matches_host_stats():
    """return_spill_count must equal the numpy diagnostic's count (the
    device spill mask and deformable_fused_spill_stats mirror the same
    window math)."""
    from gaussianformer_tpu.ops.deformable import (
        deformable_aggregation_fused_cm)

    feats, loc, w = _make_inputs(seed=3, wild=True)
    stats = deformable_fused_spill_stats(np.asarray(loc), NUM_PTS, SHAPES)
    assert stats["spilled_pairs"] > 0

    pts_cm = jnp.moveaxis(loc, 2, 1)
    w_cm = jnp.moveaxis(w.reshape(B, Q, CAMS, -1), 2, 1)
    _, n_spill = deformable_aggregation_fused_cm(
        feats,
        (pts_cm[..., 0].reshape(B, CAMS, P, NUM_PTS),
         pts_cm[..., 1].reshape(B, CAMS, P, NUM_PTS)),
        w_cm.reshape(B, CAMS, P, NUM_PTS * w_cm.shape[-1]),
        G, NUM_PTS, return_spill_count=True, interpret=True)
    assert n_spill.shape == (B,)
    assert int(np.asarray(n_spill).sum()) == stats["spilled_pairs"]


def test_module_sows_spill_count():
    """DeformableFeatureAggregation (fused) sows deformable_spill_count
    so checkpoints whose keypoints spill past the cleanup budget can be
    made loud (utils.check_deformable_spill / Trainer)."""
    from gaussianformer_tpu.models.encoder.modules import (
        DeformableFeatureAggregation)

    rng = np.random.RandomState(5)
    b, p, cams, C = 1, 24, 2, 32
    shapes = ((12, 48), (6, 24), (3, 12), (2, 6))
    feats = [jnp.asarray(rng.randn(b, cams, h, w, C), jnp.float32)
             for (h, w) in shapes]
    inst = jnp.asarray(rng.randn(b, p, C), jnp.float32)
    anchor = jnp.asarray(rng.randn(b, p, 11 + 4) * 1.2, jnp.float32)
    embed = jnp.asarray(rng.randn(b, p, C), jnp.float32)
    proj = jnp.asarray(
        rng.randn(b, cams, 4, 4) * np.asarray(
            [20.0, 20.0, 1.0, 5.0])[None, None, :, None], jnp.float32)
    wh = jnp.asarray(np.tile([48.0, 12.0], (b, cams, 1)), jnp.float32)

    mod = DeformableFeatureAggregation(
        backend="fused", interpret=True, embed_dims=C, num_cams=cams,
        num_levels=4, num_groups=4, num_learnable_pts=2,
        fix_scale=((0., 0., 0.), (0.5, 0., 0.)))
    params = mod.init(jax.random.PRNGKey(0), inst, anchor, embed,
                      feats, proj, wh)
    _, inter = mod.apply(params, inst, anchor, embed, feats, proj, wh,
                         mutable=["intermediates"])
    counts = inter["intermediates"]["deformable_spill_count"]
    n = np.asarray(jnp.stack(list(counts)))
    assert n.shape[-1] == b and (n >= 0).all()


def test_check_deformable_spill_flags_over_budget():
    """utils.check_deformable_spill: ok iff max sown count <= budget
    (over-budget spills are dropped attention mass and must be loud)."""
    import flax.linen as nn
    from gaussianformer_tpu.utils import check_deformable_spill

    class FakeSeg(nn.Module):
        count: int

        @nn.compact
        def __call__(self, imgs, projection_mat, image_wh, *, occ_xyz,
                     occ_label, occ_cam_mask, training, rng):
            self.sow("intermediates", "deformable_spill_count",
                     jnp.asarray([self.count], jnp.int32))
            return {"final_occ": jnp.zeros((1, 4))}

    batch = {k: jnp.zeros((1, 2)) for k in
             ("imgs", "projection_mat", "image_wh", "occ_xyz",
              "occ_label", "occ_cam_mask")}
    model = FakeSeg(count=100)
    res = check_deformable_spill(model, {}, batch, budget=128)
    assert res["ok"] and res["max_spill"] == 100
    res = check_deformable_spill(model, {}, batch, budget=64)
    assert not res["ok"]

