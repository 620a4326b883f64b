"""Golden-convention parity tests.

Each test freezes the *reference semantics* as an independent numpy
implementation transcribed from the reference sources, then asserts this
framework's ops reproduce it:

  - bilinear sampling with `h_im = loc_h * H - 0.5` and per-corner bounds
    (deformable_aggregation_cuda.cu:9-55,174-175)
  - strict-inside (0, 1) gating (deformable_aggregation_cuda.cu:166)
  - GMM splat: power/prob/bin_logit/density accumulation, det of the
    *inverse* covariance entries, 1e-9 uniform fallback
    (localagg_prob/src/forward.cu:34-102) with getRect AABB semantics
    (localagg_prob/src/auxiliary.h:8-19)
  - safe_sigmoid / safe_inverse_sigmoid clamps (model/utils/safe_ops.py)
  - caffe-style ResNet bottleneck: stride on conv1, frozen BN running
    stats (mmcv Bottleneck with style="caffe")

These decide whether converted reference checkpoints reproduce mIoU, so
they must never drift.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussianformer_tpu.ops.deformable import (
    bilinear_sample_nchw, deformable_aggregation)
from gaussianformer_tpu.ops.safe_ops import safe_sigmoid, safe_inverse_sigmoid
from gaussianformer_tpu.ops.splat import SplatGridSpec, splat


# ---------------------------------------------------------------------------
# Reference math, transcribed to numpy
# ---------------------------------------------------------------------------

def ref_bilinear(feat, h_im, w_im):
    """bilinear_sampling, deformable_aggregation_cuda.cu:9-55.
    feat: [H, W, C]."""
    h, w, _ = feat.shape
    h_low = int(np.floor(h_im))
    w_low = int(np.floor(w_im))
    h_high, w_high = h_low + 1, w_low + 1
    lh, lw = h_im - h_low, w_im - w_low
    hh, hw = 1.0 - lh, 1.0 - lw
    v1 = feat[h_low, w_low] if (h_low >= 0 and w_low >= 0) else 0.0
    v2 = feat[h_low, w_high] if (h_low >= 0 and w_high <= w - 1) else 0.0
    v3 = feat[h_high, w_low] if (h_high <= h - 1 and w_low >= 0) else 0.0
    v4 = (feat[h_high, w_high]
          if (h_high <= h - 1 and w_high <= w - 1) else 0.0)
    return hh * hw * v1 + hh * lw * v2 + lh * hw * v3 + lh * lw * v4


def ref_deformable_agg(feature_maps, points_2d, weights):
    """deformable_aggregation_kernel, deformable_aggregation_cuda.cu:125-187.

    feature_maps: list per level of [cams, H, W, C]; points_2d
    [Q, cams, 2] normalized (w, h); weights [Q, cams, levels, G].
    Returns [Q, C]."""
    num_levels = len(feature_maps)
    cams = feature_maps[0].shape[0]
    c = feature_maps[0].shape[-1]
    q = points_2d.shape[0]
    groups = weights.shape[-1]
    gdim = c // groups
    out = np.zeros((q, c), np.float64)
    for qi in range(q):
        for cam in range(cams):
            loc_w, loc_h = points_2d[qi, cam]
            if not (0.0 < loc_w < 1.0 and 0.0 < loc_h < 1.0):
                continue
            for lvl in range(num_levels):
                fm = feature_maps[lvl][cam]
                h, w = fm.shape[:2]
                h_im = loc_h * h - 0.5
                w_im = loc_w * w - 0.5
                val = ref_bilinear(fm, h_im, w_im)   # [C]
                for g in range(groups):
                    out[qi, g * gdim:(g + 1) * gdim] += (
                        val[g * gdim:(g + 1) * gdim]
                        * weights[qi, cam, lvl, g])
    return out


def ref_gmm_splat(pts, pts_int, means, means_int, radii, cov_inv6, opas,
                  sem):
    """renderCUDA, localagg_prob/src/forward.cu:34-102, with the
    sort-based binning replaced by its net effect: gaussian g is in the
    list of voxel v iff v lies inside g's AABB (getRect,
    auxiliary.h:8-19: [mean_int - r, mean_int + r] clamped to grid)."""
    n, p = pts.shape[0], means.shape[0]
    c = sem.shape[-1]
    logits = np.zeros((n, c), np.float64)
    bins = np.zeros(n)
    dens = np.zeros(n)
    for i in range(n):
        cacc = np.zeros(c)
        bin_logit = 1.0
        density = 0.0
        prob_sum = 0.0
        for g in range(p):
            if np.any(np.abs(pts_int[i] - means_int[g]) > radii[g]):
                continue
            cov1 = cov_inv6[g, :3]
            cov2 = cov_inv6[g, 3:]
            d = means[g] - pts[i]
            power = (cov1[0] * d[0] * d[0] + cov1[1] * d[1] * d[1]
                     + cov1[2] * d[2] * d[2])
            power = (-0.5 * power - (cov2[0] * d[0] * d[1]
                                     + cov2[1] * d[1] * d[2]
                                     + cov2[2] * d[0] * d[2]))
            power = np.exp(power)
            deter = (cov1[0] * cov1[1] * cov1[2]
                     + 2 * cov2[0] * cov2[1] * cov2[2]
                     - cov1[0] * cov2[1] ** 2 - cov1[1] * cov2[2] ** 2
                     - cov1[2] * cov2[0] ** 2)
            prob = ((2 * np.pi) ** -1.5 * deter ** 0.5 * power * opas[g])
            cacc += sem[g] * prob
            bin_logit *= (1.0 - power)
            density += power
            prob_sum += prob
        if prob_sum > 1e-9:
            logits[i] = cacc / prob_sum
        else:
            logits[i, :c - 1] = 1.0 / (c - 1)
        bins[i] = 1.0 - bin_logit
        dens[i] = density
    return logits, bins, dens


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------

def test_bilinear_convention_golden():
    rng = np.random.RandomState(0)
    feat = rng.randn(7, 9, 4).astype(np.float32)
    # cover boundary cells, strict-inside edge, and interior
    locs = np.array([
        [0.501, 0.501], [0.03, 0.97], [0.97, 0.03], [0.25, 0.5],
        [0.0001, 0.0001], [0.9999, 0.9999], [0.06, 0.08], [0.5, 0.071],
    ], np.float32)
    got = np.asarray(bilinear_sample_nchw(jnp.asarray(feat),
                                          jnp.asarray(locs)))
    h, w = feat.shape[:2]
    for k, (lw_, lh_) in enumerate(locs):
        want = ref_bilinear(feat.astype(np.float64),
                            lh_ * h - 0.5, lw_ * w - 0.5)
        np.testing.assert_allclose(got[k], want, rtol=2e-5, atol=2e-5)


def test_deformable_aggregation_golden():
    rng = np.random.RandomState(1)
    cams, levels, c, groups, q = 2, 3, 8, 2, 17
    shapes = [(6, 9), (3, 5), (2, 3)]
    fmaps = [rng.randn(cams, h, w, c).astype(np.float32)
             for h, w in shapes]
    pts = rng.uniform(-0.1, 1.1, (q, cams, 2)).astype(np.float32)
    wts = rng.rand(q, cams, levels, groups).astype(np.float32)

    want = ref_deformable_agg(
        [f.astype(np.float64) for f in fmaps], pts, wts)
    got = np.asarray(deformable_aggregation(
        [jnp.asarray(f)[None] for f in fmaps],
        jnp.asarray(pts)[None], jnp.asarray(wts)[None], groups))[0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gmm_splat_golden():
    rng = np.random.RandomState(2)
    grid = SplatGridSpec(H=6, W=6, D=4, pc_min=(0.0, 0.0, 0.0),
                         grid_size=1.0, scale_multiplier=4.0)
    n, p, c = 40, 12, 5
    pts = rng.uniform(0, [6, 6, 4], (n, 3)).astype(np.float32)
    means = rng.uniform(0, [6, 6, 4], (p, 3)).astype(np.float32)
    scales = rng.uniform(0.2, 0.8, (p, 3)).astype(np.float32)
    opas = rng.rand(p).astype(np.float32)
    sem = rng.rand(p, c).astype(np.float32)
    # random SPD inverse covariances (compact [xx, yy, zz, xy, yz, xz])
    a = rng.randn(p, 3, 3).astype(np.float32) * 0.3
    spd = np.einsum("pij,pkj->pik", a, a) + np.eye(3)[None] * 0.5
    cov6 = np.stack([spd[:, 0, 0], spd[:, 1, 1], spd[:, 2, 2],
                     spd[:, 0, 1], spd[:, 1, 2], spd[:, 0, 2]], -1)

    pts_int = np.clip((pts // 1.0).astype(int), 0, [5, 5, 3])
    means_int = np.clip((means // 1.0).astype(int), 0, [5, 5, 3])
    radii = np.maximum(
        np.ceil(scales * grid.scale_multiplier / grid.grid_size), 1
    ).astype(int)

    want_log, want_bin, want_den = ref_gmm_splat(
        pts.astype(np.float64), pts_int, means.astype(np.float64),
        means_int, radii, cov6.astype(np.float64), opas, sem)

    got_log, got_bin, got_den = splat(
        jnp.asarray(pts)[None], jnp.asarray(means)[None],
        jnp.asarray(opas)[None], jnp.asarray(sem)[None],
        jnp.asarray(scales)[None], jnp.asarray(cov6)[None], grid,
        variant="prob", per_axis_radii=True, backend="xla",
        chunk_g=4)
    np.testing.assert_allclose(np.asarray(got_log)[0], want_log,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_bin)[0], want_bin,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_den)[0], want_den,
                               rtol=1e-4, atol=1e-5)


def test_safe_ops_clamps_golden():
    # model/utils/safe_ops.py: sigmoid input clamped to ±9.21; inverse
    # sigmoid clamps x to [1-0.9999, 0.9999] then log(x/(1-x))
    x = jnp.asarray([-100.0, -9.21, -1.0, 0.0, 1.0, 9.21, 100.0])
    got = np.asarray(safe_sigmoid(x))
    want = 1.0 / (1.0 + np.exp(-np.clip(np.asarray(x), -9.21, 9.21)))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    u = jnp.asarray([0.0, 1e-6, 0.5, 1.0 - 1e-6, 1.0])
    got = np.asarray(safe_inverse_sigmoid(u))
    uc = np.clip(np.asarray(u), 1.0 - 0.9999, 0.9999)
    want = np.log(uc / (1.0 - uc))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _np_conv2d(x, w, stride=1, pad=0):
    """Plain numpy conv (NHWC, HWIO) for the golden bottleneck."""
    if pad:
        x = np.pad(x, ((pad, pad), (pad, pad), (0, 0)))
    kh, kw, ci, co = w.shape
    h = (x.shape[0] - kh) // stride + 1
    wd = (x.shape[1] - kw) // stride + 1
    out = np.zeros((h, wd, co))
    for i in range(h):
        for j in range(wd):
            patch = x[i * stride:i * stride + kh, j * stride:j * stride + kw]
            out[i, j] = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2]))
    return out


def test_caffe_bottleneck_golden():
    """Caffe-style bottleneck: the stride sits on conv1 (1x1), not conv2,
    and BN uses stored running stats (frozen). mmcv Bottleneck
    style='caffe' semantics."""
    from gaussianformer_tpu.models.backbone.resnet import Bottleneck

    rng = np.random.RandomState(3)
    cin, planes = 8, 4
    x = rng.randn(1, 6, 6, cin).astype(np.float32)

    block = Bottleneck(planes=planes, stride=2, with_dcn=False,
                       downsample=True, dtype=jnp.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # overwrite with random params/stats so the check is non-trivial
    def randomize(tree, positive=False):
        def draw(a):
            v = rng.randn(*a.shape).astype(np.float32) * 0.3 + 0.5
            return jnp.asarray(np.abs(v) + 0.1 if positive else v)
        return jax.tree_util.tree_map(draw, tree)
    variables = {"params": randomize(variables["params"]),
                 "batch_stats": randomize(variables["batch_stats"],
                                          positive=True)}
    got = np.asarray(block.apply(variables, jnp.asarray(x)))[0]

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    s = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def bn(y, name, eps=1e-5):
        return ((y - s[name]["mean"]) / np.sqrt(s[name]["var"] + eps)
                * p[name]["scale"] + p[name]["bias"])

    def relu(y):
        return np.maximum(y, 0.0)

    y = relu(bn(_np_conv2d(x[0], p["conv1"]["kernel"], stride=2), "bn1"))
    y = relu(bn(_np_conv2d(y, p["conv2"]["kernel"], stride=1, pad=1), "bn2"))
    y = bn(_np_conv2d(y, p["conv3"]["kernel"]), "bn3")
    sc = bn(_np_conv2d(x[0], p["downsample_conv"]["kernel"], stride=2),
            "downsample_bn")
    want = relu(y + sc)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_stem_conv_space_to_depth_equivalence():
    """StemConv's 2x2 space-to-depth re-indexing must match the plain
    7x7/2 pad-3 convolution exactly (same params, f32)."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from gaussianformer_tpu.models.backbone.resnet import StemConv

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 36, 44, 3), jnp.float32)
    mod = StemConv(8)
    params = mod.init(jax.random.PRNGKey(0), x)
    got = mod.apply(params, x)
    ref = jax.lax.conv_general_dilated(
        x, params["params"]["kernel"], (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
