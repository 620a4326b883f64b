"""GaussianLifterV2 deterministic-path parity vs a numpy transcription
of the reference pipeline (model/lifter/gaussian_lifter_v2.py:154-253):

    per-pixel depth pdf → top-k bin (deterministic sampling) →
    unprojection via inverse projection matrices → in-range filter →
    farthest-point sampling down to num_anchor → normalize →
    inverse-sigmoid anchor xyz;  plus the occupancy-along-ray pixel_gt
    lookup (:185-201).

VERDICT r3 item 3b. The geometry is constructed so every candidate is
valid (rays stay inside pc_range for all selected bins and the "no
occupancy" bin never wins the argmax) — on that domain the static TPU
reformulation (mask → jitter-pad → masked FPS) must be EXACTLY the
reference pipeline, with no randomness left.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianformer_tpu.models.lifter.gaussian_lifter_v2 import (
    GaussianLifterV2)

B, N_CAM = 1, 2
FEAT_H, FEAT_W = 4, 6
IMG_W, IMG_H = 48.0, 32.0
NUM_SAMPLES = 8
NUM_ANCHOR = 16
PC_RANGE = (-50.0, -50.0, -5.0, 50.0, 50.0, 3.0)
DEPTH_MIN, DEPTH_MAX = 1.0, 6.0   # vertical ray spread stays inside
                                  # the narrow z range [-5, 3]
OCC_RES = (20, 20, 8)
VOXEL = 5.0
EMPTY = 17
SEM_DIM = 4


def _projection():
    """Pinhole cameras looking along +x / +y: rays stay inside pc_range
    for all depths <= DEPTH_MAX."""
    proj = np.zeros((B, N_CAM, 4, 4), np.float32)
    intr = np.array([[40.0, 0, IMG_W / 2, 0],
                     [0, 40.0, IMG_H / 2, 0],
                     [0, 0, 1.0, 0],
                     [0, 0, 0, 1.0]], np.float32)
    for c in range(N_CAM):
        ang = np.pi / 2 * c
        rot = np.eye(4, dtype=np.float32)
        # world → cam: z_cam = viewing direction
        rot[:3, :3] = np.array(
            [[np.sin(ang), np.cos(ang), 0],
             [0, 0, -1],
             [np.cos(ang), -np.sin(ang), 0]], np.float32)
        proj[:, c] = intr @ rot
    return proj


def _numpy_reference(logits, proj, occ_label, occ_mask):
    """Transcription of reference gaussian_lifter_v2.py:154-253
    (deterministic top-1 path, all candidates valid)."""
    lo = np.array(PC_RANGE[:3], np.float32)
    hi = np.array(PC_RANGE[3:], np.float32)
    bins = np.linspace(DEPTH_MIN, DEPTH_MAX, NUM_SAMPLES)
    inv = np.linalg.inv(proj)                       # [B, N, 4, 4]

    # pixel-center rays (reference :171-181): x(d) = M^-1 [u d, v d, d, 1]
    u = (np.arange(FEAT_W) + 0.5) / FEAT_W * IMG_W
    v = (np.arange(FEAT_H) + 0.5) / FEAT_H * IMG_H
    uu, vv = np.meshgrid(u, v)                      # [h, w]
    ones = np.ones_like(uu)
    pix = np.stack([uu, vv, ones], -1)              # [h, w, 3]
    dirs = np.einsum("bnij,hwj->bnhwi", inv[..., :3, :3], pix)
    orig = inv[..., :3, 3][:, :, None, None]

    # pixel_gt (:185-201): occupied & visible along the ray per bin
    gt_grid = ((occ_label != EMPTY) & occ_mask)     # [B, X, Y, Z]
    pg = np.zeros((B, N_CAM, FEAT_H, FEAT_W, NUM_SAMPLES), bool)
    for k, d in enumerate(bins):
        pts = orig + dirs * d
        idx = np.floor((pts - lo) / VOXEL).astype(np.int64)
        oob = ((pts < lo) | (pts >= hi)).any(-1)
        ic = np.clip(idx, 0, np.array(OCC_RES) - 1)
        val = gt_grid[np.arange(B)[:, None, None, None],
                      ic[..., 0], ic[..., 1], ic[..., 2]]
        pg[..., k] = val & ~oob
    pixel_gt = np.concatenate(
        [pg, ~pg.any(-1, keepdims=True)], axis=-1)

    # deterministic top-1 bin per pixel (sampler.py gather_discrete_topk)
    pdf = np.exp(logits - logits.max(-1, keepdims=True))
    pdf = pdf / pdf.sum(-1, keepdims=True)
    top = np.argmax(pdf, axis=-1)                   # [B, N, h, w]
    assert (top < NUM_SAMPLES).all(), "no-occupancy bin must never win"
    d_sel = bins[top]
    cand = (orig + dirs * d_sel[..., None]).reshape(B, -1, 3)
    assert ((cand >= lo) & (cand < hi)).all(), "all candidates in range"

    # farthest point sampling (reference pointops; start at index 0)
    sel = np.zeros((B, NUM_ANCHOR), np.int64)
    for b in range(B):
        pts = cand[b]
        dist = np.full(pts.shape[0], np.inf)
        cur = 0
        for i in range(NUM_ANCHOR):
            sel[b, i] = cur
            dist = np.minimum(dist, ((pts - pts[cur]) ** 2).sum(-1))
            cur = int(np.argmax(dist))
    xyz = np.take_along_axis(cand, sel[..., None], axis=1)
    unit = (xyz - lo) / (hi - lo)
    # reference safe_inverse_sigmoid clamp (model/utils/safe_ops.py:7-13)
    unit = np.clip(unit, 1.0 - 0.9999, 0.9999)
    presig = np.log(unit / (1 - unit))
    return pixel_gt, cand, presig


@pytest.mark.parametrize("seed", [0])
def test_lifter_v2_deterministic_parity(seed):
    rs = np.random.RandomState(seed)
    proj = _projection()
    image_wh = np.full((B, N_CAM, 2), (IMG_W, IMG_H), np.float32)
    imgs = np.zeros((B, N_CAM, int(IMG_H), int(IMG_W), 3), np.float32)
    secondfpn = rs.randn(B, N_CAM, FEAT_H, FEAT_W, 16).astype(np.float32)
    occ_label = rs.randint(0, 18, (B,) + OCC_RES).astype(np.int32)
    occ_mask = rs.rand(B, *OCC_RES) > 0.3

    lifter = GaussianLifterV2(
        num_anchor=NUM_ANCHOR, embed_dims=8, semantic_dim=SEM_DIM,
        include_opa=True, num_samples=NUM_SAMPLES,
        depth_min=DEPTH_MIN, depth_max=DEPTH_MAX, pc_range=PC_RANGE,
        voxel_size=VOXEL, occ_resolution=OCC_RES, empty_label=EMPTY,
        deterministic_sampling=True, random_samples=4,
        use_initializer=False)

    rng = jax.random.PRNGKey(0)
    variables = lifter.init(
        rng, jnp.asarray(imgs), jnp.asarray(proj),
        jnp.asarray(image_wh), occ_label=jnp.asarray(occ_label),
        occ_cam_mask=jnp.asarray(occ_mask),
        secondfpn_out=jnp.asarray(secondfpn), rng=rng)
    # force the "no occupancy along ray" bin to never win the argmax —
    # on that domain the reference pipeline has no invalid candidates
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])
    bias = np.asarray(params["projection"]["bias"]).copy()
    bias[-1] = -1e6
    params["projection"]["bias"] = jnp.asarray(bias)
    variables = {"params": params}

    out = lifter.apply(
        variables, jnp.asarray(imgs), jnp.asarray(proj),
        jnp.asarray(image_wh), occ_label=jnp.asarray(occ_label),
        occ_cam_mask=jnp.asarray(occ_mask),
        secondfpn_out=jnp.asarray(secondfpn), rng=jax.random.PRNGKey(3),
        compute_gt=True)

    # the oracle consumes the SAME per-pixel logits the module computed
    kern = np.asarray(params["projection"]["kernel"])
    logits = np.maximum(secondfpn, 0.0) @ kern + bias
    pixel_gt, cand, presig = _numpy_reference(
        logits, proj, occ_label, occ_mask)

    np.testing.assert_array_equal(
        np.asarray(out["pixel_gt"]), pixel_gt)
    anchor = np.asarray(out["representation"])
    assert anchor.shape[1] == NUM_ANCHOR + 4
    # ordered comparison: the FPS walk itself must match the reference
    # pipeline (same candidate ids in the same order), not just the set
    np.testing.assert_allclose(anchor[0, :NUM_ANCHOR, :3], presig[0],
                               atol=1e-4, rtol=1e-4)
