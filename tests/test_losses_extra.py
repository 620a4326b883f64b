"""Focal / dice / density / occ-depth loss tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.losses import (
    sigmoid_focal_loss, softmax_focal_loss, distance_weighted_focal_loss,
    dice_loss, density_loss, occ_depth_loss)


def test_sigmoid_focal_matches_manual():
    rng = np.random.RandomState(0)
    n, c = 40, 5
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c + 1, n)  # c == background
    got = float(sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(labels)))

    onehot = np.eye(c + 1)[labels][:, :c]
    p = 1 / (1 + np.exp(-logits))
    pt = (1 - p) * onehot + p * (1 - onehot)
    focal = (0.25 * onehot + 0.75 * (1 - onehot)) * pt ** 2
    bce = -(onehot * np.log(p + 1e-12)
            + (1 - onehot) * np.log(1 - p + 1e-12))
    want = (bce * focal).sum(-1).mean()
    assert got == pytest.approx(want, rel=1e-3)


def test_softmax_focal_reduces_to_weighted_ce_at_gamma0():
    rng = np.random.RandomState(1)
    logits = rng.randn(30, 4).astype(np.float32)
    labels = rng.randint(0, 4, 30)
    got = float(softmax_focal_loss(jnp.asarray(logits), jnp.asarray(labels),
                                   gamma=0.0, alpha=1.0))
    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    want = -logp[np.arange(30), labels].mean()
    assert got == pytest.approx(want, rel=1e-3)


def test_distance_weighted_focal_runs():
    rng = np.random.RandomState(2)
    logits = jnp.asarray(rng.randn(1, 50, 6).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 6, (1, 50)))
    xyz = jnp.asarray(rng.uniform(-50, 50, (1, 50, 3)).astype(np.float32))
    out = float(distance_weighted_focal_loss(logits, labels, xyz))
    assert np.isfinite(out) and out > 0


def test_dice_perfect_prediction_is_zero():
    labels = jnp.asarray([0, 1, 2, 1])
    probs = jax.nn.one_hot(labels, 3)
    assert float(dice_loss(probs, labels)) == pytest.approx(0.0, abs=1e-3)


def test_density_loss_hinge():
    density = [jnp.asarray([[0.0, 2.0]])]
    labels = jnp.asarray([[3, 17]])  # occupied, empty
    mask = jnp.asarray([[True, True]])
    # occupied with density 0 → penalty thresh-0; empty with 2.0 → 2-thresh
    out = float(density_loss(density, labels, mask, thresh=1.0))
    assert out == pytest.approx((1.0 + 1.0) / 2, rel=1e-5)


def test_occ_depth_loss_prefers_correct_bin():
    gt = jnp.asarray(np.eye(4, dtype=bool)[None, None, None, [1, 2]])
    good = jnp.asarray(np.eye(4, dtype=np.float32)[None, None, None, [1, 2]]
                       * 10)
    bad = jnp.asarray(np.eye(4, dtype=np.float32)[None, None, None, [0, 3]]
                      * 10)
    assert float(occ_depth_loss(good, gt)) < float(occ_depth_loss(bad, gt))
