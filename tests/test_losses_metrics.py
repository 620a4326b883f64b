"""Loss and metric tests vs straightforward dense-math references."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaussianformer_tpu.losses.lovasz import lovasz_softmax
from gaussianformer_tpu.losses.occupancy import (
    OccupancyLossCfg, occupancy_loss, weighted_ce_with_softmax,
    weighted_ce_probs, balanced_class_weights)
from gaussianformer_tpu.losses.bce import (binary_cross_entropy_loss,
                                           pixel_distribution_loss)
from gaussianformer_tpu.metrics.mean_iou import MeanIoU, compute_iou


def naive_lovasz(probas, labels, valid):
    """Direct reimplementation of the Berman loss over the valid subset
    with dynamic shapes (ground truth for the masked version)."""
    probas = probas[valid]
    labels = labels[valid]
    c = probas.shape[1]
    losses = []
    for ci in range(c):
        fg = (labels == ci).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - probas[:, ci])
        order = np.argsort(-errors, kind="stable")
        fg_s = fg[order]
        errors_s = errors[order]
        gts = fg_s.sum()
        inter = gts - np.cumsum(fg_s)
        union = gts + np.cumsum(1 - fg_s)
        jac = 1.0 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        losses.append((errors_s * jac).sum())
    return np.mean(losses)


def test_lovasz_matches_naive():
    rng = np.random.RandomState(0)
    n, c = 200, 5
    logits = rng.randn(n, c)
    probas = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    labels = rng.randint(0, c, n)
    valid = rng.rand(n) > 0.3
    got = float(lovasz_softmax(jnp.asarray(probas, jnp.float32),
                               jnp.asarray(labels), jnp.asarray(valid)))
    want = naive_lovasz(probas, labels, valid)
    assert got == pytest.approx(want, rel=1e-3)


def test_lovasz_all_classes_present_no_mask():
    rng = np.random.RandomState(1)
    n, c = 64, 3
    probas = rng.dirichlet(np.ones(c), n)
    labels = rng.randint(0, c, n)
    got = float(lovasz_softmax(jnp.asarray(probas, jnp.float32),
                               jnp.asarray(labels)))
    want = naive_lovasz(probas, labels, np.ones(n, bool))
    assert got == pytest.approx(want, rel=1e-3)


def test_weighted_ce_softmax_matches_torch_semantics():
    """CrossEntropyLoss(weight, 'mean') normalizes by summed target
    weights."""
    rng = np.random.RandomState(2)
    n, c = 50, 4
    logits = rng.randn(n, c).astype(np.float32)
    labels = rng.randint(0, c, n)
    w = np.array([0.5, 1.0, 2.0, 1.5], np.float32)
    valid = (rng.rand(n) > 0.2).astype(np.float32)

    logp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    per = -logp[np.arange(n), labels] * w[labels] * valid
    want = per.sum() / (w[labels] * valid).sum()
    got = float(weighted_ce_with_softmax(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(w),
        jnp.asarray(valid)))
    assert got == pytest.approx(want, rel=1e-5)


def test_weighted_ce_probs_clamps():
    probs = jnp.asarray([[1e-9, 1.0 - 1e-9]])
    labels = jnp.asarray([0])
    w = jnp.ones(2)
    out = float(weighted_ce_probs(probs, labels, w, jnp.ones(1)))
    assert out == pytest.approx(-np.log(1e-6), rel=1e-4)


def test_balanced_class_weights_normalization():
    w = balanced_class_weights(18)
    assert float(jnp.sum(jnp.abs(w))) == pytest.approx(18.0, rel=1e-5)


def test_bce_loss_weighting():
    probs = [jnp.asarray([[0.8, 0.2]])]
    labels = jnp.asarray([[3, 17]])  # occupied, empty
    mask = jnp.asarray([[True, True]])
    got = float(binary_cross_entropy_loss(probs, labels, mask,
                                          class_weights=(1.0, 1.0)))
    want = -(np.log(0.8) + np.log(0.8)) / 2
    assert got == pytest.approx(want, rel=1e-3)


def test_pixel_distribution_loss():
    logits = jnp.asarray(np.random.RandomState(3).randn(2, 3, 4, 5, 6)
                         .astype(np.float32))
    gt = jnp.asarray(np.random.RandomState(4).rand(2, 3, 4, 5, 6) > 0.5)
    out = float(pixel_distribution_loss(logits, gt))
    assert np.isfinite(out) and out > 0


def test_occupancy_loss_runs():
    rng = np.random.RandomState(5)
    b, n, c = 1, 300, 18
    probs = rng.dirichlet(np.ones(c), (b, n)).astype(np.float32)
    labels = rng.randint(0, c, (b, n))
    mask = rng.rand(b, n) > 0.3
    cfg = OccupancyLossCfg(lovasz_use_softmax=False)
    loss = float(occupancy_loss(cfg, [jnp.asarray(probs)],
                                jnp.asarray(labels), jnp.asarray(mask)))
    assert np.isfinite(loss) and loss > 0


def test_mean_iou_counts():
    miou = MeanIoU(class_indices=[1, 2], empty_label=3,
                   label_str=["a", "b"])
    targets = np.array([1, 1, 2, 2, 3, 3])
    outputs = np.array([1, 2, 2, 2, 3, 1])
    miou.update(outputs, targets, np.ones(6, bool))
    m, occ, per = miou.result()
    # class1: seen 2, correct 1, positive 2 → iou 1/3
    # class2: seen 2, correct 2, positive 3 → iou 2/3
    assert per[0] == pytest.approx(1 / 3)
    assert per[1] == pytest.approx(2 / 3)
    assert m == pytest.approx(100 * 0.5)
    # occupancy: t = 4 non-empty, o = 5 (one fp at idx5), correct 4
    assert occ == pytest.approx(100 * 4 / 5)


def test_mean_iou_unseen_class_is_one():
    counts = np.array([[0, 0, 0], [5, 5, 5], [10, 5, 10]], np.int64)
    m, occ, per = compute_iou(counts)
    assert per[0] == 1.0 and per[1] == 1.0


def test_lovasz_custom_vjp_matches_autodiff():
    """The analytic backward equals autodiff of the naive sort-based
    implementation (torch semantics: gradient flows through `errors`
    only)."""
    rng = np.random.RandomState(9)
    n, c = 60, 4
    probas = rng.dirichlet(np.ones(c), n).astype(np.float32)
    labels = rng.randint(0, c, n)
    valid = rng.rand(n) > 0.2

    def naive_loss(p):
        validf = jnp.asarray(valid, jnp.float32)
        tot, cnt = 0.0, 0
        for ci in range(c):
            fg = (jnp.asarray(labels) == ci).astype(jnp.float32) * validf
            if float(jnp.sum(fg)) == 0:
                continue
            errors = jnp.abs(fg - p[:, ci]) * validf
            order = jnp.argsort(-errors)
            fg_s = fg[order]
            v_s = validf[order]
            gts = jnp.sum(fg_s)
            inter = gts - jnp.cumsum(fg_s)
            union = gts + jnp.cumsum(v_s - fg_s)
            jac = 1.0 - inter / jnp.maximum(union, 1e-12)
            jac = jnp.concatenate([jac[:1], jac[1:] - jac[:-1]])
            grad = jax.lax.stop_gradient(jac)
            tot = tot + jnp.sum(errors[order] * grad)
            cnt += 1
        return tot / cnt

    g_naive = jax.grad(naive_loss)(jnp.asarray(probas))
    g_ours = jax.grad(lambda p: lovasz_softmax(
        p, jnp.asarray(labels), jnp.asarray(valid)))(jnp.asarray(probas))
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_naive),
                               rtol=1e-4, atol=1e-6)
