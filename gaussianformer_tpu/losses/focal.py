"""Focal losses (reference loss/occupancy_loss.py:270-571).

The reference wraps mmcv's CUDA sigmoid/softmax focal loss inside
CustomFocalLoss, which additionally weights each voxel by its normalized
BEV distance (c = ||xy|| / max + 1, occupancy_loss.py:519-524). Plain JAX
implementations below; off in all shipped configs but part of the loss
zoo (`use_focal_loss`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits, labels, *, gamma: float = 2.0,
                       alpha: float = 0.25, class_weights=None,
                       sample_weights=None):
    """Per-sample sigmoid focal loss summed over classes, mean over samples
    (mmcv semantics with 'none' reduction + .sum(-1).mean()).

    logits: [N, C]; labels: [N] int (a label == C means background)."""
    n, c = logits.shape
    onehot = jax.nn.one_hot(labels, c + 1)[:, :c]
    p = jax.nn.sigmoid(logits)
    pt = (1.0 - p) * onehot + p * (1.0 - onehot)
    focal = (alpha * onehot + (1.0 - alpha) * (1.0 - onehot)) * pt ** gamma
    bce = -(onehot * jax.nn.log_sigmoid(logits)
            + (1.0 - onehot) * jax.nn.log_sigmoid(-logits))
    loss = bce * focal
    if class_weights is not None:
        loss = loss * jnp.asarray(class_weights)[None, :]
    loss = jnp.sum(loss, axis=-1)
    if sample_weights is not None:
        loss = loss * sample_weights
    return jnp.mean(loss)


def softmax_focal_loss(logits, labels, *, gamma: float = 2.0,
                       alpha: float = 0.25, class_weights=None,
                       sample_weights=None):
    """Softmax focal loss, mean over samples."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    pick_logp = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    pt = jnp.exp(pick_logp)
    loss = -alpha * (1.0 - pt) ** gamma * pick_logp
    if class_weights is not None:
        loss = loss * jnp.asarray(class_weights)[labels]
    if sample_weights is not None:
        loss = loss * sample_weights
    return jnp.mean(loss)


def distance_weighted_focal_loss(logits, labels, sampled_xyz, *,
                                 use_sigmoid: bool = True,
                                 gamma: float = 2.0, alpha: float = 0.25,
                                 class_weights=None):
    """CustomFocalLoss: voxels farther from the ego get up to 2x weight
    (reference occupancy_loss.py:519-524)."""
    dist = jnp.linalg.norm(sampled_xyz[..., :2], axis=-1)
    c = dist / jnp.maximum(jnp.max(dist), 1e-6) + 1.0
    b, n = labels.shape
    flat_logits = logits.reshape(b * n, -1)
    flat_labels = labels.reshape(b * n)
    fn = sigmoid_focal_loss if use_sigmoid else softmax_focal_loss
    return fn(flat_logits, flat_labels, gamma=gamma, alpha=alpha,
              class_weights=class_weights,
              sample_weights=c.reshape(b * n))


def dice_loss(probs, labels, *, class_weights=None, eps: float = 1e-5,
              valid=None):
    """Multi-class Dice loss over [N, C] probabilities."""
    n, c = probs.shape
    onehot = jax.nn.one_hot(labels, c)
    if valid is not None:
        v = valid.astype(probs.dtype)[:, None]
        probs = probs * v
        onehot = onehot * v
    inter = jnp.sum(probs * onehot, axis=0)
    denom = jnp.sum(probs, axis=0) + jnp.sum(onehot, axis=0)
    dice = 1.0 - 2.0 * inter / (denom + eps)
    if class_weights is not None:
        w = jnp.asarray(class_weights)
        return jnp.sum(dice * w) / jnp.sum(w)
    return jnp.mean(dice)
