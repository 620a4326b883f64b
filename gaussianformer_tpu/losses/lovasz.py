"""Lovász-softmax loss with static-shape masking.

Math parity with the Berman implementation vendored by the reference
(loss/utils/lovasz_softmax.py:22-200): per present class c, errors
``|fg_c - p_c|`` are sorted descending and dotted with the Lovász gradient
of the Jaccard loss. The reference removes `ignore` pixels by boolean
indexing (dynamic shape); here they are masked instead: an ignored pixel
contributes fg = 0 and error = 0, so it sorts behind every positive error
and its contribution (error * grad) vanishes, and the trailing cumsum
positions it perturbs only multiply zero errors.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _lovasz_grad_from_sorted(fg_sorted, valid_sorted):
    """Gradient of the Lovász extension w.r.t. sorted errors
    (reference lovasz_softmax.py:22-33)."""
    gts = jnp.sum(fg_sorted)
    intersection = gts - jnp.cumsum(fg_sorted, axis=0)
    union = gts + jnp.cumsum(valid_sorted - fg_sorted, axis=0)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    jaccard = jnp.concatenate(
        [jaccard[:1], jaccard[1:] - jaccard[:-1]], axis=0)
    return jaccard


def lovasz_softmax(probas, labels, valid=None, classes="present"):
    """probas: [N, C] probabilities; labels: [N] int; valid: [N] bool.

    Returns scalar loss (mean over present classes), matching
    ``lovasz_softmax_flat`` with ``classes='present'``.
    """
    n, c = probas.shape
    if valid is None:
        valid = jnp.ones((n,), bool)
    validf = valid.astype(probas.dtype)

    # python loop over the (small, static) class count — NOT jax.vmap:
    # vmap over sort-containing bodies leaks tracers under jax.grad in
    # jax 0.9.0 (see ops/splat.py for the same workaround). Each class is
    # rematerialized so the backward never holds 18 classes' sorted copies
    # of a 640k-voxel grid at once.
    @jax.checkpoint
    def class_loss(prob_col, fg):
        errors = jnp.abs(fg - prob_col) * validf
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        valid_sorted = validf[order]
        grad = _lovasz_grad_from_sorted(fg_sorted, valid_sorted)
        return jnp.sum(errors_sorted * grad)

    # row-major transpose first: the backward of a column slice
    # materializes a [N, 1] cotangent whose TPU layout pads 128x (312MB at
    # 640k voxels); rows of the transposed array have 1-D cotangents.
    probas_t = probas.T
    losses = []
    present = []
    for ci in range(c):
        fg = (labels == ci).astype(probas.dtype) * validf
        losses.append(class_loss(probas_t[ci], fg))
        present.append(jnp.sum(fg) > 0)

    losses = jnp.stack(losses)
    present = jnp.stack(present)
    num_present = jnp.maximum(jnp.sum(present), 1)
    return jnp.sum(jnp.where(present, losses, 0.0)) / num_present
